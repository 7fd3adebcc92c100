"""Pallas DAG kernel vs the scan reference (interpret mode on CPU; the same
comparison runs compiled on real TPU hardware via the verify drives)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from daspeech_tpu.ops import dag_loss_forward
from daspeech_tpu.ops.dag_pallas import dag_loss_forward_pallas
from test_dag_ops import make_random_dag


class TestPallasKernel:
    @pytest.mark.parametrize("shape", [(2, 5, 9), (3, 8, 16)])
    def test_alpha_beta_match_scan(self, shape):
        B, T, L = shape
        rng = np.random.default_rng(sum(shape))
        match, links, ol, tl = make_random_dag(rng, B=B, T=T, L=L)
        lp0, a0, b0 = dag_loss_forward(match, links, ol, tl)
        lp1, a1, b1 = dag_loss_forward_pallas(match, links, ol, tl,
                                              interpret=True)
        np.testing.assert_allclose(np.asarray(lp0), np.asarray(lp1),
                                   rtol=1e-5, atol=1e-5)
        for ref, pal in ((a0, a1), (b0, b1)):
            ref, pal = np.asarray(ref), np.asarray(pal)
            m = np.isfinite(ref)
            assert (np.isfinite(pal) == m).all()
            np.testing.assert_allclose(pal[m], ref[m], rtol=1e-4, atol=1e-4)

    def test_ragged_lengths(self):
        rng = np.random.default_rng(42)
        match, links, ol, tl = make_random_dag(rng, B=4, T=6, L=12)
        assert len(set(np.asarray(ol).tolist())) > 1  # genuinely ragged
        lp0, _, _ = dag_loss_forward(match, links, ol, tl)
        lp1, _, _ = dag_loss_forward_pallas(match, links, ol, tl,
                                            interpret=True)
        np.testing.assert_allclose(np.asarray(lp0), np.asarray(lp1),
                                   rtol=1e-5, atol=1e-5)
