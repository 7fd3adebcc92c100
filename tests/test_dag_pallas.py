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

    @pytest.mark.parametrize("shape", [
        (1, 3, 7),       # tiny, far below one (8, 128) tile
        (2, 9, 130),     # L just past the 128-lane tile boundary
        (3, 11, 40),     # T past the 8-sublane tile, ragged batch
    ])
    def test_off_tile_shapes(self, shape):
        """Shapes that are NOT multiples of the (8, 128) tile exercise the
        internal padding path (``dag_loss_forward_pallas`` pads T->8k,
        L->128k with -inf)."""
        B, T, L = shape
        rng = np.random.default_rng(sum(shape) + 99)
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

    @pytest.mark.parametrize("shape", [(3, 6, 11), (2, 9, 130), (4, 8, 16)])
    def test_best_alignment_matches_scan(self, shape):
        """Pallas Viterbi (fwd max-plus + in-kernel backtrace) must equal
        the scan reference EXACTLY, including first-argmax tie-breaking."""
        from daspeech_tpu.ops import dag_best_alignment
        from daspeech_tpu.ops.dag_pallas import dag_best_alignment_pallas

        B, T, L = shape
        rng = np.random.default_rng(sum(shape) + 5)
        match, links, ol, tl = make_random_dag(rng, B=B, T=T, L=L)
        ref = dag_best_alignment(match, links, ol, tl)
        got = dag_best_alignment_pallas(match, links, ol, tl,
                                        interpret=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_grads_through_pallas_forward(self, monkeypatch):
        """The custom VJP over the Pallas forward must produce the same
        match/links cotangents as the scan backend (the closed-form
        alpha/beta gradient einsums, fed by Pallas-computed alpha/beta)."""
        from daspeech_tpu.ops import dag_loss
        from daspeech_tpu.ops import dag_pallas

        monkeypatch.setattr(dag_pallas, "INTERPRET", True)
        rng = np.random.default_rng(7)
        match, links, ol, tl = make_random_dag(rng, B=2, T=5, L=12)

        def mean_lp(fn):
            def f(m, lk):
                return jnp.mean(fn(m, lk, ol, tl))
            return jax.value_and_grad(f, argnums=(0, 1))

        (v0, (gm0, gl0)) = mean_lp(dag_loss)(match, links)
        (v1, (gm1, gl1)) = mean_lp(dag_pallas.dag_loss_pallas)(match, links)
        np.testing.assert_allclose(float(v0), float(v1), rtol=1e-5)
        for ref, pal in ((gm0, gm1), (gl0, gl1)):
            ref, pal = np.asarray(ref), np.asarray(pal)
            np.testing.assert_allclose(pal, ref, rtol=1e-4, atol=1e-5)

    def test_grads_through_pallas_alpha_beta(self, monkeypatch):
        from daspeech_tpu.ops import dag_loss_with_alpha_beta
        from daspeech_tpu.ops import dag_pallas

        monkeypatch.setattr(dag_pallas, "INTERPRET", True)
        rng = np.random.default_rng(8)
        match, links, ol, tl = make_random_dag(rng, B=2, T=4, L=10)

        def f_ref(m, lk):
            lp, _, _ = dag_loss_with_alpha_beta(m, lk, ol, tl)
            return jnp.mean(lp)

        def f_pal(m, lk):
            lp, _, _ = dag_pallas.dag_loss_with_alpha_beta_pallas(
                m, lk, ol, tl)
            return jnp.mean(lp)

        g_ref = jax.grad(f_ref, argnums=(0, 1))(match, links)
        g_pal = jax.grad(f_pal, argnums=(0, 1))(match, links)
        for ref, pal in zip(g_ref, g_pal):
            np.testing.assert_allclose(np.asarray(pal), np.asarray(ref),
                                       rtol=1e-4, atol=1e-5)
