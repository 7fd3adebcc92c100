"""Fused FFN Pallas kernel (``ops/fused_ffn.py``) vs the module's XLA path
(same parameters), in interpret mode on CPU; the dropout/PRNG paths are
covered by the TPU verify drives."""

import numpy as np
import pytest

import jax
import jax.experimental.pallas as pl
import jax.numpy as jnp

from daspeech_tpu.models.conformer import FeedForwardModule
from daspeech_tpu.ops import fused_ffn as ff


@pytest.fixture(autouse=True)
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call

    def patched(*a, **kw):
        kw.setdefault("interpret", True)
        return orig(*a, **kw)

    monkeypatch.setattr(ff.pl, "pallas_call", patched)
    monkeypatch.setattr(ff, "available", lambda: True)


def make(B=2, T=10, C=16, F=64, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(B, T, C)).astype(np.float32))
    m_xla = FeedForwardModule(C, F, dropout=0.0, fused=False)
    m_fus = FeedForwardModule(C, F, dropout=0.0, fused=True)
    variables = m_xla.init({"params": jax.random.PRNGKey(seed)}, x,
                           train=False)
    return x, variables, m_xla, m_fus


class TestFusedFFN:
    @pytest.mark.parametrize("shape", [(2, 10, 16, 64),
                                       (1, 13, 8, 32),    # T % 8 != 0
                                       (3, 24, 32, 128)])
    def test_forward_matches_module(self, shape):
        x, variables, m_xla, m_fus = make(*shape, seed=sum(shape))
        ref = m_xla.apply(variables, x, train=False)
        out = m_fus.apply(variables, x, train=False)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_grads_match_module(self):
        x, variables, m_xla, m_fus = make(seed=3)

        def loss(m):
            return jax.grad(
                lambda v, x: jnp.sum(m.apply(v, x, train=False) ** 2),
                argnums=(0, 1))

        gv_ref, gx_ref = loss(m_xla)(variables, x)
        gv_fus, gx_fus = loss(m_fus)(variables, x)
        np.testing.assert_allclose(np.asarray(gx_fus), np.asarray(gx_ref),
                                   rtol=2e-4, atol=2e-5)
        for got, want in zip(jax.tree.leaves(gv_fus),
                             jax.tree.leaves(gv_ref)):
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=2e-4, atol=2e-5)

    def test_param_tree_identical(self):
        x, variables, m_xla, m_fus = make()
        v2 = m_fus.init({"params": jax.random.PRNGKey(0)}, x, train=False)
        assert (jax.tree_util.tree_structure(variables)
                == jax.tree_util.tree_structure(v2))
        for a, b in zip(jax.tree.leaves(variables), jax.tree.leaves(v2)):
            assert a.shape == b.shape and a.dtype == b.dtype
