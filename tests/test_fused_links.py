"""Fused link-extraction Pallas kernel (``ops/fused_links.py``) vs the XLA
oracle, in interpret mode on CPU (the same comparisons run compiled on the
real chip via the verify drives)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from daspeech_tpu.ops import fused_links as fl


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(fl, "INTERPRET", True)


def make_inputs(B=2, L=13, H=4, dk=8, seed=0, ol=None):
    rng = np.random.default_rng(seed)
    C = H * dk
    q = jnp.asarray(rng.normal(size=(B, L, C)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, L, C)).astype(np.float32))
    g = jax.nn.log_softmax(
        jnp.asarray(rng.normal(size=(B, L, H)).astype(np.float32)), axis=-1)
    if ol is None:
        ol = np.full((B,), L, np.int32)
        ol[-1] = max(2, L - 3)
    return q, k, g, jnp.asarray(ol, jnp.int32), 1.0 / np.sqrt(dk)


class TestFusedLinks:
    @pytest.mark.parametrize("shape,mtl", [
        ((2, 13, 4, 8), None),
        ((1, 130, 2, 16), None),    # L past the 128-lane boundary
        ((3, 20, 4, 8), 6),         # banded-softmax semantics
    ])
    def test_forward_matches_oracle(self, shape, mtl):
        B, L, H, dk = shape
        q, k, g, ol, sc = make_inputs(B, L, H, dk, seed=sum(shape))
        got = fl.fused_extract_links(q, k, g, ol, H, sc, mtl)
        ref = fl.xla_extract_links(q, k, g, ol, H, sc, mtl)
        got, ref = np.asarray(got), np.asarray(ref)
        m = np.isfinite(ref)
        assert (np.isfinite(got) == m).all()
        np.testing.assert_allclose(got[m], ref[m], rtol=1e-5, atol=1e-5)

    def test_grads_match_oracle(self):
        B, L, H, dk = 2, 13, 4, 8
        q, k, g, ol, sc = make_inputs(B, L, H, dk, seed=7)

        def loss(f):
            def L_(q, k, g):
                links = f(q, k, g)
                finite = jnp.isfinite(links)
                safe = jnp.where(finite, links, 0.0)
                return jnp.sum(jnp.where(finite, safe * jnp.cos(safe), 0.0))
            return jax.grad(L_, argnums=(0, 1, 2))

        g_ref = loss(lambda q, k, g: fl.xla_extract_links(
            q, k, g, ol, H, sc, None))(q, k, g)
        g_fus = loss(lambda q, k, g: fl.fused_extract_links(
            q, k, g, ol, H, sc, None))(q, k, g)
        for name, a, b in zip("qkg", g_ref, g_fus):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-5,
                err_msg=f"d{name}")

    def test_grads_with_band(self):
        B, L, H, dk = 2, 16, 2, 8
        q, k, g, ol, sc = make_inputs(B, L, H, dk, seed=9)
        mtl = 5

        def loss(f):
            def L_(q, k, g):
                links = f(q, k, g)
                return jnp.sum(jnp.where(jnp.isfinite(links),
                                         jnp.exp(links), 0.0))
            return jax.grad(L_, argnums=(0, 1, 2))

        g_ref = loss(lambda q, k, g: fl.xla_extract_links(
            q, k, g, ol, H, sc, mtl))(q, k, g)
        g_fus = loss(lambda q, k, g: fl.fused_extract_links(
            q, k, g, ol, H, sc, mtl))(q, k, g)
        for a, b in zip(g_ref, g_fus):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-4, atol=1e-5)

    def test_model_path_unchanged_off_tpu(self):
        """extract_links falls back to the XLA path off-TPU: the model's
        links must be identical before/after the fused-kernel wiring."""
        import sys
        sys.path.insert(0, ".")
        from test_models import tiny_dag_cfg
        from testutils import fast_init

        from daspeech_tpu.models import (
            S2TConformerDAG, graph_lengths, initialize_output_tokens)

        cfg = tiny_dag_cfg()
        model = S2TConformerDAG(cfg)
        rng = np.random.default_rng(3)
        B, S, L = 2, 25, 16
        fbank = jnp.asarray(rng.normal(size=(B, S, 80)).astype(np.float32))
        src_lengths = jnp.asarray([25, 19], jnp.int32)
        prev = initialize_output_tokens(
            graph_lengths(src_lengths, 0.5, 64), L, cfg.vocab)
        params = fast_init(model, jax.random.key(0), fbank, src_lengths,
                           prev)
        logits, links, feats = model.apply(params, fbank, src_lengths, prev)
        assert links.shape == (B, L, L)
        # valid entries are log-probabilities: each row of exp sums to ~1
        ex = np.exp(np.asarray(links[0, :5]))
        sums = ex.sum(axis=-1)
        np.testing.assert_allclose(sums[sums > 0.5], 1.0, rtol=1e-4)
