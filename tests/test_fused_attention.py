"""Fused-attention Pallas kernel (``ops/fused_attention.py``) vs the XLA
oracle, in interpret mode on CPU (the same comparisons run compiled on the
real chip via the verify drives)."""

import numpy as np
import pytest

import jax
import jax.experimental.pallas as pl
import jax.numpy as jnp

from daspeech_tpu.ops import fused_attention as fa


@pytest.fixture(autouse=True)
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call

    def patched(*a, **kw):
        kw.setdefault("interpret", True)
        return orig(*a, **kw)

    monkeypatch.setattr(fa.pl, "pallas_call", patched)


def make_inputs(B=2, H=3, Tq=10, Tk=13, d=16, seed=0, dtype=np.float32):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(B, H, Tq, d)).astype(dtype))
    k = jnp.asarray(rng.normal(size=(B, H, Tk, d)).astype(dtype))
    v = jnp.asarray(rng.normal(size=(B, H, Tk, d)).astype(dtype))
    valid = np.ones((B, Tk), bool)
    valid[-1, -3:] = False
    bias = jnp.asarray(np.where(valid, 0.0, fa.NEG).astype(np.float32))
    return q, k, v, bias, 1.0 / np.sqrt(d)


class TestFusedAttention:
    @pytest.mark.parametrize("shape", [(2, 3, 10, 13, 16),
                                       (1, 2, 8, 130, 64),
                                       (2, 1, 9, 40, 24)])
    def test_forward_matches_oracle(self, shape):
        q, k, v, bias, sc = make_inputs(*shape, seed=sum(shape))
        out = fa.fused_attention(q, k, v, bias, 0, sc, 0.0, False)
        ref = fa.mha_reference(q, k, v, bias, sc)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_grads_match_oracle(self):
        q, k, v, bias, sc = make_inputs()

        def loss(f):
            return jax.grad(lambda q, k, v: jnp.sum(f(q, k, v) ** 2),
                            argnums=(0, 1, 2))

        g_ref = loss(lambda q, k, v: fa.mha_reference(q, k, v, bias, sc))(
            q, k, v)
        g_fus = loss(lambda q, k, v: fa.fused_attention(
            q, k, v, bias, 0, sc, 0.0, False))(q, k, v)
        for a, b in zip(g_ref, g_fus):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-4, atol=1e-5)

    @pytest.mark.skipif(jax.default_backend() != "tpu",
                        reason="in-kernel PRNG needs real TPU hardware "
                               "(the interpret emulation stubs "
                               "prng_random_bits); covered by the TPU "
                               "verify drives")
    def test_dropout_stats_and_fwd_bwd_consistency(self):
        """v = I exposes the dropped probability matrix directly; the
        cotangent of sum(out) w.r.t. v must equal its column sums — which
        holds only if backward regenerates the SAME dropout bits."""
        rng = np.random.default_rng(1)
        Tk = d = 64
        q = jnp.asarray(rng.normal(size=(1, 1, 32, d)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(1, 1, Tk, d)).astype(np.float32))
        eye = jnp.eye(Tk, d)[None, None]
        bias = jnp.zeros((1, Tk))
        sc = 1.0 / np.sqrt(d)
        P_drop = np.asarray(fa.fused_attention(
            q, k, eye, bias, 123, sc, 0.1, True))[0, 0]
        P_ref = np.asarray(fa.mha_reference(q, k, eye, bias, sc))[0, 0]
        zeros = (P_drop == 0).mean()
        assert 0.05 < zeros < 0.16, zeros          # ~10% dropped
        kept = P_drop[P_drop != 0] / np.maximum(P_ref[P_drop != 0], 1e-20)
        np.testing.assert_allclose(kept, 1.0 / 0.9, rtol=1e-4)
        gv = jax.grad(lambda v: jnp.sum(fa.fused_attention(
            q, k, v, bias, 123, sc, 0.1, True)))(eye)
        col = P_drop.sum(axis=0)
        np.testing.assert_allclose(np.diag(np.asarray(gv)[0, 0]), col,
                                   rtol=1e-5, atol=1e-6)

    @pytest.mark.skipif(jax.default_backend() != "tpu",
                        reason="in-kernel PRNG needs real TPU hardware")
    def test_seed_determinism_and_variation(self):
        q, k, v, bias, sc = make_inputs(seed=2)
        a = fa.fused_attention(q, k, v, bias, 5, sc, 0.1, True)
        b = fa.fused_attention(q, k, v, bias, 5, sc, 0.1, True)
        c = fa.fused_attention(q, k, v, bias, 6, sc, 0.1, True)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert np.abs(np.asarray(a) - np.asarray(c)).max() > 0

    def test_mha_module_fused_flag_falls_back_off_tpu(self):
        """On the CPU backend the fused flag must silently fall back to the
        XLA path and produce identical results to fused=False."""
        from daspeech_tpu.models.layers import MultiHeadAttention

        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.normal(size=(2, 6, 16)).astype(np.float32))
        kpm = jnp.zeros((2, 6), bool)
        m1 = MultiHeadAttention(16, 2, 0.0, fused=True)
        m2 = MultiHeadAttention(16, 2, 0.0, fused=False)
        p = m1.init(jax.random.key(0), x, x, x, key_padding_mask=kpm)
        o1 = m1.apply(p, x, x, x, key_padding_mask=kpm)
        o2 = m2.apply(p, x, x, x, key_padding_mask=kpm)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2))


class TestFusedAttentionPacked:
    """Packed [B, T, H*d] layout (one grid step per batch row, in-kernel
    head loop at the native head dim)."""

    @pytest.mark.parametrize("shape", [(2, 4, 10, 13, 16),
                                       (1, 8, 8, 240, 64),
                                       (3, 2, 9, 40, 32)])
    def test_forward_matches_oracle(self, shape):
        B, H, Tq, Tk, d = shape
        rng = np.random.default_rng(sum(shape))
        q = jnp.asarray(rng.normal(size=(B, Tq, H * d)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(B, Tk, H * d)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(B, Tk, H * d)).astype(np.float32))
        valid = np.ones((B, Tk), bool)
        valid[-1, -3:] = False
        bias = jnp.asarray(np.where(valid, 0.0, fa.NEG).astype(np.float32))
        sc = 1.0 / np.sqrt(d)
        out = fa.fused_attention_packed(q, k, v, bias, 0, sc, 0.0, False, H)
        ref = fa.mha_reference_packed(q, k, v, bias, sc, H)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_grads_match_oracle(self):
        B, H, Tq, Tk, d = 2, 3, 10, 13, 16
        rng = np.random.default_rng(7)
        q = jnp.asarray(rng.normal(size=(B, Tq, H * d)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(B, Tk, H * d)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(B, Tk, H * d)).astype(np.float32))
        bias = jnp.zeros((B, Tk), jnp.float32).at[1, -4:].set(fa.NEG)
        sc = 1.0 / np.sqrt(d)

        def loss(f):
            return jax.grad(lambda q, k, v: jnp.sum(f(q, k, v) ** 2),
                            argnums=(0, 1, 2))

        g_ref = loss(lambda q, k, v: fa.mha_reference_packed(
            q, k, v, bias, sc, H))(q, k, v)
        g_fus = loss(lambda q, k, v: fa.fused_attention_packed(
            q, k, v, bias, 0, sc, 0.0, False, H))(q, k, v)
        for a, b in zip(g_ref, g_fus):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-4, atol=1e-5)

    def test_fits_vmem_gate(self):
        assert fa.packed_fits_vmem(240, 240, 512, 8)
        assert not fa.packed_fits_vmem(4096, 4096, 512, 8)

    def test_mha_module_packed_falls_back_off_tpu(self):
        """MultiHeadAttention routes through the packed kernel on TPU when
        the shape fits; on CPU it must fall back bit-for-bit."""
        from daspeech_tpu.models.layers import MultiHeadAttention

        rng = np.random.default_rng(11)
        x = jnp.asarray(rng.normal(size=(2, 6, 16)).astype(np.float32))
        kpm = jnp.zeros((2, 6), bool).at[0, -1:].set(True)
        m1 = MultiHeadAttention(16, 2, 0.0, fused=True)
        m2 = MultiHeadAttention(16, 2, 0.0, fused=False)
        p = m1.init(jax.random.key(0), x, x, x, key_padding_mask=kpm)
        o1 = m1.apply(p, x, x, x, key_padding_mask=kpm)
        o2 = m2.apply(p, x, x, x, key_padding_mask=kpm)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2))


class TestFusedAttentionFullBias:
    @pytest.mark.slow  # ~20 s; the packed/per-(b,h) oracle tests stay fast
    def test_forward_and_grads_match_oracle(self):
        rng = np.random.default_rng(9)
        B, H, Tq, Tk, d = 2, 2, 9, 12, 16
        q = jnp.asarray(rng.normal(size=(B, H, Tq, d)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(B, H, Tk, d)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(B, H, Tk, d)).astype(np.float32))
        bias4 = jnp.asarray(
            rng.normal(size=(B, H, Tq, Tk)).astype(np.float32))
        # mask a few key columns like a pad mask would
        bias4 = bias4.at[1, :, :, -2:].set(fa.NEG)
        sc = 1.0 / np.sqrt(d)
        out = fa.fused_attention_full_bias(q, k, v, bias4, 0, sc, 0.0,
                                           False)
        ref = fa.mha_reference_full_bias(q, k, v, bias4, sc)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

        def loss(f):
            return jax.grad(
                lambda q, k, v, b: jnp.sum(f(q, k, v, b) ** 2),
                argnums=(0, 1, 2, 3))

        g_ref = loss(lambda q, k, v, b: fa.mha_reference_full_bias(
            q, k, v, b, sc))(q, k, v, bias4)
        g_fus = loss(lambda q, k, v, b: fa.fused_attention_full_bias(
            q, k, v, b, 0, sc, 0.0, False))(q, k, v, bias4)
        for a, b in zip(g_ref, g_fus):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-4, atol=1e-5)

    def test_relpos_module_fused_falls_back_off_tpu(self):
        """RelPosMultiHeadAttention(fused=True) on the CPU backend equals
        the XLA path bit for bit."""
        from daspeech_tpu.models.conformer import RelPosMultiHeadAttention

        rng = np.random.default_rng(4)
        B, T, C = 2, 7, 16
        x = jnp.asarray(rng.normal(size=(B, T, C)).astype(np.float32))
        kpm = jnp.zeros((B, T), bool).at[1, -2:].set(True)
        m1 = RelPosMultiHeadAttention(C, 2, 0.0, fused=True)
        m2 = RelPosMultiHeadAttention(C, 2, 0.0, fused=False)
        p = m1.init(jax.random.key(0), x, key_padding_mask=kpm)
        o1 = m1.apply(p, x, key_padding_mask=kpm)
        o2 = m2.apply(p, x, key_padding_mask=kpm)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2))
