"""Fused rel-pos attention kernel (``ops/fused_relpos.py``) vs the XLA
oracle, in interpret mode on CPU (compiled comparisons run on the chip via
the verify drives), plus GSPMD mesh parity and the rotation identity."""

import math

import numpy as np
import pytest

import jax
import jax.experimental.pallas as pl
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from daspeech_tpu.models.conformer import (RelPosMultiHeadAttention,
                                           rel_positional_encoding)
from daspeech_tpu.ops import fused_relpos as fr


@pytest.fixture(autouse=True)
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call

    def patched(*a, **kw):
        kw.setdefault("interpret", True)
        return orig(*a, **kw)

    monkeypatch.setattr(fr.pl, "pallas_call", patched)


def oracle(q, k, v, a, e, bias, sm_scale, H):
    B, T, C = q.shape
    d = C // H
    q4 = q.reshape(B, T, H, d)
    k4 = k.reshape(B, T, H, d)
    v4 = v.reshape(B, T, H, d)
    a4 = a.reshape(B, T, H, -1)
    ac = jnp.einsum("bqhd,bkhd->bhqk", q4, k4)
    bd = jnp.einsum("bqhc,kc->bhqk", a4, e)
    s = (ac + bd) * sm_scale + bias[:, None, None, :]
    p = jax.nn.softmax(s, -1)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v4).reshape(B, T, C)


def make_inputs(B=2, T=10, H=3, d=16, seed=0):
    rng = np.random.default_rng(seed)
    C = H * d
    q = jnp.asarray(rng.normal(size=(B, T, C)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, T, C)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, T, C)).astype(np.float32))
    a = jnp.asarray((rng.normal(size=(B, T, H * C)) * 0.3)
                    .astype(np.float32))
    _, _, e = fr.relpos_basis(T, C)
    valid = np.ones((B, T), bool)
    valid[-1, -3:] = False
    bias = jnp.asarray(np.where(valid, 0.0, fr.NEG).astype(np.float32))
    seeds = jnp.arange(B, dtype=jnp.int32)
    return q, k, v, a, e, bias, seeds, 1.0 / math.sqrt(d), H


class TestFusedRelPos:
    @pytest.mark.parametrize("shape", [(2, 10, 3, 16),
                                       (1, 130, 2, 64),   # T % 8 != 0
                                       (3, 24, 4, 8)])
    def test_forward_matches_oracle(self, shape):
        q, k, v, a, e, bias, seeds, sc, H = make_inputs(*shape,
                                                        seed=sum(shape))
        out = fr.fused_attention_relpos(q, k, v, a, e, bias, seeds,
                                        sc, 0.0, False, H)
        ref = oracle(q, k, v, a, e, bias, sc, H)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_grads_match_oracle(self):
        q, k, v, a, e, bias, seeds, sc, H = make_inputs()

        def loss(f):
            return jax.grad(lambda q, k, v, a: jnp.sum(f(q, k, v, a) ** 2),
                            argnums=(0, 1, 2, 3))

        g_ref = loss(lambda q, k, v, a: oracle(q, k, v, a, e, bias, sc, H))(
            q, k, v, a)
        g_fus = loss(lambda q, k, v, a: fr.fused_attention_relpos(
            q, k, v, a, e, bias, seeds, sc, 0.0, False, H))(q, k, v, a)
        for got, want in zip(g_fus, g_ref):
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=2e-4, atol=2e-4)

    def test_module_fused_matches_xla_path(self, monkeypatch):
        """Full RelPosMultiHeadAttention: fused kernel vs XLA rotation
        path, same params, no dropout."""
        monkeypatch.setattr(fr, "available", lambda: True)
        monkeypatch.setattr(fr, "KERNEL_MIN_T", 0)
        B, T, C, H = 2, 12, 24, 3
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.normal(size=(B, T, C)).astype(np.float32))
        mask = np.zeros((B, T), bool)
        mask[-1, -4:] = True
        mask = jnp.asarray(mask)
        m_xla = RelPosMultiHeadAttention(C, H, 0.0, fused=False)
        m_fus = RelPosMultiHeadAttention(C, H, 0.0, fused=True)
        variables = m_xla.init({"params": jax.random.PRNGKey(0)}, x,
                               key_padding_mask=mask, train=False)
        o1 = m_xla.apply(variables, x, key_padding_mask=mask,
                         train=False)
        o2 = m_fus.apply(variables, x, key_padding_mask=mask,
                         train=False)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                                   rtol=1e-5, atol=1e-5)


class TestRotationIdentity:
    def test_rotation_equals_rel_shift(self):
        """bd via rotate(z) @ e^T == the espnet pad/reshape rel_shift."""
        B, T, C, H = 2, 9, 16, 2
        d = C // H
        rng = np.random.default_rng(3)
        qv = jnp.asarray(rng.normal(size=(B, T, H, d)).astype(np.float32))
        K = jnp.asarray((rng.normal(size=(C, C)) * 0.2).astype(np.float32))
        pos = rel_positional_encoding(T, C)[0]
        p = (pos @ K).reshape(1, 2 * T - 1, H, d)
        full = jnp.einsum("bqhd,bphd->bhqp", qv, p)
        bd_shift = RelPosMultiHeadAttention._rel_shift(full)

        perm = jnp.concatenate([jnp.arange(0, C, 2), jnp.arange(1, C, 2)])
        Kr = K[perm].reshape(C, H, d)
        z = jnp.einsum("bthm,chm->bthc", qv, Kr)
        s, c, e = fr.relpos_basis(T, C)
        a = fr.relpos_rotate(z, s[:, None], c[:, None])
        bd_rot = jnp.einsum("bqhc,kc->bhqk", a, e)
        np.testing.assert_allclose(np.asarray(bd_rot), np.asarray(bd_shift),
                                   rtol=1e-4, atol=1e-4)


class TestFusedRelPosSPMD:
    def test_sharded_matches_single_device(self):
        q, k, v, a, e, bias, seeds, sc, H = make_inputs(B=8, seed=7)

        def f(q, k, v, a, bias, seeds):
            return fr.fused_attention_relpos(q, k, v, a, e, bias, seeds,
                                             sc, 0.0, False, H)

        ref = f(q, k, v, a, bias, seeds)
        mesh = Mesh(np.array(jax.devices()), ("dp",))
        sh = NamedSharding(mesh, P("dp"))
        args = [jax.device_put(x, sh) for x in (q, k, v, a, bias, seeds)]
        out = jax.jit(f)(*args)
        assert out.sharding.is_equivalent_to(sh, out.ndim)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    def test_grads_sharded_match_single_device(self):
        q, k, v, a, e, bias, seeds, sc, H = make_inputs(B=8, seed=8)

        def loss(q, k, v, a, bias, seeds):
            return jnp.sum(fr.fused_attention_relpos(
                q, k, v, a, e, bias, seeds, sc, 0.0, False, H) ** 2)

        g_ref = jax.grad(loss, argnums=(0, 1, 2, 3))(q, k, v, a, bias, seeds)
        mesh = Mesh(np.array(jax.devices()), ("dp",))
        sh = NamedSharding(mesh, P("dp"))
        args = [jax.device_put(x, sh) for x in (q, k, v, a, bias, seeds)]
        g = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))(*args)
        for got, want in zip(g, g_ref):
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
