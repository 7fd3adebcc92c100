"""GSPMD compatibility of the batch-shardable Pallas kernels
(``ops/fused_attention.fused_attention_packed``, ``ops/fused_links``):
their ``custom_partitioning`` rules must let a multi-device jit shard
batch dim 0 and run the kernel per-shard, with results bit-identical to
the single-device trace. Runs in interpret mode on the 8-device CPU mesh
(the compiled path is exercised by the TPU verify drives)."""

import numpy as np
import pytest

import jax
import jax.experimental.pallas as pl
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from daspeech_tpu.ops import fused_attention as fa
from daspeech_tpu.ops import fused_links as fl


@pytest.fixture(autouse=True)
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call

    def patched(*a, **kw):
        kw.setdefault("interpret", True)
        return orig(*a, **kw)

    monkeypatch.setattr(fa.pl, "pallas_call", patched)
    monkeypatch.setattr(fl, "INTERPRET", True)


@pytest.fixture()
def dp_sharding():
    mesh = Mesh(np.array(jax.devices()), ("dp",))
    return NamedSharding(mesh, P("dp"))


class TestPackedAttentionSPMD:
    def _inputs(self, B=8, Tq=10, Tk=13, H=3, d=16, seed=0):
        rng = np.random.default_rng(seed)
        C = H * d
        q = jnp.asarray(rng.normal(size=(B, Tq, C)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(B, Tk, C)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(B, Tk, C)).astype(np.float32))
        valid = np.ones((B, Tk), bool)
        valid[-1, -3:] = False
        bias = jnp.asarray(np.where(valid, 0.0, fa.NEG).astype(np.float32))
        seeds = jnp.arange(B, dtype=jnp.int32)
        return q, k, v, bias, seeds, 1.0 / np.sqrt(d), H

    def test_forward_sharded_matches_single_device(self, dp_sharding):
        q, k, v, bias, seeds, sc, H = self._inputs()

        def f(q, k, v, bias, seeds):
            return fa.fused_attention_packed(q, k, v, bias, seeds,
                                             sc, 0.0, False, H)

        ref = f(q, k, v, bias, seeds)
        args = [jax.device_put(x, dp_sharding)
                for x in (q, k, v, bias, seeds)]
        out = jax.jit(f)(*args)
        assert out.sharding.is_equivalent_to(dp_sharding, out.ndim)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    def test_grads_sharded_match_single_device(self, dp_sharding):
        q, k, v, bias, seeds, sc, H = self._inputs(seed=1)

        def loss(q, k, v, bias, seeds):
            return jnp.sum(fa.fused_attention_packed(
                q, k, v, bias, seeds, sc, 0.0, False, H) ** 2)

        g_ref = jax.grad(loss, argnums=(0, 1, 2))(q, k, v, bias, seeds)
        args = [jax.device_put(x, dp_sharding)
                for x in (q, k, v, bias, seeds)]
        g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(*args)
        for a, b in zip(g, g_ref):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_scalar_seed_expands_per_row(self):
        # the scalar-seed compatibility path must produce per-row seeds
        s = fa._norm_seeds(jnp.int32(7), 4)
        np.testing.assert_array_equal(np.asarray(s), [7, 8, 9, 10])


class TestPerHeadAttentionSPMD:
    """The per-(b,h) kernel (the long-sequence fallback when
    ``packed_fits_vmem`` fails) carries the same custom_partitioning batch
    rule as the packed kernel (VERDICT r3 item 6)."""

    def _inputs(self, B=8, Tq=10, Tk=13, H=3, d=16, seed=4):
        rng = np.random.default_rng(seed)
        q = jnp.asarray(rng.normal(size=(B, H, Tq, d)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(B, H, Tk, d)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(B, H, Tk, d)).astype(np.float32))
        valid = np.ones((B, Tk), bool)
        valid[0, -2:] = False
        bias = jnp.asarray(np.where(valid, 0.0, fa.NEG).astype(np.float32))
        seeds = jnp.arange(B, dtype=jnp.int32)
        return q, k, v, bias, seeds, 1.0 / np.sqrt(d)

    def test_forward_sharded_matches_single_device(self, dp_sharding):
        q, k, v, bias, seeds, sc = self._inputs()

        def f(q, k, v, bias, seeds):
            return fa.fused_attention(q, k, v, bias, seeds, sc, 0.0, False)

        ref = f(q, k, v, bias, seeds)
        args = [jax.device_put(x, dp_sharding)
                for x in (q, k, v, bias, seeds)]
        out = jax.jit(f)(*args)
        assert out.sharding.is_equivalent_to(dp_sharding, out.ndim)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    def test_grads_sharded_match_single_device(self, dp_sharding):
        q, k, v, bias, seeds, sc = self._inputs(seed=5)

        def loss(q, k, v, bias, seeds):
            return jnp.sum(fa.fused_attention(
                q, k, v, bias, seeds, sc, 0.0, False) ** 2)

        g_ref = jax.grad(loss, argnums=(0, 1, 2))(q, k, v, bias, seeds)
        args = [jax.device_put(x, dp_sharding)
                for x in (q, k, v, bias, seeds)]
        g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(*args)
        for a, b in zip(g, g_ref):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_scalar_seed_still_accepted(self):
        q, k, v, bias, _, sc = self._inputs(seed=6)
        out_scalar = fa.fused_attention(q, k, v, bias, jnp.int32(3),
                                        sc, 0.0, False)
        out_rows = fa.fused_attention(q, k, v, bias,
                                      3 + jnp.arange(q.shape[0],
                                                     dtype=jnp.int32),
                                      sc, 0.0, False)
        np.testing.assert_array_equal(np.asarray(out_scalar),
                                      np.asarray(out_rows))


class TestFusedLinksSPMD:
    def _inputs(self, B=8, L=13, H=4, dk=8, seed=2):
        rng = np.random.default_rng(seed)
        C = H * dk
        q = jnp.asarray(rng.normal(size=(B, L, C)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(B, L, C)).astype(np.float32))
        g = jax.nn.log_softmax(
            jnp.asarray(rng.normal(size=(B, L, H)).astype(np.float32)), -1)
        ol = np.full((B,), L, np.int32)
        ol[-1] = L - 3
        return q, k, g, jnp.asarray(ol), 1.0 / np.sqrt(dk), H

    def test_forward_sharded_matches_single_device(self, dp_sharding):
        q, k, g, ol, sc, H = self._inputs()

        def f(q, k, g, ol):
            return fl.fused_extract_links(q, k, g, ol, H, sc, None)

        ref = np.asarray(f(q, k, g, ol))
        args = [jax.device_put(x, dp_sharding) for x in (q, k, g, ol)]
        out = np.asarray(jax.jit(f)(*args))
        finite = np.isfinite(ref)
        assert (np.isfinite(out) == finite).all()
        np.testing.assert_array_equal(out[finite], ref[finite])

    def test_grads_sharded_match_single_device(self, dp_sharding):
        q, k, g, ol, sc, H = self._inputs(seed=3)

        def loss(q, k, g, ol):
            links = fl.fused_extract_links(q, k, g, ol, H, sc, None)
            return jnp.sum(jnp.where(jnp.isfinite(links),
                                     links, 0.0))

        g_ref = jax.grad(loss, argnums=(0, 1, 2))(q, k, g, ol)
        args = [jax.device_put(x, dp_sharding) for x in (q, k, g, ol)]
        gs = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(*args)
        for a, b in zip(gs, g_ref):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
