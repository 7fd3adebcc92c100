"""Fused Conformer FFN Pallas kernel (LayerNorm -> W1 -> swish -> dropout
-> W2 -> dropout, one VMEM program per batch row) — a VERIFIED ALTERNATE
BACKEND, off by default (``FeedForwardModule.fused=False``).

Hypothesis: the [T, ffn_dim] intermediate (39 MB bf16 at B*T=9600,
F=2048) round-trips HBM between the two matmuls and is saved as a
backward residual, so keeping it VMEM-resident (recompute backward with
the shared per-row ``pltpu.prng_seed`` dropout contract of
``ops/fused_attention.py``; dW1/dW2/db/dgamma/dbeta accumulate in f32
across the batch grid) should win.

Measured on the chip at the recipe encoder shape (B=80, T'=120, C=256,
F=2048, bf16): forward TIES the XLA path (0.33 vs 0.34 ms — XLA already
fuses LN/swish/dropout into the matmuls and the intermediate traffic is
only ~0.1 ms at HBM bandwidth), and the backward LOSES (0.77 vs
0.46 ms): the per-row dW matmuls contract over K=T'~120 while XLA
computes one [C, B*T']@[B*T', F] dW at full MXU efficiency.  Kept, like
``ops/dag_pallas.py``, as a cross-checked alternate backend
(tests/test_fused_ffn.py) and a record of the negative result.

Single-device only (``fused_attention.available()``): the cross-row dW
accumulation would need a psum under GSPMD sharding — multi-device jits
fall back to the XLA path in ``models/conformer.py::FeedForwardModule``.

Reference semantics: ``fairseq/fairseq/modules/conformer_layer.py:103-147``
(FeedForwardModule: LN -> Linear -> swish -> dropout -> Linear -> dropout).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LN_EPS = 1e-6   # flax nn.LayerNorm default, matching the module


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _ln_f32(x, gamma, beta):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    r = jax.lax.rsqrt(var + LN_EPS)
    xhat = (x - mu) * r
    return xhat * gamma + beta, xhat, r


def _mask(shape, keep_p):
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    thresh = jnp.uint32(int(keep_p * (2 ** 32 - 1)))
    return (bits <= thresh).astype(jnp.float32) * (1.0 / keep_p)


def _ffn_fwd_kernel(seed_ref, x_ref, g_ref, bt_ref, w1_ref, b1_ref,
                    w2_ref, b2_ref, o_ref,
                    *, keep1: float, keep2: float, drop1: bool,
                    drop2: bool):
    b = pl.program_id(0)
    if drop1 or drop2:
        pltpu.prng_seed(seed_ref[b])
    x = x_ref[0].astype(jnp.float32)
    gamma = g_ref[...].astype(jnp.float32)
    beta = bt_ref[...].astype(jnp.float32)
    y, _, _ = _ln_f32(x, gamma, beta)
    pre = jax.lax.dot_general(
        y.astype(x_ref.dtype), w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b1_ref[...].astype(jnp.float32)
    h = pre * jax.nn.sigmoid(pre)              # swish
    if drop1:
        h = h * _mask(h.shape, keep1)
    out = jax.lax.dot_general(
        h.astype(x_ref.dtype), w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b2_ref[...].astype(jnp.float32)
    if drop2:
        out = out * _mask(out.shape, keep2)
    o_ref[0] = out.astype(o_ref.dtype)


def _ffn_bwd_kernel(seed_ref, x_ref, g_ref, bt_ref, w1_ref, b1_ref,
                    w2_ref, b2_ref, do_ref,
                    dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
                    dg_ref, dbt_ref,
                    *, keep1: float, keep2: float, drop1: bool,
                    drop2: bool):
    b = pl.program_id(0)
    if drop1 or drop2:
        pltpu.prng_seed(seed_ref[b])
    x = x_ref[0].astype(jnp.float32)
    gamma = g_ref[...].astype(jnp.float32)
    beta = bt_ref[...].astype(jnp.float32)
    y, xhat, r = _ln_f32(x, gamma, beta)
    y_lp = y.astype(x_ref.dtype)
    pre = jax.lax.dot_general(
        y_lp, w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b1_ref[...].astype(jnp.float32)
    sig = jax.nn.sigmoid(pre)
    hact = pre * sig
    if drop1:
        m1 = _mask(hact.shape, keep1)
        hdrop = hact * m1
    else:
        hdrop = hact
    g = do_ref[0].astype(jnp.float32)
    if drop2:
        g = g * _mask((g.shape[0], g.shape[1]), keep2)

    # second matmul
    hd_lp = hdrop.astype(x_ref.dtype)
    g_lp = g.astype(x_ref.dtype)
    dw2 = jax.lax.dot_general(hd_lp, g_lp, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    gh = jax.lax.dot_general(g_lp, w2_ref[...], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    if drop1:
        gh = gh * m1
    gpre = gh * (sig * (1.0 + pre * (1.0 - sig)))   # swish'
    gp_lp = gpre.astype(x_ref.dtype)
    dw1 = jax.lax.dot_general(y_lp, gp_lp, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    gy = jax.lax.dot_general(gp_lp, w1_ref[...], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    # LayerNorm backward
    dxhat = gy * gamma
    C = x.shape[-1]
    mean_dxhat = jnp.mean(dxhat, axis=-1, keepdims=True)
    mean_dxx = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx = r * (dxhat - mean_dxhat - xhat * mean_dxx)
    dx_ref[0] = dx.astype(dx_ref.dtype)

    @pl.when(b == 0)
    def _init():
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)
        dg_ref[...] = jnp.zeros_like(dg_ref)
        dbt_ref[...] = jnp.zeros_like(dbt_ref)

    dw1_ref[...] += dw1
    db1_ref[...] += jnp.sum(gpre, axis=0, keepdims=True)
    dw2_ref[...] += dw2
    db2_ref[...] += jnp.sum(g, axis=0, keepdims=True)
    dg_ref[...] += jnp.sum(gy * xhat, axis=0, keepdims=True)
    dbt_ref[...] += jnp.sum(gy, axis=0, keepdims=True)


def ffn_fits_vmem(T: int, C: int, F: int, dtype_bytes: int = 2) -> bool:
    """Backward worst case: W1/W2 tiles + f32 dW1/dW2 accumulators +
    x/g/dx row tiles + three [T, F] f32 temps."""
    Tp = _round_up(T, 8)
    weights = 2 * C * F * dtype_bytes + 2 * C * F * 4
    rows = 3 * Tp * C * dtype_bytes + 3 * Tp * F * 4
    return weights + rows < 11 * 1024 * 1024


def available() -> bool:
    from daspeech_tpu.ops import fused_attention as _fa

    return _fa.available()   # TPU + single device (dW accumulation)


def _pad_rows(x, Tp):
    T = x.shape[1]
    if T == Tp:
        return x
    return jnp.pad(x, ((0, 0), (0, Tp - T), (0, 0)))


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def fused_ffn(x, gamma, beta, w1, b1, w2, b2, seed,
              p1: float, p2: float, train: bool):
    """x [B, T, C] -> LN(gamma, beta) -> @w1+b1 -> swish -> dropout(p1)
    -> @w2+b2 -> dropout(p2), all in one VMEM program per batch row.
    ``seed`` is a scalar or per-row [B] int32 (ignored unless training
    with dropout).  Padded rows (T not a multiple of 8) compute garbage
    that is sliced away; their dropout draws are part of the stream, so
    forward and backward stay bit-identical."""
    out, _ = _ffn_vjp_fwd(x, gamma, beta, w1, b1, w2, b2, seed, p1, p2,
                          train)
    return out


def _norm_seeds(seed, B):
    from daspeech_tpu.ops.fused_attention import _norm_seeds as impl

    return impl(seed, B)


def _specs(B, Tp, C, F, dtype):
    row = pl.BlockSpec((1, Tp, C), lambda b, *_: (b, 0, 0))
    vec_c = pl.BlockSpec((1, C), lambda b, *_: (0, 0))
    vec_f = pl.BlockSpec((1, F), lambda b, *_: (0, 0))
    w1 = pl.BlockSpec((C, F), lambda b, *_: (0, 0))
    w2 = pl.BlockSpec((F, C), lambda b, *_: (0, 0))
    return row, vec_c, vec_f, w1, w2


def _ffn_vjp_fwd(x, gamma, beta, w1, b1, w2, b2, seed, p1, p2, train):
    B, T, C = x.shape
    F = w1.shape[1]
    Tp = _round_up(T, 8)
    xp = _pad_rows(x, Tp)
    seeds = _norm_seeds(seed, B)
    drop1 = bool(train) and p1 > 0.0
    drop2 = bool(train) and p2 > 0.0
    gamma2 = gamma.reshape(1, C)
    beta2 = beta.reshape(1, C)
    b1_2 = b1.reshape(1, F)
    b2_2 = b2.reshape(1, C)
    row, vec_c, vec_f, w1s, w2s = _specs(B, Tp, C, F, x.dtype)
    kern = functools.partial(
        _ffn_fwd_kernel, keep1=1.0 - p1, keep2=1.0 - p2,
        drop1=drop1, drop2=drop2)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(B,),
        in_specs=[row, vec_c, vec_c, w1s, vec_f, w2s, vec_c],
        out_specs=[row],
    )
    (out,) = pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((B, Tp, C), x.dtype)],
    )(seeds, xp, gamma2, beta2, w1, b1_2, w2, b2_2)
    return out[:, :T], (x, gamma, beta, w1, b1, w2, b2, seeds)


def _ffn_vjp_bwd(p1, p2, train, res, g):
    x, gamma, beta, w1, b1, w2, b2, seeds = res
    B, T, C = x.shape
    F = w1.shape[1]
    Tp = _round_up(T, 8)
    xp = _pad_rows(x, Tp)
    gp = _pad_rows(g, Tp)
    drop1 = bool(train) and p1 > 0.0
    drop2 = bool(train) and p2 > 0.0
    gamma2 = gamma.reshape(1, C)
    beta2 = beta.reshape(1, C)
    b1_2 = b1.reshape(1, F)
    b2_2 = b2.reshape(1, C)
    row, vec_c, vec_f, w1s, w2s = _specs(B, Tp, C, F, x.dtype)
    kern = functools.partial(
        _ffn_bwd_kernel, keep1=1.0 - p1, keep2=1.0 - p2,
        drop1=drop1, drop2=drop2)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(B,),
        in_specs=[row, vec_c, vec_c, w1s, vec_f, w2s, vec_c, row],
        out_specs=[row, w1s, vec_f, w2s, vec_c, vec_c, vec_c],
    )
    dx, dw1, db1, dw2, db2, dg, dbt = pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, Tp, C), x.dtype),
            jax.ShapeDtypeStruct((C, F), jnp.float32),
            jax.ShapeDtypeStruct((1, F), jnp.float32),
            jax.ShapeDtypeStruct((F, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
        ],
    )(seeds, xp, gamma2, beta2, w1, b1_2, w2, b2_2, gp)
    return (dx[:, :T],
            dg.reshape(C).astype(gamma.dtype),
            dbt.reshape(C).astype(beta.dtype),
            dw1.astype(w1.dtype),
            db1.reshape(F).astype(b1.dtype),
            dw2.astype(w2.dtype),
            db2.reshape(C).astype(b2.dtype),
            None)


fused_ffn.defvjp(_ffn_vjp_fwd, _ffn_vjp_bwd)
