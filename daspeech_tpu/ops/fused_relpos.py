"""Fused relative-position MHSA Pallas kernel (Conformer encoder).

The reference's ESPnet rel-pos attention
(``fairseq/fairseq/modules/espnet_multihead_attention.py:111-210``) forms a
[B, H, T, 2T-1] position-score tensor and converts it to [B, H, T, T] with
the pad/reshape ``rel_shift`` trick. On TPU those are real HBM copies: at
the recipe encoder shape (B=80, H=4, T'=120) the shift alone walks ~37 MB
of f32 per layer per pass, and the masked softmax/dropout walk the
[B, H, T, T] scores several more times — the measured XLA rel-pos block
runs ~17x off the matmul roofline.

This module removes the [T, 2T-1] tensor entirely via the sinusoid
angle-addition identity.  With pe(r)[2f] = sin(r*w_f), pe(r)[2f+1] =
cos(r*w_f) and p = W_p pe (the learned ``linear_pos`` projection), the
position score is

    bd[i, j] = q_v[i] . (W_p pe(i-j))  =  z[i] . pe(i-j),
    z[i] = W_p^T q_v[i]

and   sin((i-j)w) = s_i c_j - c_i s_j,  cos((i-j)w) = c_i c_j + s_i s_j
turn it into ONE matmul against a constant basis:

    bd = a @ e^T,   a[i] = rotate(z[i]; s_i, c_i),   e[j] = [c_j | s_j]

(:func:`relpos_rotate` / :func:`relpos_basis`; exact — verified to f32
roundoff against the shift path).  The fused kernel then computes, per
batch row with all heads in VMEM:

    s = (q_u @ k^T + a @ e^T) * scale + bias;  softmax; dropout; @ v

so neither the [B, H, T, T] scores nor the dropout bits ever reach HBM
(same recompute-based backward + per-row seed contract as
``fused_attention.fused_attention_packed``).  GSPMD-compatible: a
``custom_partitioning`` rule shards batch dim 0 (the constant basis ``e``
is replicated), so multi-device data-parallel jits keep the kernel.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# rotation basis (shared by the XLA path in models/conformer.py and the
# kernel wrapper below)
# ---------------------------------------------------------------------------

def relpos_basis(T: int, C: int):
    """Sin/cos basis of the symmetric rel-pos encoding, split-half layout.

    Returns ``(s, c, e)``: ``s[i, f] = sin(i * w_f)``, ``c[i, f] =
    cos(i * w_f)`` with the ``rel_positional_encoding`` frequencies
    (f32, [T, C/2]), and ``e = [c | s]`` ([T, C]) — the constant key-side
    basis such that ``bd = rotate(z) @ e^T``.
    """
    div = jnp.exp(jnp.arange(0, C, 2, dtype=jnp.float32)
                  * -(math.log(10000.0) / C))
    i = jnp.arange(T, dtype=jnp.float32)[:, None]
    s = jnp.sin(i * div)
    c = jnp.cos(i * div)
    return s, c, jnp.concatenate([c, s], axis=-1)


def relpos_rotate(z: jnp.ndarray, s: jnp.ndarray, c: jnp.ndarray):
    """Per-query rotation: z split-half [..., T, C] -> a with
    ``a @ e^T == bd``.  ``z[..., :C/2]`` must hold the sin (even pe)
    channels and ``z[..., C/2:]`` the cos (odd) channels — i.e. z was
    computed against a channel-permuted ``linear_pos`` kernel."""
    C2 = s.shape[-1]
    z1, z2 = z[..., :C2], z[..., C2:]
    return jnp.concatenate([z1 * s + z2 * c, -z1 * c + z2 * s], axis=-1)


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def _relpos_fwd_kernel(seed_ref, q_ref, k_ref, v_ref, a_ref, e_ref, bias_ref,
                       o_ref, *, sm_scale: float, keep_p: float,
                       dropout: bool, num_heads: int, d: int, pdim: int):
    """One batch row, all heads: packed q/k/v [T, H*d], a [T, H*pdim],
    e [T, pdim] shared across heads/rows."""
    b = pl.program_id(0)
    if dropout:
        # per-row seeds (see fused_attention._attn_kernel_packed): heads
        # draw sequentially, backward regenerates the identical stream,
        # and the stream travels with its rows under batch sharding
        pltpu.prng_seed(seed_ref[b])
    bias_row = bias_ref[b][None, :]
    e = e_ref[...].astype(jnp.float32)
    for h in range(num_heads):
        q = q_ref[0][:, h * d:(h + 1) * d].astype(jnp.float32)
        k = k_ref[0][:, h * d:(h + 1) * d].astype(jnp.float32)
        v = v_ref[0][:, h * d:(h + 1) * d].astype(jnp.float32)
        a = a_ref[0][:, h * pdim:(h + 1) * pdim].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s + jax.lax.dot_general(a, e, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        s = s * sm_scale + bias_row
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        if dropout:
            bits = pltpu.bitcast(pltpu.prng_random_bits(p.shape), jnp.uint32)
            thresh = jnp.uint32(int(keep_p * (2 ** 32 - 1)))
            p = p * (bits <= thresh).astype(jnp.float32) * (1.0 / keep_p)
        o_ref[0, :, h * d:(h + 1) * d] = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _relpos_bwd_kernel(seed_ref, q_ref, k_ref, v_ref, a_ref, e_ref, bias_ref,
                       do_ref, dq_ref, dk_ref, dv_ref, da_ref,
                       *, sm_scale: float, keep_p: float, dropout: bool,
                       num_heads: int, d: int, pdim: int):
    """Recompute-based backward; bit-identical dropout stream.  ``e`` is a
    constant basis (no gradient)."""
    b = pl.program_id(0)
    if dropout:
        pltpu.prng_seed(seed_ref[b])
    bias_row = bias_ref[b][None, :]
    e = e_ref[...].astype(jnp.float32)
    for h in range(num_heads):
        q = q_ref[0][:, h * d:(h + 1) * d].astype(jnp.float32)
        k = k_ref[0][:, h * d:(h + 1) * d].astype(jnp.float32)
        v = v_ref[0][:, h * d:(h + 1) * d].astype(jnp.float32)
        a = a_ref[0][:, h * pdim:(h + 1) * pdim].astype(jnp.float32)
        do = do_ref[0][:, h * d:(h + 1) * d].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s + jax.lax.dot_general(a, e, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        s = s * sm_scale + bias_row
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        dpv = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        if dropout:
            bits = pltpu.bitcast(pltpu.prng_random_bits(p.shape), jnp.uint32)
            thresh = jnp.uint32(int(keep_p * (2 ** 32 - 1)))
            keep = (bits <= thresh).astype(jnp.float32) * (1.0 / keep_p)
            pd = p * keep
            dp = dpv * keep
        else:
            pd = p
            dp = dpv
        dv_ref[0, :, h * d:(h + 1) * d] = jax.lax.dot_general(
            pd, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dv_ref.dtype)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        ds = ds * sm_scale
        dq_ref[0, :, h * d:(h + 1) * d] = jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dq_ref.dtype)
        dk_ref[0, :, h * d:(h + 1) * d] = jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dk_ref.dtype)
        da_ref[0, :, h * pdim:(h + 1) * pdim] = jax.lax.dot_general(
            ds, e, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(da_ref.dtype)


# ---------------------------------------------------------------------------
# pallas_call plumbing
# ---------------------------------------------------------------------------

def _pad_inputs(q, k, v, a, e, bias):
    """Sublane-align T to a multiple of 8; padded keys masked via bias."""
    B, T, C = q.shape
    Tp = _round_up(T, 8)
    if Tp != T:
        pad3 = ((0, 0), (0, Tp - T), (0, 0))
        q, k, v, a = (jnp.pad(x, pad3) for x in (q, k, v, a))
        e = jnp.pad(e, ((0, Tp - T), (0, 0)))
        bias = jnp.pad(bias, ((0, 0), (0, Tp - T)), constant_values=NEG)
    return q, k, v, a, e, bias, Tp


def _grid_call(kernel, out_kinds, seeds, q, k, v, a, e, bias):
    B, Tp, C = q.shape
    A = a.shape[2]
    pdim = e.shape[1]
    qspec = pl.BlockSpec((1, Tp, C), lambda b, *_: (b, 0, 0))
    aspec = pl.BlockSpec((1, Tp, A), lambda b, *_: (b, 0, 0))
    espec = pl.BlockSpec((Tp, pdim), lambda b, *_: (0, 0))
    bspec = pl.BlockSpec((B, Tp), lambda b, *_: (0, 0))
    specs = {"q": qspec, "a": aspec}
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[qspec, qspec, qspec, aspec, espec, bspec],
        out_specs=[specs[o] for o in out_kinds],
    )
    out_shape = [
        jax.ShapeDtypeStruct((B, Tp, C) if o == "q" else (B, Tp, A), q.dtype)
        for o in out_kinds
    ]
    return pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shape,
    )(seeds, q, k, v, a, e, bias)


# Below this T the XLA rotation path wins: the per-(row, head) matmuls are
# too small to feed the MXU and XLA's batched einsums amortize better
# (measured on-chip at the recipe dims: T=120 XLA 0.45 vs kernel 0.63 ms
# fwd+bwd; T=512 kernel 1.03 vs XLA 1.42 ms).
KERNEL_MIN_T = 256


def relpos_fits_vmem(T: int, C: int, num_heads: int) -> bool:
    """Conservative VMEM estimate for one backward program: q/k/v/do/dq/
    dk/dv tiles + a/da + e + four [T, T] f32 temps."""
    Tp = _round_up(T, 8)
    tiles = 7 * Tp * C * 2 + 2 * Tp * num_heads * C * 2 + Tp * C * 2
    temps = 4 * Tp * Tp * 4
    return tiles + temps < 10 * 1024 * 1024


def available() -> bool:
    """TPU backend, any device count (custom_partitioning rules below)."""
    return jax.default_backend() == "tpu"


# ---------------------------------------------------------------------------
# impl wrappers + GSPMD partitioning + custom VJP
# ---------------------------------------------------------------------------

def _fwd_impl(seeds, q, k, v, a, e, bias,
              sm_scale, dropout_p, train, num_heads):
    B, T, C = q.shape
    d = C // num_heads
    pdim = e.shape[1]
    qp, kp, vp, ap, ep, biasp, Tp = _pad_inputs(q, k, v, a, e, bias)
    drop = bool(train) and dropout_p > 0.0
    kern = functools.partial(
        _relpos_fwd_kernel, sm_scale=sm_scale, keep_p=1.0 - dropout_p,
        dropout=drop, num_heads=num_heads, d=d, pdim=pdim)
    (out,) = _grid_call(kern, ["q"], seeds, qp, kp, vp, ap, ep, biasp)
    return out[:, :T]


def _bwd_impl(seeds, q, k, v, a, e, bias, g,
              sm_scale, dropout_p, train, num_heads):
    B, T, C = q.shape
    d = C // num_heads
    pdim = e.shape[1]
    qp, kp, vp, ap, ep, biasp, Tp = _pad_inputs(q, k, v, a, e, bias)
    gp = jnp.pad(g, ((0, 0), (0, Tp - T), (0, 0))) if Tp != T else g
    drop = bool(train) and dropout_p > 0.0
    kern = functools.partial(
        _relpos_bwd_kernel, sm_scale=sm_scale, keep_p=1.0 - dropout_p,
        dropout=drop, num_heads=num_heads, d=d, pdim=pdim)
    dq, dk, dv, da = _grid_call_bwd(kern, seeds, qp, kp, vp, ap, ep,
                                    biasp, gp)
    return dq[:, :T], dk[:, :T], dv[:, :T], da[:, :T]


def _grid_call_bwd(kernel, seeds, q, k, v, a, e, bias, g):
    B, Tp, C = q.shape
    A = a.shape[2]
    pdim = e.shape[1]
    qspec = pl.BlockSpec((1, Tp, C), lambda b, *_: (b, 0, 0))
    aspec = pl.BlockSpec((1, Tp, A), lambda b, *_: (b, 0, 0))
    espec = pl.BlockSpec((Tp, pdim), lambda b, *_: (0, 0))
    bspec = pl.BlockSpec((B, Tp), lambda b, *_: (0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[qspec, qspec, qspec, aspec, espec, bspec, qspec],
        out_specs=[qspec, qspec, qspec, aspec],
    )
    out_shape = [
        jax.ShapeDtypeStruct((B, Tp, C), q.dtype),
        jax.ShapeDtypeStruct((B, Tp, C), q.dtype),
        jax.ShapeDtypeStruct((B, Tp, C), q.dtype),
        jax.ShapeDtypeStruct((B, Tp, A), a.dtype),
    ]
    return pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shape,
    )(seeds, q, k, v, a, e, bias, g)


def _relpos_partition(impl, batched):
    """custom_partitioning body: args flagged in ``batched`` share batch
    dim 0 (sharded as the operands arrive); the rest (the constant basis
    ``e``) and all non-batch dims replicate.  Per-row seeds keep the
    dropout stream invariant to the device count."""
    def partition(mesh, arg_shapes, result_shape):
        from jax.sharding import NamedSharding, PartitionSpec

        qspec = arg_shapes[1].sharding.spec
        b_axis = qspec[0] if len(qspec) > 0 else None

        def shard(x, is_batched=True):
            dims = [None] * len(x.shape)
            if is_batched:
                dims[0] = b_axis
            return NamedSharding(mesh, PartitionSpec(*dims))

        arg_shardings = tuple(
            shard(s, flag) for s, flag in zip(arg_shapes, batched))
        result_shardings = jax.tree.map(shard, result_shape)

        def lower_fn(*args):
            return impl(*args)

        return mesh, lower_fn, result_shardings, arg_shardings

    return partition


@functools.lru_cache(maxsize=None)
def _fwd_spmd(sm_scale, dropout_p, train, num_heads):
    from jax.experimental.custom_partitioning import custom_partitioning

    def impl(seeds, q, k, v, a, bias, e):
        return _fwd_impl(seeds, q, k, v, a, e, bias,
                         sm_scale, dropout_p, train, num_heads)

    f = custom_partitioning(impl)
    # e (no batch dim) last so every "b"-leading operand precedes it
    f.def_partition(
        partition=_relpos_partition(
            impl, batched=(True, True, True, True, True, True, False)),
        sharding_rule="b, b t c, b t c, b t c, b t z, b t, t w -> b t c",
        # factor order must follow first appearance in the rule
        need_replication_factors=("t", "c", "z", "w"),
    )
    return f


@functools.lru_cache(maxsize=None)
def _bwd_spmd(sm_scale, dropout_p, train, num_heads):
    from jax.experimental.custom_partitioning import custom_partitioning

    def impl(seeds, q, k, v, a, bias, g, e):
        return _bwd_impl(seeds, q, k, v, a, e, bias, g,
                         sm_scale, dropout_p, train, num_heads)

    f = custom_partitioning(impl)
    f.def_partition(
        partition=_relpos_partition(
            impl,
            batched=(True, True, True, True, True, True, True, False)),
        sharding_rule="b, b t c, b t c, b t c, b t z, b t, b t c, t w "
                      "-> b t c, b t c, b t c, b t z",
        need_replication_factors=("t", "c", "z", "w"),
    )
    return f


def _norm_seeds(seed, B):
    from daspeech_tpu.ops.fused_attention import _norm_seeds as impl

    return impl(seed, B)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def fused_attention_relpos(q, k, v, a, e, bias, seed,
                           sm_scale: float, dropout_p: float, train: bool,
                           num_heads: int):
    """Fused rel-pos self-attention: q/k/v [B, T, H*d] packed, a
    [B, T, H*C] the rotated position queries (:func:`relpos_rotate`),
    e [T, C] the constant basis (:func:`relpos_basis`), bias [B, T]
    additive column bias (0 / NEG), ``seed`` scalar or per-row [B] int32.

    Computes softmax((q@k^T + a@e^T)*scale + bias) (+dropout) @ v without
    materializing any [T, T] or [T, 2T-1] tensor in HBM.  ``e`` gets no
    gradient (positions are not learned). Reference semantics:
    ``espnet_multihead_attention.py:163-210``.
    """
    out, _ = _relpos_vjp_fwd(q, k, v, a, e, bias, seed,
                             sm_scale, dropout_p, train, num_heads)
    return out


def _relpos_vjp_fwd(q, k, v, a, e, bias, seed,
                    sm_scale, dropout_p, train, num_heads):
    seeds = _norm_seeds(seed, q.shape[0])
    out = _fwd_spmd(sm_scale, dropout_p, bool(train), num_heads)(
        seeds, q, k, v, a, bias, e)
    return out, (q, k, v, a, e, bias, seeds)


def _relpos_vjp_bwd(sm_scale, dropout_p, train, num_heads, res, g):
    q, k, v, a, e, bias, seeds = res
    dq, dk, dv, da = _bwd_spmd(sm_scale, dropout_p, bool(train), num_heads)(
        seeds, q, k, v, a, bias, g, e)
    return dq, dk, dv, da, None, None, None


fused_attention_relpos.defvjp(_relpos_vjp_fwd, _relpos_vjp_bwd)
