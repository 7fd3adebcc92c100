"""Fused multi-head attention Pallas kernel with in-kernel PRNG dropout.

The decoder's training-step profile (COVERAGE.md round-3 split) shows the
MFU gap living in the attention epsilon ops: at the recipe shapes the
[B, H, L, L] score/softmax/dropout tensors round-trip HBM several times per
layer, and the recipes train with ``--attention-dropout 0.1``
(``README.md:242``), so the probability masks alone are ~900 MB of PRNG
traffic per step. This kernel fuses QK^T -> column-bias mask -> softmax ->
dropout -> @V into ONE VMEM-resident program per (batch, head): scores,
probabilities, and dropout bits never exist in HBM. The backward pass
recomputes them (flash-attention style) with the SAME ``pltpu.prng_seed``,
so dropout in forward and backward agree bit-for-bit with zero residuals
beyond (q, k, v, bias).

Non-streaming by design: DASpeech graphs cap L at 1024
(``--max-target-positions``), so one (b, h) slice of scores is <=
1024*1024*4 B = 4 MB — it FITS in VMEM, and the flash tiling machinery
would buy nothing. Reference kernels replaced: none (the reference uses
cuDNN attention via torch); this is the TPU equivalent of that fusion,
with the dropout fused in as well.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30

# A bare pallas_call is an opaque custom call to GSPMD: under a
# multi-device jit the partitioner cannot shard it automatically. The
# production kernels here (per-(b,h) fused_attention, the packed variant,
# ops/fused_links.py) all carry custom_partitioning batch rules and are
# gated by available_spmd(); only the alternate backends without rules
# (fused_attention_full_bias, ops/fused_ffn.py) remain behind available()
# and this single-device switch.
ALLOW_MULTI_DEVICE = False


def available() -> bool:
    """Single-device-only fused kernels are usable: TPU backend and
    (single device or the shard_map override)."""
    import jax

    return (jax.default_backend() == "tpu"
            and (jax.device_count() == 1 or ALLOW_MULTI_DEVICE))


def available_spmd() -> bool:
    """GSPMD-compatible kernels (:func:`fused_attention` per-(b,h),
    :func:`fused_attention_packed`, ``ops/fused_links.py``) are usable:
    TPU backend, ANY device count — their ``custom_partitioning`` rules
    shard batch dim 0, so the partitioner runs them per-shard instead of
    treating the pallas_call as an unshardable opaque custom call.

    Tensor-parallel note: the rules replicate every non-batch dim, so
    under a model axis GSPMD all-gathers the hidden dim and each shard
    computes full attention — correct but redundant.  Head-sharded
    kernel execution is deliberately NOT implemented: TP already exceeds
    the reference (whose TP plumbing is dead code) and these models fit
    on one chip many times over; DP is the production axis."""
    import jax

    return jax.default_backend() == "tpu"


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _attn_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, o_ref,
                 *, sm_scale: float, keep_p: float, dropout: bool):
    """One (b, h): out = dropout(softmax(q k^T * scale + bias)) v."""
    q = q_ref[0, 0].astype(jnp.float32)        # [Tq, d]
    k = k_ref[0, 0].astype(jnp.float32)        # [Tk, d]
    v = v_ref[0, 0].astype(jnp.float32)        # [Tk, d]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * sm_scale      # [Tq, Tk]
    s = s + bias_ref[pl.program_id(0)][None, :]     # column bias row
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    if dropout:
        # PER-ROW seed + head index: the stream is invariant to batch
        # sharding (each shard's seeds travel with its rows), unlike the
        # old flat program-id seeding
        pltpu.prng_seed(seed_ref[pl.program_id(0)], pl.program_id(1))
        bits = pltpu.bitcast(pltpu.prng_random_bits(p.shape), jnp.uint32)
        thresh = jnp.uint32(int(keep_p * (2 ** 32 - 1)))
        keep = (bits <= thresh).astype(jnp.float32)
        p = p * keep * (1.0 / keep_p)
    o_ref[0, 0] = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _attn_bwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, do_ref,
                     dq_ref, dk_ref, dv_ref,
                     *, sm_scale: float, keep_p: float, dropout: bool):
    """Recompute-based backward for one (b, h)."""
    q = q_ref[0, 0].astype(jnp.float32)
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0].astype(jnp.float32)
    do = do_ref[0, 0].astype(jnp.float32)      # [Tq, d]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * sm_scale
    s = s + bias_ref[pl.program_id(0)][None, :]
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)             # pre-dropout P

    dpv = jax.lax.dot_general(                              # dO V^T [Tq, Tk]
        do, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    if dropout:
        # identical seed + identical call shape/order as the forward =>
        # identical bits
        pltpu.prng_seed(seed_ref[pl.program_id(0)], pl.program_id(1))
        bits = pltpu.bitcast(pltpu.prng_random_bits(p.shape), jnp.uint32)
        thresh = jnp.uint32(int(keep_p * (2 ** 32 - 1)))
        keep = (bits <= thresh).astype(jnp.float32) * (1.0 / keep_p)
        pd = p * keep                                       # dropped P
        dp = dpv * keep
    else:
        pd = p
        dp = dpv
    dv_ref[0, 0] = jax.lax.dot_general(                     # P_d^T dO [Tk, d]
        pd, do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dv_ref.dtype)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))  # [Tq, Tk]
    dq_ref[0, 0] = (jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * sm_scale).astype(dq_ref.dtype)
    dk_ref[0, 0] = (jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * sm_scale).astype(dk_ref.dtype)


def _pad_qkv(q, k, v, bias):
    """Pad head dim to 128 lanes and Tq/Tk to sublane/lane multiples."""
    B, H, Tq, d = q.shape
    Tk = k.shape[2]
    dp = _round_up(d, 128)
    Tqp = _round_up(Tq, 8)
    Tkp = _round_up(Tk, 128)
    if (dp, Tqp) != (d, Tq):
        q = jnp.pad(q, ((0, 0), (0, 0), (0, Tqp - Tq), (0, dp - d)))
    if (dp, Tkp) != (d, Tk):
        k = jnp.pad(k, ((0, 0), (0, 0), (0, Tkp - Tk), (0, dp - d)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, Tkp - Tk), (0, dp - d)))
    if Tkp != Tk:
        bias = jnp.pad(bias, ((0, 0), (0, Tkp - Tk)),
                       constant_values=NEG)
    return q, k, v, bias, dp, Tqp, Tkp


def _grid_call(kernel, outs, seed, q, k, v, bias, Tqp, Tkp, dp, extra=()):
    B, H = q.shape[0], q.shape[1]
    qspec = pl.BlockSpec((1, 1, Tqp, dp), lambda b, h, *_: (b, h, 0, 0))
    kspec = pl.BlockSpec((1, 1, Tkp, dp), lambda b, h, *_: (b, h, 0, 0))
    # bias rides whole (TPU block tiling forbids a 1-row block); each
    # program picks its row by program_id
    bspec = pl.BlockSpec((q.shape[0], Tkp), lambda b, h, *_: (0, 0))
    in_specs = [qspec, kspec, kspec, bspec] + [qspec] * len(extra)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, H),
        in_specs=in_specs,
        out_specs=[qspec if o == "q" else kspec for o in outs],
    )
    out_shape = [
        jax.ShapeDtypeStruct((B, H, Tqp, dp) if o == "q"
                             else (B, H, Tkp, dp), q.dtype)
        for o in outs
    ]
    return pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shape,
    )(seed, q, k, v, bias, *extra)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def fused_attention(q, k, v, bias, seed,
                    sm_scale: float, dropout_p: float, train: bool):
    """out[b,h] = dropout(softmax(q k^T * sm_scale + bias[b])) @ v.

    q [B, H, Tq, d] (d <= 128), k/v [B, H, Tk, d], bias [B, Tk] additive
    column bias (0 valid / -1e30 masked), seed a scalar or per-row [B]
    int32 (ignored unless ``train`` and ``dropout_p > 0``). Scores,
    probabilities, and dropout bits stay in VMEM; backward recomputes them
    with the same seeds. GSPMD-safe: like the packed kernel, fwd and bwd
    carry a ``custom_partitioning`` batch rule (dim 0), so long-sequence
    shapes that overflow :func:`packed_fits_vmem` keep the fused path
    under multi-device jits.
    """
    out, _ = _fused_fwd(q, k, v, bias, seed, sm_scale, dropout_p, train)
    return out


def _perhead_fwd_impl(seeds, q, k, v, bias, sm_scale, dropout_p, train):
    B, H, Tq, d = q.shape
    qp, kp, vp, biasp, dp, Tqp, Tkp = _pad_qkv(q, k, v, bias)
    drop = bool(train) and dropout_p > 0.0
    kern = functools.partial(
        _attn_kernel, sm_scale=sm_scale,
        keep_p=1.0 - dropout_p, dropout=drop)
    (out,) = _grid_call(kern, ["q"], seeds, qp, kp, vp, biasp, Tqp, Tkp, dp)
    return out[:, :, :Tq, :d]


def _perhead_bwd_impl(seeds, q, k, v, bias, g, sm_scale, dropout_p, train):
    B, H, Tq, d = q.shape
    Tk = k.shape[2]
    qp, kp, vp, biasp, dp, Tqp, Tkp = _pad_qkv(q, k, v, bias)
    gp = jnp.pad(g, ((0, 0), (0, 0), (0, Tqp - Tq), (0, dp - d))) \
        if (Tqp, dp) != (Tq, d) else g
    drop = bool(train) and dropout_p > 0.0
    kern = functools.partial(
        _attn_bwd_kernel, sm_scale=sm_scale,
        keep_p=1.0 - dropout_p, dropout=drop)
    dqp, dkp, dvp = _grid_call(
        kern, ["q", "k", "k"], seeds, qp, kp, vp, biasp, Tqp, Tkp, dp,
        extra=(gp,))
    return dqp[:, :, :Tq, :d], dkp[:, :, :Tk, :d], dvp[:, :, :Tk, :d]


@functools.lru_cache(maxsize=None)
def _perhead_fwd_spmd(sm_scale, dropout_p, train):
    from jax.experimental.custom_partitioning import custom_partitioning

    def impl(seeds, q, k, v, bias):
        return _perhead_fwd_impl(seeds, q, k, v, bias,
                                 sm_scale, dropout_p, train)

    f = custom_partitioning(impl)
    f.def_partition(
        partition=_batch_dim0_partition(impl),
        sharding_rule="b, b h q d, b h k d, b h k d, b k -> b h q d",
        need_replication_factors=("h", "q", "d", "k"),
    )
    return f


@functools.lru_cache(maxsize=None)
def _perhead_bwd_spmd(sm_scale, dropout_p, train):
    from jax.experimental.custom_partitioning import custom_partitioning

    def impl(seeds, q, k, v, bias, g):
        return _perhead_bwd_impl(seeds, q, k, v, bias, g,
                                 sm_scale, dropout_p, train)

    f = custom_partitioning(impl)
    f.def_partition(
        partition=_batch_dim0_partition(impl),
        sharding_rule="b, b h q d, b h k d, b h k d, b k, b h q d "
                      "-> b h q d, b h k d, b h k d",
        need_replication_factors=("h", "q", "d", "k"),
    )
    return f


def _fused_fwd(q, k, v, bias, seed, sm_scale, dropout_p, train):
    seeds = _norm_seeds(seed, q.shape[0])
    out = _perhead_fwd_spmd(sm_scale, dropout_p, bool(train))(
        seeds, q, k, v, bias)
    return out, (q, k, v, bias, seeds)


def _fused_bwd(sm_scale, dropout_p, train, res, g):
    q, k, v, bias, seeds = res
    dq, dk, dv = _perhead_bwd_spmd(sm_scale, dropout_p, bool(train))(
        seeds, q, k, v, bias, g)
    return dq, dk, dv, None, None


fused_attention.defvjp(_fused_fwd, _fused_bwd)


def _attn_kernel_packed(seed_ref, q_ref, k_ref, v_ref, bias_ref, o_ref,
                        *, sm_scale: float, keep_p: float, dropout: bool,
                        num_heads: int, d: int):
    """One batch row, ALL heads: packed [T, H*d] in/out.

    Measured against the per-(b, h) grid at the decoder shape (B=80, H=8,
    L=240, d=64): 0.41 vs 0.67 ms forward — the packed layout reads q/k/v
    at their native head dim (no 64->128 lane padding, so half the HBM
    traffic) and needs no [B, T, H, d] -> [B, H, T, d] transposes outside
    (the Dense outputs feed the kernel directly).
    """
    b = pl.program_id(0)
    if dropout:
        # one PER-ROW seed (seed_ref [B]); heads draw sequentially in loop
        # order, so the backward regenerates the identical stream. Per-row
        # (not per-program) seeding keeps the stream invariant under batch
        # sharding: each shard's local seeds travel with its rows.
        pltpu.prng_seed(seed_ref[b])
    bias_row = bias_ref[b][None, :]
    for h in range(num_heads):
        q = q_ref[0][:, h * d:(h + 1) * d].astype(jnp.float32)
        k = k_ref[0][:, h * d:(h + 1) * d].astype(jnp.float32)
        v = v_ref[0][:, h * d:(h + 1) * d].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale
        s = s + bias_row
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


def _attn_bwd_kernel_packed(seed_ref, q_ref, k_ref, v_ref, bias_ref, do_ref,
                            dq_ref, dk_ref, dv_ref,
                            *, sm_scale: float, keep_p: float, dropout: bool,
                            num_heads: int, d: int):
    """Recompute-based packed backward; bit-identical dropout stream."""
    b = pl.program_id(0)
    if dropout:
        pltpu.prng_seed(seed_ref[b])
    bias_row = bias_ref[b][None, :]
    for h in range(num_heads):
        q = q_ref[0][:, h * d:(h + 1) * d].astype(jnp.float32)
        k = k_ref[0][:, h * d:(h + 1) * d].astype(jnp.float32)
        v = v_ref[0][:, h * d:(h + 1) * d].astype(jnp.float32)
        do = do_ref[0][:, h * d:(h + 1) * d].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale
        s = s + bias_row
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        dpv = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
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
        dq_ref[0, :, h * d:(h + 1) * d] = (jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale).astype(
                dq_ref.dtype)
        dk_ref[0, :, h * d:(h + 1) * d] = (jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale).astype(
                dk_ref.dtype)


def _pad_packed(q, k, v, bias):
    """Sublane-align Tq/Tk to multiples of 8 (no head-dim padding)."""
    B, Tq, C = q.shape
    Tk = k.shape[1]
    Tqp = _round_up(Tq, 8)
    Tkp = _round_up(Tk, 8)
    if Tqp != Tq:
        q = jnp.pad(q, ((0, 0), (0, Tqp - Tq), (0, 0)))
    if Tkp != Tk:
        k = jnp.pad(k, ((0, 0), (0, Tkp - Tk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, Tkp - Tk), (0, 0)))
        bias = jnp.pad(bias, ((0, 0), (0, Tkp - Tk)), constant_values=NEG)
    return q, k, v, bias, Tqp, Tkp


def _grid_call_packed(kernel, n_q_outs, seed, q, k, v, bias, extra=()):
    B, Tqp, C = q.shape
    Tkp = k.shape[1]
    qspec = pl.BlockSpec((1, Tqp, C), lambda b, *_: (b, 0, 0))
    kspec = pl.BlockSpec((1, Tkp, C), lambda b, *_: (b, 0, 0))
    bspec = pl.BlockSpec((B, Tkp), lambda b, *_: (0, 0))
    specs = {"q": qspec, "k": kspec}
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[qspec, kspec, kspec, bspec] + [qspec] * len(extra),
        out_specs=[specs[o] for o in n_q_outs],
    )
    out_shape = [
        jax.ShapeDtypeStruct((B, Tqp, C) if o == "q" else (B, Tkp, C),
                             q.dtype)
        for o in n_q_outs
    ]
    return pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shape,
    )(seed, q, k, v, bias, *extra)


def packed_fits_vmem(Tq: int, Tk: int, C: int, num_heads: int) -> bool:
    """Conservative VMEM estimate for one packed program (bwd is the worst
    case: q/k/v/do/dq/dk/dv tiles + three [Tq, Tk] f32 temps)."""
    tiles = 7 * max(Tq, Tk) * C * 2
    temps = 3 * Tq * Tk * 4
    return tiles + temps < 10 * 1024 * 1024


def _batch_dim0_partition(impl):
    """``custom_partitioning`` rule body: every array arg and result shares
    batch dim 0 (sharded however the operands arrive); all other dims
    replicated. ``lower_fn`` just runs the per-shard pallas wrapper on the
    local rows — per-row seeds travel with their rows, so the dropout
    stream is invariant to the device count."""
    def partition(mesh, arg_shapes, result_shape):
        from jax.sharding import NamedSharding, PartitionSpec

        qspec = arg_shapes[1].sharding.spec        # q carries the verdict
        b_axis = qspec[0] if len(qspec) > 0 else None

        def shard(x):
            dims = [None] * len(x.shape)
            dims[0] = b_axis
            return NamedSharding(mesh, PartitionSpec(*dims))

        arg_shardings = tuple(shard(a) for a in arg_shapes)
        result_shardings = jax.tree.map(shard, result_shape)

        def lower_fn(*args):
            return impl(*args)

        return mesh, lower_fn, result_shardings, arg_shardings

    return partition


def _packed_fwd_impl(seeds, q, k, v, bias,
                     sm_scale, dropout_p, train, num_heads):
    B, Tq, C = q.shape
    d = C // num_heads
    qp, kp, vp, biasp, Tqp, Tkp = _pad_packed(q, k, v, bias)
    drop = bool(train) and dropout_p > 0.0
    kern = functools.partial(
        _attn_kernel_packed, sm_scale=sm_scale, keep_p=1.0 - dropout_p,
        dropout=drop, num_heads=num_heads, d=d)
    (out,) = _grid_call_packed(kern, ["q"], seeds, qp, kp, vp, biasp)
    return out[:, :Tq]


def _packed_bwd_impl(seeds, q, k, v, bias, g,
                     sm_scale, dropout_p, train, num_heads):
    B, Tq, C = q.shape
    Tk = k.shape[1]
    d = C // num_heads
    qp, kp, vp, biasp, Tqp, Tkp = _pad_packed(q, k, v, bias)
    gp = jnp.pad(g, ((0, 0), (0, Tqp - Tq), (0, 0))) if Tqp != Tq else g
    drop = bool(train) and dropout_p > 0.0
    kern = functools.partial(
        _attn_bwd_kernel_packed, sm_scale=sm_scale, keep_p=1.0 - dropout_p,
        dropout=drop, num_heads=num_heads, d=d)
    dqp, dkp, dvp = _grid_call_packed(
        kern, ["q", "k", "k"], seeds, qp, kp, vp, biasp, extra=(gp,))
    return dqp[:, :Tq], dkp[:, :Tk], dvp[:, :Tk]


@functools.lru_cache(maxsize=None)
def _packed_fwd_spmd(sm_scale, dropout_p, train, num_heads):
    from jax.experimental.custom_partitioning import custom_partitioning

    def impl(seeds, q, k, v, bias):
        return _packed_fwd_impl(seeds, q, k, v, bias,
                                sm_scale, dropout_p, train, num_heads)

    f = custom_partitioning(impl)
    f.def_partition(
        partition=_batch_dim0_partition(impl),
        sharding_rule="b, b q c, b k c, b k c, b k -> b q c",
        # factor order must follow first appearance in the rule
        need_replication_factors=("q", "c", "k"),
    )
    return f


@functools.lru_cache(maxsize=None)
def _packed_bwd_spmd(sm_scale, dropout_p, train, num_heads):
    from jax.experimental.custom_partitioning import custom_partitioning

    def impl(seeds, q, k, v, bias, g):
        return _packed_bwd_impl(seeds, q, k, v, bias, g,
                                sm_scale, dropout_p, train, num_heads)

    f = custom_partitioning(impl)
    f.def_partition(
        partition=_batch_dim0_partition(impl),
        sharding_rule="b, b q c, b k c, b k c, b k, b q c "
                      "-> b q c, b k c, b k c",
        need_replication_factors=("q", "c", "k"),
    )
    return f


def _norm_seeds(seed, B):
    """Accept a scalar seed (tests / no-dropout) or per-row [B] seeds; a
    scalar expands to distinct consecutive per-row seeds (the TPU PRNG
    hashes its seed, so consecutive values give decorrelated streams —
    the same contract as the previous (seed, row) two-word seeding)."""
    seeds = jnp.asarray(seed, jnp.int32)
    if seeds.ndim == 0:
        seeds = seeds + jnp.arange(B, dtype=jnp.int32)
    return seeds


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def fused_attention_packed(q, k, v, bias, seed,
                           sm_scale: float, dropout_p: float, train: bool,
                           num_heads: int):
    """Packed-layout fused MHA: q [B, Tq, H*d], k/v [B, Tk, H*d],
    bias [B, Tk] additive column bias -> out [B, Tq, H*d]; ``seed`` is a
    scalar or per-row [B] int32 (ignored unless training with dropout).

    Same math as :func:`fused_attention` but one grid step per batch row
    with an in-kernel head loop at the NATIVE head dim — no 64->128 lane
    padding, no [B, H, T, d] transposes at the call site. Use when
    :func:`packed_fits_vmem`; fall back to :func:`fused_attention` above.
    Unlike the other kernels here, this one is GSPMD-compatible: a
    ``custom_partitioning`` rule shards every operand on batch dim 0, so
    multi-device data-parallel jits keep the kernel (each device runs it
    on its local rows) instead of falling back to XLA.
    """
    out, _ = _packed_fwd(q, k, v, bias, seed, sm_scale, dropout_p, train,
                         num_heads)
    return out


def _packed_fwd(q, k, v, bias, seed, sm_scale, dropout_p, train, num_heads):
    seeds = _norm_seeds(seed, q.shape[0])
    out = _packed_fwd_spmd(sm_scale, dropout_p, bool(train), num_heads)(
        seeds, q, k, v, bias)
    return out, (q, k, v, bias, seeds)


def _packed_bwd(sm_scale, dropout_p, train, num_heads, res, g):
    q, k, v, bias, seeds = res
    dq, dk, dv = _packed_bwd_spmd(
        sm_scale, dropout_p, bool(train), num_heads)(
        seeds, q, k, v, bias, g)
    return dq, dk, dv, None, None


fused_attention_packed.defvjp(_packed_fwd, _packed_bwd)


def mha_reference_packed(q, k, v, bias, sm_scale: float, num_heads: int):
    """XLA oracle for the packed layout (tests)."""
    B, Tq, C = q.shape
    Tk = k.shape[1]
    d = C // num_heads
    qh = jnp.swapaxes(q.reshape(B, Tq, num_heads, d), 1, 2)
    kh = jnp.swapaxes(k.reshape(B, Tk, num_heads, d), 1, 2)
    vh = jnp.swapaxes(v.reshape(B, Tk, num_heads, d), 1, 2)
    out = mha_reference(qh, kh, vh, bias, sm_scale)
    return jnp.swapaxes(out, 1, 2).reshape(B, Tq, C)


def _attn_kernel_fb(seed_ref, q_ref, k_ref, v_ref, bias_ref, o_ref,
                    *, sm_scale: float, keep_p: float, dropout: bool):
    """Full-bias variant: bias [1, 1, Tq, Tk] per (b, h) — carries the
    rel-pos scores of the Conformer encoder (``conformer.py`` ``bd`` term)
    plus the pad mask."""
    q = q_ref[0, 0].astype(jnp.float32)
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * sm_scale
    s = s + bias_ref[0, 0]
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    if dropout:
        pltpu.prng_seed(
            seed_ref[0],
            pl.program_id(0) * pl.num_programs(1) + pl.program_id(1))
        bits = pltpu.bitcast(pltpu.prng_random_bits(p.shape), jnp.uint32)
        thresh = jnp.uint32(int(keep_p * (2 ** 32 - 1)))
        p = p * (bits <= thresh).astype(jnp.float32) * (1.0 / keep_p)
    o_ref[0, 0] = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _attn_bwd_kernel_fb(seed_ref, q_ref, k_ref, v_ref, bias_ref, do_ref,
                        dq_ref, dk_ref, dv_ref, ds_ref,
                        *, sm_scale: float, keep_p: float, dropout: bool):
    """Full-bias backward; additionally emits dS (= the bias cotangent)."""
    q = q_ref[0, 0].astype(jnp.float32)
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0].astype(jnp.float32)
    do = do_ref[0, 0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * sm_scale
    s = s + bias_ref[0, 0]
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    dpv = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    if dropout:
        pltpu.prng_seed(
            seed_ref[0],
            pl.program_id(0) * pl.num_programs(1) + pl.program_id(1))
        bits = pltpu.bitcast(pltpu.prng_random_bits(p.shape), jnp.uint32)
        thresh = jnp.uint32(int(keep_p * (2 ** 32 - 1)))
        keep = (bits <= thresh).astype(jnp.float32) * (1.0 / keep_p)
        pd = p * keep
        dp = dpv * keep
    else:
        pd = p
        dp = dpv
    dv_ref[0, 0] = jax.lax.dot_general(
        pd, do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dv_ref.dtype)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    ds_ref[0, 0] = ds.astype(ds_ref.dtype)
    dq_ref[0, 0] = (jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * sm_scale).astype(dq_ref.dtype)
    dk_ref[0, 0] = (jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * sm_scale).astype(dk_ref.dtype)


def _pad_bias4(bias, Tqp, Tkp):
    B, H, Tq, Tk = bias.shape
    if (Tqp, Tkp) != (Tq, Tk):
        bias = jnp.pad(bias, ((0, 0), (0, 0), (0, Tqp - Tq), (0, Tkp - Tk)),
                       constant_values=NEG)
    return bias


def _grid_call_fb(kernel, outs, seed, q, k, v, bias4, Tqp, Tkp, dp,
                  extra=()):
    B, H = q.shape[0], q.shape[1]
    qspec = pl.BlockSpec((1, 1, Tqp, dp), lambda b, h, *_: (b, h, 0, 0))
    kspec = pl.BlockSpec((1, 1, Tkp, dp), lambda b, h, *_: (b, h, 0, 0))
    sspec = pl.BlockSpec((1, 1, Tqp, Tkp), lambda b, h, *_: (b, h, 0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, H),
        in_specs=[qspec, kspec, kspec, sspec] + [qspec] * len(extra),
        out_specs=[{"q": qspec, "k": kspec, "s": sspec}[o] for o in outs],
    )
    shapes = {"q": (B, H, Tqp, dp), "k": (B, H, Tkp, dp),
              "s": (B, H, Tqp, Tkp)}
    out_shape = [jax.ShapeDtypeStruct(
        shapes[o], jnp.float32 if o == "s" else q.dtype) for o in outs]
    return pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shape,
    )(seed, q, k, v, bias4, *extra)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def fused_attention_full_bias(q, k, v, bias4, seed,
                              sm_scale: float, dropout_p: float,
                              train: bool):
    """Like :func:`fused_attention` but with a full additive score bias
    [B, H, Tq, Tk] that RECEIVES a gradient.

    KEPT ALTERNATE BACKEND, no production caller: it served the Conformer
    rel-pos path (bias = bd/sqrt(d) + pad-mask) until the rotation-form
    rewrite (``ops/fused_relpos.py``) removed the materialized bias
    entirely. Retained, cross-checked by ``tests/test_fused_attention.py``,
    for configs that need an arbitrary learned/ALiBi-style full bias."""
    out, _ = _fused_fb_fwd(q, k, v, bias4, seed, sm_scale, dropout_p, train)
    return out


def _fused_fb_fwd(q, k, v, bias4, seed, sm_scale, dropout_p, train):
    B, H, Tq, d = q.shape
    zero_bias = jnp.zeros((B, k.shape[2]), jnp.float32)
    qp, kp, vp, _, dp, Tqp, Tkp = _pad_qkv(q, k, v, zero_bias)
    biasp = _pad_bias4(bias4, Tqp, Tkp)
    drop = bool(train) and dropout_p > 0.0
    kern = functools.partial(
        _attn_kernel_fb, sm_scale=sm_scale,
        keep_p=1.0 - dropout_p, dropout=drop)
    seed = jnp.asarray(seed, jnp.int32).reshape((1,))
    (out,) = _grid_call_fb(kern, ["q"], seed, qp, kp, vp, biasp,
                           Tqp, Tkp, dp)
    return out[:, :, :Tq, :d], (q, k, v, bias4, seed)


def _fused_fb_bwd(sm_scale, dropout_p, train, res, g):
    q, k, v, bias4, seed = res
    B, H, Tq, d = q.shape
    Tk = k.shape[2]
    zero_bias = jnp.zeros((B, Tk), jnp.float32)
    qp, kp, vp, _, dp, Tqp, Tkp = _pad_qkv(q, k, v, zero_bias)
    biasp = _pad_bias4(bias4, Tqp, Tkp)
    gp = jnp.pad(g, ((0, 0), (0, 0), (0, Tqp - Tq), (0, dp - d))) \
        if (Tqp, dp) != (Tq, d) else g
    drop = bool(train) and dropout_p > 0.0
    kern = functools.partial(
        _attn_bwd_kernel_fb, sm_scale=sm_scale,
        keep_p=1.0 - dropout_p, dropout=drop)
    dqp, dkp, dvp, dsp = _grid_call_fb(
        kern, ["q", "k", "k", "s"], seed, qp, kp, vp, biasp, Tqp, Tkp, dp,
        extra=(gp,))
    return (dqp[:, :, :Tq, :d], dkp[:, :, :Tk, :d], dvp[:, :, :Tk, :d],
            dsp[:, :, :Tq, :Tk].astype(bias4.dtype), None)


fused_attention_full_bias.defvjp(_fused_fb_fwd, _fused_fb_bwd)


def mha_reference_full_bias(q, k, v, bias4, sm_scale: float):
    """XLA oracle for the full-bias path (tests)."""
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * sm_scale + bias4
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p,
                      v.astype(jnp.float32)).astype(q.dtype)


def mha_reference(q, k, v, bias, sm_scale: float):
    """XLA oracle for the no-dropout path (tests)."""
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * sm_scale
    s = s + bias[:, None, None, :]
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p,
                      v.astype(jnp.float32)).astype(q.dtype)
