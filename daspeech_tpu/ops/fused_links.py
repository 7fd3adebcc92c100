"""Fused DAG link extraction: per-head QK -> masked row-softmax -> gated
logsumexp over heads, in one VMEM-resident Pallas program per batch row.

The XLA path (``models/dag_model.py::extract_links``) materializes the
[B, L, L, H] f32 score tensor (147 MB at the recipe shape B=80, L=240,
H=8) and walks it several times (mask, row-max, row-lse, head-lse) — the
train-step trace bills it ~4.4 ms/step per decode pass, and GLAT decodes
twice. This kernel streams the heads: each head's [L, L] scores live only
in VMEM, folded into a running (max, sum) logsumexp accumulator, so the
only [L, L] HBM traffic is the final links matrix. The recompute-based
backward regenerates per-head scores the same way (flash-attention style)
and produces closed-form dq/dk/dgates.

Reference semantics: ``DASpeech/models/s2t_conformer_dag.py:171-212``
(``extract_links``: per-head scores, gated log-softmax over successors).
Masking matches the XLA path exactly: valid = (j > i) & (j < output_length)
[& (j - i <= max_transition_length)], a -1e9 finite floor inside the
softmax, -inf restored on the output.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_FLOOR = -1e9

# Same interpret switch convention as ops/dag_pallas.py.
INTERPRET = False


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def links_kernel_fits_vmem(L: int, C: int) -> bool:
    """fwd worst case ~4 [L, L] f32 tiles + q/k; bwd ~6 + dq/dk accums."""
    Lp = _round_up(L, 128)
    return (6 * Lp * Lp + 6 * Lp * C) * 4 < 10 * 1024 * 1024


def _mask_iotas(L):
    i_sub = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    j_lan = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    return i_sub, j_lan


def _valid_mask(L, ol, mtl):
    i_sub, j_lan = _mask_iotas(L)
    valid = (j_lan > i_sub) & (j_lan < ol)
    if mtl is not None:
        valid &= (j_lan - i_sub) <= mtl
    return valid


def _head_scores(q_ref, k_ref, h, dk, scale, valid):
    qh = q_ref[0][:, h * dk:(h + 1) * dk].astype(jnp.float32)
    kh = k_ref[0][:, h * dk:(h + 1) * dk].astype(jnp.float32)
    s = jax.lax.dot_general(
        qh, kh, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    return jnp.where(valid, s, NEG_FLOOR)


def _links_fwd_kernel(ol_pre, q_ref, k_ref, g_ref, links_ref,
                      *, H: int, dk: int, scale: float, mtl):
    b = pl.program_id(0)
    L = q_ref.shape[1]
    valid = _valid_mask(L, ol_pre[b], mtl)

    run_max = jnp.full((L, L), -jnp.inf, jnp.float32)
    run_sum = jnp.zeros((L, L), jnp.float32)
    for h in range(H):
        s = _head_scores(q_ref, k_ref, h, dk, scale, valid)
        m = jnp.max(s, axis=1, keepdims=True)
        lse = jnp.log(jnp.sum(jnp.exp(s - m), axis=1, keepdims=True)) + m
        gh = g_ref[0][:, h:h + 1]                          # [L, 1] f32
        v = s - lse + gh
        nm = jnp.maximum(run_max, v)
        run_sum = run_sum * jnp.exp(run_max - nm) + jnp.exp(v - nm)
        run_max = nm
    links = jnp.log(run_sum) + run_max
    links_ref[0] = jnp.where(valid, links, -jnp.inf)


def _links_bwd_kernel(ol_pre, q_ref, k_ref, g_ref, do_ref,
                      dq_ref, dk_ref, dg_ref,
                      *, H: int, dk: int, scale: float, mtl):
    b = pl.program_id(0)
    L = q_ref.shape[1]
    valid = _valid_mask(L, ol_pre[b], mtl)

    # pass 1: recompute the FLOORED links (no -inf mask: the floor keeps
    # exp(s - lse + g - links) finite at invalid entries) + per-head lse
    run_max = jnp.full((L, L), -jnp.inf, jnp.float32)
    run_sum = jnp.zeros((L, L), jnp.float32)
    lses = []
    for h in range(H):
        s = _head_scores(q_ref, k_ref, h, dk, scale, valid)
        m = jnp.max(s, axis=1, keepdims=True)
        lse = jnp.log(jnp.sum(jnp.exp(s - m), axis=1, keepdims=True)) + m
        lses.append(lse)
        v = s - lse + g_ref[0][:, h:h + 1]
        nm = jnp.maximum(run_max, v)
        run_sum = run_sum * jnp.exp(run_max - nm) + jnp.exp(v - nm)
        run_max = nm
    links_floor = jnp.log(run_sum) + run_max

    G = jnp.where(valid, do_ref[0].astype(jnp.float32), 0.0)
    for h in range(H):
        qh = q_ref[0][:, h * dk:(h + 1) * dk].astype(jnp.float32)
        kh = k_ref[0][:, h * dk:(h + 1) * dk].astype(jnp.float32)
        s = _head_scores(q_ref, k_ref, h, dk, scale, valid)
        soft = jnp.exp(s - lses[h])                       # softmax_j
        p = jnp.exp(s - lses[h] + g_ref[0][:, h:h + 1] - links_floor)
        pG = p * G
        r = jnp.sum(pG, axis=1, keepdims=True)            # [L, 1]
        ds = (pG - soft * r) * scale
        dq_ref[0, :, h * dk:(h + 1) * dk] = jax.lax.dot_general(
            ds, kh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dq_ref.dtype)
        dk_ref[0, :, h * dk:(h + 1) * dk] = jax.lax.dot_general(
            ds, qh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dk_ref.dtype)
        dg_ref[0, :, h:h + 1] = r.astype(dg_ref.dtype)


def _pad_lc(x, Lp, fill=0.0):
    L = x.shape[1]
    if Lp != L:
        x = jnp.pad(x, ((0, 0), (0, Lp - L), (0, 0)), constant_values=fill)
    return x


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def fused_extract_links(q, k, log_gates, output_length,
                        num_heads: int, scale: float, mtl):
    """links [B, L, L] f32 from packed q/k [B, L, H*dk] and
    log_gates [B, L, H]; ``mtl`` is the static max_transition_length band
    (None = full upper triangle). Matches
    ``models/dag_model.py::extract_links`` numerics to f32 tolerance."""
    out, _ = _fel_fwd(q, k, log_gates, output_length,
                      num_heads, scale, mtl)
    return out


def _grid_call(kernel, outs, ol, args, L, Lp):
    B = args[0].shape[0]
    specs = []
    for a in args:
        specs.append(pl.BlockSpec((1, Lp, a.shape[2]),
                                  lambda b, ol_p: (b, 0, 0)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=specs,
        out_specs=[pl.BlockSpec((1, Lp, o[1]), lambda b, ol_p: (b, 0, 0))
                   for o in outs],
    )
    out_shape = [jax.ShapeDtypeStruct((B, Lp, o[1]), o[0]) for o in outs]
    return pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shape,
        interpret=INTERPRET,
    )(ol, *args)


def _links_fwd_impl(ol, q, k, log_gates, num_heads, scale, mtl):
    B, L, C = q.shape
    dkh = C // num_heads
    Lp = _round_up(L, 128)
    qp, kp = _pad_lc(q, Lp), _pad_lc(k, Lp)
    gp = _pad_lc(log_gates.astype(jnp.float32), Lp)
    kern = functools.partial(_links_fwd_kernel, H=num_heads, dk=dkh,
                             scale=scale, mtl=mtl)
    (links,) = _grid_call(kern, [(jnp.float32, Lp)], ol, (qp, kp, gp), L, Lp)
    return links[:, :L, :L]


def _links_bwd_impl(ol, q, k, log_gates, g, num_heads, scale, mtl):
    B, L, C = q.shape
    dkh = C // num_heads
    Lp = _round_up(L, 128)
    qp, kp = _pad_lc(q, Lp), _pad_lc(k, Lp)
    gp = _pad_lc(log_gates.astype(jnp.float32), Lp)
    gout = g.astype(jnp.float32)
    if Lp != L:
        gout = jnp.pad(gout, ((0, 0), (0, Lp - L), (0, Lp - L)))
    kern = functools.partial(_links_bwd_kernel, H=num_heads, dk=dkh,
                             scale=scale, mtl=mtl)
    Hp = log_gates.shape[2]
    dq, dk_, dg = _grid_call(
        kern, [(q.dtype, C), (k.dtype, C), (jnp.float32, Hp)],
        ol, (qp, kp, gp, gout), L, Lp)
    return dq[:, :L], dk_[:, :L], dg[:, :L].astype(log_gates.dtype)


@functools.lru_cache(maxsize=None)
def _links_fwd_spmd(num_heads, scale, mtl):
    """GSPMD wrapper (batch dim 0 sharded, everything else replicated) —
    multi-device data-parallel jits keep the kernel per-shard."""
    from jax.experimental.custom_partitioning import custom_partitioning

    from daspeech_tpu.ops.fused_attention import _batch_dim0_partition

    def impl(ol, q, k, log_gates):
        return _links_fwd_impl(ol, q, k, log_gates, num_heads, scale, mtl)

    f = custom_partitioning(impl)
    f.def_partition(
        partition=_batch_dim0_partition(impl),
        sharding_rule="b, b i c, b j c, b i h -> b i j",
        # factor order must follow first appearance in the rule
        need_replication_factors=("i", "c", "j", "h"),
    )
    return f


@functools.lru_cache(maxsize=None)
def _links_bwd_spmd(num_heads, scale, mtl):
    from jax.experimental.custom_partitioning import custom_partitioning

    from daspeech_tpu.ops.fused_attention import _batch_dim0_partition

    def impl(ol, q, k, log_gates, g):
        return _links_bwd_impl(ol, q, k, log_gates, g,
                               num_heads, scale, mtl)

    f = custom_partitioning(impl)
    f.def_partition(
        partition=_batch_dim0_partition(impl),
        sharding_rule="b, b i c, b j c, b i h, b i j "
                      "-> b i c, b j c, b i h",
        need_replication_factors=("i", "c", "j", "h"),
    )
    return f


def _fel_fwd(q, k, log_gates, output_length, num_heads, scale, mtl):
    ol = output_length.astype(jnp.int32)
    links = _links_fwd_spmd(num_heads, scale, mtl)(ol, q, k, log_gates)
    return links, (q, k, log_gates, ol)


def _fel_bwd(num_heads, scale, mtl, res, g):
    q, k, log_gates, ol = res
    dq, dk_, dg = _links_bwd_spmd(num_heads, scale, mtl)(
        ol, q, k, log_gates, g)
    return dq, dk_, dg, None


fused_extract_links.defvjp(_fel_fwd, _fel_bwd)


def xla_extract_links(q, k, log_gates, output_length,
                      num_heads: int, scale: float, mtl):
    """XLA oracle with identical contract (tests)."""
    B, L, C = q.shape
    dkh = C // num_heads
    qh = q.reshape(B, L, num_heads, dkh)
    kh = k.reshape(B, L, num_heads, dkh)
    scores = jnp.einsum("bihd,bjhd->bijh", qh, kh,
                        preferred_element_type=jnp.float32) * scale
    i_idx = jnp.arange(L)[None, :, None]
    j_idx = jnp.arange(L)[None, None, :]
    valid = (j_idx > i_idx) & (j_idx < output_length[:, None, None])
    if mtl is not None:
        valid &= (j_idx - i_idx) <= mtl
    scores = jnp.where(valid[..., None], scores, NEG_FLOOR)
    m = jax.lax.stop_gradient(jnp.max(scores, axis=2, keepdims=True))
    lse = jnp.log(jnp.sum(jnp.exp(scores - m), axis=2, keepdims=True)) + m
    log_attn = scores - lse
    combined = log_attn + log_gates.astype(jnp.float32)[:, :, None, :]
    cm = jax.lax.stop_gradient(jnp.max(combined, axis=-1, keepdims=True))
    links = jnp.log(jnp.sum(jnp.exp(combined - cm), axis=-1)) + cm[..., 0]
    return jnp.where(valid, links, -jnp.inf)
