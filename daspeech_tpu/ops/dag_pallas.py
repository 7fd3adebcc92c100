"""Pallas TPU kernel for the DAG forward-backward (alpha/beta) recursions.

The scan reference (``dag_ref.py``) re-streams the [B, L, L] transition
matrix from HBM on every one of T scan steps; this kernel instead keeps one
sample's ``exp(links)`` resident in VMEM (L=512 f32 = 1 MB << 16 MB) and
runs both DP sweeps as fori_loops of (1, L) @ (L, L) MXU matvecs — the CUDA
reference needed an anti-diagonal wavefront with spin-locks for the same
recursion (``DASpeech/custom_ops/dag_loss.cu:41-274``); on TPU the batch
grid supplies the parallelism and the sequential t-loop stays on-chip.

Semantics identical to ``dag_ref.dag_loss_forward`` (same alpha/beta
definitions, same padded-region conventions); the closed-form gradient
einsums remain in XLA (they are plain MXU matmuls already).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from daspeech_tpu.ops import dag_ref


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# Module-level interpret switch: lets the custom-vjp wrappers (whose
# signatures are fixed by defvjp) run in Pallas interpret mode on CPU —
# the test suite flips this to exercise grads-through-the-Pallas-forward
# without TPU hardware.
INTERPRET = False


def _fb_kernel(ol_pre, tl_pre, b0, bpp, match_ref, links_ref,
               alpha_ref, beta_ref, explinks_ref):
    """``bpp`` batch elements per program, alpha and beta sweeps interleaved
    in ONE fori_loop (the sweeps are independent, so each iteration issues
    2*bpp MXU matvecs that pipeline against each other instead of 2*T*bpp
    latency-serial steps).

    Block shapes: match [bpp, T, L], links [bpp, L, L]; ``b0`` is the first
    batch index of this program (for the scalar-prefetch length lookups).
    """
    T = match_ref.shape[1]
    L = match_ref.shape[2]
    NEG = -1e30

    for i in range(bpp):
        explinks_ref[i] = jnp.exp(links_ref[i])

    col = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)

    def logmatvec(i, f, transpose):
        """log( exp(f - c) @ explinks[i] ) + c, NaN-safe for all--inf rows."""
        c = jnp.max(f, axis=-1, keepdims=True)
        c = jnp.where(c > NEG * 0.5, c, 0.0)
        p = jnp.exp(f - c)
        dims = (((1,), (1,)), ((), ())) if transpose else (((1,), (0,)), ((), ()))
        nxt = jax.lax.dot_general(
            p, explinks_ref[i], dims,
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
        return jnp.log(jnp.maximum(nxt, 0.0)) + c   # log(0) = -inf ok

    # t = 0 alpha rows
    fs = []
    for i in range(bpp):
        f0 = jnp.where(col == 0, match_ref[i, 0:1, :], -jnp.inf)
        alpha_ref[i, 0:1, :] = f0
        fs.append(f0)
    bs = [jnp.full((1, L), -jnp.inf, dtype=jnp.float32)] * bpp

    def body(k, carry):
        fs, bs = carry
        t_f = jnp.minimum(k + 1, T - 1)   # alpha step (real work: k <= T-2)
        t_b = T - 1 - k                   # beta step
        new_fs, new_bs = [], []
        for i in range(bpp):
            ol = ol_pre[b0 + i]
            tl = tl_pre[b0 + i]
            # alpha
            f_next = logmatvec(i, fs[i], False) + match_ref[i, pl.ds(t_f, 1), :]

            alpha_active = k + 1 <= T - 1

            @pl.when(alpha_active)
            def _():
                alpha_ref[i, pl.ds(t_f, 1), :] = f_next
            new_fs.append(jnp.where(alpha_active, f_next, fs[i]))
            # beta (with per-sample reset at t == tl-1)
            match_b = match_ref[i, pl.ds(t_b, 1), :]
            propagated = logmatvec(i, bs[i], True) + match_b
            init_t = jnp.where(col == ol - 1, match_b, -jnp.inf)
            b_next = jnp.where(t_b == tl - 1, init_t, propagated)
            beta_ref[i, pl.ds(t_b, 1), :] = b_next
            new_bs.append(b_next)
        return new_fs, new_bs

    jax.lax.fori_loop(0, T, body, (fs, bs), unroll=False)


def dag_loss_forward_pallas(
    match_all: jnp.ndarray,      # [B, T, L] f32 log P(y_t | v_j)
    links: jnp.ndarray,          # [B, L, L] f32 log transitions
    output_length: jnp.ndarray,  # [B]
    target_length: jnp.ndarray,  # [B]
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(logprob [B], alpha [B, T, L], beta [B, T, L]); pads T to a multiple
    of 8 and L to a multiple of 128 internally."""
    B, T, L = match_all.shape
    Tp, Lp = _round_up(T, 8), _round_up(L, 128)

    # batch rows per program: bounded by a ~12 MB VMEM budget for
    # bpp * (2 * L*L + 3 * T*L) f32 buffers.
    budget = 12 * 2 ** 20
    per = (2 * Lp * Lp + 3 * Tp * Lp) * 4
    bpp = max(1, min(4, budget // per))
    while B % bpp:
        bpp -= 1
    Bp = B

    if (Tp, Lp) != (T, L):
        match_all = jnp.pad(match_all, ((0, 0), (0, Tp - T), (0, Lp - L)),
                            constant_values=-jnp.inf)
        links = jnp.pad(links, ((0, 0), (0, Lp - L), (0, Lp - L)),
                        constant_values=-jnp.inf)

    match_all = match_all.astype(jnp.float32)
    links = links.astype(jnp.float32)
    ol = output_length.astype(jnp.int32)
    tl = target_length.astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(Bp // bpp,),
        in_specs=[
            pl.BlockSpec((bpp, Tp, Lp), lambda g, ol, tl: (g, 0, 0)),
            pl.BlockSpec((bpp, Lp, Lp), lambda g, ol, tl: (g, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bpp, Tp, Lp), lambda g, ol, tl: (g, 0, 0)),
            pl.BlockSpec((bpp, Tp, Lp), lambda g, ol, tl: (g, 0, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((bpp, Lp, Lp), jnp.float32)],
    )

    def kernel(ol_pre, tl_pre, match_ref, links_ref, alpha_ref, beta_ref,
               explinks_ref):
        b0 = pl.program_id(0) * bpp
        _fb_kernel(ol_pre, tl_pre, b0, bpp,
                   match_ref, links_ref, alpha_ref, beta_ref, explinks_ref)

    alpha, beta = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((Bp, Tp, Lp), jnp.float32),
            jax.ShapeDtypeStruct((Bp, Tp, Lp), jnp.float32),
        ],
        interpret=interpret or INTERPRET,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(1.2 * bpp * per + 2 ** 21),
        ),
    )(ol, tl, match_all, links)

    alpha = alpha[:, :T, :L]
    beta = beta[:, :T, :L]
    logprob = beta[:, 0, 0]
    return logprob, alpha, beta


@jax.custom_vjp
def dag_loss_pallas(match_all, links, output_length, target_length):
    """Pallas-backed dag_loss; same contract and gradients as
    ``dag_ref.dag_loss``."""
    logprob, _, _ = dag_loss_forward_pallas(
        match_all, links, output_length, target_length)
    return logprob


def _fwd(match_all, links, output_length, target_length):
    logprob, alpha, beta = dag_loss_forward_pallas(
        match_all, links, output_length, target_length)
    res = (match_all.astype(jnp.float32), links.astype(jnp.float32),
           alpha, beta)
    return logprob, res


def _bwd(res, g):
    match_all, links, alpha, beta = res
    gm, gl = dag_ref._dag_loss_bwd_grads(match_all, links, alpha, beta, g)
    return gm, gl, None, None


dag_loss_pallas.defvjp(_fwd, _bwd)


@jax.custom_vjp
def dag_loss_with_alpha_beta_pallas(match_all, links, output_length,
                                    target_length):
    logprob, alpha, beta = dag_loss_forward_pallas(
        match_all, links, output_length, target_length)
    return logprob, alpha, beta


def _fwd_ab(match_all, links, output_length, target_length):
    logprob, alpha, beta = dag_loss_forward_pallas(
        match_all, links, output_length, target_length)
    res = (match_all.astype(jnp.float32), links.astype(jnp.float32),
           alpha, beta)
    return (logprob, alpha, beta), res


def _bwd_ab(res, gs):
    g, _, _ = gs
    match_all, links, alpha, beta = res
    gm, gl = dag_ref._dag_loss_bwd_grads(match_all, links, alpha, beta, g)
    return gm, gl, None, None


dag_loss_with_alpha_beta_pallas.defvjp(_fwd_ab, _bwd_ab)


def _viterbi_kernel(ol_pre, tl_pre, match_ref, links_ref, path_ref,
                    traces_ref, *, T: int, L: int):
    """Max-plus forward + in-kernel backtrace for ONE batch row.

    The scan reference (``dag_ref.dag_best_alignment``) re-reads the
    [L, L] links from HBM on each of T-1 steps and then runs a second
    T-step backtrace scan whose per-step [B, L] path updates dominated the
    step trace (~2 ms of ``dynamic_update_slice``). Here links, the
    argmax traces, and the path all stay in VMEM; the backtrace extracts
    ``traces[t][cur]`` with a one-hot lane reduction instead of dynamic
    lane indexing. Equivalent of ``dag_best_alignment.cu:40-185``.
    """
    b = pl.program_id(0)
    ol = ol_pre[b]
    tl = tl_pre[b]
    lcol = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    links = links_ref[0]                                     # [L, L]

    # -inf (not a finite floor) so unreachable-vertex argmax traces match
    # the scan reference bit for bit (all--inf columns pick index 0)
    f0 = jnp.where(lcol == 0, match_ref[0, 0:1, :], -jnp.inf)

    def fwd(t, f_row):
        f_col = jax.lax.transpose(f_row, (1, 0))             # [L, 1]
        scores = f_col + links                               # [L, L]
        best = jnp.max(scores, axis=0, keepdims=True)        # [1, L]
        # first argmax, matching jnp.argmax in the scan reference
        arg = jnp.min(jnp.where(scores == best, sub_iota, L),
                      axis=0, keepdims=True)
        traces_ref[pl.ds(t, 1), :] = arg.astype(jnp.int32)
        match_t = match_ref[0, pl.ds(t, 1), :]
        return best + match_t

    jax.lax.fori_loop(1, T, fwd, f0, unroll=False)

    path0 = jnp.full((1, L), -1, dtype=jnp.int32)

    def back(k, carry):
        path, cur = carry
        t = T - 1 - k
        cur = jnp.where(t == tl - 1, ol - 1, cur)
        active = t <= tl - 1
        path = jnp.where((lcol == cur) & active, t, path)
        row = traces_ref[pl.ds(jnp.maximum(t, 1), 1), :]
        prev = jnp.sum(jnp.where(lcol == cur, row, 0))
        cur = jnp.where(active & (t >= 1), prev, cur)
        return path, cur

    path, _ = jax.lax.fori_loop(0, T, back, (path0, jnp.int32(0)),
                                unroll=False)
    path_ref[0, 0] = path[0]


def dag_best_alignment_pallas(
    match_all: jnp.ndarray,      # [B, T, L]
    links: jnp.ndarray,          # [B, L, L]
    output_length: jnp.ndarray,  # [B]
    target_length: jnp.ndarray,  # [B]
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in for ``dag_ref.dag_best_alignment`` (same first-argmax
    tie-breaking); returns path [B, L] int32. Non-differentiable."""
    B, T, L = match_all.shape
    Tp, Lp = _round_up(T, 8), _round_up(L, 128)
    if (Tp, Lp) != (T, L):
        match_all = jnp.pad(match_all, ((0, 0), (0, Tp - T), (0, Lp - L)),
                            constant_values=-jnp.inf)
        links = jnp.pad(links, ((0, 0), (0, Lp - L), (0, Lp - L)),
                        constant_values=-jnp.inf)
    match_all = match_all.astype(jnp.float32)
    links = links.astype(jnp.float32)
    ol = output_length.astype(jnp.int32)
    tl = target_length.astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, Tp, Lp), lambda b, ol, tl: (b, 0, 0)),
            pl.BlockSpec((1, Lp, Lp), lambda b, ol, tl: (b, 0, 0)),
        ],
        out_specs=[pl.BlockSpec((1, 1, Lp), lambda b, ol, tl: (b, 0, 0))],
        scratch_shapes=[pltpu.VMEM((Tp, Lp), jnp.int32)],
    )
    kern = functools.partial(_viterbi_kernel, T=Tp, L=Lp)
    (path,) = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((B, 1, Lp), jnp.int32)],
        interpret=interpret or INTERPRET,
    )(ol, tl, match_all, links)
    return jax.lax.stop_gradient(path[:, 0, :L])
