"""Block-banded DAG dynamic programs for bounded transition length.

The reference's CUDA kernels always run in a banded layout
``links[b, i, d] = log P(v_i -> v_{i+d+1})`` with d < W =
``max_transition_length`` (``DASpeech/custom_ops/dag_loss.py:80-96``); its
band is the key memory/compute lever at graph widths up to 1024.

The TPU-native formulation here is *block-banded*: split the L vertices
into L/W blocks of width W. Every edge (i -> j, 0 < j-i <= W) lands either
inside block m (strictly-upper intra matrix) or in block m+1 (lower-
triangular inter matrix). The scan step then contracts two dense
[B, nblk, W] x [B, nblk, W, W] einsums on the MXU — O(L*W) MACs per target
token instead of the full matrix's O(L^2) — with no gathers inside the
scan (all gathers happen once, outside it).

Semantics are identical to ``dag_ref.dag_loss`` restricted to a band:
``dag_loss_banded(match, band, ...) == dag_loss(match, band_to_full(band),
...)`` (tested against the full-matrix oracle).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from daspeech_tpu.ops.dag_ref import _finite_max


def _pad_to_blocks(x: jnp.ndarray, W: int, fill: float):
    """Pad axis 1 (length L) to a multiple of W."""
    L = x.shape[1]
    Lp = ((L + W - 1) // W) * W
    if Lp == L:
        return x, L
    pad = [(0, 0)] * x.ndim
    pad[1] = (0, Lp - L)
    return jnp.pad(x, pad, constant_values=fill), L


def band_to_blocks(band: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[B, L, W] banded links (log space) -> block transition matrices in
    PROB space: (intra [B, nblk, W, W], inter [B, nblk, W, W]).

    ``intra[b, m, p, q] = exp(links[b, mW+p, mW+q])`` (q > p),
    ``inter[b, m, p, q] = exp(links[b, mW+p, (m+1)W+q])`` (q <= p);
    the last block's inter matrix is all zero.
    """
    band, L = _pad_to_blocks(band, band.shape[2], -jnp.inf)
    B, Lp, W = band.shape
    nblk = Lp // W
    blocks = band.reshape(B, nblk, W, W)                 # [B, m, p, d]

    p = jnp.arange(W)[:, None]
    q = jnp.arange(W)[None, :]
    d_intra = q - p - 1                                  # valid where q > p
    d_inter = W + q - p - 1                              # valid where q <= p

    def gather(d, valid):
        idx = jnp.clip(d, 0, W - 1)
        g = jnp.take_along_axis(
            blocks, jnp.broadcast_to(idx[None, None], (B, nblk, W, W)),
            axis=3)
        return jnp.where(valid[None, None], jnp.exp(g), 0.0)

    intra = gather(d_intra, q > p)
    inter = gather(d_inter, q <= p)
    # block m's inter targets live in block m+1; the final block has none
    inter = inter.at[:, -1].set(0.0)
    return intra, inter


def _alpha_step(a, intra, inter):
    """One forward hop in prob space: a is exp(alpha - max) blockwise
    [B, nblk, W], returns the un-logged next vector [B, nblk, W]."""
    intra_out = jnp.einsum("bmp,bmpq->bmq", a, intra,
                           precision=jax.lax.Precision.HIGHEST,
                           preferred_element_type=jnp.float32)
    inter_out = jnp.einsum("bmp,bmpq->bmq", a, inter,
                           precision=jax.lax.Precision.HIGHEST,
                           preferred_element_type=jnp.float32)
    # inter_out[m] feeds block m+1
    shifted = jnp.concatenate(
        [jnp.zeros_like(inter_out[:, :1]), inter_out[:, :-1]], axis=1)
    return intra_out + shifted


def _beta_step(bvec, intra, inter):
    """One backward hop: nxt[j] = sum_k p[k] * exp(links[j, k]) — the
    transposed contraction; block n pulls from blocks n (intra) and n+1
    (inter)."""
    intra_out = jnp.einsum("bmpq,bmq->bmp", intra, bvec,
                           precision=jax.lax.Precision.HIGHEST,
                           preferred_element_type=jnp.float32)
    nxt_blocks = jnp.concatenate(
        [bvec[:, 1:], jnp.zeros_like(bvec[:, :1])], axis=1)
    inter_out = jnp.einsum("bmpq,bmq->bmp", inter, nxt_blocks,
                           precision=jax.lax.Precision.HIGHEST,
                           preferred_element_type=jnp.float32)
    return intra_out + inter_out


def banded_forward(match_all, band, output_length, target_length):
    """(logprob [B], alpha [B, T, L], beta [B, T, L]) from banded links."""
    match_all = match_all.astype(jnp.float32)
    band = band.astype(jnp.float32)
    B, T, L = match_all.shape
    W = band.shape[2]
    intra, inter = band_to_blocks(band)
    nblk = intra.shape[1]
    Lp = nblk * W
    match_p, _ = _pad_to_blocks(
        jnp.swapaxes(match_all, 1, 2), W, -jnp.inf)      # [B, Lp, T]
    match_p = jnp.swapaxes(match_p, 1, 2)                # [B, T, Lp]

    # ---- alpha
    f0 = jnp.full((B, Lp), -jnp.inf, jnp.float32).at[:, 0].set(
        match_all[:, 0, 0])

    def astep(f, match_t):
        c = _finite_max(f)                               # [B, 1]
        a = jnp.exp(f - c).reshape(B, nblk, W)
        nxt = _alpha_step(a, intra, inter).reshape(B, Lp)
        f_next = jnp.log(nxt) + c + match_t
        return f_next, f_next

    match_rest = jnp.swapaxes(match_p[:, 1:], 0, 1)
    _, alphas = jax.lax.scan(astep, f0, match_rest)
    alpha = jnp.concatenate([f0[:, None], jnp.swapaxes(alphas, 0, 1)], axis=1)

    # ---- beta (per-sample reset at t == target_length-1, as in dag_ref)
    pos = jnp.arange(Lp)[None, :]
    final_onehot = pos == (output_length[:, None] - 1)
    b_init = jnp.full((B, Lp), -jnp.inf, jnp.float32)

    def bstep(bv, inputs):
        t, match_t = inputs
        c = _finite_max(bv)
        p = jnp.exp(bv - c).reshape(B, nblk, W)
        nxt = _beta_step(p, intra, inter).reshape(B, Lp)
        propagated = jnp.log(nxt) + c + match_t
        is_last = (t == target_length - 1)[:, None]
        init_t = jnp.where(final_onehot, match_t, -jnp.inf)
        b_next = jnp.where(is_last, init_t, propagated)
        return b_next, b_next

    ts = jnp.arange(T - 1, -1, -1)
    match_rev = jnp.swapaxes(match_p, 0, 1)[::-1]
    _, betas = jax.lax.scan(bstep, b_init, (ts, match_rev))
    beta = jnp.swapaxes(betas, 0, 1)[:, ::-1]

    logprob = beta[:, 0, 0]
    return logprob, alpha[:, :, :L], beta[:, :, :L]


def _banded_bwd_grads(match_all, band, alpha, beta, g):
    """Closed-form cotangents in the banded layout (mirrors
    ``dag_loss.cu:378-485``): grad_band[b, i, d] needs only the block-pair
    outer products, never the full [L, L] S matrix."""
    B, T, L = match_all.shape
    W = band.shape[2]
    logZ = beta[:, 0, 0][:, None, None]

    expo = alpha + beta - match_all - logZ
    grad_match = jnp.where(
        jnp.isinf(match_all) | ~jnp.isfinite(expo), 0.0, jnp.exp(expo)
    ) * g[:, None, None]
    grad_match = jnp.where(jnp.isfinite(grad_match), grad_match, 0.0)

    alpha_p, _ = _pad_to_blocks(
        jnp.swapaxes(alpha, 1, 2), W, -jnp.inf)
    alpha_p = jnp.swapaxes(alpha_p, 1, 2)                 # [B, T, Lp]
    beta_p, _ = _pad_to_blocks(jnp.swapaxes(beta, 1, 2), W, -jnp.inf)
    beta_p = jnp.swapaxes(beta_p, 1, 2)
    Lp = alpha_p.shape[2]
    nblk = Lp // W

    w = _finite_max(alpha_p[:, :-1], axis=2)              # [B, T-1, 1]
    a_sh = jnp.exp(alpha_p[:, :-1] - w).reshape(B, T - 1, nblk, W)
    b_sh = jnp.exp(beta_p[:, 1:] + w - logZ)
    b_sh = jnp.where(jnp.isfinite(b_sh), b_sh, 0.0).reshape(B, T - 1, nblk, W)

    # S restricted to the two block diagonals
    S_intra = jnp.einsum("btmp,btmq->bmpq", a_sh, b_sh,
                         precision=jax.lax.Precision.HIGHEST,
                         preferred_element_type=jnp.float32)
    b_next = jnp.concatenate(
        [b_sh[:, :, 1:], jnp.zeros_like(b_sh[:, :, :1])], axis=2)
    S_inter = jnp.einsum("btmp,btmq->bmpq", a_sh, b_next,
                         precision=jax.lax.Precision.HIGHEST,
                         preferred_element_type=jnp.float32)

    # scatter block-diagonal S back into band[b, mW+p, d]:
    #   q = p+d+1 < W  -> S_intra[p, q];   q = p+d+1-W >= 0 -> S_inter[p, q]
    p = jnp.arange(W)[:, None]
    d = jnp.arange(W)[None, :]
    q_full = p + d + 1                                    # [W, W(=d)]
    use_intra = q_full < W
    qi = jnp.clip(q_full, 0, W - 1)
    qx = jnp.clip(q_full - W, 0, W - 1)
    gi = jnp.take_along_axis(
        S_intra, jnp.broadcast_to(qi[None, None], (B, nblk, W, W)), axis=3)
    gx = jnp.take_along_axis(
        S_inter, jnp.broadcast_to(qx[None, None], (B, nblk, W, W)), axis=3)
    S_band = jnp.where(use_intra[None, None], gi, gx).reshape(B, Lp, W)[:, :L]

    grad_band = S_band * jnp.exp(band.astype(jnp.float32)) * g[:, None, None]
    grad_band = jnp.where(jnp.isfinite(grad_band), grad_band, 0.0)
    return grad_match, grad_band


@jax.custom_vjp
def dag_loss_banded(match_all, band, output_length, target_length):
    """DAG marginal log-likelihood over banded links [B, L, W]
    (the reference CUDA op's native layout, ``dag_loss.py:66-121``).

    Returns ``logprob [B]``; differentiable w.r.t. match_all and band.
    """
    logprob, _, _ = banded_forward(
        match_all, band, output_length, target_length)
    return logprob


def _dlb_fwd(match_all, band, output_length, target_length):
    logprob, alpha, beta = banded_forward(
        match_all, band, output_length, target_length)
    return logprob, (match_all.astype(jnp.float32),
                     band.astype(jnp.float32), alpha, beta)


def _dlb_bwd(res, g):
    match_all, band, alpha, beta = res
    gm, gb = _banded_bwd_grads(match_all, band, alpha, beta, g)
    return gm, gb, None, None


dag_loss_banded.defvjp(_dlb_fwd, _dlb_bwd)


@jax.custom_vjp
def dag_loss_banded_with_alpha_beta(match_all, band, output_length,
                                    target_length):
    """Banded :func:`dag_loss_banded` that also returns (alpha, beta);
    alpha/beta cotangents are discarded (expect-strategy semantics,
    ``dag_loss.py:123-185``)."""
    return banded_forward(match_all, band, output_length, target_length)


def _dlbab_fwd(match_all, band, output_length, target_length):
    logprob, alpha, beta = banded_forward(
        match_all, band, output_length, target_length)
    return (logprob, alpha, beta), (
        match_all.astype(jnp.float32), band.astype(jnp.float32), alpha, beta)


def _dlbab_bwd(res, gs):
    g = gs[0]
    match_all, band, alpha, beta = res
    gm, gb = _banded_bwd_grads(match_all, band, alpha, beta, g)
    return gm, gb, None, None


dag_loss_banded_with_alpha_beta.defvjp(_dlbab_fwd, _dlbab_bwd)


def dag_best_alignment_banded(match_all, band, output_length, target_length):
    """Banded Viterbi best alignment (``dag_best_alignment.cu:40-185``):
    max-plus forward over the two block diagonals + backtrace.

    Returns ``path [B, L]`` int32 like ``dag_ref.dag_best_alignment``.
    """
    match_all = match_all.astype(jnp.float32)
    band = band.astype(jnp.float32)
    B, T, L = match_all.shape
    W = band.shape[2]
    band_p, _ = _pad_to_blocks(band, W, -jnp.inf)
    Lp = band_p.shape[1]
    nblk = Lp // W
    match_p, _ = _pad_to_blocks(jnp.swapaxes(match_all, 1, 2), W, -jnp.inf)
    match_p = jnp.swapaxes(match_p, 1, 2)

    blocks = band_p.reshape(B, nblk, W, W)
    p_i = jnp.arange(W)[:, None]
    q_i = jnp.arange(W)[None, :]
    d_intra = jnp.clip(q_i - p_i - 1, 0, W - 1)
    d_inter = jnp.clip(W + q_i - p_i - 1, 0, W - 1)

    def blockmat(d, valid):
        gv = jnp.take_along_axis(
            blocks, jnp.broadcast_to(d[None, None], (B, nblk, W, W)), axis=3)
        return jnp.where(valid[None, None], gv, -jnp.inf)

    Ti = blockmat(d_intra, q_i > p_i)                     # log space
    Tx = blockmat(d_inter, q_i <= p_i)
    Tx = Tx.at[:, -1].set(-jnp.inf)

    base = jnp.arange(nblk)[None, :, None, None] * W
    src_intra = jnp.broadcast_to(base + p_i[None, None], (B, nblk, W, W))
    src_inter = src_intra                                 # same source rows

    def fwd_step(f, match_t):
        fb = f.reshape(B, nblk, W)
        si = fb[:, :, :, None] + Ti                       # [B, m, p, q]
        best_i = jnp.max(si, axis=2)                      # into block m
        arg_i = jnp.take_along_axis(
            src_intra, jnp.argmax(si, axis=2)[:, :, None], axis=2)[:, :, 0]
        sx = fb[:, :, :, None] + Tx
        best_x = jnp.max(sx, axis=2)                      # into block m+1
        arg_x = jnp.take_along_axis(
            src_inter, jnp.argmax(sx, axis=2)[:, :, None], axis=2)[:, :, 0]
        best_x = jnp.concatenate(
            [jnp.full_like(best_x[:, :1], -jnp.inf), best_x[:, :-1]], axis=1)
        arg_x = jnp.concatenate(
            [jnp.zeros_like(arg_x[:, :1]), arg_x[:, :-1]], axis=1)
        take_x = best_x > best_i
        best = jnp.where(take_x, best_x, best_i).reshape(B, Lp)
        arg = jnp.where(take_x, arg_x, arg_i).reshape(B, Lp).astype(jnp.int32)
        f_next = best + match_t
        return f_next, (f_next, arg)

    f0 = jnp.full((B, Lp), -jnp.inf, jnp.float32).at[:, 0].set(
        match_all[:, 0, 0])
    match_rest = jnp.swapaxes(match_p[:, 1:], 0, 1)
    _, (_, traces) = jax.lax.scan(fwd_step, f0, match_rest)
    traces = jnp.swapaxes(traces, 0, 1)                   # [B, T-1, Lp]

    pos = jnp.arange(L)[None, :]
    path0 = jnp.full((B, L), -1, jnp.int32)
    cur0 = jnp.zeros((B,), jnp.int32)

    def back_step(carry, t):
        path, cur = carry
        is_start = t == (target_length - 1)
        cur = jnp.where(is_start, output_length - 1, cur).astype(jnp.int32)
        active = t <= (target_length - 1)
        mark = (pos == cur[:, None]) & active[:, None]
        path = jnp.where(mark, t, path)
        t_idx = jnp.maximum(t - 1, 0)
        prev = jnp.take_along_axis(
            traces[:, t_idx], cur[:, None], axis=1)[:, 0]
        cur = jnp.where(active & (t >= 1), prev, cur).astype(jnp.int32)
        return (path, cur), None

    ts = jnp.arange(T - 1, -1, -1)
    (path, _), _ = jax.lax.scan(back_step, (path0, cur0), ts)
    return jax.lax.stop_gradient(path)
