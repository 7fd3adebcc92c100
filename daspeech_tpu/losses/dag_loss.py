"""NAT DAG loss with glancing training (GLAT).

Pure-function rebuild of ``DASpeech/criterions/nat_dag_loss.py`` (+ the GLAT
``glat_function`` shared with ``s2s_dag_fastspeech2_loss.py:131-193``).

The reference runs two identical-dropout forward passes (``torch_seed``);
here both passes receive the same explicit dropout rng. The first (glancing)
pass is wrapped in ``stop_gradient``/``lax.stop_gradient`` territory by
simply not differentiating through it (``require_glance_grad`` is False in
the recipe).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from daspeech_tpu.ops import (
    dag_best_alignment,
    dag_logsoftmax_gather,
    dag_logsoftmax_gather_tokens,
    dag_loss,
    dag_loss_with_alpha_beta,
)


def conditional_stop_gradient(x, frozen):
    """Stop gradients through ``x`` when ``frozen`` — which may be a traced
    bool scalar (e.g. ``step <= dag_freezing_steps``), matching the
    reference's ``torch.set_grad_enabled(update_num > dag_freezing_steps)``
    (``s2s_dag_fastspeech2_loss.py:195``) and ``encoder_freezing_updates``
    (``s2t_conformer.py:140-154``). Values are unchanged either way; the
    cotangent is gated by the ``where``."""
    if x is None:
        return None
    sg = jax.lax.stop_gradient(x)
    if isinstance(frozen, bool):
        return sg if frozen else x
    return jnp.where(frozen, sg, x)


def _band_width(max_transition_length: Optional[int], L: int) -> Optional[int]:
    """Effective band width, or None when the band covers the full upper
    triangle (the recipe's 99999 clamps to L-1 and is a no-op —
    ``s2t_conformer_dag.py:144-145``).

    NOTE: band *semantics* (masked, band-renormalized links) are enforced by
    ``GlatLinkDecoder.extract_links``; ``banded_dp=True`` additionally makes
    the whole pipeline banded — the model extracts [B, L, W] links directly
    (``extract_links_banded``, block-banded QK + one-hot-einsum band
    selection) and the DP consumes that layout, so the [L, L] matrix never
    materializes. Measured on one v5e at W=128 (bf16, rbg): the full-matrix
    path wins at L<=1024 (84 vs 183 ms/step — one big QK matmul beats the
    fragmented block einsums), the banded path wins at L=4096 (489 vs
    588 ms/step) and scales O(L*W) in both FLOPs and memory where full is
    O(L^2). Banded stays opt-in because every recipe caps L at 1024.
    """
    if max_transition_length is None or max_transition_length <= 0:
        return None
    return max_transition_length if max_transition_length < L - 1 else None


def _best_alignment(match, links, output_length, target_length,
                    max_transition_length=None, banded_dp=False,
                    links_banded=False):
    """Full-matrix or block-banded Viterbi, by effective band width.
    ``links_banded`` marks ``links`` as already in the [B, L, W] band
    layout (``extract_links_banded``) — no conversion needed."""
    if links_banded:
        if banded_dp:
            from daspeech_tpu.ops.dag_banded import dag_best_alignment_banded

            return dag_best_alignment_banded(
                match, links, output_length, target_length)
        # banded extraction + FULL-matrix Viterbi: the [L, L] scan wins on
        # wall clock by ~8x even at L=1024/W=128 (see _band_width NOTE),
        # and [L, L] is only ~33 MB there — reconstruct and run fast.
        from daspeech_tpu.ops.links_utils import band_to_full

        return dag_best_alignment(
            match, band_to_full(links), output_length, target_length)
    W = _band_width(max_transition_length, links.shape[1])
    if W is None or not banded_dp:
        return dag_best_alignment(match, links, output_length, target_length)
    from daspeech_tpu.ops.dag_banded import dag_best_alignment_banded
    from daspeech_tpu.ops.links_utils import full_to_band

    return dag_best_alignment_banded(
        match, full_to_band(links, W), output_length, target_length)


class GlatInfo(NamedTuple):
    prev_output_tokens: jnp.ndarray      # [B, L] glanced decoder input
    matchmask: Optional[jnp.ndarray]     # [B, T, L] bool
    keep_word_mask: Optional[jnp.ndarray]  # [B, L] bool
    glat_accu: jnp.ndarray               # scalar
    glat_keep: jnp.ndarray               # scalar


def glat_glance(
    rng: jax.Array,
    logits: Optional[jnp.ndarray],   # [B, L, V] first-pass logits (stop-grad)
    links: jnp.ndarray,              # [B, L, L] first-pass links (stop-grad)
    tgt_tokens: jnp.ndarray,         # [B, T]
    prev_output_tokens: jnp.ndarray,  # [B, L]
    context_p: jnp.ndarray,          # scalar glancing prob
    pad: int,
    strategy: Optional[str] = "number-random",
    pred_tokens: Optional[jnp.ndarray] = None,   # [B, L] (fused path)
    match: Optional[jnp.ndarray] = None,         # [B, T, L] (fused path)
    sample_mask: Optional[jnp.ndarray] = None,   # [B] 1=real, 0=filler
    max_transition_length: Optional[int] = None,
    banded_dp: bool = False,     # route Viterbi through the banded backend
    links_banded: bool = False,  # links already [B, L, W] (banded extract)
) -> GlatInfo:
    """The ``glat_function`` (``nat_dag_loss.py:202-264``): Viterbi-align the
    graph to the reference, count mispredictions, and replace a subset of
    graph vertices with oracle target tokens.

    Pass either ``logits`` (argmax/match computed here) or precomputed
    ``pred_tokens`` + ``match`` (the streaming fused-vocab path).
    """
    links = jax.lax.stop_gradient(links)
    B, L = prev_output_tokens.shape
    T = tgt_tokens.shape[1]

    nonpad = tgt_tokens != pad
    target_length = jnp.sum(nonpad, axis=1)
    output_length = jnp.sum(prev_output_tokens != pad, axis=1)

    if logits is not None:
        logits = jax.lax.stop_gradient(logits)
        pred_tokens = jnp.argmax(logits, axis=-1)                  # [B, L]
        match = dag_logsoftmax_gather_tokens(logits, tgt_tokens)
        match = jnp.swapaxes(match, 1, 2)                          # [B, T, L]
    else:
        pred_tokens = jax.lax.stop_gradient(pred_tokens)
        match = jax.lax.stop_gradient(match)
    path = _best_alignment(match, links, output_length, target_length,
                           max_transition_length, banded_dp, links_banded)

    predict_align_mask = path >= 0                                 # [B, L]
    # matchmask[b, t, j] = (path[b, j] == t)
    matchmask = path[:, None, :] == jnp.arange(T)[None, :, None]
    oracle = jnp.take_along_axis(
        tgt_tokens, jnp.clip(path, 0, None), axis=1)               # [B, L]
    same_num = jnp.sum(
        (pred_tokens == oracle) & predict_align_mask, axis=1)      # [B]

    k_rand, k_keep = jax.random.split(rng)
    if strategy is None or strategy == "none":
        keep_prob = ((target_length - same_num) / jnp.maximum(target_length, 1)
                     * context_p)[:, None] * predict_align_mask.astype(
                         jnp.float32)
    elif strategy in ("number-random", "cmlm"):
        prob = jax.random.normal(k_rand, (B, L), dtype=jnp.float32)
        prob = jnp.where(predict_align_mask, prob, -100.0)
        if strategy == "number-random":
            glance_nums = ((target_length - same_num) * context_p + 0.5
                           ).astype(jnp.int32)
        else:  # cmlm: random fraction of the target length
            frac = jax.random.uniform(k_rand, (B,), dtype=jnp.float32)
            glance_nums = (target_length * frac + 0.5).astype(jnp.int32)
        sorted_desc = -jnp.sort(-prob, axis=-1)
        thresh = jnp.take_along_axis(
            sorted_desc, jnp.clip(glance_nums - 1, 0, None)[:, None],
            axis=1)[:, 0]
        thresh = jnp.where(glance_nums == 0, 100.0, thresh)
        keep_prob = (prob >= thresh[:, None]).astype(jnp.float32)
    else:
        raise ValueError(f"unknown glance strategy {strategy!r}")

    keep_word_mask = (
        jax.random.uniform(k_keep, (B, L)) < keep_prob)
    glat_prev = jnp.where(keep_word_mask, oracle, prev_output_tokens)

    smask = (jnp.ones((B,), jnp.float32) if sample_mask is None
             else sample_mask.astype(jnp.float32))
    return GlatInfo(
        prev_output_tokens=glat_prev,
        matchmask=matchmask,
        keep_word_mask=keep_word_mask,
        glat_accu=(jnp.sum(same_num * smask)
                   / jnp.maximum(jnp.sum(target_length * smask), 1)),
        glat_keep=(jnp.sum(keep_prob * smask[:, None])
                   / jnp.maximum(jnp.sum(smask) * L, 1.0)),
    )


def force_emit_match(
    match_all: jnp.ndarray,               # [B, T, L]
    matchmask: jnp.ndarray,               # [B, T, L]
    keep_word_mask: jnp.ndarray,          # [B, L]
    no_force_emit: bool = False,
) -> jnp.ndarray:
    """Pin glanced vertices to their aligned target position
    (``nat_dag_loss.py:130-132``); the forced columns are stop-gradient."""
    if no_force_emit:
        return match_all
    forced = jax.lax.stop_gradient(
        jnp.where(matchmask, match_all, -jnp.inf))
    keep = keep_word_mask[:, None, :]
    return jnp.where(keep, forced, match_all)


def compute_dag_loss(
    logits: Optional[jnp.ndarray],        # [B, L, V] (or None with match_all)
    links: jnp.ndarray,                   # [B, L, L]
    tgt_tokens: jnp.ndarray,              # [B, T]
    prev_output_tokens: jnp.ndarray,      # [B, L]
    pad: int,
    matchmask: Optional[jnp.ndarray] = None,
    keep_word_mask: Optional[jnp.ndarray] = None,
    no_force_emit: bool = False,
    with_alpha_beta: bool = False,
    match_all: Optional[jnp.ndarray] = None,   # [B, T, L] precomputed
    sample_mask: Optional[jnp.ndarray] = None,  # [B] 1=real, 0=bucket filler
    max_transition_length: Optional[int] = None,
    banded_dp: bool = False,
    links_banded: bool = False,   # links already [B, L, W] from the model
):
    """``_compute_dag_loss`` (``nat_dag_loss.py:116-162``): returns
    (loss, metrics[, alpha, beta]). Non-finite sentences (unsatisfiable
    graphs) are masked out of the mean instead of crashing.

    ``sample_mask`` carries zero weight for the duplicate items
    ``BucketBatcher.collate`` uses to fill short batches, matching the
    reference's true-sample_size weighting (``fairseq/trainer.py:932-953``).

    ``banded_dp=True`` with ``max_transition_length`` < L-1 routes the DP
    through the block-banded ops (``ops/dag_banded.py``) — O(L*W) memory per
    step instead of O(L^2), the reference CUDA kernels' banded layout
    (``dag_loss.py:80-96``). Off by default: see :func:`_band_width`.
    """
    B, L = prev_output_tokens.shape
    T = tgt_tokens.shape[1]
    output_length = jnp.sum(prev_output_tokens != pad, axis=1)
    target_length = jnp.sum(tgt_tokens != pad, axis=1)
    smask = (jnp.ones((B,), jnp.float32) if sample_mask is None
             else sample_mask.astype(jnp.float32))

    if match_all is None:
        match = dag_logsoftmax_gather_tokens(logits, tgt_tokens)
        match_all = jnp.swapaxes(match, 1, 2)                      # [B, T, L]
    if matchmask is not None:
        match_all = force_emit_match(
            match_all, matchmask, keep_word_mask, no_force_emit)

    if links_banded and not banded_dp:
        # banded extraction (FLOP saver) + full-matrix DP (wall-clock
        # winner): reconstruct [L, L] once — O(L^2) memory but ~10x faster
        # scans than the block-banded backend (measured at L=1024/W=128)
        from daspeech_tpu.ops.links_utils import band_to_full

        links = band_to_full(links)
        links_banded = False
    W = _band_width(max_transition_length, L) if banded_dp else None
    if links_banded or W is not None:
        from daspeech_tpu.ops.dag_banded import (
            dag_loss_banded, dag_loss_banded_with_alpha_beta)

        if links_banded:
            band = links           # already [B, L, W] (extract_links_banded)
        else:
            from daspeech_tpu.ops.links_utils import full_to_band

            band = full_to_band(links, W)
        if with_alpha_beta:
            logprob, alpha, beta = dag_loss_banded_with_alpha_beta(
                match_all, band, output_length, target_length)
        else:
            logprob = dag_loss_banded(
                match_all, band, output_length, target_length)
            alpha = beta = None
    elif with_alpha_beta:
        logprob, alpha, beta = dag_loss_with_alpha_beta(
            match_all, links, output_length, target_length)
    else:
        logprob = dag_loss(match_all, links, output_length, target_length)
        alpha = beta = None

    invalid = ~jnp.isfinite(logprob)
    safe_logprob = jnp.where(invalid, 0.0, logprob)
    per_sent = safe_logprob / jnp.maximum(target_length, 1)
    loss = -jnp.sum(per_sent * smask) / jnp.maximum(jnp.sum(smask), 1.0)

    metrics = {
        "dag-loss": loss,
        "invalid_nsentences": jnp.sum(invalid.astype(jnp.float32) * smask
                                      ).astype(jnp.int32),
        "nsentences": jnp.sum(smask).astype(jnp.int32),
        "ntokens": jnp.sum(target_length * smask).astype(jnp.int32),
        "nvalidtokens": jnp.sum(output_length * smask).astype(jnp.int32),
    }
    if with_alpha_beta:
        return loss, metrics, alpha, beta
    return loss, metrics


def nat_dag_loss(
    model,
    params,
    batch: Dict[str, jnp.ndarray],
    rng: jax.Array,
    glat_p: jnp.ndarray,
    vocab,
    glance_strategy: Optional[str] = "number-random",
    no_force_emit: bool = False,
    train: bool = True,
    fused_vocab_chunk: Optional[int] = None,
    max_transition_length: Optional[int] = None,
    banded_dp: bool = False,
    freeze_encoder=False,  # bool OR traced bool (step < encoder_freezing_updates)
) -> Tuple[jnp.ndarray, Dict[str, Any]]:
    """Criterion forward (``NATDAGLoss.forward``, ``nat_dag_loss.py:164-314``).

    batch keys: fbank [B,S,80], src_lengths [B], target [B,T],
    prev_output_tokens [B,L] (built host-side from lambda * src_len so the
    graph width L is a static bucket dim).

    ``fused_vocab_chunk``: when set, the [B, L, V] logits are never
    materialized — both GLAT and the loss use the streaming fused-vocab ops
    (for large multilingual vocabularies); requires the model's decoder to
    tie input/output embeddings or expose ``output_projection``.
    """
    fbank, src_lengths = batch["fbank"], batch["src_lengths"]
    tgt_tokens = batch["target"]
    prev_output_tokens = batch["prev_output_tokens"]
    sample_mask = batch.get("sample_mask")

    k_dropout, k_glat = jax.random.split(rng)
    rngs = {"dropout": k_dropout}

    enc_vars = {"params": params["params"]}
    if "batch_stats" in params:
        enc_vars["batch_stats"] = params["batch_stats"]

    # banded end-to-end: with --banded-dp and a real band width the model
    # extracts [B, L, W] links directly (extract_links_banded) and the DP
    # consumes the same layout — the [L, L] matrix never materializes.
    # Composes with fused_vocab_chunk (decode_features_banded): large-|V|
    # streaming and large-L banding at once.
    L_graph = prev_output_tokens.shape[1]
    band_links = (banded_dp
                  and _band_width(max_transition_length, L_graph) is not None
                  and hasattr(model, "decode_banded"))

    # Encode ONCE: both GLAT passes share the encoder output, matching the
    # reference (``s2t_conformer_dag.py:236-251``: encoder_out is computed
    # before ``glat_function`` and reused by both ``extract_features``
    # calls). The glance pass stop-grads its outputs, so encoder gradients
    # flow only through the second decode.
    enc_out = model.apply(
        enc_vars, fbank, src_lengths, train=train, rngs=rngs,
        method=model.encode, mutable=["batch_stats"] if train else False)
    if train:
        (enc, enc_pad, _), updates = enc_out
    else:
        (enc, enc_pad, _), updates = enc_out, {}
    if freeze_encoder is not False:
        # ``encoder_freezing_updates`` (``s2t_conformer.py:140-154``):
        # encoder runs under no-grad while step < N
        enc = conditional_stop_gradient(enc, freeze_encoder)

    def decode(prev):
        return model.apply(
            enc_vars, prev, enc, enc_pad, train=train, rngs=rngs,
            method=model.decode_banded if band_links else model.decode)

    def decode_feats(prev):
        return model.apply(
            enc_vars, prev, enc, enc_pad, train=train, rngs=rngs,
            method=(model.decode_features_banded if band_links
                    else model.decode_features))

    def vocab_matrix():
        dec = params["params"]["decoder"]
        if "embed_tokens" in dec and "output_projection" not in dec:
            W = dec["embed_tokens"]["embedding"].T      # tied, [D, V]
        else:
            W = dec["output_projection"]["kernel"]      # [D, V]
        return W, jnp.zeros((W.shape[1],), jnp.float32)

    glat_info = None
    use_glat = glance_strategy is not None
    fused = fused_vocab_chunk is not None
    if fused:
        from daspeech_tpu.ops.fused_vocab import (
            fused_logsoftmax_gather, streaming_argmax_and_match)

        W, b = vocab_matrix()

    # glat_p is a traced scalar; the reference skips GLAT only when p == 0,
    # which we keep data-independent by always glancing and letting
    # keep_prob -> 0 as p -> 0 (identical expectation, jit-stable shape).
    if use_glat:
        if fused:
            links1, feats1 = decode_feats(prev_output_tokens)
            pred1, match1 = streaming_argmax_and_match(
                feats1, W, b, tgt_tokens, fused_vocab_chunk)
            glat_info = glat_glance(
                k_glat, None, links1, tgt_tokens, prev_output_tokens,
                glat_p, vocab.pad, glance_strategy,
                pred_tokens=pred1, match=match1, sample_mask=sample_mask,
                max_transition_length=max_transition_length,
                banded_dp=banded_dp, links_banded=band_links)
        else:
            logits1, links1, _ = decode(prev_output_tokens)
            glat_info = glat_glance(
                k_glat, logits1, links1, tgt_tokens, prev_output_tokens,
                glat_p, vocab.pad, glance_strategy, sample_mask=sample_mask,
                max_transition_length=max_transition_length,
                banded_dp=banded_dp, links_banded=band_links)
        prev2 = glat_info.prev_output_tokens
        matchmask, keep_mask = glat_info.matchmask, glat_info.keep_word_mask
    else:
        prev2 = prev_output_tokens
        matchmask = keep_mask = None

    if fused:
        links, feats = decode_feats(prev2)
        match_all = fused_logsoftmax_gather(
            feats, W, b, tgt_tokens, fused_vocab_chunk)
        loss, metrics = compute_dag_loss(
            None, links, tgt_tokens, prev2, vocab.pad,
            matchmask=matchmask, keep_word_mask=keep_mask,
            no_force_emit=no_force_emit, match_all=match_all,
            sample_mask=sample_mask,
            max_transition_length=max_transition_length,
            banded_dp=banded_dp, links_banded=band_links)
    else:
        logits, links, feats = decode(prev2)
        loss, metrics = compute_dag_loss(
            logits, links, tgt_tokens, prev2, vocab.pad,
            matchmask=matchmask, keep_word_mask=keep_mask,
            no_force_emit=no_force_emit, sample_mask=sample_mask,
            max_transition_length=max_transition_length,
            banded_dp=banded_dp, links_banded=band_links)

    metrics["loss"] = loss
    if glat_info is not None:
        metrics["glat_accu"] = glat_info.glat_accu
        metrics["glat_keep"] = glat_info.glat_keep
    aux = {"metrics": metrics, "batch_stats": updates.get("batch_stats")}
    return loss, aux
