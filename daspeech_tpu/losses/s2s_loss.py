"""Joint two-pass S2ST loss: DAG loss + FastSpeech2 loss over expected (or
Viterbi-argmax) hidden states.

Rebuild of ``DASpeech/criterions/s2s_dag_fastspeech2_loss.py``:

- ``expect`` strategy (``:252-265``): posterior weights
  score = exp(alpha + beta - logsumexp_j(alpha + beta)) (note: as in the
  reference, alpha and beta both include the emission term, so this is the
  reference's exact quantity, not the textbook posterior), NaN -> 0,
  stop-gradient (the reference discards alpha/beta cotangents);
  expected features = score @ features, the <bos> row dropped.
- ``argmax`` strategy (``:213-251``): features gathered along the Viterbi
  best-alignment path, compacted left (reference's boolean-mask collate).
- TTS losses (``:267-298``): L1 mel + MSE log-dur/pitch/energy,
  total = dag + tts_loss_weight * tts.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from daspeech_tpu.losses.dag_loss import compute_dag_loss, glat_glance
from daspeech_tpu.losses.fastspeech2_loss import fastspeech2_losses
from daspeech_tpu.models.layers import lengths_to_padding_mask
from daspeech_tpu.ops import (
    dag_best_alignment, dag_logsoftmax_gather, dag_logsoftmax_gather_tokens)


from daspeech_tpu.losses.dag_loss import (  # noqa: E402,F401 — re-export
    conditional_stop_gradient)


def _logsumexp_last(x):
    m = jnp.max(x, axis=-1, keepdims=True)
    m = jnp.where(jnp.isfinite(m), m, 0.0)
    return jnp.log(jnp.sum(jnp.exp(x - m), axis=-1, keepdims=True)) + m


def expected_features(alpha, beta, features):
    """``expect``: z_t = sum_j score[t, j] * v_j, bos row removed.

    alpha/beta: [B, T, L]; features: [B, L, D] -> [B, T-1, D].
    """
    joint = alpha + beta                                   # [B, T, L]
    score = jnp.exp(joint - _logsumexp_last(joint))
    score = jnp.where(jnp.isfinite(score), score, 0.0)
    score = jax.lax.stop_gradient(score)
    z = jnp.einsum("btl,bld->btd", score.astype(features.dtype), features,
                   preferred_element_type=jnp.float32)
    return z[:, 1:].astype(features.dtype)


def argmax_path_features(logits, links, tgt_tokens, prev_output_tokens,
                         features, pad, match_all=None,
                         max_transition_length=None, banded_dp=False,
                         links_banded=False):
    """``argmax``: gather features on the Viterbi path, excluding <bos>
    (``path[:, 0] = -1``), compacted to the left like ``_collate_frames``.

    Returns (feats [B, T-1, D], lengths [B]). Pass either ``logits`` or a
    precomputed ``match_all`` [B, T, L] (fused-vocab path).
    """
    B, L, _ = features.shape
    T = tgt_tokens.shape[1]
    output_length = jnp.sum(prev_output_tokens != pad, axis=1)
    target_length = jnp.sum(tgt_tokens != pad, axis=1)

    if match_all is None:
        match = dag_logsoftmax_gather_tokens(
            jax.lax.stop_gradient(logits), tgt_tokens)
        match = jnp.swapaxes(match, 1, 2)
    else:
        match = jax.lax.stop_gradient(match_all)
    from daspeech_tpu.losses.dag_loss import _best_alignment

    path = _best_alignment(
        match, jax.lax.stop_gradient(links), output_length, target_length,
        max_transition_length, banded_dp, links_banded)
    path = path.at[:, 0].set(-1)                           # mask <bos>

    # vertex j with path[b, j] = t >= 1 supplies output slot t - 1; the
    # aligned-path positions are strictly increasing in both t and j, so
    # scatter by t is already the left-compacted order.
    slot = jnp.where(path >= 1, path - 1, T - 1)           # park invalid at end
    onehot = slot[:, :, None] == jnp.arange(T - 1)[None, None, :]  # [B,L,T-1]
    onehot = onehot & (path >= 1)[:, :, None]
    feats = jnp.einsum("blt,bld->btd", onehot.astype(features.dtype), features)
    lengths = jnp.sum(onehot.astype(jnp.int32), axis=(1, 2))
    return feats, lengths


def s2s_dag_fastspeech2_loss(
    model,
    params,
    batch: Dict[str, jnp.ndarray],
    rng: jax.Array,
    glat_p: jnp.ndarray,
    vocab,
    tts_loss_weight: float = 5.0,
    training_strategy: str = "expect",
    glance_strategy: Optional[str] = "number-random",
    no_force_emit: bool = False,
    freeze_dag=False,   # bool OR traced bool scalar (step <= freezing_steps)
    train: bool = True,
    fused_vocab_chunk: Optional[int] = None,
    max_transition_length: Optional[int] = None,
    banded_dp: bool = False,
    freeze_encoder=False,  # bool OR traced bool (encoder_freezing_updates)
) -> Tuple[jnp.ndarray, Dict[str, Any]]:
    """Criterion forward (``S2SDAGFastSpeech2Loss.forward``, ``:94-345``).

    batch keys: fbank, src_lengths, target_text [B,T], prev_output_tokens
    [B,L], target_audio [B,M,80], target_audio_lengths, durations, pitches,
    energies (all padded to static bucket dims).
    """
    fbank, src_lengths = batch["fbank"], batch["src_lengths"]
    tgt_tokens = batch["target_text"]
    prev_output_tokens = batch["prev_output_tokens"]
    sample_mask = batch.get("sample_mask")

    k_dropout, k_glat, k_tts = jax.random.split(rng, 3)

    variables = {"params": params["params"]}
    if "batch_stats" in params:
        variables["batch_stats"] = params["batch_stats"]

    fused = fused_vocab_chunk is not None
    if fused:
        from daspeech_tpu.ops.fused_vocab import (
            fused_logsoftmax_gather, streaming_argmax_and_match)

        dec = params["params"]["dag"]["decoder"]
        if "embed_tokens" in dec and "output_projection" not in dec:
            W_vocab = dec["embed_tokens"]["embedding"].T
        else:
            W_vocab = dec["output_projection"]["kernel"]
        b_vocab = jnp.zeros((W_vocab.shape[1],), jnp.float32)

    # banded end-to-end (see nat_dag_loss): [L, L] never materializes;
    # composes with fused_vocab_chunk (decode_features_banded)
    from daspeech_tpu.losses.dag_loss import _band_width

    band_links = (banded_dp
                  and _band_width(max_transition_length,
                                  prev_output_tokens.shape[1]) is not None
                  and hasattr(model, "decode_banded"))

    # Encode ONCE; both GLAT passes share the encoder output, matching the
    # reference (``s2t_conformer_dag.py:236-251``). The glance pass
    # stop-grads its outputs, so encoder gradients flow only through the
    # second decode.
    enc_out = model.apply(
        variables, fbank, src_lengths, train=train,
        rngs={"dropout": k_dropout}, method=model.encode,
        mutable=["batch_stats"] if train else False)
    if train:
        (enc, enc_pad, _), updates = enc_out
    else:
        (enc, enc_pad, _), updates = enc_out, {}
    if freeze_encoder is not False:
        # ``encoder_freezing_updates`` (``s2t_conformer.py:140-154``)
        enc = conditional_stop_gradient(enc, freeze_encoder)

    def dag_decode(prev, key, need_logits=True):
        if not need_logits:
            links, feats = model.apply(
                variables, prev, enc, enc_pad, train=train,
                rngs={"dropout": key},
                method=(model.decode_features_banded if band_links
                        else model.decode_features))
            return None, links, feats
        return model.apply(
            variables, prev, enc, enc_pad, train=train,
            rngs={"dropout": key},
            method=model.decode_banded if band_links else model.decode)

    if glance_strategy is not None:
        logits1, links1, feats1 = dag_decode(
            prev_output_tokens, k_dropout, need_logits=not fused)
        if fused:
            pred1, match1 = streaming_argmax_and_match(
                feats1, W_vocab, b_vocab, tgt_tokens, fused_vocab_chunk)
            glat_info = glat_glance(
                k_glat, None, links1, tgt_tokens, prev_output_tokens,
                glat_p, vocab.pad, glance_strategy,
                pred_tokens=pred1, match=match1, sample_mask=sample_mask,
                max_transition_length=max_transition_length,
                banded_dp=banded_dp, links_banded=band_links)
        else:
            glat_info = glat_glance(
                k_glat, logits1, links1, tgt_tokens, prev_output_tokens,
                glat_p, vocab.pad, glance_strategy, sample_mask=sample_mask,
                max_transition_length=max_transition_length,
                banded_dp=banded_dp, links_banded=band_links)
        prev2 = glat_info.prev_output_tokens
        matchmask, keep_mask = glat_info.matchmask, glat_info.keep_word_mask
    else:
        glat_info = None
        prev2 = prev_output_tokens
        matchmask = keep_mask = None

    logits, links, features = dag_decode(
        prev2, k_dropout, need_logits=not fused)
    if freeze_dag is not False:
        logits = conditional_stop_gradient(logits, freeze_dag)
        links = conditional_stop_gradient(links, freeze_dag)
        features = conditional_stop_gradient(features, freeze_dag)

    match_all = None
    if fused:
        W_used = (conditional_stop_gradient(W_vocab, freeze_dag)
                  if freeze_dag is not False else W_vocab)
        match_all = fused_logsoftmax_gather(
            features, W_used, b_vocab, tgt_tokens, fused_vocab_chunk)
    dagloss, metrics, alpha, beta = compute_dag_loss(
        logits, links, tgt_tokens, prev2, vocab.pad,
        matchmask=matchmask, keep_word_mask=keep_mask,
        no_force_emit=no_force_emit, with_alpha_beta=True,
        match_all=match_all, sample_mask=sample_mask,
        max_transition_length=max_transition_length, banded_dp=banded_dp,
        links_banded=band_links)

    # ---- FastSpeech 2 over selected hidden states ----
    text_lengths = jnp.sum(tgt_tokens != vocab.pad, axis=1)
    if training_strategy == "expect":
        z = expected_features(alpha, beta, features)           # [B, T-1, D]
        z_lengths = text_lengths - 1
    elif training_strategy == "argmax":
        z, z_lengths = argmax_path_features(
            logits, links, tgt_tokens, prev2, features, vocab.pad,
            match_all=match_all, max_transition_length=max_transition_length,
            banded_dp=banded_dp, links_banded=band_links)
    else:
        raise ValueError(training_strategy)

    z_pad_mask = lengths_to_padding_mask(z_lengths, z.shape[1])
    mel_tgt = batch["target_audio"]
    M = mel_tgt.shape[1]

    tts_vars = variables
    mel, mel_post, _, log_dur_out, pitch_out, energy_out = model.apply(
        tts_vars, z, z_pad_mask, M,
        batch["durations"][:, : z.shape[1]],
        batch["pitches"][:, : z.shape[1]],
        batch["energies"][:, : z.shape[1]],
        train=train, rngs={"dropout": k_tts},
        method=model.synthesize,
        mutable=False)

    src_mask = ~z_pad_mask
    mel_mask = ~lengths_to_padding_mask(batch["target_audio_lengths"], M)
    if sample_mask is not None:
        real = sample_mask.astype(bool)
        src_mask = src_mask & real[:, None]
        mel_mask = mel_mask & real[:, None]
    tts_loss, tts_metrics = fastspeech2_losses(
        mel, mel_post, log_dur_out, pitch_out, energy_out,
        mel_tgt, batch["durations"][:, : z.shape[1]],
        batch["pitches"][:, : z.shape[1]],
        batch["energies"][:, : z.shape[1]],
        src_mask, mel_mask)

    loss = dagloss + tts_loss * tts_loss_weight
    metrics.update(tts_metrics)
    metrics["loss"] = loss
    if glat_info is not None:
        metrics["glat_accu"] = glat_info.glat_accu
        metrics["glat_keep"] = glat_info.glat_keep
    aux = {"metrics": metrics, "batch_stats": updates.get("batch_stats")}
    return loss, aux
