"""FastSpeech2 pretraining criterion (token -> mel), recipe stage 2.

Wires the model-level :func:`fastspeech2_losses` to a full criterion over a
padded batch, mirroring ``fairseq/fairseq/criterions/fastspeech2_loss.py``
used with ``--task text_to_speech --arch fastspeech2``
(``/root/reference/README.md:262-283``).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from daspeech_tpu.losses.fastspeech2_loss import fastspeech2_losses
from daspeech_tpu.models.layers import lengths_to_padding_mask


def fastspeech2_criterion(
    model,
    params,
    batch: Dict[str, jnp.ndarray],
    rng: jax.Array,
    vocab,
    train: bool = True,
) -> Tuple[jnp.ndarray, Dict[str, Any]]:
    """batch keys: src_tokens [B, T] (phonemes, padded), target_audio
    [B, M, 80], target_audio_lengths, durations/pitches/energies [B, T]."""
    tokens = batch["src_tokens"]
    mel_tgt = batch["target_audio"]
    M = mel_tgt.shape[1]

    variables = {"params": params["params"]}
    ctc_weight = float(getattr(model.cfg, "ctc_weight", 0.0))
    out = model.apply(
        variables,
        src_tokens=tokens,
        max_out_len=M,
        durations=batch["durations"],
        pitches=batch["pitches"],
        energies=batch["energies"],
        train=train,
        speaker=batch.get("speaker"),
        rngs={"dropout": rng},
        mutable=["intermediates"] if ctc_weight > 0.0 else False,
    )
    if ctc_weight > 0.0:
        (mel, mel_post, out_lens, log_dur, pitch_out, energy_out), mut = out
    else:
        mel, mel_post, out_lens, log_dur, pitch_out, energy_out = out

    src_mask = tokens != vocab.pad
    mel_mask = ~lengths_to_padding_mask(batch["target_audio_lengths"], M)
    if "sample_mask" in batch:
        real = batch["sample_mask"].astype(bool)   # 0 = bucket-fill duplicate
        src_mask = src_mask & real[:, None]
        mel_mask = mel_mask & real[:, None]
    loss, metrics = fastspeech2_losses(
        mel, mel_post, log_dur, pitch_out, energy_out,
        mel_tgt, batch["durations"], batch["pitches"], batch["energies"],
        src_mask, mel_mask)
    if ctc_weight > 0.0:
        ctc = ctc_weight * fastspeech2_ctc_loss(
            mut["intermediates"]["ctc_logits"][0], mel_mask, tokens, src_mask)
        metrics["ctc-loss"] = ctc
        loss = loss + ctc
    metrics["loss"] = loss
    return loss, {"metrics": metrics, "batch_stats": None}


def fastspeech2_ctc_loss(
    ctc_logits: jnp.ndarray,   # [B, M, V] pre-postnet mel frames -> vocab
    mel_mask: jnp.ndarray,     # [B, M] True = valid frame (CTC input axis)
    src_tokens: jnp.ndarray,   # [B, T] phoneme labels (CTC target axis)
    src_mask: jnp.ndarray,     # [B, T] True = valid label
) -> jnp.ndarray:
    """The optional CTC term of ``FastSpeech2Loss``
    (``fastspeech2_loss.py:70-88``): ``F.ctc_loss(lprobs, src_tokens,
    input_lengths=tgt_lens, target_lengths=src_lens, reduction='mean')``
    with blank=0 (the dictionary's ``<s>``). torch's 'mean' divides each
    sentence by its label length, then averages over the batch — replicated
    here on top of optax's per-example sum.
    """
    import optax

    per_ex = optax.ctc_loss(
        ctc_logits.astype(jnp.float32),
        1.0 - mel_mask.astype(jnp.float32),
        src_tokens.astype(jnp.int32),
        1.0 - src_mask.astype(jnp.float32),
        blank_id=0)                                          # [B]
    label_lens = jnp.sum(src_mask.astype(jnp.float32), axis=1)
    real = jnp.any(src_mask, axis=1)   # sample_mask zeroes filler rows fully
    # zero_infinity=True: infeasible sentences contribute 0. optax clamps
    # impossible alignments at log_epsilon=-1e5 and returns a large FINITE
    # loss, so isfinite() can't detect them — test feasibility directly:
    # a CTC alignment exists iff input_len >= label_len + #adjacent-repeats
    # (each repeated label needs a separating blank).
    in_lens = jnp.sum(mel_mask.astype(jnp.float32), axis=1)
    adj_rep = jnp.sum(
        ((src_tokens[:, 1:] == src_tokens[:, :-1])
         & src_mask[:, 1:] & src_mask[:, :-1]).astype(jnp.float32), axis=1)
    feasible = in_lens >= label_lens + adj_rep
    per_ex = jnp.where(feasible & real & jnp.isfinite(per_ex),
                       per_ex / jnp.maximum(label_lens, 1.0), 0.0)
    return jnp.sum(per_ex) / jnp.maximum(
        jnp.sum(real.astype(jnp.float32)), 1.0)


def tts_transformer_criterion(
    model,
    params,
    batch: Dict[str, jnp.ndarray],
    rng: jax.Array,
    vocab,
    stop_weight: float = 1.0,
    train: bool = True,
) -> Tuple[jnp.ndarray, Dict[str, Any]]:
    """AR Transformer-TTS training loss (fairseq ``tacotron2`` criterion
    shape): teacher-forced L1 mel + BCE stop prediction."""
    tokens = batch["src_tokens"]
    mel_tgt = batch["target_audio"]
    lens = batch["target_audio_lengths"]
    B, M, D = mel_tgt.shape

    go = jnp.zeros((B, 1, D), mel_tgt.dtype)
    prev = jnp.concatenate([go, mel_tgt[:, :-1]], axis=1)
    mel, stop = model.apply({"params": params["params"]}, tokens, prev,
                            train=train, rngs={"dropout": rng})

    valid = ~lengths_to_padding_mask(lens, M)
    if "sample_mask" in batch:
        valid = valid & batch["sample_mask"].astype(bool)[:, None]
    l1 = jnp.sum(jnp.abs(mel - mel_tgt) * valid[:, :, None]) / jnp.maximum(
        jnp.sum(valid) * D, 1)
    stop_tgt = (jnp.arange(M)[None, :] == (lens - 1)[:, None]).astype(
        jnp.float32)
    bce = optax_sigmoid_bce(stop, stop_tgt)
    stop_loss = jnp.sum(bce * valid) / jnp.maximum(jnp.sum(valid), 1)
    loss = l1 + stop_weight * stop_loss
    return loss, {"metrics": {"loss": loss, "l1-loss": l1,
                              "stop-loss": stop_loss},
                  "batch_stats": None}


def multidecoder_criterion(
    model,
    params,
    batch: Dict[str, jnp.ndarray],
    rng: jax.Array,
    vocab,
    mt_loss_weight: float = 1.0,
    stop_weight: float = 1.0,
    train: bool = True,
) -> Tuple[jnp.ndarray, Dict[str, Any]]:
    """Two-pass UnitY-style training loss: CE on the AR text pass +
    teacher-forced L1 mel + BCE stop on the AR mel pass (the multitask
    criterion shape the reference's MultiDecoder baselines train with).

    batch keys: fbank, src_lengths, target_text [B,T] (<bos>..<eos>),
    target_audio [B,M,80], target_audio_lengths[, sample_mask].
    """
    tgt = batch["target_text"]
    mel_tgt = batch["target_audio"]
    lens = batch["target_audio_lengths"]
    B, T = tgt.shape
    M, D = mel_tgt.shape[1], mel_tgt.shape[2]

    # <eos>-prefixed shifted text input (fairseq's prev_output_tokens)
    prev_tokens = jnp.concatenate(
        [jnp.full((B, 1), vocab.eos, tgt.dtype), tgt[:, :-1]], axis=1)
    go = jnp.zeros((B, 1, D), mel_tgt.dtype)
    prev_mel = jnp.concatenate([go, mel_tgt[:, :-1]], axis=1)

    variables = {"params": params["params"]}
    if params.get("batch_stats"):
        variables["batch_stats"] = params["batch_stats"]
    out = model.apply(
        variables, batch["fbank"], batch["src_lengths"],
        prev_tokens, prev_mel, train=train, rngs={"dropout": rng},
        mutable=["batch_stats"] if train else False)
    if train:
        (logits, mel, stop), updates = out
    else:
        logits, mel, stop = out
        updates = {}

    text_valid = tgt != vocab.pad
    mel_valid = ~lengths_to_padding_mask(lens, M)
    if "sample_mask" in batch:
        real = batch["sample_mask"].astype(bool)
        text_valid = text_valid & real[:, None]
        mel_valid = mel_valid & real[:, None]

    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ce = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    mt_loss = jnp.sum(ce * text_valid) / jnp.maximum(jnp.sum(text_valid), 1)

    l1 = jnp.sum(jnp.abs(mel - mel_tgt) * mel_valid[:, :, None]) / \
        jnp.maximum(jnp.sum(mel_valid) * D, 1)
    stop_tgt = (jnp.arange(M)[None, :] == (lens - 1)[:, None]).astype(
        jnp.float32)
    bce = optax_sigmoid_bce(stop, stop_tgt)
    stop_loss = jnp.sum(bce * mel_valid) / jnp.maximum(jnp.sum(mel_valid), 1)

    loss = mt_loss_weight * mt_loss + l1 + stop_weight * stop_loss
    return loss, {"metrics": {"loss": loss, "mt-loss": mt_loss,
                              "l1-loss": l1, "stop-loss": stop_loss},
                  "batch_stats": updates.get("batch_stats")}


def optax_sigmoid_bce(logits, targets):
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    return -(targets * log_p + (1.0 - targets) * log_not_p)
