"""FastSpeech 2 acoustic decoder (flax.linen), with a fully vectorized
length regulator.

TPU-native rebuild of ``fairseq/fairseq/models/text_to_speech/fastspeech2.py``
and the continuous-input variant ``DASpeech/models/fastspeech2_noemb.py``.
The reference's per-sample Python repeat loop (``fastspeech2.py:98-114``)
becomes a cumsum + searchsorted gather; the bucketize+embedding variance
adaptor maps to ``jnp.searchsorted`` + table lookups.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from daspeech_tpu.core.config import FastSpeech2Config
from daspeech_tpu.models.layers import (
    Dropout,
    Dtype,
    MultiHeadAttention,
    lengths_to_padding_mask,
)


class PositionwiseConvFFN(nn.Module):
    """Conv1d(k) -> ReLU -> Conv1d(k) + residual + LN
    (``PositionwiseFeedForward``, ``fastspeech2.py:42-70``)."""

    hidden_dim: int
    out_dim: int
    kernel_size: int
    dropout: float
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        p = (self.kernel_size - 1) // 2
        x = nn.Conv(self.hidden_dim, (self.kernel_size,), padding=[(p, p)],
                    dtype=self.dtype, name="conv1")(x)
        x = jax.nn.relu(x)
        x = nn.Conv(self.out_dim, (self.kernel_size,), padding=[(p, p)],
                    dtype=self.dtype, name="conv2")(x)
        x = Dropout(self.dropout, deterministic=not train)(x)
        return nn.LayerNorm(dtype=self.dtype, name="layer_norm")(x + residual)


class FFTLayer(nn.Module):
    """Self-attention + conv FFN (``FFTLayer``, ``fastspeech2.py:73-95``)."""

    embed_dim: int
    num_heads: int
    hidden_dim: int
    kernel_size: int
    dropout: float
    attention_dropout: float
    fused_attention: bool = True    # Pallas fused MHA on TPU (layers.py);
    #                                 the mel decoder's [B, H, M, M] scores
    #                                 are ~170 MB/layer at M=512 in XLA
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pad_mask, train: bool = False):
        residual = x
        x = MultiHeadAttention(
            self.embed_dim, self.num_heads, self.attention_dropout,
            fused=self.fused_attention,
            dtype=self.dtype, name="self_attn",
        )(x, x, x, key_padding_mask=pad_mask, train=train)
        x = nn.LayerNorm(dtype=self.dtype, name="layer_norm")(x + residual)
        return PositionwiseConvFFN(
            self.hidden_dim, self.embed_dim, self.kernel_size, self.dropout,
            dtype=self.dtype, name="ffn")(x, train=train)


class VariancePredictor(nn.Module):
    """Conv -> ReLU -> LN -> dropout (x2) -> Linear
    (``VariancePredictor``, ``fastspeech2.py:117-151``)."""

    hidden_dim: int
    kernel_size: int
    dropout: float
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = (self.kernel_size - 1) // 2
        x = nn.Conv(self.hidden_dim, (self.kernel_size,), padding=[(p, p)],
                    dtype=self.dtype, name="conv1")(x)
        x = jax.nn.relu(x)
        x = nn.LayerNorm(dtype=self.dtype, name="ln1")(x)
        x = Dropout(self.dropout, deterministic=not train)(x)
        # NOTE: the reference's second conv uses padding=1 regardless of
        # kernel size (``fastspeech2.py:131-138``); identical for k=3.
        x = nn.Conv(self.hidden_dim, (self.kernel_size,), padding=[(1, 1)],
                    dtype=self.dtype, name="conv2")(x)
        x = jax.nn.relu(x)
        x = nn.LayerNorm(dtype=self.dtype, name="ln2")(x)
        x = Dropout(self.dropout, deterministic=not train)(x)
        return nn.Dense(1, dtype=self.dtype, name="proj")(x)[..., 0]  # [B, T]


def length_regulate(
    x: jnp.ndarray, durations: jnp.ndarray, max_out_len: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Vectorized LengthRegulator (replaces the Python loop at
    ``fastspeech2.py:98-114``).

    out[b, m] = x[b, j] where j is the source index whose cumulative
    duration span covers frame m; frames beyond sum(durations) are zeros.

    Returns (out [B, M, C], out_lens [B]).
    """
    cums = jnp.cumsum(durations, axis=1)               # [B, T]
    out_lens = cums[:, -1]
    m_idx = jnp.arange(max_out_len)                    # [M]
    # idx[b, m] = #(cums[b] <= m) = searchsorted(cums[b], m, side='right')
    idx = jax.vmap(
        lambda c: jnp.searchsorted(c, m_idx, side="right"))(cums)
    idx = jnp.minimum(idx, x.shape[1] - 1)
    out = jnp.take_along_axis(x, idx[:, :, None], axis=1)
    valid = m_idx[None, :] < out_lens[:, None]
    return jnp.where(valid[:, :, None], out, 0.0), out_lens


class VarianceAdaptor(nn.Module):
    """Duration/pitch/energy predictors + length regulator
    (``VarianceAdaptor``, ``fastspeech2.py:154-216``)."""

    cfg: FastSpeech2Config
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,                      # [B, T, C]
        pad_mask: jnp.ndarray,               # [B, T] True=pad
        max_out_len: int,
        durations: Optional[jnp.ndarray] = None,
        pitches: Optional[jnp.ndarray] = None,
        energies: Optional[jnp.ndarray] = None,
        d_factor: float = 1.0,
        p_factor: float = 1.0,
        e_factor: float = 1.0,
        train: bool = False,
    ):
        c = self.cfg
        vp = lambda name: VariancePredictor(
            c.var_pred_hidden_dim, c.var_pred_kernel_size, c.var_pred_dropout,
            dtype=self.dtype, name=name)

        log_dur_out = vp("duration_predictor")(x, train=train)
        dur_out = jnp.clip(
            jnp.round((jnp.exp(log_dur_out) - 1) * d_factor), 0, None
        ).astype(jnp.int32)
        dur_out = jnp.where(pad_mask, 0, dur_out)

        n_bins = c.var_pred_n_bins
        pitch_bins = jnp.linspace(c.pitch_min, c.pitch_max, n_bins - 1)
        energy_bins = jnp.linspace(c.energy_min, c.energy_max, n_bins - 1)

        pitch_out = vp("pitch_predictor")(x, train=train)
        pitch_src = pitches if pitches is not None else pitch_out * p_factor
        pitch_emb = nn.Embed(
            n_bins, x.shape[-1],
            embedding_init=nn.initializers.normal(x.shape[-1] ** -0.5),
            dtype=self.dtype, name="embed_pitch",
        )(jnp.searchsorted(pitch_bins, pitch_src, side="right").astype(jnp.int32))
        x = x + pitch_emb

        energy_out = vp("energy_predictor")(x, train=train)
        energy_src = energies if energies is not None else energy_out * e_factor
        energy_emb = nn.Embed(
            n_bins, x.shape[-1],
            embedding_init=nn.initializers.normal(x.shape[-1] ** -0.5),
            dtype=self.dtype, name="embed_energy",
        )(jnp.searchsorted(energy_bins, energy_src, side="right").astype(jnp.int32))
        x = x + energy_emb

        use_dur = durations if durations is not None else dur_out
        x, out_lens = length_regulate(x, use_dur, max_out_len)
        return x, out_lens, log_dur_out, pitch_out, energy_out


class Postnet(nn.Module):
    """Tacotron-2 Postnet (``fairseq/.../tacotron2.py:380``): 5 conv layers,
    tanh + batchnorm, residual added by the caller."""

    in_dim: int
    conv_dim: int = 512
    kernel_size: int = 5
    layers: int = 5
    dropout: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = (self.kernel_size - 1) // 2
        for i in range(self.layers):
            last = i == self.layers - 1
            x = nn.Conv(self.in_dim if last else self.conv_dim,
                        (self.kernel_size,), padding=[(p, p)],
                        dtype=self.dtype, name=f"conv{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=self.dtype, name=f"bn{i}")(x)
            if not last:
                x = jnp.tanh(x)
            x = Dropout(self.dropout, deterministic=not train)(x)
        return x


class FastSpeech2Encoder(nn.Module):
    """Full FastSpeech2 pipeline (``FastSpeech2Encoder``,
    ``fastspeech2.py:219-324``) and its continuous-input variant
    (``fastspeech2_noemb.py:71-174``): pass ``src_tokens`` for the token
    path or ``x`` (hidden states) for the NoEmb path.
    """

    cfg: FastSpeech2Config
    vocab_size: int = 0                  # 0 -> NoEmb-only
    pad: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        src_tokens: Optional[jnp.ndarray] = None,     # [B, T] int
        x: Optional[jnp.ndarray] = None,              # [B, T, C] continuous
        enc_pad_mask: Optional[jnp.ndarray] = None,   # [B, T] (NoEmb path)
        max_out_len: int = 0,
        durations: Optional[jnp.ndarray] = None,
        pitches: Optional[jnp.ndarray] = None,
        energies: Optional[jnp.ndarray] = None,
        d_factor: float = 1.0,
        train: bool = False,
        speaker: Optional[jnp.ndarray] = None,        # [B] int speaker ids
    ):
        c = self.cfg
        if src_tokens is not None:
            x = nn.Embed(
                self.vocab_size, c.encoder_embed_dim,
                embedding_init=nn.initializers.normal(
                    c.encoder_embed_dim ** -0.5),
                dtype=self.dtype, name="embed_tokens")(src_tokens)
            enc_pad_mask = src_tokens == self.pad

        assert enc_pad_mask is not None
        T = x.shape[1]
        # sinusoidal PE indexed like fairseq PositionalEmbedding over ~pad
        from daspeech_tpu.models.layers import sinusoidal_embedding_table
        table = sinusoidal_embedding_table(
            T + self.pad + 1, c.encoder_embed_dim, self.pad)
        positions = jnp.cumsum(
            (~enc_pad_mask).astype(jnp.int32), axis=1
        ) * (~enc_pad_mask).astype(jnp.int32) + self.pad
        pos = jnp.take(table, positions, axis=0).astype(self.dtype)
        pos_alpha = self.param("pos_emb_alpha", nn.initializers.ones, (1,))
        x = x + pos_alpha * pos
        x = Dropout(c.dropout, deterministic=not train)(x)

        for i in range(c.encoder_layers):
            x = FFTLayer(
                c.encoder_embed_dim, c.encoder_heads, c.fft_hidden_dim,
                c.fft_kernel_size, c.dropout, c.attention_dropout,
                fused_attention=c.fused_attention,
                dtype=self.dtype, name=f"encoder_fft_{i}",
            )(x, enc_pad_mask, train=train)

        if c.speaker_embed_dim > 0 and c.num_speakers > 0:
            # multi-speaker conditioning (``fastspeech2.py:226-238,305-309``):
            # per-utterance speaker embedding broadcast over time, concat,
            # project back to the encoder width
            if speaker is None:
                speaker = jnp.zeros((x.shape[0],), jnp.int32)
            emb = nn.Embed(
                c.num_speakers, c.speaker_embed_dim,
                embedding_init=nn.initializers.normal(
                    c.speaker_embed_dim ** -0.5),
                dtype=self.dtype, name="embed_speaker")(speaker)  # [B, E]
            emb = jnp.broadcast_to(
                emb[:, None, :], (x.shape[0], x.shape[1], c.speaker_embed_dim))
            x = nn.Dense(c.encoder_embed_dim, dtype=self.dtype,
                         name="spk_emb_proj")(
                jnp.concatenate([x, emb], axis=-1))

        x, out_lens, log_dur_out, pitch_out, energy_out = VarianceAdaptor(
            c, dtype=self.dtype, name="var_adaptor",
        )(x, enc_pad_mask, max_out_len, durations, pitches, energies,
          d_factor=d_factor, train=train)

        dec_pad_mask = lengths_to_padding_mask(out_lens, x.shape[1])
        positions_d = jnp.cumsum(
            (~dec_pad_mask).astype(jnp.int32), axis=1
        ) * (~dec_pad_mask).astype(jnp.int32) + self.pad
        table_d = sinusoidal_embedding_table(
            x.shape[1] + self.pad + 1, c.decoder_embed_dim, self.pad)
        dec_pos_alpha = self.param(
            "dec_pos_emb_alpha", nn.initializers.ones, (1,))
        x = x + dec_pos_alpha * jnp.take(
            table_d, positions_d, axis=0).astype(self.dtype)

        for i in range(c.decoder_layers):
            x = FFTLayer(
                c.decoder_embed_dim, c.decoder_heads, c.fft_hidden_dim,
                c.fft_kernel_size, c.dropout, c.attention_dropout,
                fused_attention=c.fused_attention,
                dtype=self.dtype, name=f"decoder_fft_{i}",
            )(x, dec_pad_mask, train=train)

        out_dim = c.output_frame_dim * c.n_frames_per_step
        x = nn.Dense(out_dim, dtype=self.dtype, name="out_proj")(x)

        if c.ctc_weight > 0.0 and self.vocab_size > 0:
            # CTC auxiliary head (``fastspeech2.py:401-416``): project the
            # pre-postnet mel frames to the source vocabulary; exposed via
            # sow so the 6-tuple return stays stable (criterion applies
            # with mutable=["intermediates"] when ctc_weight > 0)
            self.sow("intermediates", "ctc_logits",
                     nn.Dense(self.vocab_size, dtype=self.dtype,
                              name="ctc_proj")(x))

        x_post = None
        if c.add_postnet:
            x_post = x + Postnet(
                out_dim, c.postnet_conv_dim, c.postnet_conv_kernel_size,
                c.postnet_layers, c.postnet_dropout,
                dtype=self.dtype, name="postnet")(x, train=train)
        return x, x_post, out_lens, log_dur_out, pitch_out, energy_out


class FFNAdapter(nn.Module):
    """DAG-hidden-state -> TTS-input adaptor (``FFNAdapter``,
    ``s2s_conformer_dag_fastspeech2.py:24-39``)."""

    hidden_dim: int
    out_dim: int
    dropout: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        x = jax.nn.relu(x)
        x = Dropout(self.dropout, deterministic=not train)(x)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="fc2")(x)
