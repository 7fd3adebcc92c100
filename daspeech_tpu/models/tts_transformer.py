"""Autoregressive Transformer-TTS (the reference's AR baseline family).

Compact rebuild of fairseq's ``tts_transformer`` model
(``fairseq/fairseq/models/text_to_speech/tts_transformer.py``), the model
the reference's ``AutoRegressiveSpeechGenerator`` baselines drive
(``DASpeech/generator/speech_generator_modified.py:14-95``): token encoder,
mel prenet, causal decoder with cross-attention, mel + stop-logit heads,
optional postnet.

Generation runs as a full-recompute ``lax.scan`` over output frames — the
decoder forward is identical between training and inference (one compiled
program, causal mask), trading FLOPs for zero cache machinery; fine for a
baseline whose recipes never exceed ~1k mel frames.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from daspeech_tpu.models.fastspeech2 import Postnet
from daspeech_tpu.models.layers import (
    Dropout,
    Dtype,
    MultiHeadAttention,
    TransformerFFN,
    sinusoidal_embedding_table,
)


class TTSEncoderLayer(nn.Module):
    embed_dim: int
    ffn_dim: int
    num_heads: int
    dropout: float
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pad_mask, train=False):
        residual = x
        x = MultiHeadAttention(self.embed_dim, self.num_heads, self.dropout,
                               dtype=self.dtype, name="self_attn")(
            x, x, x, key_padding_mask=pad_mask, train=train)
        x = nn.LayerNorm(dtype=self.dtype, name="ln1")(x + residual)
        residual = x
        x = TransformerFFN(self.ffn_dim, self.embed_dim, "relu",
                           self.dropout, dtype=self.dtype, name="ffn")(
            x, train=train)
        return nn.LayerNorm(dtype=self.dtype, name="ln2")(x + residual)


class TTSDecoderLayer(nn.Module):
    embed_dim: int
    ffn_dim: int
    num_heads: int
    dropout: float
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, enc, enc_pad_mask, train=False):
        residual = x
        x = MultiHeadAttention(self.embed_dim, self.num_heads, self.dropout,
                               causal=True, dtype=self.dtype,
                               name="self_attn")(x, x, x, train=train)
        x = nn.LayerNorm(dtype=self.dtype, name="ln1")(x + residual)
        residual = x
        x = MultiHeadAttention(self.embed_dim, self.num_heads, self.dropout,
                               dtype=self.dtype, name="cross_attn")(
            x, enc, enc, key_padding_mask=enc_pad_mask, train=train)
        x = nn.LayerNorm(dtype=self.dtype, name="ln2")(x + residual)
        residual = x
        x = TransformerFFN(self.ffn_dim, self.embed_dim, "relu",
                           self.dropout, dtype=self.dtype, name="ffn")(
            x, train=train)
        return nn.LayerNorm(dtype=self.dtype, name="ln3")(x + residual)


class TTSTransformer(nn.Module):
    """Token -> mel AR transformer with stop prediction."""

    vocab_size: int
    pad: int = 1
    embed_dim: int = 256
    ffn_dim: int = 1024
    encoder_layers: int = 4
    decoder_layers: int = 4
    num_heads: int = 4
    dropout: float = 0.1
    prenet_dim: int = 256
    out_dim: int = 80
    add_postnet: bool = False
    dtype: Dtype = jnp.float32

    def setup(self):
        self.embed_tokens = nn.Embed(
            self.vocab_size, self.embed_dim,
            embedding_init=nn.initializers.normal(self.embed_dim ** -0.5),
            dtype=self.dtype)
        self.enc_layers = [
            TTSEncoderLayer(self.embed_dim, self.ffn_dim, self.num_heads,
                            self.dropout, dtype=self.dtype, name=f"enc_{i}")
            for i in range(self.encoder_layers)]
        self.prenet_0 = nn.Dense(self.prenet_dim, dtype=self.dtype)
        self.prenet_1 = nn.Dense(self.prenet_dim, dtype=self.dtype)
        self.prenet_proj = nn.Dense(self.embed_dim, dtype=self.dtype)
        self.prenet_dropout = Dropout(0.5)
        self.dec_layers = [
            TTSDecoderLayer(self.embed_dim, self.ffn_dim, self.num_heads,
                            self.dropout, dtype=self.dtype, name=f"dec_{i}")
            for i in range(self.decoder_layers)]
        self.mel_out = nn.Dense(self.out_dim, dtype=self.dtype)
        self.stop_out = nn.Dense(1, dtype=self.dtype)
        self.postnet = (Postnet(self.out_dim, dtype=self.dtype)
                        if self.add_postnet else None)

    def encode(self, src_tokens, train=False):
        x = self.embed_tokens(src_tokens)
        pad_mask = src_tokens == self.pad
        T = src_tokens.shape[1]
        table = sinusoidal_embedding_table(T + 2, self.embed_dim, None)
        x = x + table[None, 1: T + 1].astype(self.dtype)
        for layer in self.enc_layers:
            x = layer(x, pad_mask, train=train)
        return x, pad_mask

    def decode(self, prev_mel, enc, enc_pad_mask, train=False):
        """prev_mel: [B, T, out_dim] shifted teacher-forcing input (frame 0
        is a zero 'go' frame). Returns (mel [B,T,out], stop_logit [B,T])."""
        x = prev_mel.astype(self.dtype)
        for dense in (self.prenet_0, self.prenet_1):
            x = dense(x)
            x = jax.nn.relu(x)
            # the tacotron prenet keeps dropout at inference (fairseq too)
            x = self.prenet_dropout(x, deterministic=not train)
        x = self.prenet_proj(x)
        T = x.shape[1]
        table = sinusoidal_embedding_table(T + 2, self.embed_dim, None)
        x = x + table[None, 1: T + 1].astype(self.dtype)
        for layer in self.dec_layers:
            x = layer(x, enc, enc_pad_mask, train=train)
        mel = self.mel_out(x)
        stop = self.stop_out(x)[..., 0]
        if self.postnet is not None:
            mel = mel + self.postnet(mel, train=train)
        return mel, stop

    def __call__(self, src_tokens, prev_mel, train=False):
        enc, enc_pad = self.encode(src_tokens, train=train)
        return self.decode(prev_mel, enc, enc_pad, train=train)

    def generate(self, src_tokens, max_len: int, stop_threshold: float = 0.5):
        """AR inference: scan over output frames, recomputing the causal
        decoder over the (padded) buffer each step."""
        enc, enc_pad = self.encode(src_tokens, train=False)
        B = src_tokens.shape[0]
        buf0 = jnp.zeros((B, max_len + 1, self.out_dim), self.dtype)
        done0 = jnp.zeros((B,), bool)
        lens0 = jnp.full((B,), max_len, jnp.int32)

        def step(carry, t):
            buf, done, lens = carry
            mel, stop = self.decode(buf[:, :max_len], enc, enc_pad,
                                    train=False)
            frame = jnp.take_along_axis(
                mel, jnp.full((B, 1, 1), t), axis=1)[:, 0]
            stop_t = jnp.take_along_axis(
                stop, jnp.full((B, 1), t), axis=1)[:, 0]
            buf = jax.lax.dynamic_update_slice_in_dim(
                buf, frame[:, None, :], t + 1, axis=1)
            newly_done = (~done) & (jax.nn.sigmoid(stop_t) > stop_threshold)
            lens = jnp.where(newly_done, t + 1, lens)
            done = done | newly_done
            return (buf, done, lens), None

        (buf, done, lens), _ = jax.lax.scan(
            step, (buf0, done0, lens0), jnp.arange(max_len))
        return buf[:, 1:], lens
