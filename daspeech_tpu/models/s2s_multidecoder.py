"""UnitY-style two-pass AR S2ST model (speech -> text -> mel).

This is the model family the reference's
``MultiDecoderSpeechGeneratorModified`` drives
(``DASpeech/generator/speech_generator_modified.py:151-306``): a speech
encoder, an autoregressive MT text decoder, an optional synthesizer encoder
over the MT decoder's hidden states, and an autoregressive (Tacotron-style)
mel decoder with stop prediction. The reference uses it for its AR S2ST
baselines; DASpeech's own model replaces both AR passes with the DAG.

Composed from the existing blocks: ConformerEncoder (first pass),
TransformerDecoderLayer with a causal mask (MT decoder), TTSEncoderLayer
stack (synthesizer encoder), and the TTSTransformer prenet/decoder/stop
machinery (second pass).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from daspeech_tpu.models.conformer import ConformerEncoder
from daspeech_tpu.models.layers import (
    Dropout,
    Dtype,
    LearnedPositionalEmbedding,
    TransformerDecoderLayer,
    sinusoidal_embedding_table,
)
from daspeech_tpu.models.tts_transformer import TTSDecoderLayer, TTSEncoderLayer


class CausalTextDecoder(nn.Module):
    """AR MT decoder: causal self-attention + cross-attention on the speech
    encoder (the ``{mt_task_name}_decoder`` of the reference flow)."""

    vocab_size: int
    pad: int = 1
    embed_dim: int = 256
    ffn_dim: int = 1024
    num_layers: int = 2
    num_heads: int = 4
    dropout: float = 0.1
    max_positions: int = 1024
    dtype: Dtype = jnp.float32

    def setup(self):
        self.embed_tokens = nn.Embed(
            self.vocab_size, self.embed_dim,
            embedding_init=nn.initializers.normal(self.embed_dim ** -0.5),
            dtype=self.dtype)
        self.embed_positions = LearnedPositionalEmbedding(
            self.max_positions, self.embed_dim, self.pad)
        self.layers = [
            TransformerDecoderLayer(
                self.embed_dim, self.ffn_dim, self.num_heads, self.dropout,
                causal=True, dtype=self.dtype, name=f"layers_{i}")
            for i in range(self.num_layers)]
        self.dropout_layer = Dropout(self.dropout)

    def extract_features(self, prev_tokens, enc, enc_pad, train=False):
        x = self.embed_tokens(prev_tokens) * math.sqrt(self.embed_dim)
        x = x + self.embed_positions(prev_tokens)
        x = self.dropout_layer(x, deterministic=not train)
        pad_mask = prev_tokens == self.pad
        for layer in self.layers:
            x = layer(x, pad_mask, enc, enc_pad, train=train)
        return x

    def __call__(self, prev_tokens, enc, enc_pad, train=False):
        features = self.extract_features(prev_tokens, enc, enc_pad,
                                         train=train)
        logits = self.embed_tokens.attend(features)
        return logits, features


class S2SMultiDecoderModel(nn.Module):
    """Two-pass AR S2ST: Conformer -> AR text decoder -> synthesizer
    encoder -> AR mel decoder + stop head."""

    vocab_size: int
    pad: int = 1
    bos: int = 0
    eos: int = 2
    encoder_embed_dim: int = 64
    encoder_layers: int = 2
    encoder_heads: int = 2
    mt_embed_dim: int = 64
    mt_layers: int = 2
    mt_heads: int = 2
    ffn_dim: int = 256
    synth_encoder_layers: int = 1
    tts_decoder_layers: int = 2
    prenet_dim: int = 64
    out_dim: int = 80
    dropout: float = 0.1
    conv_channels: int = 64
    depthwise_kernel_size: int = 7
    max_positions: int = 1024
    dtype: Dtype = jnp.float32

    def setup(self):
        self.encoder = ConformerEncoder(
            embed_dim=self.encoder_embed_dim, ffn_dim=self.ffn_dim,
            num_layers=self.encoder_layers, num_heads=self.encoder_heads,
            dropout=self.dropout, attn_dropout=self.dropout,
            conv_channels=self.conv_channels,
            depthwise_kernel_size=self.depthwise_kernel_size,
            dtype=self.dtype)
        self.enc_proj = (
            nn.Dense(self.mt_embed_dim, dtype=self.dtype)
            if self.encoder_embed_dim != self.mt_embed_dim else None)
        self.mt_decoder = CausalTextDecoder(
            vocab_size=self.vocab_size, pad=self.pad,
            embed_dim=self.mt_embed_dim, ffn_dim=self.ffn_dim,
            num_layers=self.mt_layers, num_heads=self.mt_heads,
            dropout=self.dropout, max_positions=self.max_positions,
            dtype=self.dtype)
        self.synthesizer_encoder = [
            TTSEncoderLayer(self.mt_embed_dim, self.ffn_dim, self.mt_heads,
                            self.dropout, dtype=self.dtype,
                            name=f"synth_enc_{i}")
            for i in range(self.synth_encoder_layers)]
        # second-pass AR mel decoder (TTSTransformer machinery)
        self.prenet_0 = nn.Dense(self.prenet_dim, dtype=self.dtype)
        self.prenet_1 = nn.Dense(self.prenet_dim, dtype=self.dtype)
        self.prenet_proj = nn.Dense(self.mt_embed_dim, dtype=self.dtype)
        self.prenet_dropout = Dropout(0.5)
        self.tts_layers = [
            TTSDecoderLayer(self.mt_embed_dim, self.ffn_dim, self.mt_heads,
                            self.dropout, dtype=self.dtype,
                            name=f"tts_dec_{i}")
            for i in range(self.tts_decoder_layers)]
        self.mel_out = nn.Dense(self.out_dim, dtype=self.dtype)
        self.stop_out = nn.Dense(1, dtype=self.dtype)

    # ---- pass 1
    def forward_encoder(self, fbank, src_lengths, train=False):
        enc, enc_pad, _ = self.encoder(fbank, src_lengths, train=train)
        if self.enc_proj is not None:
            enc = self.enc_proj(enc)
        return enc, enc_pad

    def mt_decode(self, prev_tokens, enc, enc_pad, train=False):
        return self.mt_decoder(prev_tokens, enc, enc_pad, train=train)

    # ---- pass 2
    def synthesize_encode(self, features, pad_mask, train=False):
        x = features
        for layer in self.synthesizer_encoder:
            x = layer(x, pad_mask, train=train)
        return x

    def tts_decode(self, prev_mel, synth, synth_pad, train=False):
        x = prev_mel.astype(self.dtype)
        for dense in (self.prenet_0, self.prenet_1):
            x = jax.nn.relu(dense(x))
            x = self.prenet_dropout(x, deterministic=not train)
        x = self.prenet_proj(x)
        T = x.shape[1]
        table = sinusoidal_embedding_table(T + 2, self.mt_embed_dim, None)
        x = x + table[None, 1: T + 1].astype(self.dtype)
        for layer in self.tts_layers:
            x = layer(x, synth, synth_pad, train=train)
        return self.mel_out(x), self.stop_out(x)[..., 0]

    def __call__(self, fbank, src_lengths, prev_tokens, prev_mel,
                 train=False):
        """Teacher-forced two-pass forward for training: returns
        (text_logits [B,T,V], mel [B,M,80], stop_logits [B,M])."""
        enc, enc_pad = self.forward_encoder(fbank, src_lengths, train=train)
        logits, features = self.mt_decode(prev_tokens, enc, enc_pad,
                                          train=train)
        pad_mask = prev_tokens == self.pad
        synth = self.synthesize_encode(features, pad_mask, train=train)
        mel, stop = self.tts_decode(prev_mel, synth, pad_mask, train=train)
        return logits, mel, stop
