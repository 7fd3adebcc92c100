"""DA-Transformer (DAG) decoder + S2T Conformer-DAG model.

TPU-native rebuild of ``DASpeech/models/s2t_conformer_dag.py`` and the NAT
decoder it builds on (``fairseq/fairseq/models/nat/
nonautoregressive_transformer.py:207-329``): a non-causal transformer decoder
over a graph of lambda * src_len vertices, plus a multi-head link predictor
whose gated logsumexp yields the DAG transition matrix.

Differences from the reference, by design:
- links are produced directly as a full [B, L, L] log-transition matrix
  (strictly upper-triangular within the graph) instead of the banded
  gather/scatter pair ``extract_valid_links``/``restore_valid_links``
  (``s2t_conformer_dag.py:140-169``); ``max_transition_length`` applies the
  same banded-softmax semantics as a mask on the full layout, and
  ``ops.links_utils``/``ops.dag_banded`` provide the banded [B, L, W] views
  and block-banded DP for small W.
- the GLAT paired forward passes share dropout rngs via explicit key reuse
  (replacing the ``torch_seed`` ctx manager, ``s2t_conformer_dag.py:39-50``).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from daspeech_tpu.core.config import DAGModelConfig
from daspeech_tpu.models.conformer import ConformerEncoder
from daspeech_tpu.models.layers import (
    Dropout,
    Dtype,
    LearnedPositionalEmbedding,
    SinusoidalPositionalEmbedding,
    TransformerDecoderLayer,
)


class GlatLinkDecoder(nn.Module):
    """NAT transformer decoder + link predictor (``GlatLinkDecoder``,
    ``s2t_conformer_dag.py:437-477``)."""

    vocab_size: int
    pad: int = 1
    embed_dim: int = 512
    ffn_dim: int = 2048
    num_layers: int = 4
    num_heads: int = 8
    dropout: float = 0.1
    attn_dropout: float = 0.1
    activation_dropout: float = 0.1
    activation: str = "gelu"
    learned_pos: bool = True
    share_input_output_embed: bool = True
    max_target_positions: int = 1024
    links_feature: str = "feature:position"
    max_transition_length: int = 99999
    fused_attention: bool = True    # Pallas fused MHA on TPU (layers.py)
    fused_links: bool = True        # Pallas link extraction (fused_links.py)
    dtype: Dtype = jnp.float32

    def setup(self):
        self.embed_tokens = nn.Embed(
            self.vocab_size, self.embed_dim,
            embedding_init=nn.initializers.normal(self.embed_dim ** -0.5),
            dtype=self.dtype)
        pos_cls = (LearnedPositionalEmbedding if self.learned_pos
                   else SinusoidalPositionalEmbedding)
        self.embed_positions = pos_cls(
            self.max_target_positions, self.embed_dim, self.pad)
        self.layers = [
            TransformerDecoderLayer(
                self.embed_dim, self.ffn_dim, self.num_heads, self.dropout,
                self.attn_dropout, self.activation_dropout, self.activation,
                fused_attention=self.fused_attention,
                dtype=self.dtype, name=f"layers_{i}")
            for i in range(self.num_layers)
        ]
        self.dropout_layer = Dropout(self.dropout)
        if not self.share_input_output_embed:
            self.output_projection = nn.Dense(
                self.vocab_size, use_bias=False, dtype=self.dtype)
        # link predictor (``GlatLinkDecoder.init_link_feature``)
        feats = self.links_feature.split(":")
        self._use_feature = "feature" in feats
        self._use_position = ("position" in feats) or ("sinposition" in feats)
        if self._use_position:
            self.link_positional = (
                LearnedPositionalEmbedding(
                    self.max_target_positions, self.embed_dim, self.pad)
                if "position" in feats else
                SinusoidalPositionalEmbedding(
                    self.max_target_positions, self.embed_dim, self.pad))
        self.query_linear = nn.Dense(self.embed_dim, dtype=self.dtype)
        self.key_linear = nn.Dense(self.embed_dim, dtype=self.dtype)
        self.gate_linear = nn.Dense(self.num_heads, dtype=self.dtype)

    def extract_features(
        self,
        prev_output_tokens: jnp.ndarray,        # [B, L]
        enc_out: jnp.ndarray,                   # [B, S, C_enc]
        enc_pad_mask: jnp.ndarray,              # [B, S]
        train: bool = False,
    ) -> jnp.ndarray:
        x = self.embed_tokens(prev_output_tokens) * math.sqrt(self.embed_dim)
        x = x + self.embed_positions(prev_output_tokens)
        x = self.dropout_layer(x, deterministic=not train)
        pad_mask = prev_output_tokens == self.pad
        for layer in self.layers:
            x = layer(x, pad_mask, enc_out, enc_pad_mask, train=train)
        return x

    def output_layer(self, features: jnp.ndarray) -> jnp.ndarray:
        if self.share_input_output_embed:
            return self.embed_tokens.attend(features)
        return self.output_projection(features)

    def extract_links(
        self,
        features: jnp.ndarray,                  # [B, L, C]
        prev_output_tokens: jnp.ndarray,        # [B, L]
        train: bool = False,
    ) -> jnp.ndarray:
        """Full-matrix equivalent of ``extract_links``
        (``s2t_conformer_dag.py:171-212``): per-head QK scores over vertex
        pairs, masked log-softmax over valid successors (j > i,
        j <= i + max_transition_length, and j < output_length), then gated
        logsumexp over heads.

        ``max_transition_length`` reproduces the banded-softmax semantics of
        the reference's ``extract_valid_links`` (``s2t_conformer_dag.py:
        140-155``): the normalizer runs over the band only. The recipe's
        99999 clamps to L-1 (a full upper triangle), making the band a
        no-op there.

        Returns links [B, L, L] float32 log-transitions (-inf invalid).
        """
        parts = []
        if self._use_feature:
            parts.append(features)
        if self._use_position:
            parts.append(self.link_positional(prev_output_tokens))
        feats = jnp.concatenate(parts, axis=-1)

        B, L, _ = features.shape
        H = self.num_heads
        dk = self.embed_dim // H

        # q/k stay in the model compute dtype (bf16 under --dtype bfloat16,
        # exactly the reference's fp16-autocast regime for this matmul —
        # ``nat_speech_to_text.py:241-291``); the einsum ACCUMULATES in f32
        # and everything downstream (softmax, gating, the DAG DP) is f32.
        q_packed = self.query_linear(feats)                  # [B, L, H*dk]
        k_packed = self.key_linear(feats)
        log_gates = jax.nn.log_softmax(
            self.gate_linear(feats).astype(jnp.float32), axis=-1)  # [B, L, H]
        out_len = jnp.sum(prev_output_tokens != self.pad, axis=-1)   # [B]

        from daspeech_tpu.ops import fused_attention as _fa
        from daspeech_tpu.ops.fused_links import (
            fused_extract_links, links_kernel_fits_vmem)

        mtl = (self.max_transition_length
               if 0 < self.max_transition_length < L - 1 else None)
        if (self.fused_links and _fa.available_spmd()
                and links_kernel_fits_vmem(L, self.embed_dim)):
            # head-streaming Pallas kernel: the [B, L, L, H] f32 scores
            # never touch HBM (147 MB/pass at the recipe shape, walked
            # several times by the XLA path below). GSPMD-safe: its
            # custom_partitioning rule shards batch dim 0.
            return fused_extract_links(
                q_packed, k_packed, log_gates, out_len,
                H, 1.0 / math.sqrt(dk), mtl)

        q = q_packed.reshape(B, L, H, dk)
        k = k_packed.reshape(B, L, H, dk)
        scores = jnp.einsum("bihd,bjhd->bijh", q, k,
                            preferred_element_type=jnp.float32) / math.sqrt(dk)
        i_idx = jnp.arange(L)[None, :, None]
        j_idx = jnp.arange(L)[None, None, :]
        valid = (j_idx > i_idx) & (j_idx < out_len[:, None, None])   # [B, L, L]
        if 0 < self.max_transition_length < L - 1:
            valid &= (j_idx - i_idx) <= self.max_transition_length

        # finite floor instead of -inf inside the differentiable region:
        # exp(-1e9 - lse) underflows to exactly 0 in f32, so valid entries
        # are numerically identical, while reverse-mode AD never sees a
        # 0 * inf from log/exp at -inf (the final mask below restores -inf).
        scores = jnp.where(valid[..., None], scores, -1e9)
        m = jax.lax.stop_gradient(jnp.max(scores, axis=2, keepdims=True))
        lse = jnp.log(jnp.sum(jnp.exp(scores - m), axis=2, keepdims=True)) + m
        log_attn = scores - lse

        combined = log_attn + log_gates[:, :, None, :]  # gate by source i
        cm = jax.lax.stop_gradient(jnp.max(combined, axis=-1, keepdims=True))
        links = jnp.log(jnp.sum(jnp.exp(combined - cm), axis=-1)) + cm[..., 0]
        return jnp.where(valid, links, -jnp.inf)

    def extract_links_banded(
        self,
        features: jnp.ndarray,                  # [B, L, C]
        prev_output_tokens: jnp.ndarray,        # [B, L]
        train: bool = False,
    ) -> jnp.ndarray:
        """Banded transitions [B, L, W] (``band[b,i,d] = log P(v_i ->
        v_{i+d+1})``) WITHOUT ever forming the [L, L] QK matrix.

        Block-banded computation: L is split into blocks of the band width
        W; row i's successors i+1..i+W live in row i's own block and the
        next one, so QK runs only on (diagonal, superdiagonal) block pairs
        — O(L * 2W * D) FLOPs instead of O(L^2 * D). At L=1024 / W=128
        that is a 4x FLOP cut on the model's dominant matmul; the DP side
        consumes the same band via ``ops/dag_banded.py``, so with
        ``--banded-dp`` the [L, L] matrix never exists anywhere (the
        reference's ``extract_valid_links`` banding,
        ``s2t_conformer_dag.py:140-155``, applied one level earlier).
        Numerically identical to ``full_to_band(extract_links(...), W)``
        (band-masked softmax normalizer, gated head logsumexp).
        """
        parts = []
        if self._use_feature:
            parts.append(features)
        if self._use_position:
            parts.append(self.link_positional(prev_output_tokens))
        feats = jnp.concatenate(parts, axis=-1)

        B, L, _ = features.shape
        H = self.num_heads
        dk = self.embed_dim // H
        W = self.max_transition_length
        if not (0 < W < L - 1):
            raise ValueError(
                f"extract_links_banded needs 0 < max_transition_length "
                f"< L-1, got {W} at L={L}")

        q = self.query_linear(feats).reshape(B, L, H, dk)
        k = self.key_linear(feats).reshape(B, L, H, dk)
        log_gates = jax.nn.log_softmax(
            self.gate_linear(feats).astype(jnp.float32), axis=-1)  # [B,L,H]

        nb = -(-L // W)                      # blocks of the band width
        Lp = nb * W
        if Lp != L:
            padz = jnp.zeros((B, Lp - L, H, dk), q.dtype)
            q = jnp.concatenate([q, padz], axis=1)
            k = jnp.concatenate([k, padz], axis=1)
        qb = q.reshape(B, nb, W, H, dk)
        kb = k.reshape(B, nb, W, H, dk)
        k_next = jnp.concatenate(
            [kb[:, 1:], jnp.zeros_like(kb[:, :1])], axis=1)
        kcat = jnp.concatenate([kb, k_next], axis=2)   # [B, nb, 2W, H, dk]
        scores = jnp.einsum(
            "bnqhd,bnkhd->bnqkh", qb, kcat,
            preferred_element_type=jnp.float32) / math.sqrt(dk)

        # local row q's band entry d sits at local column q + d + 1;
        # extract via a one-hot einsum (an MXU matmul with a matmul VJP —
        # a take_along_axis gather here costs more than the [L, L] matrix
        # it avoids, and its scatter-add backward is worse)
        sel = (jnp.arange(2 * W)[None, None, :]
               == (jnp.arange(W)[:, None, None]
                   + jnp.arange(W)[None, :, None] + 1)
               ).astype(scores.dtype)                   # [W(q), W(d), 2W(k)]
        band = jnp.einsum("bnqkh,qdk->bnqdh", scores, sel,
                          preferred_element_type=jnp.float32)
        band = band.reshape(B, Lp, W, H)[:, :L]

        out_len = jnp.sum(prev_output_tokens != self.pad, axis=-1)   # [B]
        i_idx = jnp.arange(L)[None, :, None]
        d_idx = jnp.arange(W)[None, None, :]
        j_idx = i_idx + d_idx + 1
        valid = (j_idx < L) & (j_idx < out_len[:, None, None])  # [B, L, W]

        band = jnp.where(valid[..., None], band, -1e9)
        m = jax.lax.stop_gradient(jnp.max(band, axis=2, keepdims=True))
        lse = jnp.log(jnp.sum(jnp.exp(band - m), axis=2, keepdims=True)) + m
        log_attn = band - lse

        combined = log_attn + log_gates[:, :L, None, :]
        cm = jax.lax.stop_gradient(jnp.max(combined, axis=-1, keepdims=True))
        links = jnp.log(jnp.sum(jnp.exp(combined - cm), axis=-1)) + cm[..., 0]
        return jnp.where(valid, links, -jnp.inf)


class S2TConformerDAG(nn.Module):
    """``S2TConformerDAGModel`` (``s2t_conformer_dag.py:60-435``): Conformer
    encoder + GlatLinkDecoder. ``__call__`` runs one decoding pass and
    returns (word_ins_logits, links, decoder_features); GLAT orchestration
    (two passes with shared rng) lives in the criterion."""

    cfg: DAGModelConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        e = self.cfg.encoder
        d = self.cfg.decoder
        self.encoder = ConformerEncoder(
            embed_dim=e.embed_dim, ffn_dim=e.ffn_dim, num_layers=e.num_layers,
            num_heads=e.num_heads, dropout=e.dropout,
            attn_dropout=e.attn_dropout,
            depthwise_kernel_size=e.depthwise_kernel_size,
            conv_channels=e.conv_channels,
            conv_kernel_sizes=e.conv_kernel_sizes,
            input_feat_dim=e.input_feat_dim,
            no_scale_embedding=e.no_scale_embedding,
            fused_attention=e.fused_attention, dtype=self.dtype)
        self.enc_proj = (
            nn.Dense(d.embed_dim, dtype=self.dtype)
            if e.embed_dim != d.embed_dim else None)
        self.decoder = GlatLinkDecoder(
            vocab_size=self.cfg.vocab.size, pad=self.cfg.vocab.pad,
            embed_dim=d.embed_dim, ffn_dim=d.ffn_dim,
            num_layers=d.num_layers, num_heads=d.num_heads,
            dropout=d.dropout, attn_dropout=d.attn_dropout,
            activation_dropout=d.activation_dropout, activation=d.activation,
            learned_pos=d.learned_pos,
            share_input_output_embed=d.share_input_output_embed,
            max_target_positions=d.max_target_positions,
            links_feature=d.links_feature,
            max_transition_length=d.max_transition_length,
            fused_attention=d.fused_attention,
            fused_links=d.fused_links, dtype=self.dtype)

    def encode(self, fbank, src_lengths, train: bool = False):
        enc, enc_pad, enc_lens = self.encoder(fbank, src_lengths, train=train)
        if self.enc_proj is not None:
            enc = self.enc_proj(enc)
        return enc, enc_pad, enc_lens

    def decode(self, prev_output_tokens, enc, enc_pad,
               require_links: bool = True, train: bool = False):
        features = self.decoder.extract_features(
            prev_output_tokens, enc, enc_pad, train=train)
        logits = self.decoder.output_layer(features)
        links = (self.decoder.extract_links(features, prev_output_tokens,
                                            train=train)
                 if require_links else None)
        return logits, links, features

    def decode_features(self, prev_output_tokens, enc, enc_pad,
                        train: bool = False):
        """Decode WITHOUT the vocab projection — for the streaming
        fused-vocab loss path (``ops/fused_vocab.py``), which must never
        materialize the [B, L, V] logits."""
        features = self.decoder.extract_features(
            prev_output_tokens, enc, enc_pad, train=train)
        links = self.decoder.extract_links(
            features, prev_output_tokens, train=train)
        return links, features

    def decode_banded(self, prev_output_tokens, enc, enc_pad,
                      train: bool = False):
        """Decode with BANDED link extraction: (logits, band [B, L, W],
        features). With ``--banded-dp`` the [L, L] transition matrix never
        materializes anywhere — O(L*W) links + O(L*W) DP end to end."""
        features = self.decoder.extract_features(
            prev_output_tokens, enc, enc_pad, train=train)
        logits = self.decoder.output_layer(features)
        band = self.decoder.extract_links_banded(
            features, prev_output_tokens, train=train)
        return logits, band, features

    def decode_features_banded(self, prev_output_tokens, enc, enc_pad,
                               train: bool = False):
        """Banded links WITHOUT the vocab projection: (band, features) —
        the composition of the fused-vocab (large |V|) and banded (large L)
        levers; neither the [B, L, V] logits nor the [L, L] links exist."""
        features = self.decoder.extract_features(
            prev_output_tokens, enc, enc_pad, train=train)
        band = self.decoder.extract_links_banded(
            features, prev_output_tokens, train=train)
        return band, features

    def forward_features(self, fbank, src_lengths, prev_output_tokens,
                         train: bool = False):
        """encode + :meth:`decode_features` in one call."""
        enc, enc_pad, _ = self.encode(fbank, src_lengths, train=train)
        return self.decode_features(prev_output_tokens, enc, enc_pad,
                                    train=train)

    def forward_banded(self, fbank, src_lengths, prev_output_tokens,
                       train: bool = False):
        """encode + :meth:`decode_banded` in one call."""
        enc, enc_pad, _ = self.encode(fbank, src_lengths, train=train)
        return self.decode_banded(prev_output_tokens, enc, enc_pad,
                                  train=train)

    def __call__(self, fbank, src_lengths, prev_output_tokens,
                 train: bool = False):
        enc, enc_pad, _ = self.encode(fbank, src_lengths, train=train)
        return self.decode(prev_output_tokens, enc, enc_pad,
                           require_links=True, train=train)


def graph_lengths(src_lengths: jnp.ndarray, upsample_scale: float,
                  max_positions: int) -> jnp.ndarray:
    """lambda * src_len graph size (``initialize_output_tokens_by_tokens``,
    ``s2t_conformer_dag.py:281-283``). ``src_lengths`` are *encoder-output*
    frame counts (post-4x-subsampling raw fbank frames in the S2T task feed
    raw lengths here, matching the reference which passes raw src_lengths)."""
    return jnp.clip((src_lengths * upsample_scale).astype(jnp.int32),
                    2, max_positions)


def initialize_output_tokens(
    length_tgt: jnp.ndarray, max_length: int, vocab
) -> jnp.ndarray:
    """[B] graph lengths -> [B, max_length] tokens: <bos> unk... <eos> pad...
    (``initialize_output_tokens_with_length``, ``s2t_conformer_dag.py:267-279``)."""
    B = length_tgt.shape[0]
    idx = jnp.arange(max_length)[None, :]
    toks = jnp.where(idx < length_tgt[:, None], vocab.unk, vocab.pad)
    toks = toks.at[:, 0].set(vocab.bos)
    eos_onehot = idx == (length_tgt[:, None] - 1)
    return jnp.where(eos_onehot, vocab.eos, toks).astype(jnp.int32)
