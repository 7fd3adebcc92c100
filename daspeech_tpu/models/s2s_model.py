"""Two-pass S2ST model: Conformer-DAG linguistic first pass + FastSpeech2
acoustic second pass consuming DAG decoder hidden states.

TPU-native rebuild of ``DASpeech/models/s2s_conformer_dag_fastspeech2.py``:
the DAG sub-model produces (logits, links, features); an FFN adaptor maps
features (decoder_embed_dim) to the TTS encoder width; the FastSpeech2NoEmb
encoder synthesizes mel. Hidden-state selection (expected vs argmax-path vs
decode-path) is done by the criterion/generator, not here.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from daspeech_tpu.core.config import S2SModelConfig
from daspeech_tpu.models.dag_model import S2TConformerDAG
from daspeech_tpu.models.fastspeech2 import FastSpeech2Encoder, FFNAdapter
from daspeech_tpu.models.layers import Dtype


class S2SConformerDAGFastSpeech2(nn.Module):
    """``S2SConformerDAGFastSpeech2Model``
    (``s2s_conformer_dag_fastspeech2.py:43-354``)."""

    cfg: S2SModelConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        self.dag = S2TConformerDAG(self.cfg.dag, dtype=self.dtype)
        self.adaptor = FFNAdapter(
            self.cfg.adaptor_ffn_dim,
            self.cfg.tts.encoder_embed_dim,
            self.cfg.adaptor_dropout,
            dtype=self.dtype)
        self.tts = FastSpeech2Encoder(
            self.cfg.tts, vocab_size=0, pad=self.cfg.dag.vocab.pad,
            dtype=self.dtype)

    def encode(self, fbank, src_lengths, train: bool = False):
        return self.dag.encode(fbank, src_lengths, train=train)

    def decode(self, prev_output_tokens, enc, enc_pad,
               require_links: bool = True, train: bool = False):
        return self.dag.decode(prev_output_tokens, enc, enc_pad,
                               require_links=require_links, train=train)

    def __call__(self, fbank, src_lengths, prev_output_tokens,
                 train: bool = False):
        enc, enc_pad, _ = self.encode(fbank, src_lengths, train=train)
        return self.decode(prev_output_tokens, enc, enc_pad, train=train)

    def decode_features(self, prev_output_tokens, enc, enc_pad,
                        train: bool = False):
        """DAG decode without the vocab projection (fused-vocab loss path)."""
        return self.dag.decode_features(
            prev_output_tokens, enc, enc_pad, train=train)

    def decode_banded(self, prev_output_tokens, enc, enc_pad,
                      train: bool = False):
        """DAG decode with banded links (see ``S2TConformerDAG``)."""
        return self.dag.decode_banded(
            prev_output_tokens, enc, enc_pad, train=train)

    def decode_features_banded(self, prev_output_tokens, enc, enc_pad,
                               train: bool = False):
        """Banded links, no vocab projection (fused-vocab × banded)."""
        return self.dag.decode_features_banded(
            prev_output_tokens, enc, enc_pad, train=train)

    def forward_features(self, fbank, src_lengths, prev_output_tokens,
                         train: bool = False):
        """DAG forward without the vocab projection (fused-vocab loss path)."""
        return self.dag.forward_features(
            fbank, src_lengths, prev_output_tokens, train=train)

    def forward_banded(self, fbank, src_lengths, prev_output_tokens,
                       train: bool = False):
        """DAG forward with banded links (see ``S2TConformerDAG``)."""
        return self.dag.forward_banded(
            fbank, src_lengths, prev_output_tokens, train=train)

    def synthesize(
        self,
        features: jnp.ndarray,               # [B, M, decoder_embed_dim]
        features_pad_mask: jnp.ndarray,      # [B, M] True=pad
        max_mel_len: int,
        durations: Optional[jnp.ndarray] = None,
        pitches: Optional[jnp.ndarray] = None,
        energies: Optional[jnp.ndarray] = None,
        d_factor: float = 1.0,
        train: bool = False,
    ):
        """adaptor -> FastSpeech2NoEmb
        (``s2s_dag_fastspeech2_loss.py:300-306`` / ``s2s_nat_generator.py:242-253``)."""
        x = self.adaptor(features, train=train)
        return self.tts(
            x=x, enc_pad_mask=features_pad_mask, max_out_len=max_mel_len,
            durations=durations, pitches=pitches, energies=energies,
            d_factor=d_factor, train=train)
