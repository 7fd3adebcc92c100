"""Typed configuration tree (replaces the reference's argparse + hydra +
per-dataset YAML triplex — ``fairseq/fairseq/dataclass/configs.py``).

Every model/loss/task reads plain frozen dataclasses; YAML round-trip via
``to_dict``/``from_dict``. Defaults mirror the CVSS-C fr-en recipe
(``/root/reference/README.md:224-323``).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple


@dataclass(frozen=True)
class VocabConfig:
    size: int = 200
    bos: int = 0
    pad: int = 1
    eos: int = 2
    unk: int = 3


@dataclass(frozen=True)
class ConformerConfig:
    """Encoder (``README.md:235``: 12L x 256d, ffn 2048, 4 heads)."""
    embed_dim: int = 256
    ffn_dim: int = 2048
    num_layers: int = 12
    num_heads: int = 4
    dropout: float = 0.1
    attn_dropout: float = 0.1
    depthwise_kernel_size: int = 31
    conv_channels: int = 1024
    conv_kernel_sizes: Tuple[int, ...] = (5, 5)
    input_feat_dim: int = 80
    no_scale_embedding: bool = False
    max_source_positions: int = 6000
    # Pallas fused rel-pos attention (ops/fused_relpos.py). The module
    # self-gates: below T'=KERNEL_MIN_T (256) the XLA rotation path is
    # faster and runs instead (the recipe's post-subsample T'~120 lands
    # there); long-input configs (T'>=256, e.g. un-bucketed inference)
    # take the kernel, measured -28% at T'=512. Safe to leave on.
    fused_attention: bool = True


@dataclass(frozen=True)
class DAGDecoderConfig:
    """DAG (DA-Transformer) decoder (``README.md:236``: 4L x 512d)."""
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
    src_upsample_scale: float = 0.5
    # Pallas fused attention (QK^T->mask->softmax->dropout->V in one VMEM
    # kernel, ops/fused_attention.py); TPU-only, auto-fallback elsewhere
    fused_attention: bool = True
    # Pallas head-streaming link extraction (ops/fused_links.py); same
    # TPU-only auto-fallback — the escape hatch for A/B and debugging
    fused_links: bool = True


@dataclass(frozen=True)
class DecodeConfig:
    """``s2t_conformer_dag.py:125-138`` decode flags."""
    strategy: str = "lookahead"      # greedy|lookahead|viterbi|jointviterbi|beamsearch
    beta: float = 1.0                # logit scale (decode_beta)
    viterbibeta: float = 1.0         # length penalty for (joint)viterbi
    alpha: float = 1.1               # beam-search length penalty
    gamma: float = 0.1               # beam-search LM weight
    top_cand_n: int = 5
    beamsize: int = 100
    max_beam_per_length: int = 10
    top_p: float = 0.9
    dedup: bool = False
    max_output_length: Optional[int] = None
    # NAT length beam (``iter_decode_with_beam``): decode `length_beam`
    # graph sizes around lambda*src_len and keep the best-scoring candidate
    # (``s2t_nat_generator.py:59-76,212-230``). Recipes use 1.
    length_beam: int = 1
    # Iterative refinement (``s2t_nat_generator.py:120-215``): feed the
    # decoded tokens back as the next graph input for up to `max_iter`
    # extra passes; unless `force_max_iter`, a sample terminates as soon
    # as its output equals its input (the reference's ``is_a_loop``
    # adaptive check). Every DASpeech recipe decodes single-pass (0).
    iter_decode_max_iter: int = 0
    iter_decode_force_max_iter: bool = False


@dataclass(frozen=True)
class FastSpeech2Config:
    """``README.md:272-276,300-302``: 4+4L x 256d, fft hidden 1024."""
    encoder_layers: int = 4
    encoder_embed_dim: int = 256
    encoder_heads: int = 4
    decoder_layers: int = 4
    decoder_embed_dim: int = 256
    decoder_heads: int = 4
    fft_hidden_dim: int = 1024
    fft_kernel_size: int = 9
    dropout: float = 0.2
    attention_dropout: float = 0.0
    output_frame_dim: int = 80
    n_frames_per_step: int = 1
    var_pred_n_bins: int = 256
    var_pred_hidden_dim: int = 256
    var_pred_kernel_size: int = 3
    var_pred_dropout: float = 0.5
    pitch_min: float = 0.0
    pitch_max: float = 600.0
    energy_min: float = 0.0
    energy_max: float = 5000.0
    add_postnet: bool = False
    postnet_layers: int = 5
    postnet_conv_dim: int = 512
    postnet_conv_kernel_size: int = 5
    postnet_dropout: float = 0.5
    # Pallas fused MHA for the FFT blocks (layers.py packed kernel);
    # TPU-only with auto-fallback, and the kernel self-gates by VMEM fit
    # (packed_fits_vmem crosses its 10 MB budget at M~800 frames for the
    # 256d/4-head decoder — longer mels fall back to XLA automatically)
    fused_attention: bool = True
    speaker_embed_dim: int = 64      # used only when num_speakers > 0
    num_speakers: int = 0            # 0 = single-speaker (no embedding)
    # optional CTC auxiliary (``fastspeech2.py:401-416``): mel frames ->
    # source phonemes via a ctc_proj head; 0.0 (all recipes) disables it
    ctc_weight: float = 0.0
    max_positions: int = 4096
    mel_mult: int = 8                # padded mel buckets: multiple of this


@dataclass(frozen=True)
class TTSTransformerConfig:
    """AR Transformer-TTS baseline (fairseq ``tts_transformer``), driven by
    the ``at_tts`` generator type (``generate_features.py:29-61``)."""
    embed_dim: int = 256
    ffn_dim: int = 1024
    encoder_layers: int = 4
    decoder_layers: int = 4
    num_heads: int = 4
    dropout: float = 0.1
    prenet_dim: int = 256
    out_dim: int = 80
    add_postnet: bool = False


@dataclass(frozen=True)
class MultiDecoderConfig:
    """UnitY-style two-pass AR S2ST baseline
    (``speech_generator_modified.py:151-306`` / the ``at_s2s`` generator)."""
    encoder_embed_dim: int = 256
    encoder_layers: int = 12
    encoder_heads: int = 4
    mt_embed_dim: int = 256
    mt_layers: int = 4
    mt_heads: int = 4
    ffn_dim: int = 1024
    synth_encoder_layers: int = 2
    tts_decoder_layers: int = 4
    prenet_dim: int = 256
    out_dim: int = 80
    dropout: float = 0.1
    conv_channels: int = 256
    depthwise_kernel_size: int = 31
    max_positions: int = 1024


@dataclass(frozen=True)
class HiFiGANConfig:
    """config_v1 (``/root/reference/hifi-gan/config_v1.json``)."""
    resblock: str = "1"
    upsample_rates: Tuple[int, ...] = (8, 8, 2, 2)
    upsample_kernel_sizes: Tuple[int, ...] = (16, 16, 4, 4)
    upsample_initial_channel: int = 512
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilation_sizes: Tuple[Tuple[int, ...], ...] = (
        (1, 3, 5), (1, 3, 5), (1, 3, 5))
    num_mels: int = 80
    sampling_rate: int = 22050
    hop_size: int = 256


@dataclass(frozen=True)
class DAGModelConfig:
    vocab: VocabConfig = field(default_factory=VocabConfig)
    encoder: ConformerConfig = field(default_factory=ConformerConfig)
    decoder: DAGDecoderConfig = field(default_factory=DAGDecoderConfig)
    decode: DecodeConfig = field(default_factory=DecodeConfig)


@dataclass(frozen=True)
class S2SModelConfig:
    """``s2s_conformer_dag_fastspeech2`` (``README.md:291-303``)."""
    dag: DAGModelConfig = field(default_factory=DAGModelConfig)
    tts: FastSpeech2Config = field(default_factory=FastSpeech2Config)
    adaptor_ffn_dim: int = 1024
    adaptor_dropout: float = 0.1


@dataclass(frozen=True)
class GlatConfig:
    """Glancing training (``nat_dag_loss.py:60-67``)."""
    p_schedule: str = "0.5:0.1@100k"
    strategy: Optional[str] = "number-random"   # None | number-random | cmlm
    no_force_emit: bool = False


@dataclass(frozen=True)
class TrainingConfig:
    lr: float = 5e-4
    warmup_updates: int = 10000
    warmup_init_lr: float = 1e-7
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    weight_decay: float = 0.01
    clip_norm: float = 1.0
    max_update: int = 100000
    update_freq: int = 1
    seed: int = 1
    label_smoothing: float = 0.0
    glat: GlatConfig = field(default_factory=GlatConfig)
    tts_loss_weight: float = 5.0
    dag_freezing_steps: int = -1
    training_strategy: str = "expect"   # expect | argmax


def to_dict(cfg: Any) -> Dict[str, Any]:
    return dataclasses.asdict(cfg)


def _build(cls, data: Dict[str, Any]):
    kwargs = {}
    for f in dataclasses.fields(cls):
        if f.name not in data:
            continue
        v = data[f.name]
        if dataclasses.is_dataclass(f.type) and isinstance(v, dict):
            v = _build(f.type, v)
        elif isinstance(v, list):
            v = tuple(tuple(e) if isinstance(e, list) else e for e in v)
        kwargs[f.name] = v
    return cls(**kwargs)


def from_dict(cls, data: Dict[str, Any]):
    """Rebuild a (nested) config dataclass from a plain dict (e.g. YAML)."""
    import typing

    hints = typing.get_type_hints(cls)

    kwargs = {}
    for f in dataclasses.fields(cls):
        if f.name not in data:
            continue
        v = data[f.name]
        tp = hints.get(f.name, f.type)
        if dataclasses.is_dataclass(tp) and isinstance(v, dict):
            v = from_dict(tp, v)
        elif isinstance(v, list):
            v = tuple(tuple(e) if isinstance(e, list) else e for e in v)
        kwargs[f.name] = v
    return cls(**kwargs)
