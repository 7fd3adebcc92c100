"""Import PyTorch reference checkpoints into flax parameter trees.

Needed for parity evaluation without full retraining (SURVEY.md §7 "hard
parts" #6): HiFi-GAN (``hifi-gan/models.py``), FastSpeech2 and the
Conformer-DAG models (fairseq ``.pt`` files with a ``model`` state dict).

Conventions converted here:
- weight_norm (g, v) pairs folded into plain weights (the reference itself
  removes weight norm for inference, ``models.py:118-125``)
- torch Conv1d  [out, in, k]      -> flax Conv kernel [k, in, out]
- torch ConvTranspose1d [in,out,k]-> ConvTranspose1dTorch kernel [k, in, out]
- torch Linear  [out, in]         -> flax Dense kernel [in, out]
- torch Embedding [V, D]          -> flax Embed embedding [V, D]
- torch LayerNorm weight/bias     -> flax scale/bias
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _np(t) -> np.ndarray:
    import torch

    if isinstance(t, torch.Tensor):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def fold_weight_norm(sd: Dict[str, Any], prefix: str) -> np.ndarray:
    """w = g * v / ||v|| with the norm over all dims except 0
    (torch ``weight_norm`` default dim=0)."""
    g = _np(sd[f"{prefix}.weight_g"])
    v = _np(sd[f"{prefix}.weight_v"])
    axes = tuple(range(1, v.ndim))
    norm = np.sqrt((v ** 2).sum(axis=axes, keepdims=True))
    return g * v / np.maximum(norm, 1e-12)


def conv_w(w: np.ndarray) -> np.ndarray:
    """torch Conv1d [out, in, k] -> flax [k, in, out]."""
    return np.transpose(w, (2, 1, 0))


def convT_w(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose1d [in, out, k] -> [k, in, out]."""
    return np.transpose(w, (2, 0, 1))


def dense_w(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


def import_hifigan(sd: Dict[str, Any], cfg) -> Dict[str, Any]:
    """torch ``Generator.state_dict()`` -> params for
    :class:`daspeech_tpu.models.hifigan.HiFiGANGenerator`."""
    p: Dict[str, Any] = {}

    def conv_entry(prefix):
        return {"kernel": conv_w(fold_weight_norm(sd, prefix)),
                "bias": _np(sd[f"{prefix}.bias"])}

    p["conv_pre"] = conv_entry("conv_pre")
    p["conv_post"] = conv_entry("conv_post")
    for i in range(len(cfg.upsample_rates)):
        p[f"ups_{i}"] = {
            "kernel": convT_w(fold_weight_norm(sd, f"ups.{i}")),
            "bias": _np(sd[f"ups.{i}.bias"]),
        }
    num_kernels = len(cfg.resblock_kernel_sizes)
    n_blocks = len(cfg.upsample_rates) * num_kernels
    for n in range(n_blocks):
        block: Dict[str, Any] = {}
        if cfg.resblock == "1":
            for j in range(len(cfg.resblock_dilation_sizes[n % num_kernels])):
                block[f"convs1_{j}"] = conv_entry(f"resblocks.{n}.convs1.{j}")
                block[f"convs2_{j}"] = conv_entry(f"resblocks.{n}.convs2.{j}")
        else:
            for j in range(len(cfg.resblock_dilation_sizes[n % num_kernels])):
                block[f"convs_{j}"] = conv_entry(f"resblocks.{n}.convs.{j}")
        p[f"resblocks_{n}"] = block
    return {"params": p}


def _mha(sd, prefix):
    out = {}
    for name in ("q_proj", "k_proj", "v_proj", "out_proj"):
        out[name] = {
            "kernel": dense_w(_np(sd[f"{prefix}.{name}.weight"])),
            "bias": _np(sd[f"{prefix}.{name}.bias"]),
        }
    return out


def _ln(sd, prefix):
    return {"scale": _np(sd[f"{prefix}.weight"]),
            "bias": _np(sd[f"{prefix}.bias"])}


def _conv(sd, prefix):
    return {"kernel": conv_w(_np(sd[f"{prefix}.weight"])),
            "bias": _np(sd[f"{prefix}.bias"])}


def _dense(sd, prefix, bias=True):
    d = {"kernel": dense_w(_np(sd[f"{prefix}.weight"]))}
    if bias and f"{prefix}.bias" in sd:
        d["bias"] = _np(sd[f"{prefix}.bias"])
    return d


def import_fastspeech2(sd: Dict[str, Any], cfg,
                       prefix: str = "encoder") -> Dict[str, Any]:
    """fairseq ``FastSpeech2Encoder``/``FastSpeech2EncoderNoEmb`` state dict
    -> params for :class:`...fastspeech2.FastSpeech2Encoder`.

    ``prefix`` is the torch-side module prefix ('encoder' for a standalone
    fastspeech2 checkpoint, 'tts' inside the joint S2S model).
    """
    P = lambda s: f"{prefix}.{s}" if prefix else s
    p: Dict[str, Any] = {
        "pos_emb_alpha": _np(sd[P("pos_emb_alpha")]),
        "dec_pos_emb_alpha": _np(sd[P("dec_pos_emb_alpha")]),
        "out_proj": _dense(sd, P("out_proj")),
    }
    if P("embed_tokens.weight") in sd:
        p["embed_tokens"] = {"embedding": _np(sd[P("embed_tokens.weight")])}

    def fft(prefix_t):
        return {
            "self_attn": _mha(sd, f"{prefix_t}.self_attn"),
            "layer_norm": _ln(sd, f"{prefix_t}.layer_norm"),
            "ffn": {
                "conv1": _conv(sd, f"{prefix_t}.ffn.ffn.0"),
                "conv2": _conv(sd, f"{prefix_t}.ffn.ffn.2"),
                "layer_norm": _ln(sd, f"{prefix_t}.ffn.layer_norm"),
            },
        }

    for i in range(cfg.encoder_layers):
        p[f"encoder_fft_{i}"] = fft(P(f"encoder_fft_layers.{i}"))
    for i in range(cfg.decoder_layers):
        p[f"decoder_fft_{i}"] = fft(P(f"decoder_fft_layers.{i}"))

    def vp(prefix_t):
        return {
            "conv1": _conv(sd, f"{prefix_t}.conv1.0"),
            "ln1": _ln(sd, f"{prefix_t}.ln1"),
            "conv2": _conv(sd, f"{prefix_t}.conv2.0"),
            "ln2": _ln(sd, f"{prefix_t}.ln2"),
            "proj": _dense(sd, f"{prefix_t}.proj"),
        }

    va = P("var_adaptor")
    p["var_adaptor"] = {
        "duration_predictor": vp(f"{va}.duration_predictor"),
        "pitch_predictor": vp(f"{va}.pitch_predictor"),
        "energy_predictor": vp(f"{va}.energy_predictor"),
        "embed_pitch": {"embedding": _np(sd[f"{va}.embed_pitch.weight"])},
        "embed_energy": {"embedding": _np(sd[f"{va}.embed_energy.weight"])},
    }
    return {"params": p}


def import_conformer_layer(sd: Dict[str, Any], prefix: str) -> Dict[str, Any]:
    """One fairseq ``ConformerEncoderLayer`` (espnet rel_pos attention) ->
    params/batch_stats for :class:`...conformer.ConformerEncoderLayer`."""
    P = lambda s: f"{prefix}.{s}" if prefix else s

    def ffn(p):
        return {
            "layer_norm": _ln(sd, f"{p}.layer_norm"),
            "w_1": _dense(sd, f"{p}.w_1"),
            "w_2": _dense(sd, f"{p}.w_2"),
        }

    attn = {
        "linear_q": _dense(sd, P("self_attn.linear_q")),
        "linear_k": _dense(sd, P("self_attn.linear_k")),
        "linear_v": _dense(sd, P("self_attn.linear_v")),
        "linear_out": _dense(sd, P("self_attn.linear_out")),
        "linear_pos": _dense(sd, P("self_attn.linear_pos")),
        "pos_bias_u": _np(sd[P("self_attn.pos_bias_u")]),
        "pos_bias_v": _np(sd[P("self_attn.pos_bias_v")]),
    }
    # torch Conv1d k=1 [out, in, 1] -> Dense [in, out]
    pw1 = _np(sd[P("conv_module.pointwise_conv1.weight")])[:, :, 0].T
    pw2 = _np(sd[P("conv_module.pointwise_conv2.weight")])[:, :, 0].T
    dw = np.transpose(_np(sd[P("conv_module.depthwise_conv.weight")]),
                      (2, 1, 0))                      # [C,1,k] -> [k,1,C]
    conv_module = {
        "layer_norm": _ln(sd, P("conv_module.layer_norm")),
        "pointwise_conv1": {"kernel": pw1},
        "depthwise_conv": {"kernel": dw},
        "batch_norm": {
            "scale": _np(sd[P("conv_module.batch_norm.weight")]),
            "bias": _np(sd[P("conv_module.batch_norm.bias")]),
        },
        "pointwise_conv2": {"kernel": pw2},
    }
    params = {
        "ffn1": ffn(P("ffn1")),
        "ffn2": ffn(P("ffn2")),
        "self_attn_layer_norm": _ln(sd, P("self_attn_layer_norm")),
        "self_attn": attn,
        "conv_module": conv_module,
        "final_layer_norm": _ln(sd, P("final_layer_norm")),
    }
    batch_stats = {
        "conv_module": {"batch_norm": {
            "mean": _np(sd[P("conv_module.batch_norm.running_mean")]),
            "var": _np(sd[P("conv_module.batch_norm.running_var")]),
        }},
    }
    return {"params": params, "batch_stats": batch_stats}


def import_dag_decoder(sd: Dict[str, Any], num_layers: int,
                       prefix: str = "decoder",
                       tied_embeddings: bool = True) -> Dict[str, Any]:
    """``GlatLinkDecoder`` state dict (``s2t_conformer_dag.py:437-477`` on a
    fairseq ``NATransformerDecoder``) -> params for
    :class:`daspeech_tpu.models.dag_model.GlatLinkDecoder`.

    Covers: token/positional embeddings, the non-causal transformer layers
    (self_attn, encoder_attn, FFN), the link predictor (link_positional +
    query/key/gate linears), and the untied output projection when present.
    The NAT base class's unused ``embed_length`` head is skipped.
    """
    P = lambda s: f"{prefix}.{s}" if prefix else s
    p: Dict[str, Any] = {
        "embed_tokens": {"embedding": _np(sd[P("embed_tokens.weight")])},
        "embed_positions": {"embedding": _np(sd[P("embed_positions.weight")])},
        "query_linear": _dense(sd, P("query_linear")),
        "key_linear": _dense(sd, P("key_linear")),
        "gate_linear": _dense(sd, P("gate_linear")),
    }
    if P("link_positional.weight") in sd:
        p["link_positional"] = {
            "embedding": _np(sd[P("link_positional.weight")])}
    if not tied_embeddings and P("output_projection.weight") in sd:
        p["output_projection"] = _dense(sd, P("output_projection"))

    for i in range(num_layers):
        lp = P(f"layers.{i}")
        p[f"layers_{i}"] = {
            "self_attn": _mha(sd, f"{lp}.self_attn"),
            "self_attn_layer_norm": _ln(sd, f"{lp}.self_attn_layer_norm"),
            "encoder_attn": _mha(sd, f"{lp}.encoder_attn"),
            "encoder_attn_layer_norm": _ln(
                sd, f"{lp}.encoder_attn_layer_norm"),
            "ffn": {"fc1": _dense(sd, f"{lp}.fc1"),
                    "fc2": _dense(sd, f"{lp}.fc2")},
            "final_layer_norm": _ln(sd, f"{lp}.final_layer_norm"),
        }
    return {"params": p}


def import_s2t_conformer_dag(sd: Dict[str, Any], enc_layers: int,
                             dec_layers: int,
                             tied_embeddings: bool = True) -> Dict[str, Any]:
    """Full ``S2TConformerDAGModel`` ``model`` state dict -> variables for
    :class:`...dag_model.S2TConformerDAG` (the stage-1 checkpoint loaded by
    ``s2s_conformer_dag_fastspeech2.py:66-70``).

    Dimension bridge: the reference's 256-d encoder feeds 512-d decoder
    cross-attention through per-layer ``kdim``/``vdim`` projections; here an
    ``enc_proj`` zero-pads the encoder output to the decoder width (kernel =
    [I; 0]) and the per-layer k/v kernels get matching zero rows — an exact
    reparameterization, verified by the parity test.
    """
    enc = import_conformer_encoder(sd, enc_layers, prefix="encoder")
    dec = import_dag_decoder(sd, dec_layers, prefix="decoder",
                             tied_embeddings=tied_embeddings)
    params = {"encoder": enc["params"], "decoder": dec["params"]}
    batch_stats = {"encoder": enc["batch_stats"]}

    # infer dims from the weights themselves
    enc_dim = _np(sd["encoder.linear.weight"]).shape[0]
    dec_dim = _np(sd["decoder.embed_tokens.weight"]).shape[1]
    if enc_dim != dec_dim:
        params["enc_proj"] = pad_cross_attention_kv(
            params["decoder"], dec_layers, enc_dim, dec_dim)
    return {"params": params, "batch_stats": batch_stats}


def pad_cross_attention_kv(dec_params: Dict[str, Any], dec_layers: int,
                           enc_dim: int, dec_dim: int) -> Dict[str, Any]:
    """Zero-pad per-layer cross-attention k/v kernels from ``enc_dim`` to
    ``dec_dim`` input rows (in place) and return the matching identity-pad
    ``enc_proj`` params. Exact reparameterization of fairseq's
    kdim/vdim-typed encoder_attn."""
    for i in range(dec_layers):
        ea = dec_params[f"layers_{i}"]["encoder_attn"]
        for name in ("k_proj", "v_proj"):
            w = ea[name]["kernel"]                         # [enc_dim, dec_dim]
            padded = np.zeros((dec_dim, w.shape[1]), w.dtype)
            padded[:enc_dim] = w
            ea[name]["kernel"] = padded
    eye = np.zeros((enc_dim, dec_dim), np.float32)
    eye[:enc_dim, :enc_dim] = np.eye(enc_dim, dtype=np.float32)
    return {"kernel": eye, "bias": np.zeros((dec_dim,), np.float32)}


def import_s2s_daspeech(sd: Dict[str, Any], enc_layers: int, dec_layers: int,
                        tts_cfg, tied_embeddings: bool = True
                        ) -> Dict[str, Any]:
    """Full ``S2SConformerDAGFastSpeech2Model`` ``model`` state dict ->
    variables for :class:`...s2s_model.S2SConformerDAGFastSpeech2`
    (released DASpeech .pt layout: encoder./decoder./adaptor./tts.* —
    ``s2s_conformer_dag_fastspeech2.py:43-100``)."""
    dag = import_s2t_conformer_dag(sd, enc_layers, dec_layers,
                                   tied_embeddings=tied_embeddings)
    adaptor = {"fc1": _dense(sd, "adaptor.fc1"),
               "fc2": _dense(sd, "adaptor.fc2")}
    tts = import_fastspeech2(sd, tts_cfg, prefix="tts")
    return {
        "params": {"dag": dag["params"], "adaptor": adaptor,
                   "tts": tts["params"]},
        "batch_stats": {"dag": dag["batch_stats"]},
    }


def import_conformer_encoder(sd: Dict[str, Any], num_layers: int,
                             prefix: str = "encoder") -> Dict[str, Any]:
    """Full ``S2TConformerEncoder`` state dict -> params for
    :class:`...conformer.ConformerEncoder`."""
    P = lambda s: f"{prefix}.{s}" if prefix else s
    params: Dict[str, Any] = {
        "linear": _dense(sd, P("linear")),
        "subsample": {
            f"conv{i}": _conv(sd, P(f"subsample.conv_layers.{i}"))
            for i in range(2)
        },
    }
    batch_stats: Dict[str, Any] = {}
    for i in range(num_layers):
        layer = import_conformer_layer(sd, P(f"conformer_layers.{i}"))
        params[f"layers_{i}"] = layer["params"]
        batch_stats[f"layers_{i}"] = layer["batch_stats"]
    return {"params": params, "batch_stats": batch_stats}
