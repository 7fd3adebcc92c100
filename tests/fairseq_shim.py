"""Load the reference fairseq's FastSpeech2 modules without importing the
fairseq package (whose dataclass config tree breaks on python >= 3.12).

Strategy: register a stub ``fairseq`` package in sys.modules with minimal
glue (registries, base classes, lengths_to_padding_mask), then execute the
*real* module files that carry numerics — utils, fairseq_dropout,
quant_noise, layer_norm, multihead_attention, positional embeddings,
tacotron2 (Postnet), fastspeech2 — by path.
"""

import importlib.util
import sys
import types
from pathlib import Path

REF = Path("/root/reference/fairseq")


def _load_real(name: str, relpath: str):
    spec = importlib.util.spec_from_file_location(name, REF / relpath)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def install() -> types.ModuleType:
    """Install the shim; returns the real ``fastspeech2`` module."""
    if "fairseq.models.text_to_speech.fastspeech2" in sys.modules:
        return sys.modules["fairseq.models.text_to_speech.fastspeech2"]

    import torch
    import torch.nn as nn

    # ---- package roots
    fairseq = types.ModuleType("fairseq")
    fairseq.__path__ = [str(REF / "fairseq")]
    sys.modules["fairseq"] = fairseq

    # ---- real numerics-bearing leaves (ordered by dependency)
    utils = _load_real("fairseq.utils", "fairseq/utils.py")
    fairseq.utils = utils

    modules_pkg = types.ModuleType("fairseq.modules")
    sys.modules["fairseq.modules"] = modules_pkg
    fairseq.modules = modules_pkg

    fd = _load_real("fairseq.modules.fairseq_dropout",
                    "fairseq/modules/fairseq_dropout.py")
    qn = _load_real("fairseq.modules.quant_noise",
                    "fairseq/modules/quant_noise.py")

    # FairseqIncrementalDecoder is only used for incremental-state typing
    models_pkg = types.ModuleType("fairseq.models")
    sys.modules["fairseq.models"] = models_pkg
    fairseq.models = models_pkg

    class FairseqEncoder(nn.Module):
        def __init__(self, dictionary):
            super().__init__()
            self.dictionary = dictionary

    class FairseqEncoderModel(nn.Module):
        def __init__(self, encoder):
            super().__init__()
            self.encoder = encoder

    class FairseqDecoder(nn.Module):
        def __init__(self, dictionary):
            super().__init__()
            self.dictionary = dictionary

    idu = _load_real("fairseq.incremental_decoding_utils",
                     "fairseq/incremental_decoding_utils.py")
    fairseq.incremental_decoding_utils = idu

    @idu.with_incremental_state
    class FairseqIncrementalDecoder(FairseqDecoder):
        pass

    class FairseqEncoderDecoderModel(nn.Module):
        def __init__(self, encoder, decoder):
            super().__init__()
            self.encoder = encoder
            self.decoder = decoder

    def register_model(name):
        return lambda cls: cls

    def register_model_architecture(model, arch):
        return lambda fn: fn

    models_pkg.FairseqEncoder = FairseqEncoder
    models_pkg.FairseqEncoderModel = FairseqEncoderModel
    models_pkg.FairseqEncoderDecoderModel = FairseqEncoderDecoderModel
    models_pkg.FairseqDecoder = FairseqDecoder
    models_pkg.FairseqIncrementalDecoder = FairseqIncrementalDecoder
    models_pkg.register_model = register_model
    models_pkg.register_model_architecture = register_model_architecture

    fid = types.ModuleType("fairseq.models.fairseq_incremental_decoder")
    fid.FairseqIncrementalDecoder = FairseqIncrementalDecoder
    sys.modules["fairseq.models.fairseq_incremental_decoder"] = fid

    ln = _load_real("fairseq.modules.layer_norm",
                    "fairseq/modules/layer_norm.py")
    lstm = _load_real("fairseq.modules.lstm_cell_with_zoneout",
                      "fairseq/modules/lstm_cell_with_zoneout.py")
    loca = _load_real("fairseq.modules.location_attention",
                      "fairseq/modules/location_attention.py")
    mha = _load_real("fairseq.modules.multihead_attention",
                     "fairseq/modules/multihead_attention.py")
    lpe = _load_real("fairseq.modules.learned_positional_embedding",
                     "fairseq/modules/learned_positional_embedding.py")
    spe = _load_real("fairseq.modules.sinusoidal_positional_embedding",
                     "fairseq/modules/sinusoidal_positional_embedding.py")
    pe = _load_real("fairseq.modules.positional_embedding",
                    "fairseq/modules/positional_embedding.py")

    modules_pkg.FairseqDropout = fd.FairseqDropout
    modules_pkg.LayerNorm = ln.LayerNorm
    modules_pkg.LSTMCellWithZoneOut = lstm.LSTMCellWithZoneOut
    modules_pkg.LocationAttention = loca.LocationAttention
    modules_pkg.MultiheadAttention = mha.MultiheadAttention
    modules_pkg.PositionalEmbedding = pe.PositionalEmbedding

    # ---- data utils: only lengths_to_padding_mask is needed
    data_pkg = types.ModuleType("fairseq.data")
    sys.modules["fairseq.data"] = data_pkg
    data_utils = types.ModuleType("fairseq.data.data_utils")

    def lengths_to_padding_mask(lens):
        bsz, max_lens = lens.size(0), torch.max(lens).item()
        mask = torch.arange(int(max_lens)).to(lens.device).view(1, int(max_lens))
        return mask.expand(bsz, -1) >= lens.view(bsz, 1).expand(-1, int(max_lens))

    data_utils.lengths_to_padding_mask = lengths_to_padding_mask
    sys.modules["fairseq.data.data_utils"] = data_utils
    data_pkg.data_utils = data_utils

    tts_pkg = types.ModuleType("fairseq.models.text_to_speech")
    sys.modules["fairseq.models.text_to_speech"] = tts_pkg

    hub = types.ModuleType("fairseq.models.text_to_speech.hub_interface")

    class TTSHubInterface:  # glue only
        def __init__(self, *a, **k):
            pass

    hub.TTSHubInterface = TTSHubInterface
    sys.modules["fairseq.models.text_to_speech.hub_interface"] = hub

    tac = _load_real("fairseq.models.text_to_speech.tacotron2",
                     "fairseq/models/text_to_speech/tacotron2.py")
    fs2 = _load_real("fairseq.models.text_to_speech.fastspeech2",
                     "fairseq/models/text_to_speech/fastspeech2.py")

    # ---- conformer stack (for encoder parity tests)
    gelu_mod = _load_real("fairseq.modules.gelu", "fairseq/modules/gelu.py")
    modules_pkg.gelu = gelu_mod.gelu
    modules_pkg.gelu_accurate = gelu_mod.gelu_accurate
    rot = _load_real("fairseq.modules.rotary_positional_embedding",
                     "fairseq/modules/rotary_positional_embedding.py")
    modules_pkg.RotaryPositionalEmbedding = rot.RotaryPositionalEmbedding
    esp = _load_real("fairseq.modules.espnet_multihead_attention",
                     "fairseq/modules/espnet_multihead_attention.py")
    modules_pkg.ESPNETMultiHeadedAttention = esp.ESPNETMultiHeadedAttention
    modules_pkg.RelPositionMultiHeadedAttention = (
        esp.RelPositionMultiHeadedAttention)
    modules_pkg.RotaryPositionMultiHeadedAttention = (
        esp.RotaryPositionMultiHeadedAttention)
    posenc = _load_real("fairseq.modules.positional_encoding",
                        "fairseq/modules/positional_encoding.py")
    modules_pkg.RelPositionalEncoding = posenc.RelPositionalEncoding
    conf = _load_real("fairseq.modules.conformer_layer",
                      "fairseq/modules/conformer_layer.py")
    conv = _load_real("fairseq.models.speech_to_text.modules.convolution",
                      "fairseq/models/speech_to_text/modules/convolution.py")
    fairseq.conformer_layer = conf
    fairseq.convolution = conv
    fairseq.positional_encoding = posenc
    return fs2
