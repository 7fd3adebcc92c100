from daspeech_tpu.models.conformer import ConformerEncoder
from daspeech_tpu.models.dag_model import (
    GlatLinkDecoder,
    S2TConformerDAG,
    graph_lengths,
    initialize_output_tokens,
)
from daspeech_tpu.models.fastspeech2 import (
    FastSpeech2Encoder,
    FFNAdapter,
    length_regulate,
)
from daspeech_tpu.models.hifigan import HiFiGANGenerator
from daspeech_tpu.models.s2s_model import S2SConformerDAGFastSpeech2
from daspeech_tpu.models.s2s_multidecoder import (
    CausalTextDecoder,
    S2SMultiDecoderModel,
)
from daspeech_tpu.models.tts_transformer import TTSTransformer

__all__ = [
    "S2SConformerDAGFastSpeech2",
    "ConformerEncoder",
    "GlatLinkDecoder",
    "S2TConformerDAG",
    "graph_lengths",
    "initialize_output_tokens",
    "FastSpeech2Encoder",
    "FFNAdapter",
    "length_regulate",
    "HiFiGANGenerator",
    "CausalTextDecoder",
    "S2SMultiDecoderModel",
    "TTSTransformer",
]
