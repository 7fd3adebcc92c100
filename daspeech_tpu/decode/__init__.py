from daspeech_tpu.decode.dag_decode import (
    DecodeResult,
    gather_path_features,
    greedy_or_lookahead_decode,
    viterbi_decode,
)

__all__ = [
    "DecodeResult",
    "gather_path_features",
    "greedy_or_lookahead_decode",
    "viterbi_decode",
]
