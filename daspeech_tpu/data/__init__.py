from daspeech_tpu.data.audio_utils import (
    get_features_or_waveform,
    kaldi_fbank,
    log_mel_spectrogram,
    parse_path,
)
from daspeech_tpu.data.datasets import (
    BucketBatcher,
    BucketSpec,
    NATSpeechToSpeechDataset,
    NATSpeechToTextDataset,
    load_tsv,
    make_buckets,
)
from daspeech_tpu.data.data_cfg import S2SDataConfig, S2TDataConfig
from daspeech_tpu.data.dictionary import Dictionary
from daspeech_tpu.data.transforms import (
    Compose,
    GlobalCMVN,
    SpecAugment,
    UtteranceCMVN,
)

__all__ = [
    "get_features_or_waveform",
    "kaldi_fbank",
    "log_mel_spectrogram",
    "parse_path",
    "BucketBatcher",
    "BucketSpec",
    "NATSpeechToSpeechDataset",
    "NATSpeechToTextDataset",
    "load_tsv",
    "make_buckets",
    "Dictionary",
    "S2SDataConfig",
    "S2TDataConfig",
    "Compose",
    "GlobalCMVN",
    "SpecAugment",
    "UtteranceCMVN",
]
