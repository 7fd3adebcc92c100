from daspeech_tpu.losses.dag_loss import (
    compute_dag_loss,
    glat_glance,
    nat_dag_loss,
)
from daspeech_tpu.losses.fastspeech2_loss import fastspeech2_losses, masked_mean
from daspeech_tpu.losses.tts_loss import (
    fastspeech2_criterion,
    multidecoder_criterion,
    tts_transformer_criterion,
)
from daspeech_tpu.losses.s2s_loss import (
    argmax_path_features,
    expected_features,
    s2s_dag_fastspeech2_loss,
)

__all__ = [
    "compute_dag_loss",
    "glat_glance",
    "nat_dag_loss",
    "fastspeech2_losses",
    "masked_mean",
    "argmax_path_features",
    "expected_features",
    "s2s_dag_fastspeech2_loss",
    "fastspeech2_criterion",
    "multidecoder_criterion",
    "tts_transformer_criterion",
]
