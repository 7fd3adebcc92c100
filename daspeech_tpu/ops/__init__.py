"""DAG dynamic-program primitives.

Three backends mirror (and extend) the reference's CUDA-vs-torch dual
implementation (``DASpeech/custom_ops/__init__.py``):

- ``dag_ref``    : full-matrix `lax.scan` logsumexp/max DP. The DEFAULT —
                   the exp-matmul trick keeps every step on the MXU and it
                   is the fastest backend at recipe shapes; also the
                   correctness oracle.
- ``dag_banded`` : block-banded DP for bounded ``max_transition_length``
                   (O(L*W) per token; the reference CUDA kernels' banded
                   layout). The criteria route here automatically when the
                   band is narrower than the full triangle.
- ``dag_pallas`` : experimental fused Pallas TPU kernels keeping the DP
                   state in VMEM. Currently NOT on any hot path: it ties or
                   loses to the XLA scan at recipe shapes (see COVERAGE.md
                   bench table); kept as a verified alternative backend.

Attention-side Pallas kernels live in their own modules (all GSPMD
batch-shardable unless noted, all with in-kernel PRNG dropout and
interpret-mode tests + ``tools/verify_chip.py`` on-chip checks):

- ``fused_attention`` : packed softmax(QK^T+bias)V MHA (production for the
                        DAG decoder and FastSpeech2 FFT blocks); also a
                        per-(b, h) variant and a full-bias variant, both
                        single-device alternates.
- ``fused_relpos``    : Conformer rel-pos attention via the rotation
                        identity (production for long inputs, T' >= 256).
- ``fused_links``     : head-streaming DAG link extraction (production).
- ``fused_vocab``     : streaming vocab projection + logsumexp + gather.
- ``fused_ffn``       : whole-FFN kernel — measured slower backward than
                        XLA, kept as an alternate (single-device only).
"""

from daspeech_tpu.ops.dag_banded import (
    dag_best_alignment_banded,
    dag_loss_banded,
    dag_loss_banded_with_alpha_beta,
)
from daspeech_tpu.ops.dag_ref import (
    dag_best_alignment,
    dag_logsoftmax_gather,
    dag_logsoftmax_gather_tokens,
    dag_loss,
    dag_loss_forward,
    dag_loss_with_alpha_beta,
    torch_style_dag_loss,
)
from daspeech_tpu.ops.links_utils import band_to_full, full_to_band

__all__ = [
    "dag_best_alignment",
    "dag_best_alignment_banded",
    "dag_logsoftmax_gather",
    "dag_logsoftmax_gather_tokens",
    "dag_loss",
    "dag_loss_banded",
    "dag_loss_banded_with_alpha_beta",
    "dag_loss_forward",
    "dag_loss_with_alpha_beta",
    "torch_style_dag_loss",
    "band_to_full",
    "full_to_band",
    "dag_loss_pallas",
    "dag_loss_with_alpha_beta_pallas",
    "dag_best_alignment_pallas",
]


def __getattr__(name):
    # Pallas backends import lazily (they pull in pallas/Mosaic machinery).
    if name in ("dag_loss_pallas", "dag_loss_with_alpha_beta_pallas",
                "dag_loss_forward_pallas", "dag_best_alignment_pallas"):
        from daspeech_tpu.ops import dag_pallas

        return getattr(dag_pallas, name)
    raise AttributeError(name)
