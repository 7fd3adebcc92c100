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

Attention-side fused kernels live in their own modules:

- ``fused_attention`` : Pallas packed softmax(QK^T+bias)V MHA with
                        in-kernel PRNG dropout, GSPMD batch-shardable
                        (production for the DAG decoder and FastSpeech2
                        FFT blocks; on-chip checks in
                        ``tools/verify_chip.py``); also a per-(b, h)
                        variant and a full-bias variant, single-device
                        alternates covered by interpret-mode tests only.
- ``fused_relpos``    : Pallas Conformer rel-pos attention via the
                        rotation identity, GSPMD batch-shardable
                        (production for long inputs, T' >= 256; on-chip
                        checks in verify_chip).
- ``fused_links``     : Pallas head-streaming DAG link extraction, GSPMD
                        batch-shardable (production; on-chip checks).
- ``fused_vocab``     : XLA (not Pallas) streaming vocab projection +
                        logsumexp + gather with a recompute VJP.
- ``fused_ffn``       : Pallas whole-FFN kernel — measured slower
                        backward than XLA, kept as a single-device
                        alternate (on-chip check in verify_chip).
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
