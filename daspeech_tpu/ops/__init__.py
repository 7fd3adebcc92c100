"""DAG dynamic-program primitives.

Two interchangeable backends mirror the reference's CUDA-vs-torch dual
implementation (``DASpeech/custom_ops/__init__.py``):

- ``dag_ref``   : `lax.scan` logsumexp/max DP (correctness oracle, already
                  MXU-friendly via the exp-matmul trick).
- ``dag_pallas``: fused Pallas TPU kernels keeping the DP state in VMEM.

The public names dispatch to the Pallas backend when available and fall back
to the scan reference.
"""

from daspeech_tpu.ops.dag_ref import (
    dag_best_alignment,
    dag_logsoftmax_gather,
    dag_loss,
    dag_loss_forward,
    dag_loss_with_alpha_beta,
    torch_style_dag_loss,
)
from daspeech_tpu.ops.links_utils import band_to_full, full_to_band

__all__ = [
    "dag_best_alignment",
    "dag_logsoftmax_gather",
    "dag_loss",
    "dag_loss_forward",
    "dag_loss_with_alpha_beta",
    "torch_style_dag_loss",
    "band_to_full",
    "full_to_band",
    "dag_loss_pallas",
    "dag_loss_with_alpha_beta_pallas",
]


def __getattr__(name):
    # Pallas backends import lazily (they pull in pallas/Mosaic machinery).
    if name in ("dag_loss_pallas", "dag_loss_with_alpha_beta_pallas",
                "dag_loss_forward_pallas"):
        from daspeech_tpu.ops import dag_pallas

        return getattr(dag_pallas, name)
    raise AttributeError(name)
