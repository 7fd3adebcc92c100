"""daspeech_tpu: a TPU-native (JAX/XLA/Pallas) non-autoregressive two-pass
speech-to-speech translation framework with the capabilities of ictnlp/DASpeech.

Layering (bottom-up):
  ops/     -- DAG dynamic-program primitives (dag_loss forward-backward,
              dag_best_alignment Viterbi, logsoftmax_gather) as lax.scan
              reference impls + Pallas TPU kernels.
  models/  -- Conformer encoder, DA-Transformer (DAG) decoder + link predictor,
              FastSpeech2 acoustic decoder, HiFi-GAN vocoder (flax.linen).
  losses/  -- nat_dag_loss (+GLAT glancing), fastspeech2 loss, joint
              s2s_dag_fastspeech2 loss as pure functions.
  data/    -- TSV manifests, zip-packed .npy audio features, CMVN/SpecAugment,
              length-bucketed token-budget batching with fixed padded shapes.
  train/   -- pjit data-parallel training step, bf16/fp32, inverse-sqrt LR,
              orbax checkpointing, in-graph psum'd metrics.
  decode/  -- jitted greedy/lookahead/viterbi/joint-viterbi DAG decoding and
              the fused two-pass S2ST generator.
"""

__version__ = "0.1.0"
