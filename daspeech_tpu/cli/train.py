"""Training CLI.

Rebuild of ``fairseq_cli/train.py`` specialized to the DASpeech recipes
(``/root/reference/README.md:224-323``):

  python -m daspeech_tpu.cli.train DATA \
      --task nat_speech_to_text --criterion nat_dag_loss \
      --model-yaml model.yaml --max-update 100000 --save-dir ckpts ...

The epoch loop, validation cadence, checkpointing, and early-stop logic of
the reference trainer collapse into this file; the per-step machinery
(grad accumulation via microbatch averaging, fp16 scaling, OOM retries,
manual all-reduce) is not needed: batches have fixed bucket shapes, bf16
needs no loss scaling, and XLA inserts the collectives.
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from daspeech_tpu.core.config import (
    DAGModelConfig,
    DecodeConfig,
    FastSpeech2Config,
    S2SModelConfig,
    from_dict,
    to_dict,
)
from daspeech_tpu.losses import nat_dag_loss, s2s_dag_fastspeech2_loss
from daspeech_tpu.losses.tts_loss import fastspeech2_criterion
from daspeech_tpu.models import S2SConformerDAGFastSpeech2, S2TConformerDAG
from daspeech_tpu.models.fastspeech2 import FastSpeech2Encoder
from daspeech_tpu.tasks import (
    NATSpeechToSpeechTask,
    NATSpeechToTextTask,
    TaskConfig,
    TextToSpeechTask,
)
from daspeech_tpu.train import (
    TrainState,
    anneal_value,
    jit_data_parallel,
    make_optimizer,
    make_train_step,
    parse_anneal,
)
from daspeech_tpu.train.checkpoint import CheckpointManager
from daspeech_tpu.train.metrics import JsonProgressLogger, MetricsAggregator


def parse_args(argv=None):
    p = argparse.ArgumentParser("daspeech-train")
    p.add_argument("data")
    p.add_argument("--task", default="nat_speech_to_text",
                   choices=["nat_speech_to_text", "nat_speech_to_speech",
                            "text_to_speech"])
    p.add_argument("--criterion", default="nat_dag_loss",
                   choices=["nat_dag_loss", "s2s_dag_fastspeech2_loss",
                            "fastspeech2", "tts_transformer",
                            "s2s_multidecoder"],
                   help="tts_transformer = AR Transformer-TTS baseline "
                        "(at_tts generation); s2s_multidecoder = UnitY-"
                        "style two-pass AR S2ST baseline (at_s2s)")
    p.add_argument("--max-sentences", type=int, default=64)
    p.add_argument("--update-freq", type=int, default=1,
                   help="gradient accumulation over N same-bucket batches")
    p.add_argument("--model-yaml", default=None,
                   help="YAML with the model config tree; default recipe dims")
    p.add_argument("--save-dir", default="checkpoints")
    p.add_argument("--max-update", type=int, default=1000)
    p.add_argument("--max-tokens", type=int, default=40000)
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--warmup-updates", type=int, default=10000)
    p.add_argument("--warmup-init-lr", type=float, default=1e-7)
    p.add_argument("--weight-decay", type=float, default=0.01)
    p.add_argument("--clip-norm", type=float, default=1.0)
    p.add_argument("--noise", default="full_mask",
                   choices=["full_mask", "random_mask", "random_delete",
                            "no_noise"],
                   help="prev-target corruption for CMLM-style NAT models "
                        "(``nat_speech_to_text.py:138-219``; the DAG "
                        "criterion builds its own graph input)")
    p.add_argument("--glat-p", default="0.5:0.1@100k")
    p.add_argument("--glance-strategy", default="number-random")
    p.add_argument("--no-force-emit", action="store_true")
    p.add_argument("--training-strategy", default="expect",
                   choices=["expect", "argmax"])
    p.add_argument("--tts-loss-weight", type=float, default=5.0)
    p.add_argument("--dag-freezing-steps", type=int, default=-1)
    p.add_argument("--encoder-freezing-updates", type=int, default=0,
                   help="freeze the Conformer encoder for the first N "
                        "updates (``s2t_conformer.py:140-154``)")
    p.add_argument("--src-upsample-scale", type=float, default=0.5)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--log-interval", type=int, default=100)
    p.add_argument("--save-interval-updates", type=int, default=2000)
    p.add_argument("--validate-interval-updates", type=int, default=2000)
    p.add_argument("--eval-inference", action="store_true",
                   help="during TTS validation also synthesize with "
                        "predicted durations and report corpus MCD "
                        "(``tasks/text_to_speech.py`` eval-inference)")
    p.add_argument("--keep-last-checkpoints", type=int, default=5)
    p.add_argument("--train-subset", default="train")
    p.add_argument("--valid-subset", default="dev")
    p.add_argument("--num-buckets", type=int, default=8)
    p.add_argument("--max-source-positions", type=int, default=6000)
    p.add_argument("--max-target-positions", type=int, default=1024)
    p.add_argument("--restore", action="store_true",
                   help="resume from the latest checkpoint in save-dir")
    p.add_argument("--load-pretrained-dag-from", default=None,
                   help="checkpoint dir of a pretrained DA-Transformer")
    p.add_argument("--load-pretrained-fastspeech-from", default=None,
                   help="checkpoint dir of a pretrained FastSpeech2")
    p.add_argument("--reset-decoder-vocab", action="store_true",
                   help="keep fresh decoder embeddings when loading the "
                        "pretrained DAG (multilingual vocabulary swap)")
    p.add_argument("--banded-dp", action="store_true",
                   help="route the DAG DP through the block-banded backend "
                        "(O(L*W) memory; requires max_transition_length < "
                        "L-1 in the model config; measured slower than the "
                        "full-matrix scan on one v5e — a memory lever)")
    p.add_argument("--fused-vocab-chunk", type=int, default=None,
                   help="stream the vocab projection in chunks of this size "
                        "(never materializes B*L*V logits; for large "
                        "multilingual vocabularies)")
    p.add_argument("--coordinator", default=None,
                   help="multi-host rendezvous address host:port "
                        "(jax.distributed.initialize); also via "
                        "DASPEECH_COORDINATOR. Omit on single host / "
                        "autodetected clusters (TPU pod, SLURM)")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--fsdp", action="store_true",
                   help="ZeRO-shard params + Adam moments over the data "
                        "axis (the reference's --ddp-backend=fully_sharded) "
                        "instead of replicating them on every device")
    p.add_argument("--min-fsdp-size", type=int, default=2 ** 12,
                   help="leaves under N elements stay replicated under "
                        "--fsdp (fairseq's --min-params-to-wrap)")
    p.add_argument("--profile-dir", default=None,
                   help="capture a jax.profiler trace of steps 5-15 to DIR")
    p.add_argument("--tensorboard-logdir", default=None,
                   help="also mirror progress stats to TensorBoard "
                        "(``logging/progress_bar.py`` tensorboard backend)")
    p.add_argument("--wandb-project", default=None,
                   help="also mirror progress stats to Weights & Biases "
                        "(``logging/progress_bar.py`` wandb backend; "
                        "requires the optional wandb package)")
    p.add_argument("--rng-impl", default="rbg",
                   choices=["threefry2x32", "rbg", "unsafe_rbg"],
                   help="PRNG for dropout/GLAT keys; rbg uses the TPU "
                        "hardware generator (~3x cheaper masks than "
                        "threefry at recipe shapes)")
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="model compute dtype (params stay fp32; the DAG DP "
                        "always runs fp32 — replaces the reference's fp16 "
                        "optimizer + DynamicLossScaler, which bf16 does not "
                        "need)")
    p.add_argument("--no-packed-h2d", action="store_true",
                   help="disable single-buffer batch transfer (default ON "
                        "for the single-host data-parallel path: the whole "
                        "batch ships as ONE uint8[B, bytes] device_put and "
                        "is unpacked bit-exactly inside the step jit — one "
                        "link round-trip per update instead of one per "
                        "leaf)")
    p.add_argument("--h2d-dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="transfer dtype for the big float features (fbank/"
                        "target_audio): bfloat16 halves the host->device "
                        "bytes per batch (the whole-loop bottleneck on "
                        "transfer-bound hosts) and is cast back to fp32 on "
                        "device; training numerics see fp32 values rounded "
                        "through bf16 (~3 significant digits on log-mel)")
    p.add_argument("--compilation-cache-dir", default=None,
                   help="persist XLA executables here so reruns and new "
                        "bucket shapes skip the cold compile (default "
                        "$DASPEECH_COMPILE_CACHE or ~/.cache/daspeech_tpu/"
                        "xla; pass '' to disable)")
    p.add_argument("--heartbeat-timeout", type=float, default=-1,
                   help="kill the process (stack dump + SIGINT) if no "
                        "training step completes for N seconds — a wedged "
                        "host in a multi-process run otherwise hangs every "
                        "collective silently (distributed_timeout_wrapper."
                        "py equivalent). <= 0 disables; arms after the "
                        "first step so cold compiles don't trip it")
    p.add_argument("--aim-repo", default=None,
                   help="also mirror progress stats to an Aim repo "
                        "(``logging/progress_bar.py`` aim backend; "
                        "requires the optional aim package)")
    p.add_argument("--aim-run-hash", default=None,
                   help="append to an existing Aim run")
    p.add_argument("--azureml-logging", action="store_true",
                   help="also mirror progress stats to Azure ML's ambient "
                        "run context (requires azureml-core)")
    return p.parse_args(argv)


def build_model_cfg(args, vocab):
    from daspeech_tpu.core.config import (
        MultiDecoderConfig, TTSTransformerConfig)

    if args.criterion == "fastspeech2":
        cls = FastSpeech2Config
    elif args.criterion == "s2s_dag_fastspeech2_loss":
        cls = S2SModelConfig
    elif args.criterion == "tts_transformer":
        cls = TTSTransformerConfig
    elif args.criterion == "s2s_multidecoder":
        cls = MultiDecoderConfig
    else:
        cls = DAGModelConfig
    if args.model_yaml:
        import yaml

        data = yaml.safe_load(Path(args.model_yaml).read_text())
        cfg = from_dict(cls, data)
    else:
        cfg = cls()
    if cls in (FastSpeech2Config, TTSTransformerConfig, MultiDecoderConfig):
        return cfg
    # stamp the actual vocab
    import dataclasses

    if isinstance(cfg, S2SModelConfig):
        cfg = dataclasses.replace(
            cfg, dag=dataclasses.replace(cfg.dag, vocab=vocab))
    else:
        cfg = dataclasses.replace(cfg, vocab=vocab)
    return cfg


def main(argv=None):
    args = parse_args(argv)
    from daspeech_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache(args.compilation_cache_dir)
    # multi-host rendezvous BEFORE any device query (distributed/utils.py:
    # 273-347 equivalent); no-op on plain single-process runs
    from daspeech_tpu.parallel.multihost import initialize_distributed

    multi_host = initialize_distributed(
        args.coordinator, args.num_processes, args.process_id)
    if multi_host:
        print(f"multi-host runtime: process {jax.process_index()} of "
              f"{jax.process_count()}, {len(jax.devices())} global / "
              f"{len(jax.local_devices())} local devices", file=sys.stderr)
    task_cls = {"nat_speech_to_speech": NATSpeechToSpeechTask,
                "text_to_speech": TextToSpeechTask}.get(
                    args.task, NATSpeechToTextTask)
    task = task_cls.setup_task(TaskConfig(
        data_dir=args.data, max_tokens=args.max_tokens,
        num_buckets=args.num_buckets, noise=args.noise,
        max_source_positions=args.max_source_positions,
        max_target_positions=args.max_target_positions))
    task.load_dataset(args.train_subset, upsample_scale=args.src_upsample_scale)
    try:
        task.load_dataset(args.valid_subset,
                          upsample_scale=args.src_upsample_scale)
        has_valid = True
    except FileNotFoundError:
        has_valid = False

    vocab = task.vocab
    model_cfg = build_model_cfg(args, vocab)
    is_s2s = args.criterion == "s2s_dag_fastspeech2_loss"
    is_tts = args.criterion == "fastspeech2"
    is_ar_tts = args.criterion == "tts_transformer"
    is_mdec = args.criterion == "s2s_multidecoder"
    # bf16 compute / fp32 params replaces the reference's fp16+loss-scaling
    # stack; the DAG DP itself always accumulates in fp32 (ops/dag_ref.py)
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    if is_tts:
        model = FastSpeech2Encoder(model_cfg, vocab_size=vocab.size,
                                   pad=vocab.pad, dtype=dtype)
    elif is_ar_tts:
        from daspeech_tpu.models.tts_transformer import TTSTransformer

        model = TTSTransformer(vocab_size=vocab.size, pad=vocab.pad,
                               dtype=dtype, **to_dict(model_cfg))
    elif is_mdec:
        from daspeech_tpu.models.s2s_multidecoder import S2SMultiDecoderModel

        model = S2SMultiDecoderModel(
            vocab_size=vocab.size, pad=vocab.pad, bos=vocab.bos,
            eos=vocab.eos, dtype=dtype, **to_dict(model_cfg))
    elif is_s2s:
        model = S2SConformerDAGFastSpeech2(model_cfg, dtype=dtype)
    else:
        model = S2TConformerDAG(model_cfg, dtype=dtype)

    # --- init params with one real batch shape
    if is_tts or is_ar_tts:
        it = task.get_batch_iterator(args.train_subset,
                                     max_sentences=args.max_sentences,
                                     seed=args.seed)
    else:
        it = task.get_batch_iterator(
            args.train_subset, seed=args.seed,
            upsample_scale=args.src_upsample_scale)
    first = next(iter(it))
    jbatch = {k: jnp.asarray(v) for k, v in first.items()}

    def init_fn(key):
        if is_tts:
            return model.init(
                key, src_tokens=jbatch["src_tokens"],
                max_out_len=int(jbatch["target_audio"].shape[1]),
                durations=jbatch["durations"], pitches=jbatch["pitches"],
                energies=jbatch["energies"])
        if is_ar_tts:
            return model.init(
                key, jbatch["src_tokens"],
                jnp.zeros_like(jbatch["target_audio"]))
        if is_mdec:
            return model.init(
                key, jbatch["fbank"], jbatch["src_lengths"],
                jbatch["target_text"],
                jnp.zeros_like(jbatch["target_audio"]))
        if is_s2s:
            def full(m):
                logits, links, feats = m(
                    jbatch["fbank"], jbatch["src_lengths"],
                    jbatch["prev_output_tokens"])
                B, L = jbatch["prev_output_tokens"].shape
                return m.synthesize(
                    feats, jnp.zeros((B, L), bool),
                    jbatch["target_audio"].shape[1])
            return model.init(key, method=full)
        return model.init(key, jbatch["fbank"], jbatch["src_lengths"],
                          jbatch["prev_output_tokens"])

    variables = init_fn(jax.random.key(args.seed))

    # stage-3 component transfer (README.md:288-323)
    if args.load_pretrained_dag_from or args.load_pretrained_fastspeech_from:
        from daspeech_tpu.train.checkpoint import (
            transfer_dag_params, transfer_tts_params)

        params = dict(variables["params"])
        if args.load_pretrained_dag_from:
            src = CheckpointManager(args.load_pretrained_dag_from).restore()
            src_params = src["params"] if "params" in src else src
            params = transfer_dag_params(
                params, src_params, reset_vocab=args.reset_decoder_vocab)
            print("loaded pretrained DA-Transformer from "
                  f"{args.load_pretrained_dag_from}", file=sys.stderr)
        if args.load_pretrained_fastspeech_from:
            src = CheckpointManager(
                args.load_pretrained_fastspeech_from).restore()
            src_params = src["params"] if "params" in src else src
            params = transfer_tts_params(params, src_params)
            print("loaded pretrained FastSpeech2 from "
                  f"{args.load_pretrained_fastspeech_from}", file=sys.stderr)
        variables = dict(variables)
        variables["params"] = params

    tx = make_optimizer(
        lr=args.lr, warmup_updates=args.warmup_updates,
        warmup_init_lr=args.warmup_init_lr,
        weight_decay=args.weight_decay, clip_norm=args.clip_norm)
    state = TrainState.create(variables, tx)

    uses_bleu_metric = has_valid and args.criterion == "nat_dag_loss"
    ckpt = CheckpointManager(args.save_dir,
                             keep_last=args.keep_last_checkpoints,
                             maximize_best=uses_bleu_metric)
    resume_epoch, resume_batch = 0, 0
    if args.restore and ckpt.latest_step() is not None:
        import json as _json

        state = ckpt.restore(state)
        meta_f = (Path(args.save_dir)
                  / f"checkpoint_{ckpt.latest_step()}.json")
        if meta_f.exists():
            meta = _json.loads(meta_f.read_text())
            resume_epoch = int(meta.get("epoch", 0))
            resume_batch = int(meta.get("batch_idx", 0))
        print(f"restored checkpoint at step {int(state.step)} "
              f"(epoch {resume_epoch}, batch {resume_batch})",
              file=sys.stderr)

    glat_sched = parse_anneal(args.glat_p)
    glance = (None if args.glance_strategy in ("none", "None")
              else args.glance_strategy)
    # banded DP when the model caps the transition distance (< L-1)
    mtl = (model_cfg.dag.decoder.max_transition_length if is_s2s
           else model_cfg.decoder.max_transition_length
           if args.criterion == "nat_dag_loss" else None)

    def loss_fn(params_dict, batch, key, step):
        enc_freeze = (step < args.encoder_freezing_updates
                      if args.encoder_freezing_updates > 0 else False)
        if is_tts:
            return fastspeech2_criterion(model, params_dict, batch, key, vocab)
        if is_ar_tts:
            from daspeech_tpu.losses import tts_transformer_criterion

            return tts_transformer_criterion(
                model, params_dict, batch, key, vocab)
        if is_mdec:
            from daspeech_tpu.losses import multidecoder_criterion

            return multidecoder_criterion(
                model, params_dict, batch, key, vocab)
        glat_p = anneal_value(glat_sched, step)
        if is_s2s:
            # frozen while update_num <= dag_freezing_steps — traced on the
            # step, matching ``s2s_dag_fastspeech2_loss.py:195``
            freeze = (step <= args.dag_freezing_steps
                      if args.dag_freezing_steps > 0 else False)
            return s2s_dag_fastspeech2_loss(
                model, params_dict, batch, key, glat_p, vocab,
                tts_loss_weight=args.tts_loss_weight,
                training_strategy=args.training_strategy,
                glance_strategy=glance,
                no_force_emit=args.no_force_emit,
                freeze_dag=freeze,
                fused_vocab_chunk=args.fused_vocab_chunk,
                max_transition_length=mtl, banded_dp=args.banded_dp,
                freeze_encoder=enc_freeze)
        return nat_dag_loss(
            model, params_dict, batch, key, glat_p, vocab,
            glance_strategy=glance, no_force_emit=args.no_force_emit,
            fused_vocab_chunk=args.fused_vocab_chunk,
            max_transition_length=mtl, banded_dp=args.banded_dp,
            freeze_encoder=enc_freeze)

    from daspeech_tpu.parallel.multihost import (
        global_data_mesh, host_local_batch_to_global, process_batch_slice)

    mesh = global_data_mesh("data")
    batch_dim = 1 if args.update_freq > 1 else 0
    raw_step = make_train_step(loss_fn, tx, accum_steps=args.update_freq)
    if args.fsdp:
        from daspeech_tpu.parallel import jit_sharded

        step_fn = jit_sharded(raw_step, mesh, state, batch_dim=batch_dim,
                              fsdp_axis="data",
                              min_fsdp_size=args.min_fsdp_size)
    else:
        step_fn = jit_data_parallel(raw_step, mesh, batch_dim=batch_dim)

    # --h2d-dtype bfloat16: the fbank (and s2s target mel) dominate the
    # batch bytes (~97%); casting them to bf16 ON THE HOST halves the
    # wire bytes of every transfer, then a device-side cast restores the
    # fp32 compute path. ml_dtypes gives numpy the bf16 dtype jax accepts
    # natively.
    _h2d_cast_keys = ("fbank", "target_audio")
    _h2d_bf16 = args.h2d_dtype == "bfloat16"
    if _h2d_bf16:
        import ml_dtypes
        _np_bf16 = ml_dtypes.bfloat16

    def _put(k, v):
        if (_h2d_bf16 and k in _h2d_cast_keys
                and getattr(v, "dtype", None) == np.float32):
            return jnp.asarray(np.asarray(v).astype(_np_bf16)).astype(
                jnp.float32)
        return jnp.asarray(v)

    def _wire_bytes(k, v):
        n = getattr(v, "nbytes", 0)
        if (_h2d_bf16 and k in _h2d_cast_keys
                and getattr(v, "dtype", None) == np.float32):
            n //= 2
        return n

    # single-buffer H2D (default on for the single-host dp path): pack the
    # whole batch into ONE uint8[B, bytes] put — each extra device_put
    # pays the link's round-trip floor (measured 25.4 ms on this host's
    # relay; 5 leaves ≈ 127 ms/update of pure RTT) — and unpack
    # bit-exactly inside the step jit (data/packing.py). The packed
    # buffer keeps the batch axis, so dim-0 data-parallel sharding is
    # unchanged.
    _packing_on = (not args.no_packed_h2d and not multi_host
                   and args.update_freq == 1 and not args.fsdp)
    _bf16_wire_keys = _h2d_cast_keys if _h2d_bf16 else ()

    class PackedBatch:
        __slots__ = ("layout", "buf")

        def __init__(self, layout, buf):
            self.layout, self.buf = layout, buf

    def _pack_put(batch):
        """-> PackedBatch (one put) or None if not packable."""
        from daspeech_tpu.data.packing import pack_host

        packed = pack_host(batch, bf16_keys=_bf16_wire_keys)
        if packed is None:
            return None
        layout, buf = packed
        return PackedBatch(layout, jnp.asarray(buf))

    _packed_steps = {}

    def run_step(state, jb, rng):
        """Dispatch to the packed-unpacking step jit (per layout) or the
        plain dict step. The unpack happens INSIDE the jit, so the
        packed path compiles to the identical training computation fed
        by slices of the one transferred buffer."""
        if isinstance(jb, PackedBatch):
            fn = _packed_steps.get(jb.layout)
            if fn is None:
                from daspeech_tpu.data.packing import unpack_device

                def unpacking_step(state, b, rng, _layout=jb.layout):
                    return raw_step(
                        state, unpack_device(_layout, b["buf"]), rng)

                fn = jit_data_parallel(unpacking_step, mesh,
                                       batch_dim=batch_dim)
                _packed_steps[jb.layout] = fn
            return fn(state, {"buf": jb.buf}, rng)
        return step_fn(state, jb, rng)

    def to_device(batch):
        """Single-host: plain device arrays (sharded inside the jit).
        Multi-host: every process iterates the same seeded batches; each
        keeps ITS contiguous row block (the reference's shard-by-rank,
        ``data/iterators.py``) and the global sharded array is assembled
        from the local blocks (jax.make_array_from_process_local_data)."""
        if not multi_host:
            return {k: _put(k, v) for k, v in batch.items()}
        any_leaf = next(iter(batch.values()))
        sl = process_batch_slice(any_leaf.shape[batch_dim])
        idx = (slice(None),) * batch_dim + (sl,)
        local = {k: np.asarray(v)[idx] for k, v in batch.items()}
        return host_local_batch_to_global(local, mesh, "data", batch_dim)

    sinks = []
    if args.tensorboard_logdir:
        from daspeech_tpu.train.metrics import TensorboardSink

        sinks.append(TensorboardSink(args.tensorboard_logdir))
    if args.wandb_project:
        from daspeech_tpu.train.metrics import WandBSink

        sinks.append(WandBSink(args.wandb_project,
                               run_name=Path(args.save_dir).name))
    if args.aim_repo:
        from daspeech_tpu.train.metrics import AimSink

        sinks.append(AimSink(args.aim_repo, run_hash=args.aim_run_hash))
    if args.azureml_logging:
        from daspeech_tpu.train.metrics import AzureMLSink

        sinks.append(AzureMLSink())
    logger = JsonProgressLogger(log_interval=args.log_interval, sinks=sinks)
    agg = MetricsAggregator()
    # rbg: the TPU-native counter PRNG for dropout keys. threefry mask
    # generation costs ~75 ms/step at the recipe budget vs ~24 ms for rbg
    # (measured; the reference's torch CUDA RNG has no such tax).
    rng = jax.random.key(args.seed, impl=args.rng_impl)

    # validation: eval-BLEU through the generator for S2T
    # (``--eval-bleu``, ``nat_speech_to_text.py:280-331``)
    generator = None
    if has_valid and args.criterion == "nat_dag_loss":
        generator = task.build_generator(
            model, DecodeConfig(strategy="lookahead"))

    # eval-BLEU detokenization: BPE decode then pre-tokenizer decode, from
    # the data config's tokenizer declarations (identity for the recipes'
    # phoneme vocab) — ``nat_speech_to_text.py`` decode_fn semantics.
    from daspeech_tpu.data.encoders import build_bpe, build_tokenizer

    _bpe = build_bpe(task.data_cfg.bpe_tokenizer
                     if task.data_cfg is not None else None)
    _pretok = build_tokenizer(task.data_cfg.pre_tokenizer
                              if task.data_cfg is not None else None)

    def detok(s: str) -> str:
        return _pretok.decode(_bpe.decode(s))

    # multi-host: each process validates only ITS round-robin share of the
    # valid batches and results are combined with a host all-gather — the
    # fast-stat-sync analogue of the reference's sharded validation
    # (``fairseq/trainer.py:1442-1481``); single-process these are no-ops
    from daspeech_tpu.parallel.multihost import (
        all_gather_host_objects, shard_batches)

    def validate(cur_state):
        if not has_valid or generator is None:
            return None
        from daspeech_tpu.eval import corpus_bleu

        vit = task.get_batch_iterator(
            args.valid_subset, seed=args.seed,
            upsample_scale=args.src_upsample_scale)
        params_d = {"params": cur_state.params}
        if cur_state.batch_stats:
            params_d["batch_stats"] = cur_state.batch_stats
        hyps, refs = [], []
        for spec, idxs in shard_batches(vit.batches_for_epoch(0)):
            b = vit.collate(spec, idxs)
            jb = {k: jnp.asarray(v) for k, v in b.items()}
            out = generator.generate(params_d, jb)
            for i, local in enumerate(idxs):
                hyps.append(detok(task.tgt_dict.string(out[i]["tokens"])))
                refs.append(detok(vit.dataset._tgt_text(int(local))))
        if multi_host:
            parts = all_gather_host_objects((hyps, refs))
            hyps = [h for hs, _ in parts for h in hs]
            refs = [r for _, rs in parts for r in rs]
        return corpus_bleu(hyps, refs)

    # validation loss for the TTS and joint-S2S stages: the reference
    # validates every task and selects checkpoint_best on valid loss
    # (``fairseq_cli/train.py:375-448``, ``trainer.py:1131-1191``)
    def eval_loss_fn(params_dict, batch, key):
        if is_tts:
            return fastspeech2_criterion(
                model, params_dict, batch, key, vocab, train=False)
        if is_ar_tts:
            from daspeech_tpu.losses import tts_transformer_criterion

            return tts_transformer_criterion(
                model, params_dict, batch, key, vocab, train=False)
        if is_mdec:
            from daspeech_tpu.losses import multidecoder_criterion

            return multidecoder_criterion(
                model, params_dict, batch, key, vocab, train=False)
        return s2s_dag_fastspeech2_loss(
            model, params_dict, batch, key, jnp.asarray(0.0), vocab,
            tts_loss_weight=args.tts_loss_weight,
            training_strategy=args.training_strategy,
            glance_strategy=None, no_force_emit=args.no_force_emit,
            train=False, fused_vocab_chunk=args.fused_vocab_chunk,
            max_transition_length=mtl, banded_dp=args.banded_dp)

    uses_valid_loss = has_valid and (is_s2s or is_tts or is_ar_tts
                                     or is_mdec)
    eval_step = (jax.jit(
        lambda pd, b, key: eval_loss_fn(pd, b, key)[1]["metrics"])
        if uses_valid_loss else None)

    # --eval-inference: during TTS validation also synthesize with
    # PREDICTED durations and report corpus MCD, the reference's
    # ``text_to_speech`` eval-inference metric
    # (``fairseq/fairseq/tasks/text_to_speech.py`` batch_mel_cepstral_distortion;
    # regression target MCD 3.2 +/- 0.1, ``tests/speech/test_fastspeech2.py``).
    tts_infer = None
    if is_tts and args.eval_inference:
        @functools.partial(jax.jit, static_argnums=(2,))
        def tts_infer(pd, tokens, max_out_len):
            mel, mel_post, out_lens, _, _, _ = model.apply(
                pd, src_tokens=tokens, max_out_len=max_out_len)
            return (mel_post if mel_post is not None else mel), out_lens

    def validate_mcd(cur_state, max_utts: int = 64):
        from daspeech_tpu.eval.mcd import mel_cepstral_distortion

        vit = task.get_batch_iterator(
            args.valid_subset, max_sentences=args.max_sentences,
            seed=args.seed)
        params_d = {"params": cur_state.params}
        if cur_state.batch_stats:
            params_d["batch_stats"] = cur_state.batch_stats
        vals = []
        per_proc = -(-max_utts // jax.process_count())
        for spec, idxs in shard_batches(vit.batches_for_epoch(0)):
            b = vit.collate(spec, idxs)
            M = int(b["target_audio"].shape[1])
            mel, out_lens = tts_infer(
                params_d, jnp.asarray(b["src_tokens"]), 2 * M)
            mel, out_lens = np.asarray(mel), np.asarray(out_lens)
            for i in range(len(idxs)):
                if b["sample_mask"][i] == 0 or len(vals) >= per_proc:
                    break
                hyp = mel[i, : max(int(out_lens[i]), 1)]
                ref = b["target_audio"][i, : int(b["target_audio_lengths"][i])]
                vals.append(mel_cepstral_distortion(hyp, ref))
            if len(vals) >= per_proc:
                break
        if multi_host:
            vals = [v for part in all_gather_host_objects(vals)
                    for v in part][:max_utts]
        return float(np.mean(vals)) if vals else None

    def validate_loss(cur_state):
        """Mean per-sentence valid loss, sample_mask-weighted."""
        if not uses_valid_loss:
            return None
        if is_tts or is_ar_tts:
            vit = task.get_batch_iterator(
                args.valid_subset, max_sentences=args.max_sentences,
                seed=args.seed)
        else:
            vit = task.get_batch_iterator(
                args.valid_subset, seed=args.seed,
                upsample_scale=args.src_upsample_scale)
        params_d = {"params": cur_state.params}
        if cur_state.batch_stats:
            params_d["batch_stats"] = cur_state.batch_stats
        total, n = 0.0, 0
        for spec, idxs in shard_batches(vit.batches_for_epoch(0)):
            b = vit.collate(spec, idxs)
            jb = {k: jnp.asarray(v) for k, v in b.items()}
            m = eval_step(params_d, jb, jax.random.key(args.seed))
            ns = int(m.get("nsentences", len(idxs)))
            total += float(m["loss"]) * ns
            n += ns
        if multi_host:
            parts = all_gather_host_objects((total, n))
            total = sum(t for t, _ in parts)
            n = sum(c for _, c in parts)
        return total / max(n, 1)

    update = int(state.step)
    epoch = 0
    t_start = time.perf_counter()

    from daspeech_tpu.data.prefetch import prefetch_epoch

    # hung-rank detection: die loudly if no step completes for N seconds
    # (fairseq distributed_timeout_wrapper.py; off by default)
    from daspeech_tpu.parallel.multihost import HeartbeatWatchdog

    watchdog = HeartbeatWatchdog(args.heartbeat_timeout)

    pending = []   # device-side metrics awaiting a host fetch
    # host input-pipeline accounting (the reference's de-facto metric is
    # sustained updates/s through trainer.py:797 INCLUDING DataLoader
    # workers): time the loop spends blocked waiting for a collated batch
    # (prefetch queue get) and in host->device transfer, per log window
    # and over the whole run. If `data_wait_ms` per update approaches the
    # step time, the TPU is input-starved and every MFU win is masked.
    io_acc = {"wait_s": 0.0, "h2d_s": 0.0, "steps": 0,
              "run_wait_s": 0.0, "run_h2d_s": 0.0, "run_steps": 0,
              "h2d_bytes": 0}

    # per-(window, keys) jitted stackers: pack the whole metrics window
    # into ONE [n, K] device array so the flush costs a single
    # device->host transfer. jax.device_get on the raw list is one
    # transfer PER SCALAR (n x K of them); at a ~1.5-30 ms per-transfer
    # tunnel floor that dominated the sustained whole-loop time.
    _stackers = {}

    def _fetch_pending():
        keys = sorted(pending[0])
        sig = (len(pending), tuple(keys))
        fn = _stackers.get(sig)
        if fn is None:
            def stack(ms):
                return jnp.stack([
                    jnp.stack([jnp.asarray(m[k], jnp.float32)
                               for k in keys]) for m in ms])
            fn = jax.jit(stack)
            _stackers[sig] = fn
        vals = np.asarray(fn(pending))          # [n, K]: one transfer
        return [dict(zip(keys, row)) for row in vals.tolist()]

    def flush_metrics():
        """Fetch the pending device metrics in one host sync. Deferring the
        float() to the log boundary keeps XLA dispatch asynchronous — the
        values are already resolved by the time they are read (the reference
        pays this per-step via fast-stat-sync; here it costs one sync per
        log_interval)."""
        for m in (_fetch_pending() if pending else ()):
            for k, v in m.items():
                agg.log_scalar(k, float(v))
            agg.log_speed("ups")
        pending.clear()
        stats = agg.get_smoothed_values()
        if io_acc["steps"]:
            stats["data_wait_ms"] = round(
                io_acc["wait_s"] * 1e3 / io_acc["steps"], 2)
            stats["h2d_ms"] = round(
                io_acc["h2d_s"] * 1e3 / io_acc["steps"], 2)
            io_acc["wait_s"] = io_acc["h2d_s"] = 0.0
            io_acc["steps"] = 0
        # device-memory tracker (the reference's gpu_mem_track / SHOW_MEMORY
        # equivalent): peak HBM in use, when the backend reports it
        try:
            ms = jax.local_devices()[0].memory_stats()
            if ms and "peak_bytes_in_use" in ms:
                stats["peak_hbm_gb"] = round(
                    ms["peak_bytes_in_use"] / 2**30, 2)
        except Exception:
            pass
        return stats

    def loop():
        nonlocal state, update, epoch
        epoch = max(0, resume_epoch - 1)
        first_skip = resume_batch
        accum = {}   # per-bucket microbatch buffers for --update-freq
        # update_freq>1 stacks host batches before transfer, so the H2D
        # must stay on the consumer side; otherwise it runs on the
        # producer thread, overlapped with the device step
        producer_h2d = args.update_freq == 1

        def timed_to_device(batch):
            t = time.perf_counter()
            jb = (_pack_put(batch) if _packing_on else None)
            if jb is None:
                jb = to_device(batch)
                wire = sum(_wire_bytes(k, v) for k, v in batch.items())
            else:
                wire = jb.buf.nbytes
            dt = time.perf_counter() - t
            io_acc["h2d_s"] += dt
            io_acc["run_h2d_s"] += dt
            io_acc["h2d_bytes"] += wire
            return jb

        while update < args.max_update:
            epoch += 1
            batch_idx = -1
            pf = iter(prefetch_epoch(
                it, epoch,
                to_device=timed_to_device if producer_h2d else None))
            while True:
                t_wait = time.perf_counter()
                nxt = next(pf, None)
                if nxt is None:
                    break
                io_acc["wait_s"] += time.perf_counter() - t_wait
                io_acc["run_wait_s"] += time.perf_counter() - t_wait
                spec, batch = nxt
                batch_idx += 1
                if epoch == resume_epoch and batch_idx < first_skip:
                    continue     # fast-forward to the saved iterator position
                if args.update_freq > 1:
                    # accumulate same-shape batches into a microbatch axis
                    buf = accum.setdefault(spec, [])
                    buf.append(batch)
                    if len(buf) < args.update_freq:
                        continue
                    batch = {k: np.stack([b[k] for b in buf])
                             for k in buf[0]}
                    accum[spec] = []
                jb = batch if producer_h2d else timed_to_device(batch)
                io_acc["steps"] += 1
                io_acc["run_steps"] += 1
                if args.profile_dir and update == 5:
                    jax.profiler.start_trace(args.profile_dir)
                if args.profile_dir and update == 15:
                    jax.profiler.stop_trace()
                state, metrics = run_step(state, jb, rng)
                update += 1          # step_fn bumps state.step by exactly 1
                pending.append(metrics)
                # the enqueue above blocks once the device's launch queue
                # backs up, so a wedged chip stops these pings within a
                # few steps even though dispatch is asynchronous
                watchdog.ping()

                need_log = update % args.log_interval == 0
                need_validate = (
                    (generator is not None or uses_valid_loss)
                    and update % args.validate_interval_updates == 0)
                need_save = update % args.save_interval_updates == 0
                done = update >= args.max_update
                if not (need_log or need_validate or need_save or done):
                    continue
                stats = flush_metrics()
                logger.log(stats, update, epoch)
                metric = stats.get("loss")
                if need_validate:
                    if generator is not None:
                        bleu = validate(state)
                        if bleu is not None:
                            logger.print({"valid_bleu": round(bleu, 2)},
                                         update, epoch, tag="valid")
                            metric = bleu
                    else:
                        vloss = validate_loss(state)
                        if vloss is not None:
                            logger.print({"valid_loss": round(vloss, 4)},
                                         update, epoch, tag="valid")
                            metric = vloss
                        if tts_infer is not None:
                            mcd = validate_mcd(state)
                            if mcd is not None:
                                logger.print(
                                    {"valid_mcd": round(mcd, 3)},
                                    update, epoch, tag="valid")
                if need_save:
                    # async: serialization overlaps the next steps; the loop
                    # only stalls if the write outlives the save interval
                    ckpt.save(state, update, metric=metric,
                              extra={"epoch": epoch,
                                     "batch_idx": batch_idx + 1},
                              blocking=False)
                if done:
                    return

    try:
        loop()
        ckpt.save(state, update)
        wall = time.perf_counter() - t_start
        io_totals = {}
        if io_acc["run_steps"]:
            io_totals = {
                "run_data_wait_s": round(io_acc["run_wait_s"], 2),
                "run_h2d_s": round(io_acc["run_h2d_s"], 2),
                "input_wait_frac": round(
                    (io_acc["run_wait_s"] + io_acc["run_h2d_s"]) / wall, 4),
                "h2d_mb_per_step": round(
                    io_acc["h2d_bytes"] / io_acc["run_steps"] / (1 << 20),
                    2),
            }
        logger.print({"done": True, "wall_s": round(wall, 1),
                      **io_totals, **flush_metrics()}, update, epoch)
    except Exception:
        # crash checkpoint (``trainer.py:869-874`` crash.pt equivalent)
        try:
            ckpt.save(state, update, extra={"crash": True})
            print(f"saved crash checkpoint at step {update}",
                  file=sys.stderr)
        except Exception:
            pass
        raise
    finally:
        watchdog.stop()
        # make any in-flight async checkpoint durable before exiting
        try:
            ckpt.wait_until_finished()
        except Exception:
            pass
        # flush+close the metric sinks even on abnormal exit (W&B's atexit
        # flush is best-effort only; TB buffers events until close)
        for s in sinks:
            try:
                s.close()
            except Exception:
                pass
    return 0


if __name__ == "__main__":
    sys.exit(main())
