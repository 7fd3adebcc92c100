"""Generation/eval CLI: decode a test split to phonemes, mel features, and
(optionally) waveforms.

Rebuild of ``DASpeech/generator/generate_features.py`` (mel .npy dump per
utterance) + ``hifi-gan/inference_e2e.py`` (mel -> wav) in one entry point:

  python -m daspeech_tpu.cli.generate DATA --checkpoint DIR \
      --task nat_speech_to_speech --decode-strategy lookahead \
      --results-path results/ [--vocoder-checkpoint G.pt]
"""

from __future__ import annotations

import argparse
import json
import pickle
import sys
import wave
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from daspeech_tpu.core.config import DAGModelConfig, DecodeConfig, S2SModelConfig
from daspeech_tpu.models import (
    HiFiGANGenerator,
    S2SConformerDAGFastSpeech2,
    S2TConformerDAG,
)
from daspeech_tpu.tasks import (
    NATSpeechToSpeechTask,
    NATSpeechToTextTask,
    TaskConfig,
)
from daspeech_tpu.train import TrainState, make_optimizer
from daspeech_tpu.train.checkpoint import CheckpointManager


def write_wav(path, wav: np.ndarray, sample_rate: int = 22050):
    """int16 WAV writer (``inference_e2e.py`` uses scipy.io.wavfile; the
    stdlib ``wave`` module avoids that dependency)."""
    data = np.clip(wav, -1.0, 1.0)
    data = (data * 32767.0).astype(np.int16)
    with wave.open(str(path), "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(data.tobytes())


def read_wav(path):
    with wave.open(str(path), "rb") as f:
        sr = f.getframerate()
        data = np.frombuffer(f.readframes(f.getnframes()), dtype=np.int16)
    return data.astype(np.float32) / 32767.0, sr


def parse_args(argv=None):
    p = argparse.ArgumentParser("daspeech-generate")
    p.add_argument("data")
    p.add_argument("--task", default="nat_speech_to_speech",
                   choices=["nat_speech_to_text", "nat_speech_to_speech",
                            "text_to_speech"])
    p.add_argument("--generator-type", default="auto",
                   choices=["auto", "nat_s2s", "nat_tts", "at_tts",
                            "at_s2s"],
                   help="``generate_features.py:29-76`` dispatch: nat_s2s = "
                        "two-pass DAG+TTS (default for the S2S task), "
                        "nat_tts = FastSpeech2-only phoneme->mel (the "
                        "text_to_speech task / stage-2 checkpoints), "
                        "at_tts = AR Transformer-TTS (cli.train --criterion "
                        "tts_transformer checkpoints), at_s2s = two-pass AR "
                        "multi-decoder S2ST (--criterion s2s_multidecoder)")
    p.add_argument("--max-text-len", type=int, default=200,
                   help="at_s2s AR text decode budget")
    p.add_argument("--stop-threshold", type=float, default=0.5,
                   help="AR mel stop-prediction threshold (at_tts/at_s2s)")
    p.add_argument("--checkpoint-dir", default=None,
                   help="orbax checkpoint dir from cli.train")
    p.add_argument("--model-torch", default=None,
                   help="released DASpeech fairseq .pt to import directly "
                        "(encoder./decoder.[/adaptor./tts.] model state "
                        "dict; s2s_conformer_dag_fastspeech2.py:43-100)")
    p.add_argument("--gen-subset", default="test")
    p.add_argument("--results-path", default="results")
    p.add_argument("--decode-strategy", default="lookahead")
    p.add_argument("--decode-beta", type=float, default=1.0)
    p.add_argument("--decode-viterbibeta", type=float, default=1.0)
    p.add_argument("--length-beam", type=int, default=1,
                   help="NAT length beam: decode N graph sizes around "
                        "lambda*src_len, keep the best mean-logprob "
                        "candidate (s2t_nat_generator.py:59-76)")
    p.add_argument("--reranker-dir", default=None,
                   help="orbax checkpoint dir of a trained AR "
                        "s2s_multidecoder model whose first pass reranks "
                        "the --length-beam candidates by teacher-forced "
                        "mean logprob (the reference's last-ensemble-"
                        "checkpoint reranker, s2t_nat_generator.py:34-41)")
    p.add_argument("--reranker-yaml", default=None,
                   help="MultiDecoderConfig YAML for --reranker-dir "
                        "(default config when omitted)")
    p.add_argument("--iter-decode-max-iter", type=int, default=0,
                   help="iterative refinement: feed decoded tokens back "
                        "as the next graph input for up to N extra "
                        "passes (s2t_nat_generator.py:120-215); every "
                        "DASpeech recipe decodes single-pass (0)")
    p.add_argument("--iter-decode-force-max-iter", action="store_true",
                   help="disable the adaptive output==input early "
                        "termination and always run max-iter passes")
    p.add_argument("--src-upsample-scale", type=float, default=0.5)
    p.add_argument("--max-tokens", type=int, default=40000)
    p.add_argument("--max-mel-len", type=int, default=1024)
    p.add_argument("--vocoder-checkpoint", default=None,
                   help="orbax checkpoint dir from cli.train_vocoder")
    p.add_argument("--vocoder-type", default="auto",
                   choices=["auto", "hifigan", "griffin_lim"],
                   help="griffin_lim = checkpoint-free mel->wav fallback "
                        "(``vocoder.py:30-165``/``get_vocoder``); auto = "
                        "hifigan when a checkpoint is given, else the "
                        "data config's vocoder type, else none")
    p.add_argument("--vocoder-quant", default="none",
                   choices=["none", "bf16", "int8", "int8-skip1"],
                   help="opt-in reduced-precision vocoder serving ladder "
                        "(measured speed/quality in COVERAGE.md): bf16 = "
                        "bfloat16 activations (halves the HBM traffic the "
                        "fp32 path is partially bound by, near-fp32 "
                        "quality); int8 = W8A8 with static activation "
                        "scales calibrated over the first batches "
                        "(fastest); int8-skip1 keeps level 0 in fp32 "
                        "(higher quality, most of the int8 win). Default "
                        "fp32 keeps exact torch waveform parity")
    p.add_argument("--vocoder-chunk", type=int, default=0,
                   help="vocode in exact fixed windows of N mel frames "
                        "(+receptive-field halo) instead of one shot: "
                        "first-audio latency becomes one chunk (~N*256/"
                        "22050 s) instead of one utterance; bit-identical "
                        "output (models/hifigan.py::vocode_chunked). 0 = "
                        "one-shot. Stacks with --vocoder-quant int8")
    p.add_argument("--vocoder-calib-batches", type=int, default=4,
                   help="int8 mode: number of served batches to calibrate "
                        "the static activation scales over before freezing "
                        "them (decode/speech_generator.py::make_vocode_fn)")
    p.add_argument("--vocoder-torch", default=None,
                   help="torch HiFi-GAN generator .pt (weight-normed) to "
                        "import (the reference's VCTK_V1 release format)")
    p.add_argument("--gcmvn-stats", default=None,
                   help="gcmvn_stats.npz for mel denormalization")
    p.add_argument("--model-yaml", default=None)
    p.add_argument("--average-last-n", type=int, default=0,
                   help="average the last N checkpoints before decoding "
                        "(scripts/average_checkpoints.py equivalent)")
    p.add_argument("--compilation-cache-dir", default=None,
                   help="persist XLA executables here across runs (default "
                        "$DASPEECH_COMPILE_CACHE or ~/.cache/daspeech_tpu/"
                        "xla; pass '' to disable)")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from daspeech_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache(args.compilation_cache_dir)
    if args.generator_type == "at_tts":
        return _generate_ar_tts(args)
    if args.generator_type == "at_s2s":
        return _generate_at_s2s(args)
    if args.generator_type == "nat_tts" or args.task == "text_to_speech":
        return _generate_tts(args)
    is_s2s = args.task == "nat_speech_to_speech"
    task_cls = NATSpeechToSpeechTask if is_s2s else NATSpeechToTextTask
    task = task_cls.setup_task(TaskConfig(
        data_dir=args.data, max_tokens=args.max_tokens))
    task.load_dataset(args.gen_subset,
                      upsample_scale=args.src_upsample_scale)
    vocab = task.vocab

    from daspeech_tpu.cli.train import build_model_cfg

    class _A:
        model_yaml = args.model_yaml
        criterion = ("s2s_dag_fastspeech2_loss" if is_s2s else "nat_dag_loss")

    model_cfg = build_model_cfg(_A, vocab)
    model = (S2SConformerDAGFastSpeech2(model_cfg) if is_s2s
             else S2TConformerDAG(model_cfg))

    if not (args.checkpoint_dir or args.model_torch):
        raise SystemExit("need --checkpoint-dir or --model-torch")
    it = task.get_batch_iterator(args.gen_subset,
                                 upsample_scale=args.src_upsample_scale)
    probe = next(iter(it))

    if args.model_torch:
        import torch

        from daspeech_tpu.train.torch_import import (
            import_s2s_daspeech, import_s2t_conformer_dag)

        # released DASpeech/fairseq checkpoints pickle argparse/omegaconf
        # config objects next to the state dict, which weights_only=True
        # rejects with UnpicklingError; this is an explicit local-file
        # import path, so fall back to a full unpickle for those ONLY
        # (anything else — corruption, IO — propagates)
        try:
            ckpt_t = torch.load(args.model_torch, map_location="cpu",
                                weights_only=True)
        except pickle.UnpicklingError:
            print(f"WARNING: {args.model_torch} rejected by the safe "
                  "(weights_only) loader; retrying with full unpickling — "
                  "only do this for checkpoints you trust", file=sys.stderr)
            ckpt_t = torch.load(args.model_torch, map_location="cpu",
                                weights_only=False)
        sd = ckpt_t.get("model", ckpt_t)
        dag_cfg = model_cfg.dag if is_s2s else model_cfg
        if is_s2s:
            variables = import_s2s_daspeech(
                sd, enc_layers=dag_cfg.encoder.num_layers,
                dec_layers=dag_cfg.decoder.num_layers,
                tts_cfg=model_cfg.tts,
                tied_embeddings=dag_cfg.decoder.share_input_output_embed)
        else:
            variables = import_s2t_conformer_dag(
                sd, enc_layers=dag_cfg.encoder.num_layers,
                dec_layers=dag_cfg.decoder.num_layers,
                tied_embeddings=dag_cfg.decoder.share_input_output_embed)
        params = {"params": variables["params"]}
        if variables.get("batch_stats"):
            params["batch_stats"] = variables["batch_stats"]
        print(f"imported torch checkpoint {args.model_torch}",
              file=sys.stderr)
        return _generate_with(args, task, model, params, it, is_s2s)

    ckpt = CheckpointManager(args.checkpoint_dir)
    # restore with an abstract template derived from a probe batch

    def init_fn(key):
        jb = {k: jnp.asarray(v) for k, v in probe.items()}
        if is_s2s:
            def full(m):
                _, _, feats = m(jb["fbank"], jb["src_lengths"],
                                jb["prev_output_tokens"])
                B, L = jb["prev_output_tokens"].shape
                return m.synthesize(feats, jnp.zeros((B, L), bool), 8)
            return model.init(key, method=full)
        return model.init(key, jb["fbank"], jb["src_lengths"],
                          jb["prev_output_tokens"])

    variables = jax.eval_shape(init_fn, jax.random.key(0))
    tx = make_optimizer()
    state_like = jax.eval_shape(
        lambda v: TrainState.create(v, tx), variables)
    state = ckpt.restore(state_like)
    if state is None:
        raise SystemExit(f"no checkpoint found in {args.checkpoint_dir}")
    if args.average_last_n > 1:
        from daspeech_tpu.train.checkpoint import average_checkpoints

        avg = average_checkpoints(ckpt, state_like,
                                  last_n=args.average_last_n)
        state = state.replace(params=avg)
    params = {"params": state.params}
    if state.batch_stats:
        params["batch_stats"] = state.batch_stats
    return _generate_with(args, task, model, params, it, is_s2s)


def _generate_tts(args):
    """``--generator-type nat_tts``: FastSpeech2-only phoneme->mel(->wav)
    over the stage-2 `text_to_speech` checkpoints
    (``generate_features.py:62-74`` nat_tts branch /
    ``speech_generator_modified.py:96-150``)."""
    from daspeech_tpu.decode.speech_generator import (
        NonAutoregressiveSpeechGenerator)
    from daspeech_tpu.models.fastspeech2 import FastSpeech2Encoder
    from daspeech_tpu.tasks import TextToSpeechTask

    task = TextToSpeechTask.setup_task(TaskConfig(data_dir=args.data))
    task.load_dataset(args.gen_subset)
    vocab = task.vocab

    from daspeech_tpu.cli.train import build_model_cfg

    class _A:
        model_yaml = args.model_yaml
        criterion = "fastspeech2"

    model_cfg = build_model_cfg(_A, vocab)
    model = FastSpeech2Encoder(model_cfg, vocab_size=vocab.size,
                               pad=vocab.pad)
    if not args.checkpoint_dir:
        raise SystemExit("nat_tts needs --checkpoint-dir (cli.train "
                         "--criterion fastspeech2 output)")
    it = task.get_batch_iterator(args.gen_subset)
    probe = next(iter(it))

    variables = jax.eval_shape(
        lambda key: model.init(
            key, src_tokens=jnp.asarray(probe["src_tokens"]),
            max_out_len=8),
        jax.random.key(0))
    tx = make_optimizer()
    state_like = jax.eval_shape(lambda v: TrainState.create(v, tx),
                                variables)
    params = _restore_params(args, state_like)

    vocoder, vocoder_params, gcmvn = _load_vocoder_and_gcmvn(args, task)
    gen = NonAutoregressiveSpeechGenerator(
        model, vocab, max_mel_len=args.max_mel_len, vocoder=vocoder,
        vocoder_params=vocoder_params, gcmvn=gcmvn)

    return _emit_feature_outputs(it, gen, params, Path(args.results_path))



def _emit_feature_outputs(it, gen, params, out_dir, hypo_line=None):
    """Shared batch loop for the TTS-style generator types: per-utterance
    transposed mel .npy under feat/ (+ optional wav and hypos.txt line) —
    the reference's dump loop (``generate_features.py:87-133``)."""
    (out_dir / "feat").mkdir(parents=True, exist_ok=True)
    hypos_file = (out_dir / "hypos.txt").open("w") if hypo_line else None
    n = 0
    for spec, idxs in it.batches_for_epoch(0):
        batch = it.collate(spec, idxs)
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        hypos = gen.generate(params, jb)
        for i, local in enumerate(idxs):
            utt_id = it.dataset.rows[local]["id"]
            h = hypos[i]
            if hypos_file is not None:
                hypos_file.write(hypo_line(utt_id, h))
            np.save(out_dir / "feat" / f"{utt_id}.npy",
                    np.asarray(h["feature"]).T)
            if "waveform" in h:
                (out_dir / "wav").mkdir(exist_ok=True)
                write_wav(out_dir / "wav" / f"{utt_id}_pred.wav",
                          np.asarray(h["waveform"]))
            n += 1
    if hypos_file is not None:
        hypos_file.close()
    print(json.dumps({"generated": n, "results": str(out_dir)}))
    return 0


def _restore_params(args, state_like):
    """Restore {params[, batch_stats]} from an orbax TrainState checkpoint
    dir (with optional last-N averaging)."""
    ckpt = CheckpointManager(args.checkpoint_dir)
    state = ckpt.restore(state_like)
    if state is None:
        raise SystemExit(f"no checkpoint found in {args.checkpoint_dir}")
    if args.average_last_n > 1:
        from daspeech_tpu.train.checkpoint import average_checkpoints

        avg = average_checkpoints(ckpt, state_like,
                                  last_n=args.average_last_n)
        state = state.replace(params=avg)
    params = {"params": state.params}
    if state.batch_stats:
        params["batch_stats"] = state.batch_stats
    return params


def _generate_ar_tts(args):
    """``--generator-type at_tts``: AR Transformer-TTS phoneme->mel(->wav)
    (``generate_features.py:29-61`` at_tts branch driving
    ``speech_generator_modified.py:14-95``)."""
    from daspeech_tpu.core.config import TTSTransformerConfig
    from daspeech_tpu.decode.speech_generator import (
        AutoRegressiveSpeechGenerator)
    from daspeech_tpu.models.tts_transformer import TTSTransformer
    from daspeech_tpu.tasks import TextToSpeechTask

    task = TextToSpeechTask.setup_task(TaskConfig(data_dir=args.data))
    task.load_dataset(args.gen_subset)
    vocab = task.vocab

    from daspeech_tpu.core.config import from_dict, to_dict

    cfg = TTSTransformerConfig()
    if args.model_yaml:
        import yaml

        cfg = from_dict(TTSTransformerConfig,
                        yaml.safe_load(Path(args.model_yaml).read_text()))
    model = TTSTransformer(vocab_size=vocab.size, pad=vocab.pad,
                           **to_dict(cfg))
    if not args.checkpoint_dir:
        raise SystemExit("at_tts needs --checkpoint-dir (cli.train "
                         "--criterion tts_transformer output)")
    it = task.get_batch_iterator(args.gen_subset)
    probe = next(iter(it))
    variables = jax.eval_shape(
        lambda key: model.init(
            key, jnp.asarray(probe["src_tokens"]),
            jnp.zeros((probe["src_tokens"].shape[0], 8, cfg.out_dim))),
        jax.random.key(0))
    state_like = jax.eval_shape(
        lambda v: TrainState.create(v, make_optimizer()), variables)
    params = _restore_params(args, state_like)

    vocoder, vocoder_params, gcmvn = _load_vocoder_and_gcmvn(args, task)
    gen = AutoRegressiveSpeechGenerator(
        model, vocab, max_mel_len=args.max_mel_len, vocoder=vocoder,
        vocoder_params=vocoder_params, gcmvn=gcmvn,
        stop_threshold=args.stop_threshold)

    return _emit_feature_outputs(it, gen, params, Path(args.results_path))


def _generate_at_s2s(args):
    """``--generator-type at_s2s``: two-pass AR multi-decoder S2ST
    (``generate_features.py:62-76`` at_s2s branch driving
    ``speech_generator_modified.py:151-306``)."""
    from daspeech_tpu.core.config import MultiDecoderConfig, from_dict, to_dict
    from daspeech_tpu.decode.speech_generator import (
        MultiDecoderSpeechGenerator)
    from daspeech_tpu.models.s2s_multidecoder import S2SMultiDecoderModel

    task = NATSpeechToSpeechTask.setup_task(TaskConfig(
        data_dir=args.data, max_tokens=args.max_tokens))
    task.load_dataset(args.gen_subset,
                      upsample_scale=args.src_upsample_scale)
    vocab = task.vocab

    cfg = MultiDecoderConfig()
    if args.model_yaml:
        import yaml

        cfg = from_dict(MultiDecoderConfig,
                        yaml.safe_load(Path(args.model_yaml).read_text()))
    model = S2SMultiDecoderModel(
        vocab_size=vocab.size, pad=vocab.pad, bos=vocab.bos, eos=vocab.eos,
        **to_dict(cfg))
    if not args.checkpoint_dir:
        raise SystemExit("at_s2s needs --checkpoint-dir (cli.train "
                         "--criterion s2s_multidecoder output)")
    it = task.get_batch_iterator(args.gen_subset,
                                 upsample_scale=args.src_upsample_scale)
    probe = next(iter(it))
    B = probe["fbank"].shape[0]
    variables = jax.eval_shape(
        lambda key: model.init(
            key, jnp.asarray(probe["fbank"]),
            jnp.asarray(probe["src_lengths"]),
            jnp.asarray(probe["target_text"]),
            jnp.zeros((B, 8, cfg.out_dim))),
        jax.random.key(0))
    state_like = jax.eval_shape(
        lambda v: TrainState.create(v, make_optimizer()), variables)
    params = _restore_params(args, state_like)

    vocoder, vocoder_params, gcmvn = _load_vocoder_and_gcmvn(args, task)
    gen = MultiDecoderSpeechGenerator(
        model, vocab, max_text_len=args.max_text_len,
        max_mel_len=args.max_mel_len, vocoder=vocoder,
        vocoder_params=vocoder_params, gcmvn=gcmvn,
        stop_threshold=args.stop_threshold)

    return _emit_feature_outputs(
        it, gen, params, Path(args.results_path),
        hypo_line=lambda utt_id, h:
            f"{utt_id}\t{task.tgt_dict.string(h['tokens'])}\n")


def _load_vocoder_and_gcmvn(args, task):
    """Optional vocoder (``get_vocoder`` dispatch, ``vocoder.py:297-305``)
    and gcmvn stats (flag, else config.yaml's global_cmvn —
    ``data_cfg.py:179-182``)."""
    vocoder = vocoder_params = None
    cfg_voc_type = None
    if task is not None and task.data_cfg is not None:
        cfg_voc_type = task.data_cfg.vocoder.get("type")
    if (getattr(args, "vocoder_type", "auto") == "griffin_lim"
            or (getattr(args, "vocoder_type", "auto") == "auto"
                and cfg_voc_type == "griffin_lim"
                and not (args.vocoder_torch or args.vocoder_checkpoint))):
        from daspeech_tpu.models.griffin_lim import GriffinLimVocoder

        vocoder, vocoder_params = GriffinLimVocoder(), {}
    elif args.vocoder_torch or args.vocoder_checkpoint:
        from daspeech_tpu.core.config import HiFiGANConfig

        hifi_cfg = HiFiGANConfig()
        # fold_to=128: space-to-depth serving path, ~2x faster on TPU with
        # identical output (models/hifigan.py); --vocoder-quant int8 adds
        # the W8A8 mode on top (first-batch calibration happens in
        # decode/speech_generator.py::make_vocode_fn)
        quant = getattr(args, "vocoder_quant", "none")
        vocoder = HiFiGANGenerator(
            hifi_cfg, fold_to=128,
            dtype=jnp.bfloat16 if quant == "bf16" else jnp.float32,
            quant_int8=quant.startswith("int8"),
            quant_skip_levels=1 if quant == "int8-skip1" else 0,
            serve_chunk=int(getattr(args, "vocoder_chunk", 0) or 0),
            serve_calib_batches=int(
                getattr(args, "vocoder_calib_batches", 4)))
        if args.vocoder_torch:
            import torch

            from daspeech_tpu.train.torch_import import import_hifigan

            try:
                sd = torch.load(args.vocoder_torch, map_location="cpu",
                                weights_only=True)
            except pickle.UnpicklingError:
                print(f"WARNING: {args.vocoder_torch} rejected by the safe "
                      "(weights_only) loader; retrying with full unpickling "
                      "— only do this for checkpoints you trust",
                      file=sys.stderr)
                sd = torch.load(args.vocoder_torch, map_location="cpu",
                                weights_only=False)
            sd = sd.get("generator", sd)
            vocoder_params = import_hifigan(sd, hifi_cfg)
        else:
            vck = CheckpointManager(args.vocoder_checkpoint)
            vstate = vck.restore()
            vocoder_params = vstate["gen_params"]

    gcmvn_path = args.gcmvn_stats
    if gcmvn_path is None and task.data_cfg is not None:
        gcmvn_path = task.data_cfg.global_cmvn_stats_npz
    gcmvn = None
    if gcmvn_path:
        from daspeech_tpu.data.transforms import GlobalCMVN

        gcmvn = GlobalCMVN(stats_npz_path=gcmvn_path)
    return vocoder, vocoder_params, gcmvn


def _load_reranker(args, vocab):
    """Build + restore the AR reranker model for --length-beam reranking
    (an ``S2SMultiDecoderModel`` whose Conformer + causal text decoder is
    the in-repo AR speech-to-text family; the reference passes the
    reranker as the last checkpoint of the decode ensemble,
    ``s2t_nat_generator.py:34-41``)."""
    if not args.reranker_dir:
        return None, None
    import yaml

    from daspeech_tpu.core.config import (
        MultiDecoderConfig, from_dict, to_dict)
    from daspeech_tpu.models.s2s_multidecoder import S2SMultiDecoderModel

    cfg = MultiDecoderConfig()
    if args.reranker_yaml:
        cfg = from_dict(MultiDecoderConfig,
                        yaml.safe_load(Path(args.reranker_yaml).read_text()))
    model = S2SMultiDecoderModel(
        vocab_size=vocab.size, pad=vocab.pad, bos=vocab.bos, eos=vocab.eos,
        **to_dict(cfg))
    variables = jax.eval_shape(
        lambda key: model.init(
            key, jnp.zeros((1, 16, 80)), jnp.asarray([16]),
            jnp.full((1, 4), vocab.pad, jnp.int32),
            jnp.zeros((1, 4, cfg.out_dim))),
        jax.random.key(0))
    state_like = jax.eval_shape(
        lambda v: TrainState.create(v, make_optimizer()), variables)
    state = CheckpointManager(args.reranker_dir).restore(state_like)
    if state is None:
        raise SystemExit(f"no reranker checkpoint in {args.reranker_dir}")
    rparams = {"params": state.params}
    if state.batch_stats:
        rparams["batch_stats"] = state.batch_stats
    return model, rparams


def _generate_with(args, task, model, params, it, is_s2s):
    vocoder, vocoder_params, gcmvn = _load_vocoder_and_gcmvn(args, task)
    reranker, reranker_params = _load_reranker(args, task.vocab)

    decode_cfg = DecodeConfig(
        strategy=args.decode_strategy, beta=args.decode_beta,
        viterbibeta=args.decode_viterbibeta,
        length_beam=args.length_beam,
        iter_decode_max_iter=args.iter_decode_max_iter,
        iter_decode_force_max_iter=args.iter_decode_force_max_iter)
    if is_s2s:
        gen = task.build_generator(model, decode_cfg,
                                   max_mel_len=args.max_mel_len,
                                   vocoder=vocoder,
                                   vocoder_params=vocoder_params,
                                   gcmvn=gcmvn,
                                   reranker=reranker,
                                   reranker_params=reranker_params)
    else:
        gen = task.build_generator(model, decode_cfg,
                                   reranker=reranker,
                                   reranker_params=reranker_params)

    out_dir = Path(args.results_path)
    (out_dir / "feat").mkdir(parents=True, exist_ok=True)
    hypos_file = (out_dir / "hypos.txt").open("w")

    n = 0
    for spec, idxs in it.batches_for_epoch(0):
        batch = it.collate(spec, idxs)
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        hypos = gen.generate(params, jb)
        for i, local in enumerate(idxs):
            utt_id = it.dataset.rows[local]["id"]
            h = hypos[i]
            text = task.tgt_dict.string(h["tokens"])
            hypos_file.write(f"{utt_id}\t{text}\n")
            if is_s2s and "feature" in h:
                # transposed [80, T] like generate_features.py:87-91
                np.save(out_dir / "feat" / f"{utt_id}.npy",
                        np.asarray(h["feature"]).T)
            if "waveform" in h:
                (out_dir / "wav").mkdir(exist_ok=True)
                write_wav(out_dir / "wav" / f"{utt_id}_pred.wav",
                          np.asarray(h["waveform"]))
            n += 1
    hypos_file.close()
    print(json.dumps({"generated": n, "results": str(out_dir)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
