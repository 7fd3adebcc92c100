"""BASELINE.md benchmark suite on one TPU chip, CVSS-C-realistic shapes.

Emits one JSON line per BASELINE.md config (1-5), headline LAST (the driver
parses the final line):

  1 vocoder_rtf          HiFi-GAN config_v1 mel->wav (folded serving path)
    vocoder_int8_rtf     same, opt-in W8A8 serving mode (static calibrated
                         activation scales; quality delta in COVERAGE.md)
  2 fastspeech2_rtf      phoneme->mel synthesis
  3 s2tt_decode_rtf      Conformer-DAG forward + lookahead decode
  5 dag_train_step_ms    full nat_dag_loss fwd+bwd+Adam at max-tokens 40k,
                         with measured TFLOP/s and MFU (vs v5e bf16 peak)
    s2s_joint_step_ms    stage-3 joint S2ST finetune step (max-tokens 20k)
    hifigan_train_step_ms  vocoder G+D alternating update (b16 x 8192)
  4 e2e_s2st_rtf         full two-pass S2ST (headline; vs the 10x-real-time
                         north star — the reference publishes no numbers)

Model dims follow the recipes (``/root/reference/README.md:233-237,
297-301``): Conformer 12Lx256d, DAG 4Lx512d (graph = 0.5*src), FastSpeech2
4+4Lx256d, HiFi-GAN config_v1 at 22.05 kHz. Weights are random (no trained
checkpoint on this host), so durations are teacher-forced to fill the mel
bucket — random-weight predicted durations collapse to ~0 frames which
would fake an unrealistically high RTF. The measured compute matches the
trained-model workload at these shapes.
"""

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

# TPU executable cache: the first bench run on a fresh machine pays the full
# compile; subsequent runs (e.g. the driver's) load from cache.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

V5E_BF16_PEAK = 197e12   # TPU v5e peak bf16 FLOP/s (MFU denominator)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def fast_init(model, key, method):
    shapes = jax.eval_shape(lambda k: model.init(k, method=method), key)
    flat, td = jax.tree_util.tree_flatten_with_path(shapes)
    r = np.random.default_rng(0)
    leaves = []
    for path, leaf in flat:
        name = "/".join(str(p) for p in path).lower()
        if any(s in name for s in ("scale", "alpha", "'var'")):
            v = np.ones(leaf.shape, leaf.dtype)
        elif any(s in name for s in ("bias", "mean")):
            v = np.zeros(leaf.shape, leaf.dtype)
        else:
            v = r.normal(0, 0.05, size=leaf.shape).astype(leaf.dtype)
        leaves.append(jnp.asarray(v))
    return jax.tree_util.tree_unflatten(td, leaves)


def sync(out):
    """Force true completion: read one element back to the host.

    Over the axon tunnel ``jax.block_until_ready`` returns before the device
    has finished (measured: a 200 ms train step "completes" in 1.6 ms by
    block_until_ready but takes 200.0 ms wall when a scalar is fetched).
    TPU programs execute in order on the stream, so materializing any
    element of the LAST call's output proves every prior call finished.
    """
    leaves = [x for x in jax.tree.leaves(out) if hasattr(x, "dtype")]
    x = leaves[-1]
    np.asarray(jax.device_get(x.ravel()[:1] if x.ndim else x))


LAST_REPS_MS = []   # per-rep means of the most recent timeit() call


def timeit(fn, *args, n=30, reps=3):
    """Throughput timing: n enqueued calls closed by one forced
    device->host read; best of ``reps`` repetitions (the remote-TPU
    tunnel adds run-to-run jitter that min() filters out). The per-rep
    means land in ``LAST_REPS_MS`` so records can publish their spread —
    r03->r04 saw -26%/-32% component-RTF moves that were pure ~1 ms
    dispatch-floor drift, indistinguishable from regression without it."""
    out = fn(*args)
    sync(out)
    rep_times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        sync(out)
        rep_times.append((time.perf_counter() - t0) / n)
    LAST_REPS_MS[:] = [round(r * 1e3, 3) for r in rep_times]
    return min(rep_times)


def spread():
    """ms spread fields of the most recent timeit() (best/median/worst)."""
    s = sorted(LAST_REPS_MS)
    return {"ms_best": s[0], "ms_median": s[len(s) // 2], "ms_worst": s[-1]}


def measure_dispatch_floor():
    """The tunnel's per-dispatch floor: round-trip of a trivial jit with a
    forced scalar read per call. Component RTFs on 2-4 ms stages ride on
    this floor (documented ~1.2-1.5 ms), so every bench run reports it —
    a +-1 ms floor drift moves those RTFs tens of percent at flat e2e."""
    tiny = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8,), jnp.float32)
    sync(tiny(x))
    ts = []
    for _ in range(30):
        t0 = time.perf_counter()
        sync(tiny(x))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return {"dispatch_floor_ms": round(ts[len(ts) // 2] * 1e3, 3),
            "dispatch_floor_best_ms": round(ts[0] * 1e3, 3)}


def measure_h2d(mb=12, reps=5):
    """The tunnel's host->device characteristics: bandwidth of a big
    (recipe-batch-sized) put and the small-put round-trip floor. The
    sustained whole-loop train bench pays one recipe batch (~12.6 MB of
    fbank) of this per update — on a transfer-bound tunnel that, not the
    step, sets the sustained floor, so the row must carry it."""
    big = np.random.default_rng(0).normal(
        size=(mb * (1 << 20) // 4,)).astype(np.float32)
    small = np.zeros((8,), np.float32)

    def put(x):
        t0 = time.perf_counter()
        d = jnp.asarray(x)
        np.asarray(jax.device_get(d.ravel()[:1]))   # force completion
        return time.perf_counter() - t0

    put(big), put(small)                             # warm the path
    t_big = min(put(big) for _ in range(reps))
    t_small = min(put(small) for _ in range(reps))
    bw = big.nbytes / max(t_big - t_small, 1e-9)
    return {"h2d_bw_MBps": round(bw / (1 << 20), 1),
            "h2d_rtt_ms": round(t_small * 1e3, 3),
            "h2d_big_put_ms": round(t_big * 1e3, 2),
            "h2d_big_put_mb": round(big.nbytes / (1 << 20), 1)}


def main():
    sys.path.insert(0, ".")
    from daspeech_tpu.core.config import (
        DAGModelConfig, HiFiGANConfig, S2SModelConfig, VocabConfig)
    from daspeech_tpu.decode import (
        gather_path_features, greedy_or_lookahead_decode)
    from daspeech_tpu.models import (
        HiFiGANGenerator, S2SConformerDAGFastSpeech2, graph_lengths,
        initialize_output_tokens)

    # fr-en phoneme vocab is small (~80 entries); round up to a lane-friendly 128
    cfg = S2SModelConfig(dag=DAGModelConfig(vocab=VocabConfig(size=128)))
    model = S2SConformerDAGFastSpeech2(cfg)
    voc = HiFiGANGenerator(HiFiGANConfig(), fold_to=128)

    B = 8                     # batch of utterances per device step
    S = 480                   # 4.8 s of 10 ms fbank frames per utterance
    L = 240                   # graph = 0.5 * S (src_upsample_scale)
    T_PHONE = 64              # decoded phoneme budget
    M = 416                   # mel frames -> M*256/22050 = 4.83 s audio

    rng = np.random.default_rng(0)
    fbank = jnp.asarray(rng.normal(size=(B, S, 80)).astype(np.float32))
    src_lengths = jnp.full((B,), S, jnp.int32)
    prev = initialize_output_tokens(
        graph_lengths(src_lengths, cfg.dag.decoder.src_upsample_scale,
                      cfg.dag.decoder.max_target_positions),
        L, cfg.dag.vocab)

    def full(m):
        logits, links, feats = m(fbank, src_lengths, prev)
        return m.synthesize(feats[:, :T_PHONE], jnp.zeros((B, T_PHONE), bool), M)

    params = fast_init(model, jax.random.key(0), full)
    vparams = fast_init(
        voc, jax.random.key(1), lambda m: m(jnp.zeros((B, M, 80))))

    # teacher-forced durations filling the mel bucket exactly (see docstring)
    per = M // T_PHONE
    durs = np.full((B, T_PHONE), per, np.int32)
    durs[:, -1] += M - per * T_PHONE
    durs = jnp.asarray(durs)

    # three jits (DAG+decode / FastSpeech2 / vocoder) so each compile payload
    # stays under the compile-service request limit; XLA pipelines the
    # dispatches back-to-back on device.
    @jax.jit
    def stage1(fbank, src_lengths, prev):
        logits, links, feats = model.apply(params, fbank, src_lengths, prev)
        ol = jnp.sum(prev != cfg.dag.vocab.pad, axis=1)
        res = greedy_or_lookahead_decode(
            logits, links, ol, cfg.dag.vocab.pad, 1.0, True)
        z, zmask = gather_path_features(feats, res, skip_first=True)
        return res.tokens, z[:, :T_PHONE], zmask[:, :T_PHONE]

    @jax.jit
    def stage2(z, zmask, durs):
        mel, _, mel_lens, _, _, _ = model.apply(
            params, z, zmask, M, durs, method=model.synthesize)
        return mel

    stage3 = jax.jit(lambda mel: voc.apply(vparams, mel))

    def s2st(fbank, src_lengths, prev, durs):
        tokens, z, zmask = stage1(fbank, src_lengths, prev)
        mel = stage2(z, zmask, durs)
        return tokens, mel, stage3(mel)

    audio_seconds = B * M * 256 / 22050.0
    results = []
    floor = measure_dispatch_floor()
    log(f"dispatch floor: {floor['dispatch_floor_ms']} ms (median), "
        f"{floor['dispatch_floor_best_ms']} ms (best)")

    t = time.perf_counter()
    o1 = stage1(fbank, src_lengths, prev)
    sync(o1)
    log(f"stage1 (DAG+decode) compiled in {time.perf_counter()-t:.0f}s")
    t = time.perf_counter()
    o2 = stage2(o1[1], o1[2], durs)
    sync(o2)
    log(f"stage2 (FastSpeech2) compiled in {time.perf_counter()-t:.0f}s")
    t = time.perf_counter()
    sync(stage3(o2))
    log(f"stage3 (HiFi-GAN folded) compiled in {time.perf_counter()-t:.0f}s")

    # --- config 3: S2TT lookahead decode (speech seconds per wall second)
    dt = timeit(stage1, fbank, src_lengths, prev)
    speech_seconds = B * S * 0.01
    results.append({"metric": "s2tt_lookahead_decode_rtf",
                    "value": round(speech_seconds / dt, 2),
                    "unit": "x_realtime", "vs_baseline": None,
                    **spread(), **floor})

    # --- config 2: FastSpeech2 synthesis
    dt = timeit(stage2, o1[1], o1[2], durs)
    results.append({"metric": "fastspeech2_rtf",
                    "value": round(audio_seconds / dt, 2),
                    "unit": "x_realtime", "vs_baseline": None,
                    **spread(), **floor})

    # --- config 1: vocoder
    dt = timeit(stage3, o2)
    results.append({"metric": "hifigan_vocoder_rtf",
                    "value": round(audio_seconds / dt, 2),
                    "unit": "x_realtime", "vs_baseline": None,
                    **spread(), **floor})

    # --- config 1b': vocoder, opt-in bf16 serving mode (bfloat16
    # activations halve the HBM traffic the fp32 path is partially bound
    # by; near-fp32 quality — the middle rung of the serving ladder)
    try:
        wav_fp = np.asarray(stage3(o2))
        voc_b = HiFiGANGenerator(HiFiGANConfig(), fold_to=128,
                                 dtype=jnp.bfloat16)
        stage3_b = jax.jit(lambda mel: voc_b.apply(vparams, mel))
        t = time.perf_counter()
        wav_b = np.asarray(stage3_b(o2), np.float32)
        log(f"stage3 bf16 compiled in {time.perf_counter()-t:.0f}s")
        snr = 10 * np.log10(float(np.sum(wav_fp ** 2))
                            / max(float(np.sum((wav_b - wav_fp) ** 2)),
                                  1e-30))
        dt = timeit(stage3_b, o2)
        results.append({"metric": "hifigan_vocoder_bf16_rtf",
                        "value": round(audio_seconds / dt, 2),
                        "unit": "x_realtime", "vs_baseline": None,
                        "snr_db_vs_fp32": round(snr, 1),
                        **spread(), **floor})
    except Exception as e:
        log(f"bf16 vocoder bench failed: {type(e).__name__}: {e}")

    # --- config 1b: vocoder, opt-in int8 serving mode (W8A8, static
    # calibrated activation scales; fp32 parity path above stays default)
    try:
        voc_q = HiFiGANGenerator(HiFiGANConfig(), fold_to=128,
                                 quant_int8=True)
        voc_qc = HiFiGANGenerator(HiFiGANConfig(), fold_to=128,
                                  quant_int8=True, calibrate=True)
        vq = fast_init(voc_q, jax.random.key(1),
                       lambda m: m(jnp.zeros((B, M, 80))))
        _, upd = jax.jit(lambda v, m: voc_qc.apply(
            v, m, mutable=["quant"]))({"params": vparams["params"],
                                       "quant": vq["quant"]}, o2)
        vq = {"params": vparams["params"], "quant": upd["quant"]}
        stage3_q = jax.jit(lambda mel: voc_q.apply(vq, mel))
        t = time.perf_counter()
        wav_q = np.asarray(stage3_q(o2), np.float32)
        log(f"stage3 int8 compiled in {time.perf_counter()-t:.0f}s")
        snr_q = 10 * np.log10(float(np.sum(wav_fp ** 2))
                              / max(float(np.sum((wav_q - wav_fp) ** 2)),
                                    1e-30))
        dt = timeit(stage3_q, o2)
        results.append({"metric": "hifigan_vocoder_int8_rtf",
                        "value": round(audio_seconds / dt, 2),
                        "unit": "x_realtime", "vs_baseline": None,
                        "snr_db_vs_fp32": round(snr_q, 1),
                        **spread(), **floor})

        # int8-skip1 mitigation rung (level 0 in fp32)
        voc_s = HiFiGANGenerator(HiFiGANConfig(), fold_to=128,
                                 quant_int8=True, quant_skip_levels=1)
        voc_sc = HiFiGANGenerator(HiFiGANConfig(), fold_to=128,
                                  quant_int8=True, quant_skip_levels=1,
                                  calibrate=True)
        _, upd_s = jax.jit(lambda v, m: voc_sc.apply(
            v, m, mutable=["quant"]))({"params": vparams["params"]}, o2)
        vs = {"params": vparams["params"], "quant": upd_s["quant"]}
        stage3_s = jax.jit(lambda mel: voc_s.apply(vs, mel))
        wav_s = np.asarray(stage3_s(o2), np.float32)
        snr_s = 10 * np.log10(float(np.sum(wav_fp ** 2))
                              / max(float(np.sum((wav_s - wav_fp) ** 2)),
                                    1e-30))
        dt = timeit(stage3_s, o2)
        results.append({"metric": "hifigan_vocoder_int8_skip1_rtf",
                        "value": round(audio_seconds / dt, 2),
                        "unit": "x_realtime", "vs_baseline": None,
                        "snr_db_vs_fp32": round(snr_s, 1),
                        **spread(), **floor})
    except Exception as e:
        log(f"int8 vocoder bench failed: {type(e).__name__}: {e}")
        stage3_q = None

    # --- config 1c: chunked/streaming first-audio latency (B=1): ms from
    # mel-ready to the FIRST audio chunk (one fixed 64+2*halo-frame window,
    # --vocoder-chunk serving) vs the one-shot whole-utterance latency.
    try:
        from daspeech_tpu.models.hifigan import (
            receptive_halo_mel, vocode_chunked)

        chunk = 64
        halo = receptive_halo_mel(voc.cfg)
        mel1 = o2[:1]                          # [1, M, 80] single utterance
        win = jax.jit(lambda m: voc.apply(vparams, m))
        first_w = mel1[:, :chunk + 2 * halo]
        sync(win(first_w))                     # compile the window shape
        dt_first = timeit(win, first_w, n=10)
        sp_first = spread()
        one1 = jax.jit(lambda m: voc.apply(vparams, m))
        sync(one1(mel1))
        dt_one = timeit(one1, mel1, n=10)
        # exactness of the full chunked path at these shapes (cheap guard)
        full_wav = np.asarray(one1(mel1))
        ch_wav = np.asarray(vocode_chunked(voc, vparams, mel1, chunk=chunk,
                                           run=win))
        ok = bool(np.allclose(full_wav, ch_wav, rtol=0, atol=2e-5))
        results.append({
            "metric": "e2e_first_chunk_latency_ms",
            "value": round(dt_first * 1e3, 2), "unit": "ms_to_first_audio",
            "vs_baseline": None, "one_shot_ms": round(dt_one * 1e3, 2),
            "chunk_frames": chunk, "halo_frames": halo,
            "chunk_audio_s": round(chunk * 256 / 22050.0, 3),
            "chunked_equals_one_shot": ok, **sp_first, **floor})
    except Exception as e:
        log(f"first-chunk latency bench failed: {type(e).__name__}: {e}")

    # --- config 5: DAG training step at max-tokens 40000
    train_rec = None
    try:
        train_rec = bench_train_step()
        results.append(train_rec)
    except Exception as e:   # never lose the headline to a train-bench issue
        log(f"train-step bench failed: {type(e).__name__}: {e}")

    # --- config 5b: SUSTAINED whole-loop training throughput through the
    # real cli.train loop (TSV/zip decode, collation, prefetch, to_device,
    # logging, checkpointing) on a recipe-scale synthetic fixture — the
    # reference's de-facto metric (trainer.py:797 hot loop incl. DataLoader
    # workers). Proves the 1-CPU host can feed the TPU.
    h2d_info = None
    try:
        h2d_info = measure_h2d()
        log(f"h2d: {h2d_info['h2d_bw_MBps']} MB/s, "
            f"rtt {h2d_info['h2d_rtt_ms']} ms")
    except Exception as e:
        log(f"h2d measure failed: {type(e).__name__}: {e}")
    try:
        results.append(bench_sustained_train(train_rec, h2d_info=h2d_info))
    except Exception as e:
        log(f"sustained-train bench failed: {type(e).__name__}: {e}")
    # the bf16-H2D rung: halve the wire bytes of the dominant transfer
    # (--h2d-dtype bfloat16), same compiled step (device-side cast back)
    try:
        results.append(bench_sustained_train(
            train_rec, updates=40, h2d_info=h2d_info,
            extra_argv=("--h2d-dtype", "bfloat16"),
            metric_name="sustained_train_bf16h2d_ms_per_update"))
    except Exception as e:
        log(f"sustained-train bf16-h2d bench failed: "
            f"{type(e).__name__}: {e}")

    # --- stage-3 joint S2ST finetune step (max-tokens 20000 recipe)
    try:
        results.append(bench_s2s_joint_step())
    except Exception as e:
        log(f"s2s-joint bench failed: {type(e).__name__}: {e}")

    # --- HiFi-GAN vocoder training step (G+D alternating update)
    try:
        results.append(bench_vocoder_train_step())
    except Exception as e:
        log(f"vocoder-train bench failed: {type(e).__name__}: {e}")

    # --- e2e with the int8 vocoder (opt-in serving mode)
    if stage3_q is not None:
        def s2st_q(fbank, src_lengths, prev, durs):
            tokens, z, zmask = stage1(fbank, src_lengths, prev)
            mel = stage2(z, zmask, durs)
            return tokens, mel, stage3_q(mel)

        sync(s2st_q(fbank, src_lengths, prev, durs))
        dt = timeit(s2st_q, fbank, src_lengths, prev, durs)
        results.append({"metric": "e2e_s2st_int8_rtf_x_realtime",
                        "value": round(audio_seconds / dt, 2),
                        "unit": "x_realtime",
                        "vs_baseline": round(audio_seconds / dt / 10.0, 3),
                        **spread(), **floor})

    # --- config 4 (headline, LAST): full two-pass S2ST
    sync(s2st(fbank, src_lengths, prev, durs))
    dt = timeit(s2st, fbank, src_lengths, prev, durs)
    rtf_x = audio_seconds / dt
    results.append({"metric": "e2e_s2st_rtf_x_realtime",
                    "value": round(rtf_x, 2), "unit": "x_realtime",
                    "vs_baseline": round(rtf_x / 10.0, 3),
                    "utt_per_sec_chip": round(B / dt, 1),
                    **spread(), **floor})

    for r in results:
        print(json.dumps(r))


def bench_train_step():
    """Config 5: S2TT DAG criterion fwd+bwd+Adam at the recipe's token
    budget (max-tokens 40000 -> B=80 x S=480), with TFLOP/s and MFU."""
    from daspeech_tpu.core.config import DAGModelConfig, VocabConfig
    from daspeech_tpu.losses import nat_dag_loss
    from daspeech_tpu.models import (
        S2TConformerDAG, graph_lengths, initialize_output_tokens)
    from daspeech_tpu.train import TrainState, make_optimizer, make_train_step

    cfg = DAGModelConfig(vocab=VocabConfig(size=128))
    # bf16 compute / fp32 params, the recipe-faithful regime (the reference
    # trains fp16 under AMP, README.md:245); the DAG DP stays fp32 inside.
    model = S2TConformerDAG(cfg, dtype=jnp.bfloat16)
    B, S, L, T = 80, 480, 240, 64
    rng = np.random.default_rng(0)
    fbank = jnp.asarray(rng.normal(size=(B, S, 80)).astype(np.float32))
    src_lengths = jnp.full((B,), S, jnp.int32)
    prev = initialize_output_tokens(
        graph_lengths(src_lengths, 0.5, 1024), L, cfg.vocab)
    tgt = jnp.asarray(rng.integers(4, 128, size=(B, T)), jnp.int32)
    tgt = tgt.at[:, 0].set(cfg.vocab.bos).at[:, T - 1].set(cfg.vocab.eos)
    batch = {"fbank": fbank, "src_lengths": src_lengths, "target": tgt,
             "prev_output_tokens": prev}

    def init_method(m):
        return m(fbank[:1], src_lengths[:1], prev[:1])

    params = fast_init(model, jax.random.key(0), init_method)
    # rbg keys: TPU-hardware RNG for the dropout masks (the train CLI
    # default); threefry costs ~50 ms/step more at these shapes.
    key = jax.random.key(0, impl="rbg")
    tx = make_optimizer(lr=5e-4, warmup_updates=10000, clip_norm=1.0)
    state = TrainState.create(params, tx)

    def loss_fn(pd, b, key, step):
        return nat_dag_loss(model, pd, b, key, jnp.asarray(0.5), cfg.vocab)

    step_jit = jax.jit(make_train_step(loss_fn, tx), donate_argnums=())
    t = time.perf_counter()
    lowered = step_jit.lower(state, batch, key)
    t_lower = time.perf_counter() - t
    t = time.perf_counter()
    compiled = lowered.compile()
    t_first = time.perf_counter() - t
    # Second AOT compile of the same lowering: served by the persistent
    # cache the first compile just populated, so this is the warm number a
    # rerun (or a later bucket-shape re-encounter) pays. Reporting BOTH
    # protects against the round-3 artifact where a warm 23 s was compared
    # against a cold 150 s and read as a 6.5x code regression (round-4
    # A/B: the round-2 code compiles cold in 95.3 s under identical
    # conditions — there was no regression, only cache state).
    t = time.perf_counter()
    lowered.compile()
    t_warm = time.perf_counter() - t
    log(f"train step: trace {t_lower:.0f}s, compile {t_first:.0f}s "
        f"(warm-cache recompile {t_warm:.1f}s)")
    flops = None
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get("flops", 0.0)) or None
    except Exception:
        pass

    dt = timeit(lambda: compiled(state, batch, key), n=10)
    rec = {"metric": "dag_train_step_ms", "value": round(dt * 1e3, 2),
           "unit": "ms_per_update_maxtokens40k", "vs_baseline": None,
           "trace_s": round(t_lower, 1), "compile_s": round(t_first, 1),
           "compile_warm_s": round(t_warm, 1), **spread()}
    if flops:
        tflops = flops / dt / 1e12
        rec["tflops"] = round(tflops, 1)
        rec["mfu_vs_v5e_bf16_peak"] = round(flops / dt / V5E_BF16_PEAK, 3)
    return rec


def _build_sustained_fixture(root, n_utts=512, seed=0,
                             frames=(380, 481), words=(24, 64)):
    """Recipe-scale synthetic S2TT corpus: zip-packed fp32 fbank (.npy,
    STORED — the reference's packed-audio layout, ``audio_utils.py:
    169-211``), a ~124-phoneme vocab (fr-en scale), and a train TSV.
    Cached across bench runs."""
    import csv
    import io
    import zipfile
    from pathlib import Path

    from daspeech_tpu.data.dictionary import Dictionary

    root = Path(root)
    tsv = root / "train.tsv"
    if tsv.exists():
        return root
    root.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    d = Dictionary()
    for i in range(124):
        d.add_symbol(f"PH{i}")
    d.save(root / "vocab.txt")
    zip_path = root / "fbank.zip"
    n_frames = []
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_STORED) as zf:
        for i in range(n_utts):
            T = int(rng.integers(*frames))      # ~4-4.8 s of 10 ms frames
            n_frames.append(T)
            buf = io.BytesIO()
            np.save(buf, rng.normal(size=(T, 80)).astype(np.float32))
            zf.writestr(f"utt{i}.npy", buf.getvalue())
    rows = []
    with zipfile.ZipFile(zip_path) as zf:
        for i, info in enumerate(zf.infolist()):
            offset = info.header_offset + len(info.FileHeader())
            n_words = int(rng.integers(*words))
            text = " ".join(f"PH{int(rng.integers(0, 124))}"
                            for _ in range(n_words))
            rows.append({
                "id": f"utt{i}",
                "audio": f"{zip_path}:{offset}:{info.file_size}",
                "n_frames": str(n_frames[i]),
                "tgt_text": text,
            })
    with open(tsv, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()),
                           delimiter="\t")
        w.writeheader()
        for r in rows:
            w.writerow(r)
    return root


class _TimedLines:
    """stdout sink recording (perf_counter, line) per emitted line."""

    def __init__(self):
        self.events = []
        self._buf = ""

    def write(self, s):
        self._buf += s
        while "\n" in self._buf:
            line, self._buf = self._buf.split("\n", 1)
            if line.strip():
                self.events.append((time.perf_counter(), line))

    def flush(self):
        pass


def bench_sustained_train(train_rec=None, updates=60, settle=10,
                          fixture_root="/tmp/daspeech_bench_train_data",
                          fixture_kwargs=None, max_tokens=40000,
                          extra_argv=(), h2d_info=None,
                          metric_name="sustained_train_ms_per_update"):
    """Sustained ms/update through the REAL ``cli.train`` loop — host input
    pipeline included — at the S2TT recipe budget (max-tokens 40000, the
    same workload as ``dag_train_step_ms``). Runs ``updates`` updates on a
    recipe-scale synthetic fixture; sustained time is measured between the
    update-``settle`` log record (after the one-time jit compile) and the
    final record, purely from host-side wall clock on the emitted log
    lines. Also reports the loop's own input accounting: mean ms/update
    blocked on the prefetch queue (``data_wait_ms``), host->device
    transfer (``h2d_ms``), and the run-level ``input_wait_frac``."""
    import contextlib

    from daspeech_tpu.cli.train import main as train_main

    root = _build_sustained_fixture(fixture_root, **(fixture_kwargs or {}))
    save_dir = str(root) + "_ckpt"
    import shutil

    shutil.rmtree(save_dir, ignore_errors=True)
    cap = _TimedLines()
    argv = [
        str(root), "--task", "nat_speech_to_text",
        "--criterion", "nat_dag_loss",
        "--save-dir", save_dir,
        "--max-update", str(updates), "--max-tokens", str(max_tokens),
        "--num-buckets", "1",             # one padded shape = one compile,
        # directly comparable to the isolated 80x480 step bench
        "--lr", "5e-4", "--warmup-updates", "10000",
        "--log-interval", str(settle),
        "--valid-subset", "missing",
        "--dtype", "bfloat16",
        "--max-source-positions", "481",
        *extra_argv,
    ]
    t0 = time.perf_counter()
    with contextlib.redirect_stdout(cap):
        rc = train_main(argv)
    if rc != 0:
        raise RuntimeError(f"cli.train exited {rc}")
    recs = []
    for t, line in cap.events:
        try:
            recs.append((t, json.loads(line)))
        except json.JSONDecodeError:
            continue
    # log-interval records only: the "done" record prints after the final
    # blocking checkpoint save, which is not part of the steady-state loop
    prog = [(t, r) for t, r in recs
            if r.get("update") and r.get("tag") == "train"
            and not r.get("done")]
    done = next((r for _, r in recs if r.get("done")), {})
    t_settle = next(t for t, r in prog if r["update"] >= settle)
    u_settle = next(r["update"] for _, r in prog if r["update"] >= settle)
    t_last, r_last = prog[-1]
    n = r_last["update"] - u_settle
    if n <= 0:
        raise RuntimeError("not enough updates to time")
    dt_ms = (t_last - t_settle) / n * 1e3
    rec = {"metric": metric_name,
           "value": round(dt_ms, 2),
           "unit": "ms_per_update_maxtokens40k_wholeloop",
           "vs_baseline": None,
           "updates_timed": n,
           "total_wall_s": round(time.perf_counter() - t0, 1),
           "data_wait_ms": r_last.get("data_wait_ms"),
           "h2d_ms": r_last.get("h2d_ms"),
           # whole-run fraction (diluted by the one-time compile) and the
           # steady-state fraction over the timed window
           "input_wait_frac": done.get("input_wait_frac"),
           "input_wait_frac_steady": round(
               ((r_last.get("data_wait_ms") or 0)
                + (r_last.get("h2d_ms") or 0)) / dt_ms, 4)}
    if train_rec:
        rec["isolated_step_ms"] = train_rec["value"]
        rec["gap_vs_isolated_pct"] = round(
            (dt_ms / train_rec["value"] - 1) * 100, 1)
    # tunnel-floor attribution: on this host's remote-TPU tunnel the
    # per-update H2D transfer serializes with device execution on the one
    # relay stream, so the sustained floor is step + batch_bytes/bandwidth
    # + a round-trip — publish it so gap_vs_isolated is attributable to
    # the tunnel vs the framework at a glance.
    batch_mb = done.get("h2d_mb_per_step")
    if batch_mb is not None:
        rec["h2d_mb_per_step"] = batch_mb
    if h2d_info:
        rec.update(h2d_info)
        if batch_mb and train_rec and h2d_info.get("h2d_bw_MBps"):
            floor = (train_rec["value"]
                     + batch_mb / h2d_info["h2d_bw_MBps"] * 1e3
                     + h2d_info["h2d_rtt_ms"])
            rec["tunnel_floor_ms_per_update"] = round(floor, 1)
            rec["gap_vs_tunnel_floor_pct"] = round(
                (dt_ms / floor - 1) * 100, 1)
    return rec


def bench_s2s_joint_step():
    """Stage-3 joint S2ST finetune step (``README.md:297-301`` recipe:
    max-tokens 20000 -> B=40 x S=480, expect strategy, tts weight 5.0),
    with TFLOP/s and MFU where XLA reports FLOPs."""
    import dataclasses

    from daspeech_tpu.core.config import (
        DAGModelConfig, S2SModelConfig, VocabConfig)
    from daspeech_tpu.losses import s2s_dag_fastspeech2_loss
    from daspeech_tpu.models import (
        S2SConformerDAGFastSpeech2, graph_lengths, initialize_output_tokens)
    from daspeech_tpu.train import TrainState, make_optimizer, make_train_step

    vocab = VocabConfig(size=128)
    cfg = S2SModelConfig(dag=DAGModelConfig(vocab=vocab))
    model = S2SConformerDAGFastSpeech2(cfg, dtype=jnp.bfloat16)
    B, S, L, T, M = 40, 480, 240, 64, 512
    rng = np.random.default_rng(0)
    fbank = jnp.asarray(rng.normal(size=(B, S, 80)).astype(np.float32))
    sl = jnp.full((B,), S, jnp.int32)
    prev = initialize_output_tokens(graph_lengths(sl, 0.5, 1024), L, vocab)
    tgt = jnp.asarray(rng.integers(4, 128, size=(B, T)), jnp.int32)
    tgt = tgt.at[:, 0].set(vocab.bos).at[:, T - 1].set(vocab.eos)
    batch = {
        "fbank": fbank, "src_lengths": sl, "target_text": tgt,
        "prev_output_tokens": prev,
        "target_audio": jnp.asarray(
            rng.normal(size=(B, M, 80)).astype(np.float32)),
        "target_audio_lengths": jnp.full((B,), M, jnp.int32),
        "durations": jnp.full((B, T - 1), 8, jnp.int32),
        "pitches": jnp.zeros((B, T - 1), jnp.float32),
        "energies": jnp.zeros((B, T - 1), jnp.float32),
    }

    def full(m):
        _, _, feats = m(fbank[:1], sl[:1], prev[:1])
        return m.synthesize(feats, jnp.zeros((1, L), bool), M)

    params = fast_init(model, jax.random.key(0), method=full)
    key = jax.random.key(0, impl="rbg")
    tx = make_optimizer(lr=1e-3, warmup_updates=10000, clip_norm=1.0)
    state = TrainState.create(params, tx)

    def loss_fn(pd, b, k, step):
        return s2s_dag_fastspeech2_loss(
            model, pd, b, k, jnp.asarray(0.1), vocab,
            tts_loss_weight=5.0, training_strategy="expect")

    step_jit = jax.jit(make_train_step(loss_fn, tx), donate_argnums=())
    t = time.perf_counter()
    compiled = step_jit.lower(state, batch, key).compile()
    log(f"s2s joint step compiled in {time.perf_counter()-t:.0f}s")
    flops = None
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get("flops", 0.0)) or None
    except Exception:
        pass
    dt = timeit(lambda: compiled(state, batch, key), n=10)
    rec = {"metric": "s2s_joint_step_ms", "value": round(dt * 1e3, 2),
           "unit": "ms_per_update_maxtokens20k", "vs_baseline": None,
           **spread()}
    if flops:
        rec["tflops"] = round(flops / dt / 1e12, 1)
        rec["mfu_vs_v5e_bf16_peak"] = round(flops / dt / V5E_BF16_PEAK, 3)
    return rec


def bench_vocoder_train_step():
    """HiFi-GAN training step: alternating D/G update with the mel loss
    (``hifi-gan/train.py:118-171``) at the reference's batch 16 x 8192
    segment."""
    from daspeech_tpu.core.config import HiFiGANConfig
    from daspeech_tpu.data.audio_utils import _slaney_mel
    from daspeech_tpu.train.vocoder_train import VocoderTrainer

    cfg = HiFiGANConfig()
    hop = cfg.hop_size
    mel_basis = jnp.asarray(_slaney_mel(cfg.num_mels, 1024, 22050,
                                        0.0, 8000.0))
    win = jnp.asarray(np.hanning(1025)[:-1].astype(np.float32))

    def mel_fn(wav):
        pad = (1024 - hop) // 2
        w = jnp.pad(wav, ((0, 0), (pad, pad)), mode="reflect")
        n_frames = 1 + (w.shape[1] - 1024) // hop
        idx = (jnp.arange(1024)[None, :]
               + hop * jnp.arange(n_frames)[:, None])
        frames = w[:, idx] * win[None, None, :]
        spec = jnp.abs(jnp.fft.rfft(frames, axis=-1))
        mel = jnp.einsum("btf,fm->btm", spec, mel_basis)
        return jnp.log(jnp.maximum(mel, 1e-5))

    seg = 8192
    # gen_fold=128: the folded (space-to-depth) generator execution the
    # serving path built, now applied to training (G fwd AND bwd); grads
    # are parity-tested vs the unfolded path in tests/test_vocoder_train.py
    trainer = VocoderTrainer(cfg, mel_fn=mel_fn, segment_size=seg,
                             gen_fold=128)
    state = trainer.init_state(jax.random.key(0))
    B = 16
    rng = np.random.default_rng(0)
    mel = jnp.asarray(
        rng.normal(size=(B, seg // hop, cfg.num_mels)).astype(np.float32))
    wav = jnp.asarray(
        (0.1 * rng.normal(size=(B, seg))).astype(np.float32))
    # two jits (D update / G update): each compiles independently (the
    # round-4 fused step was the suite's worst compile at 206 s)
    t = time.perf_counter()
    d_low = jax.jit(trainer.d_update).lower(state, mel, wav)
    d_comp = d_low.compile()
    t_d = time.perf_counter() - t
    t = time.perf_counter()
    g_low = jax.jit(trainer.g_update).lower(state, mel, wav)
    g_comp = g_low.compile()
    t_g = time.perf_counter() - t
    log(f"vocoder train compiled: D {t_d:.0f}s + G {t_g:.0f}s")

    def flops_of(comp):
        try:
            ca = comp.cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            return float(ca.get("flops", 0.0)) or None
        except Exception:
            return None

    fl_d, fl_g = flops_of(d_comp), flops_of(g_comp)
    dt_d = timeit(lambda: d_comp(state, mel, wav), n=10)
    dt_g = timeit(lambda: g_comp(state, mel, wav), n=10)

    def step(state, mel, wav):
        state, d_loss = d_comp(state, mel, wav)
        state, m = g_comp(state, mel, wav)
        return state, m

    dt = timeit(lambda: step(state, mel, wav), n=10)
    rec = {"metric": "hifigan_train_step_ms", "value": round(dt * 1e3, 2),
           "unit": "ms_per_update_b16_seg8192", "vs_baseline": None,
           "d_update_ms": round(dt_d * 1e3, 2),
           "g_update_ms": round(dt_g * 1e3, 2),
           "compile_d_s": round(t_d, 1), "compile_g_s": round(t_g, 1),
           **spread()}
    if fl_d and fl_g:
        rec["tflops"] = round((fl_d + fl_g) / dt / 1e12, 1)
        rec["mfu_vs_v5e_bf16_peak"] = round(
            (fl_d + fl_g) / dt / V5E_BF16_PEAK, 3)
        rec["d_tflops"] = round(fl_d / dt_d / 1e12, 1)
        rec["g_tflops"] = round(fl_g / dt_g / 1e12, 1)
    return rec


if __name__ == "__main__":
    main()
