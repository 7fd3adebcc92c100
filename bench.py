"""End-to-end fr-en S2ST inference benchmark (BASELINE.json config 4).

Measures the full two-pass pipeline on one TPU chip at CVSS-C-realistic
shapes and the recipe's model dims (``/root/reference/README.md:233-237,
297-301``): 80-dim fbank -> Conformer 12L x 256d -> DAG decoder 4L x 512d
(graph = 0.5 * src frames) -> lookahead decode -> path-feature gather ->
FastSpeech2 4+4L x 256d -> HiFi-GAN config_v1 -> 22.05 kHz waveform.

Weights are random this round (no trained checkpoint yet), so durations are
teacher-forced to fill the mel bucket — random-weight predicted durations
collapse to ~0 frames which would fake an unrealistically high RTF. The
measured compute therefore matches the trained-model inference workload at
these shapes.

Prints ONE JSON line:
  {"metric": "e2e_s2st_rtf_x_realtime", "value": R, "unit": "x_realtime",
   "vs_baseline": R / 10.0}
(vs_baseline is relative to the 10x-real-time-per-chip north star in
BASELINE.md; the reference repo publishes no quantitative baseline.)
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

# TPU executable cache: the first bench run on a fresh machine pays the full
# compile; subsequent runs (e.g. the driver's) load from cache.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    import sys
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
    voc = HiFiGANGenerator(HiFiGANConfig())

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

    params = fast_init(model, jax.random.key(0), full)
    vparams = fast_init(
        voc, jax.random.key(1),
        lambda m: m(jnp.zeros((B, M, 80))))

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

    import sys

    def log(msg):
        print(msg, file=sys.stderr, flush=True)

    args = (fbank, src_lengths, prev, durs)
    t = time.perf_counter()
    o1 = stage1(fbank, src_lengths, prev)
    jax.block_until_ready(o1)
    log(f"stage1 (DAG+decode) compiled in {time.perf_counter()-t:.0f}s")
    t = time.perf_counter()
    o2 = stage2(o1[1], o1[2], durs)
    jax.block_until_ready(o2)
    log(f"stage2 (FastSpeech2) compiled in {time.perf_counter()-t:.0f}s")
    t = time.perf_counter()
    jax.block_until_ready(stage3(o2))
    log(f"stage3 (HiFi-GAN) compiled in {time.perf_counter()-t:.0f}s")
    jax.block_until_ready(s2st(*args))          # compile
    n_iters = 10
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = s2st(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n_iters

    audio_seconds = B * M * 256 / 22050.0
    rtf_x = audio_seconds / dt
    print(json.dumps({
        "metric": "e2e_s2st_rtf_x_realtime",
        "value": round(rtf_x, 2),
        "unit": "x_realtime",
        "vs_baseline": round(rtf_x / 10.0, 3),
    }))


if __name__ == "__main__":
    main()
