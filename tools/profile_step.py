"""Component-level timing of the flagship DAG training step on the real chip.

Times each stage of the nat_dag_loss criterion as its own jit (each number
carries ~1.2 ms of tunnel dispatch floor) plus the composed criterion and the
full optimizer step, so COVERAGE.md's performance narrative stays honest.

Usage:  python tools/profile_step.py [--fp32] [--no-fused-attention]
        [--no-fused-links]
"""

import argparse
import sys

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, ".")


# one timing implementation for every tool: bench.timeit's forced
# device->host sync and best-of-3 jitter filter (the remote-TPU tunnel adds
# run-to-run noise that a single-rep mean keeps)
from bench import sync, timeit as _bench_timeit  # noqa: E402


def timeit(fn, *args, n=20):
    return _bench_timeit(fn, *args, n=n) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fp32", action="store_true")
    ap.add_argument("--no-fused-attention", action="store_true")
    ap.add_argument("--no-fused-links", action="store_true")
    args = ap.parse_args()

    from daspeech_tpu.core.config import DAGModelConfig, VocabConfig
    import dataclasses
    from daspeech_tpu.losses import nat_dag_loss
    from daspeech_tpu.losses.dag_loss import compute_dag_loss, glat_glance
    from daspeech_tpu.models import (
        S2TConformerDAG, graph_lengths, initialize_output_tokens)
    from daspeech_tpu.train import TrainState, make_optimizer, make_train_step
    from bench import fast_init

    cfg = DAGModelConfig(vocab=VocabConfig(size=128))
    if args.no_fused_attention:
        cfg = dataclasses.replace(
            cfg, decoder=dataclasses.replace(cfg.decoder,
                                             fused_attention=False))
    if args.no_fused_links:
        cfg = dataclasses.replace(
            cfg, decoder=dataclasses.replace(cfg.decoder,
                                             fused_links=False))
    dtype = jnp.float32 if args.fp32 else jnp.bfloat16
    model = S2TConformerDAG(cfg, dtype=dtype)
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

    params = fast_init(
        model, jax.random.key(0),
        lambda m: m(fbank[:1], src_lengths[:1], prev[:1]))
    key = jax.random.key(0, impl="rbg")
    enc_vars = {"params": params["params"]}
    if "batch_stats" in params:
        enc_vars["batch_stats"] = params["batch_stats"]
    rngs = {"dropout": key}

    rows = []

    def rec(name, ms):
        rows.append((name, ms))
        print(f"{name:42s} {ms:8.2f} ms", flush=True)

    # --- encoder fwd
    @jax.jit
    def enc_fwd(p):
        vars_ = {"params": p["params"], "batch_stats": p.get("batch_stats")}
        out, _ = model.apply(vars_, fbank, src_lengths, train=True,
                             rngs=rngs, method=model.encode,
                             mutable=["batch_stats"])
        return out[0]
    rec("encoder fwd (train)", timeit(enc_fwd, params))

    # --- encoder fwd+bwd (sum-of-output cotangent)
    @jax.jit
    def enc_grad(p):
        def f(pp):
            vars_ = {"params": pp["params"],
                     "batch_stats": p.get("batch_stats")}
            out, _ = model.apply(vars_, fbank, src_lengths, train=True,
                                 rngs=rngs, method=model.encode,
                                 mutable=["batch_stats"])
            return jnp.sum(out[0].astype(jnp.float32))
        return jax.grad(f)(p)["params"]["encoder"]
    rec("encoder fwd+bwd", timeit(enc_grad, params))

    enc_out = enc_fwd(params)
    enc = enc_out
    enc_pad = jnp.zeros((B, enc.shape[1]), bool)

    # --- decoder extract_features fwd
    @jax.jit
    def dec_feats(p, enc):
        return model.apply(
            {"params": p["params"]}, prev, enc, enc_pad, True,
            rngs=rngs, method=lambda m, *a: m.decoder.extract_features(*a))
    rec("decoder extract_features fwd (train)", timeit(dec_feats, params, enc))

    feats = dec_feats(params, enc)

    # --- decoder features fwd+bwd
    @jax.jit
    def dec_grad(p, enc):
        def f(pp):
            out = model.apply(
                {"params": pp["params"]}, prev, enc, enc_pad, True,
                rngs=rngs, method=lambda m, *a: m.decoder.extract_features(*a))
            return jnp.sum(out.astype(jnp.float32))
        return jax.grad(f)(p)["params"]["decoder"]
    rec("decoder extract_features fwd+bwd", timeit(dec_grad, params, enc))

    # --- links fwd
    @jax.jit
    def links_fwd(p, feats):
        return model.apply(
            {"params": p["params"]}, feats, prev, True,
            method=lambda m, *a: m.decoder.extract_links(*a))
    rec("extract_links fwd", timeit(links_fwd, params, feats))

    # --- links fwd+bwd
    @jax.jit
    def links_grad(p, feats):
        def f(pp, ff):
            out = model.apply(
                {"params": pp["params"]}, ff, prev, True,
                method=lambda m, *a: m.decoder.extract_links(*a))
            return jnp.sum(jnp.where(jnp.isfinite(out), out, 0.0))
        return jax.grad(f, argnums=(0, 1))(p, feats)[1]
    rec("extract_links fwd+bwd", timeit(links_grad, params, feats))

    # --- output layer (logits)
    @jax.jit
    def out_layer(p, feats):
        return model.apply(
            {"params": p["params"]}, feats,
            method=lambda m, f: m.decoder.output_layer(f))
    rec("output_layer fwd", timeit(out_layer, params, feats))

    logits = out_layer(params, feats)
    links = links_fwd(params, feats)

    # --- glat glance (argmax + match + Viterbi + oracle mix)
    @jax.jit
    def glance(logits, links):
        return glat_glance(key, logits.astype(jnp.float32), links, tgt, prev,
                           jnp.asarray(0.5), cfg.vocab.pad, "number-random")
    rec("glat_glance (Viterbi align + mix)", timeit(glance, logits, links))

    gi = glance(logits, links)

    # --- dag loss fwd
    @jax.jit
    def dloss(logits, links, prev2, mm, km):
        return compute_dag_loss(
            logits.astype(jnp.float32), links, tgt, prev2, cfg.vocab.pad,
            matchmask=mm, keep_word_mask=km)[0]
    rec("compute_dag_loss fwd", timeit(
        dloss, logits, links, gi.prev_output_tokens, gi.matchmask,
        gi.keep_word_mask))

    # --- full criterion fwd
    def loss_fn(pd, b, key, step):
        return nat_dag_loss(model, pd, b, key, jnp.asarray(0.5), cfg.vocab)

    @jax.jit
    def crit_fwd(p):
        return loss_fn(p, batch, key, 0)[0]
    rec("criterion fwd (both passes)", timeit(crit_fwd, params))

    # --- criterion fwd+grad
    @jax.jit
    def crit_grad(p):
        return jax.grad(lambda pp: loss_fn(pp, batch, key, 0)[0])(p)
    rec("criterion fwd+grad", timeit(crit_grad, params))

    # --- full train step
    tx = make_optimizer(lr=5e-4, warmup_updates=10000, clip_norm=1.0)
    state = TrainState.create(params, tx)
    step_jit = jax.jit(make_train_step(loss_fn, tx), donate_argnums=())
    rec("full train step", timeit(lambda: step_jit(state, batch, key), n=10))

    print("\nsummary:")
    for name, ms in rows:
        print(f"  {name}: {ms:.2f}")


if __name__ == "__main__":
    main()
