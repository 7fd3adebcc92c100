"""Capture a jax.profiler trace of the flagship train step (and the decoder
forward alone) for op-level analysis. Writes to /tmp/trace_step/."""

import sys

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, ".")


from bench import sync  # noqa: E402  (one forced-sync implementation)


def main():
    from daspeech_tpu.core.config import DAGModelConfig, VocabConfig
    from daspeech_tpu.losses import nat_dag_loss
    from daspeech_tpu.models import (
        S2TConformerDAG, graph_lengths, initialize_output_tokens)
    from daspeech_tpu.train import TrainState, make_optimizer, make_train_step
    from bench import fast_init

    cfg = DAGModelConfig(vocab=VocabConfig(size=128))
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

    params = fast_init(
        model, jax.random.key(0),
        lambda m: m(fbank[:1], src_lengths[:1], prev[:1]))
    key = jax.random.key(0, impl="rbg")

    def loss_fn(pd, b, key, step):
        return nat_dag_loss(model, pd, b, key, jnp.asarray(0.5), cfg.vocab)

    tx = make_optimizer(lr=5e-4, warmup_updates=10000, clip_norm=1.0)
    state = TrainState.create(params, tx)
    step_jit = jax.jit(make_train_step(loss_fn, tx), donate_argnums=())

    sync(step_jit(state, batch, key))
    print("compiled; tracing...", flush=True)
    with jax.profiler.trace("/tmp/trace_step"):
        for _ in range(5):
            out = step_jit(state, batch, key)
        sync(out)
    print("trace done", flush=True)


if __name__ == "__main__":
    main()
