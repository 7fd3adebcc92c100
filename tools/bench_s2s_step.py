"""Stage-3 joint S2ST finetune step timing at the recipe budget
(max-tokens 20000: B=40 x 480 frames) with the round-3 kernels."""
import sys, time
sys.path.insert(0, ".")
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from daspeech_tpu.core.config import (DAGModelConfig, S2SModelConfig,
                                      VocabConfig)
from daspeech_tpu.losses import s2s_dag_fastspeech2_loss
from daspeech_tpu.models import (S2SConformerDAGFastSpeech2, graph_lengths,
                                 initialize_output_tokens)
from daspeech_tpu.train import TrainState, make_optimizer, make_train_step
from bench import fast_init, sync

vocab = VocabConfig(size=128)
cfg = S2SModelConfig(dag=DAGModelConfig(vocab=vocab))
model = S2SConformerDAGFastSpeech2(cfg, dtype=jnp.bfloat16)
B, S, L, T = 40, 480, 240, 64
M = 512
rng = np.random.default_rng(0)
fbank = jnp.asarray(rng.normal(size=(B, S, 80)).astype(np.float32))
sl = jnp.full((B,), S, jnp.int32)
prev = initialize_output_tokens(graph_lengths(sl, 0.5, 1024), L, vocab)
tgt = jnp.asarray(rng.integers(4, 128, size=(B, T)), jnp.int32)
tgt = tgt.at[:, 0].set(vocab.bos).at[:, T - 1].set(vocab.eos)
batch = {
    "fbank": fbank, "src_lengths": sl, "target_text": tgt,
    "prev_output_tokens": prev,
    "target_audio": jnp.asarray(rng.normal(size=(B, M, 80)).astype(np.float32)),
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

step = jax.jit(make_train_step(loss_fn, tx))
t0 = time.perf_counter()
out = step(state, batch, key); sync(out)
print(f"compiled in {time.perf_counter()-t0:.0f}s")
best = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    for _ in range(10):
        out = step(state, batch, key)
    sync(out)
    best = min(best, (time.perf_counter() - t0) / 10 * 1e3)
print(f"stage-3 joint step: {best:.1f} ms/update")
