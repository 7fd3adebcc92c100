"""Learnability test: the full GLAT + DAG-loss training pipeline must learn
a deterministic synthetic fbank->phoneme mapping, and lookahead decoding
must recover the sequences. This is the semantic end-to-end check the
reference only gets from multi-day GPU runs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from testutils import fast_init

from daspeech_tpu.core.config import (
    ConformerConfig,
    DAGDecoderConfig,
    DAGModelConfig,
    DecodeConfig,
    VocabConfig,
)
from daspeech_tpu.decode import greedy_or_lookahead_decode
from daspeech_tpu.losses import nat_dag_loss
from daspeech_tpu.models import (
    S2TConformerDAG,
    graph_lengths,
    initialize_output_tokens,
)
from daspeech_tpu.train import TrainState, make_optimizer, make_train_step

pytestmark = pytest.mark.slow

N_PHONES = 8           # symbols 4..11
FRAMES_PER_PHONE = 8   # so 4x subsampling leaves 2 encoder frames per phone


def synth_batch(rng, vocab, B=8, n_phones=4):
    """Each phoneme renders as a distinctive 80-dim pattern over 8 frames."""
    codes = np.linspace(-1, 1, N_PHONES)
    toks = rng.integers(4, 4 + N_PHONES, size=(B, n_phones))
    S = n_phones * FRAMES_PER_PHONE
    fbank = np.zeros((B, S, 80), np.float32)
    for b in range(B):
        for i, t in enumerate(toks[b]):
            block = np.zeros(80, np.float32)
            block[(t - 4) * 10: (t - 4) * 10 + 10] = 2.0
            fbank[b, i * FRAMES_PER_PHONE: (i + 1) * FRAMES_PER_PHONE] = block
    target = np.full((B, n_phones + 2), vocab.pad, np.int32)
    target[:, 0] = vocab.bos
    target[:, 1:-1] = toks
    target[:, -1] = vocab.eos
    src_lengths = np.full((B,), S, np.int32)
    return fbank, src_lengths, target


@pytest.mark.slow
class TestLearnability:
    def test_dag_training_learns_synthetic_mapping(self):
        vocab = VocabConfig(size=16)
        cfg = DAGModelConfig(
            vocab=vocab,
            encoder=ConformerConfig(
                embed_dim=32, ffn_dim=64, num_layers=2, num_heads=2,
                conv_channels=32, depthwise_kernel_size=7, dropout=0.0,
                attn_dropout=0.0),
            decoder=DAGDecoderConfig(
                embed_dim=32, ffn_dim=64, num_layers=2, num_heads=2,
                dropout=0.0, attn_dropout=0.0, activation_dropout=0.0,
                max_target_positions=64),
        )
        model = S2TConformerDAG(cfg)
        rng = np.random.default_rng(0)
        n_phones, B = 4, 16
        S = n_phones * FRAMES_PER_PHONE
        L = 16  # graph = 0.5 * 32 = 16

        fbank, src_lengths, target = synth_batch(rng, vocab, B, n_phones)
        prev = initialize_output_tokens(
            graph_lengths(jnp.asarray(src_lengths), 0.5, 64), L, vocab)
        batch = {
            "fbank": jnp.asarray(fbank),
            "src_lengths": jnp.asarray(src_lengths),
            "target": jnp.asarray(target),
            "prev_output_tokens": prev,
        }
        variables = fast_init(model, jax.random.key(0), batch["fbank"],
                              batch["src_lengths"], prev)
        tx = make_optimizer(lr=2e-3, warmup_updates=20, clip_norm=1.0,
                            weight_decay=0.0)
        state = TrainState.create(variables, tx)

        def loss_fn(pd, b, key, step):
            return nat_dag_loss(model, pd, b, key, jnp.asarray(0.5), vocab)

        step = jax.jit(make_train_step(loss_fn, tx), donate_argnums=0)

        losses = []
        key = jax.random.key(1)
        for i in range(400):
            # fresh random batch every step: the model must learn the rule
            fb, sl, tg = synth_batch(rng, vocab, B, n_phones)
            b = {"fbank": jnp.asarray(fb), "src_lengths": jnp.asarray(sl),
                 "target": jnp.asarray(tg), "prev_output_tokens": prev}
            state, metrics = step(state, b, key)
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])

        # decode a held-out batch and require exact sequence recovery
        fb, sl, tg = synth_batch(np.random.default_rng(123), vocab, 8,
                                 n_phones)
        logits, links, _ = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            jnp.asarray(fb), jnp.asarray(sl), prev[:8])
        ol = jnp.sum(prev[:8] != vocab.pad, axis=1)
        res = greedy_or_lookahead_decode(logits, links, ol, vocab.pad, 1.0,
                                         True)
        correct = 0
        for b in range(8):
            n = int(res.lengths[b])
            hyp = np.asarray(res.tokens)[b, :n].tolist()
            want = [vocab.bos] + tg[b, 1:-1].tolist() + [vocab.eos]
            correct += hyp == want
        # the mapping is trivial; at least 6/8 must decode exactly
        assert correct >= 6, (correct, losses[-1])


@pytest.mark.slow
class TestJointLearnability:
    def test_s2s_joint_training_learns(self):
        """The expect-strategy joint criterion must reduce both the DAG and
        TTS losses on a synthetic fbank->phoneme->mel task."""
        from daspeech_tpu.core.config import (
            FastSpeech2Config, S2SModelConfig)
        from daspeech_tpu.losses import s2s_dag_fastspeech2_loss
        from daspeech_tpu.models import S2SConformerDAGFastSpeech2

        vocab = VocabConfig(size=16)
        cfg = S2SModelConfig(
            dag=DAGModelConfig(
                vocab=vocab,
                encoder=ConformerConfig(
                    embed_dim=32, ffn_dim=64, num_layers=2, num_heads=2,
                    conv_channels=32, depthwise_kernel_size=7, dropout=0.0,
                    attn_dropout=0.0),
                decoder=DAGDecoderConfig(
                    embed_dim=32, ffn_dim=64, num_layers=2, num_heads=2,
                    dropout=0.0, attn_dropout=0.0, activation_dropout=0.0,
                    max_target_positions=64)),
            tts=FastSpeech2Config(
                encoder_layers=1, encoder_embed_dim=32, encoder_heads=2,
                decoder_layers=1, decoder_embed_dim=32, decoder_heads=2,
                fft_hidden_dim=64, var_pred_hidden_dim=16,
                var_pred_n_bins=8, dropout=0.0, attention_dropout=0.0,
                var_pred_dropout=0.0),
            adaptor_ffn_dim=64, adaptor_dropout=0.0)
        model = S2SConformerDAGFastSpeech2(cfg)
        rng = np.random.default_rng(0)
        n_ph, B, L, DUR = 4, 16, 16, 4
        T = n_ph + 2
        M = (T - 1) * DUR

        def s2s_batch():
            fb, sl, tg = synth_batch(rng, vocab, B, n_ph)
            mel = np.zeros((B, M, 80), np.float32)
            toks = tg[:, 1:]
            for b in range(B):
                for i in range(T - 1):
                    t = toks[b, i]
                    mel[b, i * DUR:(i + 1) * DUR,
                        (t % 16) * 5:(t % 16) * 5 + 5] = 1.0
            return {
                "fbank": jnp.asarray(fb), "src_lengths": jnp.asarray(sl),
                "target_text": jnp.asarray(tg),
                "prev_output_tokens": initialize_output_tokens(
                    graph_lengths(jnp.asarray(sl), 0.5, 64), L, vocab),
                "target_audio": jnp.asarray(mel),
                "target_audio_lengths": jnp.full((B,), M, jnp.int32),
                "durations": jnp.full((B, T - 1), DUR, jnp.int32),
                "pitches": jnp.zeros((B, T - 1), jnp.float32),
                "energies": jnp.zeros((B, T - 1), jnp.float32),
            }

        b0 = s2s_batch()

        def full(m):
            _, _, feats = m(b0["fbank"], b0["src_lengths"],
                            b0["prev_output_tokens"])
            return m.synthesize(feats, jnp.zeros((B, L), bool), M)

        variables = fast_init(model, jax.random.key(0), method=full)
        tx = make_optimizer(lr=2e-3, warmup_updates=20, clip_norm=1.0,
                            weight_decay=0.0)
        state = TrainState.create(variables, tx)

        def loss_fn(pd, b, key, step):
            return s2s_dag_fastspeech2_loss(
                model, pd, b, key, jnp.asarray(0.5), vocab,
                tts_loss_weight=5.0, training_strategy="expect")

        step = jax.jit(make_train_step(loss_fn, tx), donate_argnums=0)
        key = jax.random.key(1)
        first = None
        for i in range(200):
            state, m = step(state, s2s_batch(), key)
            if first is None:
                first = (float(m["dag-loss"]), float(m["tts-loss"]))
        last = (float(m["dag-loss"]), float(m["tts-loss"]))
        assert last[0] < first[0] * 0.6, (first, last)
        assert last[1] < first[1] * 0.5, (first, last)
