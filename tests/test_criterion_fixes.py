"""Regression tests for criterion-level training-path semantics:

- ``--dag-freezing-steps`` freezes DAG grads only while step <= N, traced
  on the step (reference: ``s2s_dag_fastspeech2_loss.py:195``).
- ``sample_mask`` gives the duplicate rows BucketBatcher uses to fill short
  batches zero weight in losses and token counts (reference: true
  sample_size weighting, ``fairseq/trainer.py:932-953``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from testutils import fast_init

from daspeech_tpu.core.config import (
    ConformerConfig,
    DAGDecoderConfig,
    DAGModelConfig,
    FastSpeech2Config,
    S2SModelConfig,
    VocabConfig,
)
from daspeech_tpu.losses import nat_dag_loss, s2s_dag_fastspeech2_loss
from daspeech_tpu.losses.s2s_loss import conditional_stop_gradient
from daspeech_tpu.models import (
    S2SConformerDAGFastSpeech2,
    S2TConformerDAG,
    graph_lengths,
    initialize_output_tokens,
)

VOCAB = VocabConfig(size=16)


def tiny_s2s_cfg():
    return S2SModelConfig(
        dag=DAGModelConfig(
            vocab=VOCAB,
            encoder=ConformerConfig(
                embed_dim=16, ffn_dim=32, num_layers=1, num_heads=2,
                conv_channels=16, depthwise_kernel_size=7, dropout=0.0,
                attn_dropout=0.0),
            decoder=DAGDecoderConfig(
                embed_dim=16, ffn_dim=32, num_layers=1, num_heads=2,
                dropout=0.0, attn_dropout=0.0, activation_dropout=0.0,
                max_target_positions=32)),
        tts=FastSpeech2Config(
            encoder_layers=1, encoder_embed_dim=16, encoder_heads=2,
            decoder_layers=1, decoder_embed_dim=16, decoder_heads=2,
            fft_hidden_dim=32, var_pred_hidden_dim=8, var_pred_n_bins=4,
            dropout=0.0, attention_dropout=0.0, var_pred_dropout=0.0),
        adaptor_ffn_dim=32, adaptor_dropout=0.0)


def s2s_batch(B=2, S=16, L=8, T=5, M=8, seed=0):
    rng = np.random.default_rng(seed)
    fbank = jnp.asarray(rng.normal(size=(B, S, 80)).astype(np.float32))
    src_lengths = jnp.full((B,), S, jnp.int32)
    prev = initialize_output_tokens(
        graph_lengths(src_lengths, 0.5, 64), L, VOCAB)
    tgt = jnp.asarray(rng.integers(4, VOCAB.size, size=(B, T)), jnp.int32)
    tgt = tgt.at[:, 0].set(VOCAB.bos).at[:, T - 1].set(VOCAB.eos)
    return {
        "fbank": fbank, "src_lengths": src_lengths, "target_text": tgt,
        "prev_output_tokens": prev,
        "target_audio": jnp.asarray(
            rng.normal(size=(B, M, 80)).astype(np.float32)),
        "target_audio_lengths": jnp.full((B,), M, jnp.int32),
        "durations": jnp.full((B, T - 1), M // (T - 1), jnp.int32),
        "pitches": jnp.zeros((B, T - 1), jnp.float32),
        "energies": jnp.zeros((B, T - 1), jnp.float32),
    }


def rows(batch, idx):
    """Row-select every [B, ...] leaf of a batch."""
    idx = np.asarray(idx)
    return {k: v[idx] for k, v in batch.items()}


class TestConditionalStopGradient:
    def test_traced_condition_gates_grads(self):
        def f(x, frozen):
            return jnp.sum(conditional_stop_gradient(x, frozen) ** 2)

        x = jnp.asarray([1.0, 2.0])
        g_frozen = jax.grad(f)(x, jnp.asarray(True))
        g_live = jax.grad(f)(x, jnp.asarray(False))
        np.testing.assert_allclose(np.asarray(g_frozen), 0.0)
        np.testing.assert_allclose(np.asarray(g_live), [2.0, 4.0])
        # python bools still take the static path
        np.testing.assert_allclose(np.asarray(jax.grad(f)(x, True)), 0.0)
        # values are identical regardless of freezing
        assert float(f(x, jnp.asarray(True))) == float(f(x, False))


class TestDagFreezing:
    def test_freeze_until_step(self):
        """DAG grads must be exactly zero while step <= N and nonzero after,
        with TTS grads alive in both regimes."""
        cfg = tiny_s2s_cfg()
        model = S2SConformerDAGFastSpeech2(cfg)
        batch = s2s_batch()
        B, L = batch["prev_output_tokens"].shape
        M = batch["target_audio"].shape[1]

        def full(m):
            _, _, feats = m(batch["fbank"], batch["src_lengths"],
                            batch["prev_output_tokens"])
            return m.synthesize(feats, jnp.zeros((B, L), bool), M)

        variables = fast_init(model, jax.random.key(0), method=full)
        N = 5

        @jax.jit
        def grads_at(step):
            def lossf(params):
                freeze = step <= N
                loss, _ = s2s_dag_fastspeech2_loss(
                    model,
                    {"params": params,
                     "batch_stats": variables.get("batch_stats", {})},
                    batch, jax.random.key(1), jnp.asarray(0.0), VOCAB,
                    glance_strategy=None, freeze_dag=freeze, train=False)
                return loss
            return jax.grad(lossf)(variables["params"])

        g_frozen = grads_at(jnp.asarray(3))
        g_live = grads_at(jnp.asarray(9))

        def total(tree):
            return sum(float(jnp.abs(x).sum())
                       for x in jax.tree.leaves(tree))

        assert total(g_frozen["dag"]) == 0.0
        assert total(g_live["dag"]) > 0.0
        assert total(g_frozen["tts"]) > 0.0
        assert total(g_live["tts"]) > 0.0


class TestSampleMask:
    def test_nat_dag_loss_padded_equals_unpadded(self):
        cfg = DAGModelConfig(
            vocab=VOCAB,
            encoder=ConformerConfig(
                embed_dim=16, ffn_dim=32, num_layers=1, num_heads=2,
                conv_channels=16, depthwise_kernel_size=7, dropout=0.0,
                attn_dropout=0.0),
            decoder=DAGDecoderConfig(
                embed_dim=16, ffn_dim=32, num_layers=1, num_heads=2,
                dropout=0.0, attn_dropout=0.0, activation_dropout=0.0,
                max_target_positions=32))
        model = S2TConformerDAG(cfg)
        rng = np.random.default_rng(3)
        B, S, L, T = 2, 16, 8, 5
        fbank = jnp.asarray(rng.normal(size=(B, S, 80)).astype(np.float32))
        # distinct source lengths so a mixed-up mask would change the loss
        src_lengths = jnp.asarray([S, S - 4], jnp.int32)
        prev = initialize_output_tokens(
            graph_lengths(src_lengths, 0.5, 64), L, VOCAB)
        tgt = jnp.asarray(rng.integers(4, VOCAB.size, size=(B, T)), jnp.int32)
        tgt = tgt.at[:, 0].set(VOCAB.bos).at[:, T - 1].set(VOCAB.eos)
        real = {"fbank": fbank, "src_lengths": src_lengths, "target": tgt,
                "prev_output_tokens": prev}
        variables = fast_init(model, jax.random.key(0), fbank, src_lengths,
                              prev)
        padded = rows(real, [0, 1, 0, 0])
        padded["sample_mask"] = jnp.asarray([1.0, 1.0, 0.0, 0.0])

        def run(b):
            loss, aux = nat_dag_loss(
                model,
                {"params": variables["params"],
                 "batch_stats": variables.get("batch_stats", {})},
                b, jax.random.key(1), jnp.asarray(0.0), VOCAB,
                glance_strategy=None, train=False)
            return loss, aux["metrics"]

        loss_real, m_real = run(real)
        loss_pad, m_pad = run(padded)
        np.testing.assert_allclose(
            float(loss_pad), float(loss_real), rtol=1e-5)
        assert int(m_pad["nsentences"]) == int(m_real["nsentences"]) == 2
        assert int(m_pad["ntokens"]) == int(m_real["ntokens"])

    def test_s2s_loss_padded_equals_unpadded(self):
        cfg = tiny_s2s_cfg()
        model = S2SConformerDAGFastSpeech2(cfg)
        real = s2s_batch(B=2)
        B, L = real["prev_output_tokens"].shape
        M = real["target_audio"].shape[1]

        def full(m):
            _, _, feats = m(real["fbank"], real["src_lengths"],
                            real["prev_output_tokens"])
            return m.synthesize(feats, jnp.zeros((B, L), bool), M)

        variables = fast_init(model, jax.random.key(0), method=full)
        padded = rows(real, [0, 1, 0])
        padded["sample_mask"] = jnp.asarray([1.0, 1.0, 0.0])

        def run(b):
            loss, aux = s2s_dag_fastspeech2_loss(
                model,
                {"params": variables["params"],
                 "batch_stats": variables.get("batch_stats", {})},
                b, jax.random.key(1), jnp.asarray(0.0), VOCAB,
                glance_strategy=None, train=False)
            return loss, aux["metrics"]

        loss_real, m_real = run(real)
        loss_pad, m_pad = run(padded)
        np.testing.assert_allclose(
            float(loss_pad), float(loss_real), rtol=1e-5)
        np.testing.assert_allclose(
            float(m_pad["tts-loss"]), float(m_real["tts-loss"]), rtol=1e-5)

    def test_fastspeech2_criterion_padded_equals_unpadded(self):
        from daspeech_tpu.losses.tts_loss import fastspeech2_criterion
        from daspeech_tpu.models.fastspeech2 import FastSpeech2Encoder

        cfg = FastSpeech2Config(
            encoder_layers=1, encoder_embed_dim=16, encoder_heads=2,
            decoder_layers=1, decoder_embed_dim=16, decoder_heads=2,
            fft_hidden_dim=32, var_pred_hidden_dim=8, var_pred_n_bins=4,
            dropout=0.0, attention_dropout=0.0, var_pred_dropout=0.0)
        model = FastSpeech2Encoder(cfg, vocab_size=VOCAB.size, pad=VOCAB.pad)
        rng = np.random.default_rng(5)
        B, T, M = 2, 4, 8
        toks = jnp.asarray(rng.integers(4, VOCAB.size, size=(B, T)),
                           jnp.int32)
        real = {
            "src_tokens": toks,
            "target_audio": jnp.asarray(
                rng.normal(size=(B, M, 80)).astype(np.float32)),
            "target_audio_lengths": jnp.asarray([M, M - 2], jnp.int32),
            "durations": jnp.full((B, T), M // T, jnp.int32),
            "pitches": jnp.zeros((B, T), jnp.float32),
            "energies": jnp.zeros((B, T), jnp.float32),
        }
        variables = fast_init(
            model, jax.random.key(0), src_tokens=toks, max_out_len=M,
            durations=real["durations"], pitches=real["pitches"],
            energies=real["energies"])
        padded = rows(real, [0, 1, 0])
        padded["sample_mask"] = jnp.asarray([1.0, 1.0, 0.0])

        def run(b):
            loss, _ = fastspeech2_criterion(
                model, {"params": variables["params"]}, b,
                jax.random.key(1), VOCAB, train=False)
            return float(loss)

        np.testing.assert_allclose(run(padded), run(real), rtol=1e-5)


class TestBandedDPGate:
    """--banded-dp with the config-default max_transition_length=99999
    (>= L-1, i.e. no real band) must fall back to the full-matrix path
    instead of raising at trace time (advisor round-2 finding)."""

    def test_banded_dp_flag_with_full_width_band_is_noop(self):
        cfg = tiny_s2s_cfg()   # decoder max_transition_length defaults 99999
        model = S2SConformerDAGFastSpeech2(cfg)
        batch = s2s_batch()
        B, L = batch["prev_output_tokens"].shape
        M = batch["target_audio"].shape[1]

        def full(m):
            _, _, feats = m(batch["fbank"], batch["src_lengths"],
                            batch["prev_output_tokens"])
            return m.synthesize(feats, jnp.zeros((B, L), bool), M)

        variables = fast_init(model, jax.random.key(0), method=full)
        params = {"params": variables["params"],
                  "batch_stats": variables.get("batch_stats", {})}
        mtl = cfg.dag.decoder.max_transition_length
        assert mtl >= L - 1  # the recipe-default full-width "band"

        def run(banded):
            loss, _ = s2s_dag_fastspeech2_loss(
                model, params, batch, jax.random.key(1),
                jnp.asarray(0.3), VOCAB, train=False,
                max_transition_length=mtl, banded_dp=banded)
            return float(loss)

        np.testing.assert_allclose(run(True), run(False), rtol=1e-6)

    def test_banded_dp_flag_with_real_band_matches_full(self):
        cfg = tiny_s2s_cfg()
        dec = cfg.dag.decoder
        object.__setattr__(dec, "max_transition_length", 3)
        model = S2SConformerDAGFastSpeech2(cfg)
        batch = s2s_batch()
        B, L = batch["prev_output_tokens"].shape
        M = batch["target_audio"].shape[1]

        def full(m):
            _, _, feats = m(batch["fbank"], batch["src_lengths"],
                            batch["prev_output_tokens"])
            return m.synthesize(feats, jnp.zeros((B, L), bool), M)

        variables = fast_init(model, jax.random.key(0), method=full)
        params = {"params": variables["params"],
                  "batch_stats": variables.get("batch_stats", {})}

        def run(banded):
            loss, _ = s2s_dag_fastspeech2_loss(
                model, params, batch, jax.random.key(1),
                jnp.asarray(0.3), VOCAB, train=False,
                max_transition_length=3, banded_dp=banded)
            return float(loss)

        np.testing.assert_allclose(run(True), run(False), rtol=1e-5)


class TestEncoderFreezing:
    def test_encoder_frozen_until_step(self):
        """``encoder_freezing_updates`` (``s2t_conformer.py:140-154``):
        encoder grads exactly zero while step < N, alive after; decoder
        grads alive in both regimes."""
        from daspeech_tpu.losses import nat_dag_loss
        from daspeech_tpu.models import S2TConformerDAG
        from daspeech_tpu.core.config import DAGModelConfig

        cfg = DAGModelConfig(
            vocab=VOCAB,
            encoder=ConformerConfig(
                embed_dim=16, ffn_dim=32, num_layers=1, num_heads=2,
                conv_channels=16, depthwise_kernel_size=7, dropout=0.0,
                attn_dropout=0.0),
            decoder=DAGDecoderConfig(
                embed_dim=16, ffn_dim=32, num_layers=1, num_heads=2,
                dropout=0.0, attn_dropout=0.0, activation_dropout=0.0,
                max_target_positions=32))
        model = S2TConformerDAG(cfg)
        b = s2s_batch()
        batch = {"fbank": b["fbank"], "src_lengths": b["src_lengths"],
                 "target": b["target_text"],
                 "prev_output_tokens": b["prev_output_tokens"]}
        variables = fast_init(
            model, jax.random.key(0), batch["fbank"], batch["src_lengths"],
            batch["prev_output_tokens"])
        params = {"params": variables["params"],
                  "batch_stats": variables.get("batch_stats", {})}
        N = 5

        @jax.jit
        def grads_at(step):
            def lossf(p):
                loss, _ = nat_dag_loss(
                    model,
                    {"params": p, "batch_stats": params["batch_stats"]},
                    batch, jax.random.key(1), jnp.asarray(0.3), VOCAB,
                    train=False, freeze_encoder=step < N)
                return loss
            return jax.grad(lossf)(params["params"])

        def total(tree):
            return sum(float(jnp.abs(x).sum())
                       for x in jax.tree.leaves(tree))

        g_frozen = grads_at(jnp.asarray(2))
        g_live = grads_at(jnp.asarray(8))
        assert total(g_frozen["encoder"]) == 0.0
        assert total(g_live["encoder"]) > 0.0
        assert total(g_frozen["decoder"]) > 0.0
        assert total(g_live["decoder"]) > 0.0

pytestmark = pytest.mark.slow
