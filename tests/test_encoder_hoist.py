"""The GLAT criteria encode ONCE and decode twice (the reference's
structure, ``s2t_conformer_dag.py:236-251``). These tests pin that the
hoisted computation is bit-comparable to the naive two-full-forward
version under active dropout (same rng keys => same masks), for both the
S2TT criterion and the joint S2ST criterion."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

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
from daspeech_tpu.losses.dag_loss import compute_dag_loss, glat_glance
from daspeech_tpu.models import (
    S2SConformerDAGFastSpeech2,
    S2TConformerDAG,
    graph_lengths,
    initialize_output_tokens,
)

VOCAB = VocabConfig(size=16)


def tiny_dag_cfg(dropout=0.1):
    return DAGModelConfig(
        vocab=VOCAB,
        encoder=ConformerConfig(
            embed_dim=16, ffn_dim=32, num_layers=1, num_heads=2,
            conv_channels=16, depthwise_kernel_size=7, dropout=dropout,
            attn_dropout=dropout),
        decoder=DAGDecoderConfig(
            embed_dim=16, ffn_dim=32, num_layers=1, num_heads=2,
            dropout=dropout, attn_dropout=dropout,
            activation_dropout=dropout, max_target_positions=32))


def tiny_s2s_cfg(dropout=0.1):
    return S2SModelConfig(
        dag=tiny_dag_cfg(dropout),
        tts=FastSpeech2Config(
            encoder_layers=1, encoder_embed_dim=16, encoder_heads=2,
            decoder_layers=1, decoder_embed_dim=16, decoder_heads=2,
            fft_hidden_dim=32, var_pred_hidden_dim=8, var_pred_n_bins=4,
            dropout=0.0, attention_dropout=0.0, var_pred_dropout=0.0),
        adaptor_ffn_dim=32, adaptor_dropout=0.0)


def make_batch(B=2, S=16, L=8, T=5, M=8, seed=0):
    rng = np.random.default_rng(seed)
    fbank = jnp.asarray(rng.normal(size=(B, S, 80)).astype(np.float32))
    src_lengths = jnp.full((B,), S, jnp.int32)
    prev = initialize_output_tokens(
        graph_lengths(src_lengths, 0.5, 64), L, VOCAB)
    tgt = jnp.asarray(rng.integers(4, VOCAB.size, size=(B, T)), jnp.int32)
    tgt = tgt.at[:, 0].set(VOCAB.bos).at[:, T - 1].set(VOCAB.eos)
    return {
        "fbank": fbank, "src_lengths": src_lengths,
        "target": tgt, "target_text": tgt,
        "prev_output_tokens": prev,
        "target_audio": jnp.asarray(
            rng.normal(size=(B, M, 80)).astype(np.float32)),
        "target_audio_lengths": jnp.full((B,), M, jnp.int32),
        "durations": jnp.full((B, T - 1), M // (T - 1), jnp.int32),
        "pitches": jnp.zeros((B, T - 1), jnp.float32),
        "energies": jnp.zeros((B, T - 1), jnp.float32),
    }


def naive_nat_dag_loss(model, params, batch, rng, glat_p, vocab):
    """The pre-hoist criterion: TWO full model.apply forwards with the
    same dropout key (the round-2 implementation, kept here as the
    correctness oracle for the encode-once rewrite)."""
    fbank, src_lengths = batch["fbank"], batch["src_lengths"]
    tgt_tokens = batch["target"]
    prev_output_tokens = batch["prev_output_tokens"]
    k_dropout, k_glat = jax.random.split(rng)
    rngs = {"dropout": k_dropout}
    enc_vars = {"params": params["params"]}
    if "batch_stats" in params:
        enc_vars["batch_stats"] = params["batch_stats"]

    def forward(prev):
        (logits, links, feats), _ = model.apply(
            enc_vars, fbank, src_lengths, prev, train=True, rngs=rngs,
            mutable=["batch_stats"])
        return logits, links, feats

    logits1, links1, _ = forward(prev_output_tokens)
    glat_info = glat_glance(
        k_glat, logits1, links1, tgt_tokens, prev_output_tokens,
        glat_p, vocab.pad, "number-random")
    logits, links, _ = forward(glat_info.prev_output_tokens)
    loss, _ = compute_dag_loss(
        logits, links, tgt_tokens, glat_info.prev_output_tokens, vocab.pad,
        matchmask=glat_info.matchmask,
        keep_word_mask=glat_info.keep_word_mask)
    return loss


class TestEncoderHoist:
    def test_s2tt_criterion_matches_two_pass_oracle_under_dropout(self):
        model = S2TConformerDAG(tiny_dag_cfg())
        batch = make_batch()
        variables = fast_init(
            model, jax.random.key(0), batch["fbank"], batch["src_lengths"],
            batch["prev_output_tokens"])
        params = {"params": variables["params"],
                  "batch_stats": variables.get("batch_stats", {})}
        key = jax.random.key(7)
        p = jnp.asarray(0.5)

        loss_hoisted, _ = nat_dag_loss(
            model, params, batch, key, p, VOCAB, train=True)
        loss_naive = naive_nat_dag_loss(model, params, batch, key, p, VOCAB)
        # same dropout keys on identical module paths => identical masks;
        # the hoist must not change the computed loss at all
        np.testing.assert_allclose(
            float(loss_hoisted), float(loss_naive), rtol=1e-6)

    def test_s2st_criterion_trains_with_dropout_and_encoder_grads_flow(self):
        model = S2SConformerDAGFastSpeech2(tiny_s2s_cfg())
        batch = make_batch()
        B, L = batch["prev_output_tokens"].shape
        M = batch["target_audio"].shape[1]

        def full(m):
            _, _, feats = m(batch["fbank"], batch["src_lengths"],
                            batch["prev_output_tokens"])
            return m.synthesize(feats, jnp.zeros((B, L), bool), M)

        variables = fast_init(model, jax.random.key(0), method=full)
        params = {"params": variables["params"],
                  "batch_stats": variables.get("batch_stats", {})}

        def lossf(p):
            loss, _ = s2s_dag_fastspeech2_loss(
                model,
                {"params": p, "batch_stats": params["batch_stats"]},
                batch, jax.random.key(3), jnp.asarray(0.5), VOCAB,
                train=True)
            return loss

        loss, grads = jax.value_and_grad(lossf)(params["params"])
        assert np.isfinite(float(loss))
        # encoder gradients must flow through the (single) encode call
        enc_grads = grads["dag"]["encoder"]
        total = sum(float(jnp.abs(x).sum())
                    for x in jax.tree.leaves(enc_grads))
        assert total > 0.0

    def test_glance_pass_contributes_no_encoder_grads(self):
        """Grads w.r.t. encoder params must be identical whether the
        glance pass exists or not when glat keep-prob is 0 (the glance
        outputs are stop-gradded; only prev2 differs, and at p=0 it
        doesn't)."""
        model = S2TConformerDAG(tiny_dag_cfg(dropout=0.0))
        batch = make_batch()
        variables = fast_init(
            model, jax.random.key(0), batch["fbank"], batch["src_lengths"],
            batch["prev_output_tokens"])
        params = {"params": variables["params"],
                  "batch_stats": variables.get("batch_stats", {})}

        def lossf(p, strategy):
            loss, _ = nat_dag_loss(
                model, {"params": p, "batch_stats": params["batch_stats"]},
                batch, jax.random.key(3), jnp.asarray(0.0), VOCAB,
                glance_strategy=strategy, train=False)
            return loss

        g_glat = jax.grad(lambda p: lossf(p, "number-random"))(
            params["params"])
        g_none = jax.grad(lambda p: lossf(p, None))(params["params"])
        for a, b in zip(jax.tree.leaves(g_glat["encoder"]),
                        jax.tree.leaves(g_none["encoder"])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7)

pytestmark = pytest.mark.slow
