"""Block-banded DAG ops vs the full-matrix oracle: for any band width W,
``dag_loss_banded(match, band)`` must equal ``dag_loss(match,
band_to_full(band))`` in value and gradient, and the banded Viterbi must
produce the same path score."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from daspeech_tpu.ops.dag_banded import (
    dag_best_alignment_banded,
    dag_loss_banded,
    dag_loss_banded_with_alpha_beta,
)
from daspeech_tpu.ops.dag_ref import (
    dag_best_alignment,
    dag_loss,
    dag_loss_with_alpha_beta,
)
from daspeech_tpu.ops.links_utils import band_to_full, full_to_band

pytestmark = pytest.mark.slow


def random_banded_problem(rng, B=3, T=6, L=12, W=4):
    """Random feasible banded DAG problem (band entries are log-probs of a
    row-normalized transition; -inf where the hop leaves the graph)."""
    match = rng.normal(size=(B, T, L)).astype(np.float32)
    raw = rng.normal(size=(B, L, W)).astype(np.float32)
    i = np.arange(L)[:, None]
    d = np.arange(W)[None, :]
    out_len = np.full((B,), L, np.int32)
    out_len[1] = L - 2
    tgt_len = np.full((B,), T, np.int32)
    tgt_len[B - 1] = T - 2
    valid = (i + d + 1 < out_len[:, None, None])
    raw = np.where(valid, raw, -np.inf)
    # log-normalize rows so alpha stays in a sane range
    m = np.max(np.where(np.isfinite(raw), raw, -1e9), axis=2, keepdims=True)
    lse = np.log(np.sum(np.exp(np.where(np.isfinite(raw), raw - m, -np.inf)),
                        axis=2, keepdims=True) + 1e-30) + m
    band = np.where(valid, raw - lse, -np.inf)
    return (jnp.asarray(match), jnp.asarray(band),
            jnp.asarray(out_len), jnp.asarray(tgt_len))


@pytest.mark.parametrize("W,L", [(4, 12), (5, 12), (4, 13), (11, 12)])
def test_banded_matches_full_oracle_value(W, L):
    rng = np.random.default_rng(0)
    match, band, ol, tl = random_banded_problem(rng, L=L, W=W)
    full = band_to_full(band)
    want = dag_loss(match, full, ol, tl)
    got = dag_loss_banded(match, band, ol, tl)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_banded_gradients_match_full_oracle():
    rng = np.random.default_rng(1)
    match, band, ol, tl = random_banded_problem(rng)
    W = band.shape[2]

    def f_banded(m, b):
        return jnp.sum(dag_loss_banded(m, b, ol, tl))

    def f_full(m, b):
        return jnp.sum(dag_loss(m, band_to_full(b), ol, tl))

    gm_b, gb_b = jax.grad(f_banded, argnums=(0, 1))(match, band)
    gm_f, gb_f = jax.grad(f_full, argnums=(0, 1))(match, band)
    np.testing.assert_allclose(np.asarray(gm_b), np.asarray(gm_f),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gb_b), np.asarray(gb_f),
                               rtol=1e-4, atol=1e-5)


def test_banded_alpha_beta_match_full():
    rng = np.random.default_rng(2)
    match, band, ol, tl = random_banded_problem(rng)
    lp_b, alpha_b, beta_b = dag_loss_banded_with_alpha_beta(
        match, band, ol, tl)
    lp_f, alpha_f, beta_f = dag_loss_with_alpha_beta(
        match, band_to_full(band), ol, tl)
    np.testing.assert_allclose(np.asarray(lp_b), np.asarray(lp_f),
                               rtol=1e-5, atol=1e-5)
    fin = np.isfinite(np.asarray(alpha_f))
    np.testing.assert_allclose(np.asarray(alpha_b)[fin],
                               np.asarray(alpha_f)[fin], rtol=1e-4, atol=1e-4)
    fin = np.isfinite(np.asarray(beta_f))
    np.testing.assert_allclose(np.asarray(beta_b)[fin],
                               np.asarray(beta_f)[fin], rtol=1e-4, atol=1e-4)


def test_banded_best_alignment_matches_full():
    rng = np.random.default_rng(3)
    match, band, ol, tl = random_banded_problem(rng)
    path_b = np.asarray(dag_best_alignment_banded(match, band, ol, tl))
    path_f = np.asarray(dag_best_alignment(match, band_to_full(band), ol, tl))

    # tie-breaking may differ; require identical path SCORES
    def score(path):
        B, L = path.shape
        total = np.zeros(B)
        m = np.asarray(match)
        fl = np.asarray(band_to_full(band))
        for b in range(B):
            verts = [j for j in range(L) if path[b, j] >= 0]
            for j in verts:
                total[b] += m[b, path[b, j], j]
            for a, c in zip(verts, verts[1:]):
                total[b] += fl[b, a, c]
        return total

    np.testing.assert_allclose(score(path_b), score(path_f),
                               rtol=1e-5, atol=1e-5)
    # both must mark exactly target_length vertices
    for b in range(path_b.shape[0]):
        assert (path_b[b] >= 0).sum() == int(np.asarray(tl)[b])


def test_band_roundtrip_full_to_band():
    rng = np.random.default_rng(4)
    match, band, ol, tl = random_banded_problem(rng)
    full = band_to_full(band)
    back = full_to_band(full, band.shape[2])
    np.testing.assert_array_equal(np.asarray(back), np.asarray(band))


def test_compute_dag_loss_band_routing_matches_full():
    """compute_dag_loss with max_transition_length routes through the banded
    backend and must equal the full-matrix DP on band-masked links."""
    from daspeech_tpu.losses.dag_loss import compute_dag_loss

    rng = np.random.default_rng(5)
    B, T, L, W = 2, 5, 12, 4
    V = 16
    pad = 1
    logits = jnp.asarray(rng.normal(size=(B, L, V)).astype(np.float32))
    match, band, ol, tl = random_banded_problem(rng, B=B, T=T, L=L, W=W)
    links = band_to_full(band)
    tgt = jnp.asarray(rng.integers(4, V, size=(B, T)), jnp.int32)
    prev = jnp.where(jnp.arange(L)[None, :] < ol[:, None], 4, pad)

    def run(**kw):
        loss, m = compute_dag_loss(logits, links, tgt, prev, pad, **kw)
        return float(loss), m

    loss_full, _ = run()
    loss_band, _ = run(max_transition_length=W, banded_dp=True)
    np.testing.assert_allclose(loss_band, loss_full, rtol=1e-5)
    # a width covering the whole triangle must be a no-op (recipe's 99999)
    loss_wide, _ = run(max_transition_length=99999, banded_dp=True)
    np.testing.assert_allclose(loss_wide, loss_full, rtol=1e-6)


def test_model_extract_links_enforces_band():
    """GlatLinkDecoder.extract_links must yield -inf beyond the configured
    max_transition_length and renormalize within the band."""
    import sys
    sys.path.insert(0, "tests") if "tests" not in sys.path[0] else None
    from testutils import fast_init

    from daspeech_tpu.core.config import (
        ConformerConfig, DAGDecoderConfig, DAGModelConfig, VocabConfig)
    from daspeech_tpu.models import (
        S2TConformerDAG, graph_lengths, initialize_output_tokens)

    W = 3
    vocab = VocabConfig(size=16)
    cfg = DAGModelConfig(
        vocab=vocab,
        encoder=ConformerConfig(
            embed_dim=16, ffn_dim=32, num_layers=1, num_heads=2,
            conv_channels=16, depthwise_kernel_size=7, dropout=0.0,
            attn_dropout=0.0),
        decoder=DAGDecoderConfig(
            embed_dim=16, ffn_dim=32, num_layers=1, num_heads=2,
            dropout=0.0, attn_dropout=0.0, activation_dropout=0.0,
            max_target_positions=32, max_transition_length=W))
    model = S2TConformerDAG(cfg)
    rng = np.random.default_rng(6)
    B, S, L = 2, 16, 8
    fbank = jnp.asarray(rng.normal(size=(B, S, 80)).astype(np.float32))
    sl = jnp.full((B,), S, jnp.int32)
    prev = initialize_output_tokens(graph_lengths(sl, 0.5, 64), L, vocab)
    variables = fast_init(model, jax.random.key(0), fbank, sl, prev)
    _, links, _ = model.apply(variables, fbank, sl, prev)
    links = np.asarray(links)
    i = np.arange(L)[:, None]
    j = np.arange(L)[None, :]
    assert np.all(np.isneginf(links[:, (j - i > W) | (j <= i)]))
    # rows with any in-band successor are normalized over the band
    probs = np.exp(links)
    row_sums = probs.sum(axis=2)
    has_succ = row_sums > 0
    np.testing.assert_allclose(row_sums[has_succ], 1.0, rtol=1e-4)


def _banded_model(W=3, L=12):
    import sys
    if "tests" not in sys.path[0]:
        sys.path.insert(0, "tests")
    from testutils import fast_init

    from daspeech_tpu.core.config import (
        ConformerConfig, DAGDecoderConfig, DAGModelConfig, VocabConfig)
    from daspeech_tpu.models import (
        S2TConformerDAG, graph_lengths, initialize_output_tokens)

    vocab = VocabConfig(size=16)
    cfg = DAGModelConfig(
        vocab=vocab,
        encoder=ConformerConfig(
            embed_dim=16, ffn_dim=32, num_layers=1, num_heads=2,
            conv_channels=16, depthwise_kernel_size=7, dropout=0.0,
            attn_dropout=0.0),
        decoder=DAGDecoderConfig(
            embed_dim=16, ffn_dim=32, num_layers=1, num_heads=2,
            dropout=0.0, attn_dropout=0.0, activation_dropout=0.0,
            max_target_positions=32, max_transition_length=W))
    model = S2TConformerDAG(cfg)
    rng = np.random.default_rng(7)
    B, S = 2, 24
    fbank = jnp.asarray(rng.normal(size=(B, S, 80)).astype(np.float32))
    sl = jnp.asarray([24, 17], jnp.int32)
    prev = initialize_output_tokens(graph_lengths(sl, 0.5, 64), L, vocab)
    variables = fast_init(model, jax.random.key(0), fbank, sl, prev)
    return model, cfg, variables, fbank, sl, prev


def test_extract_links_banded_matches_full_band():
    """extract_links_banded == full_to_band(extract_links) — the block-
    banded QK path computes the identical band without the [L, L] matrix."""
    from daspeech_tpu.ops.links_utils import full_to_band

    for W, L in ((3, 12), (4, 12), (5, 16)):
        model, cfg, variables, fbank, sl, prev = _banded_model(W, L)
        logits, links_full, feats = model.apply(
            variables, fbank, sl, prev)
        want = full_to_band(links_full, W)
        _, band, feats2 = model.apply(
            variables, fbank, sl, prev, method=model.forward_banded)
        assert band.shape == (fbank.shape[0], L, W)
        fin = np.isfinite(np.asarray(want))
        np.testing.assert_array_equal(np.isfinite(np.asarray(band)), fin)
        np.testing.assert_allclose(
            np.asarray(band)[fin], np.asarray(want)[fin],
            rtol=2e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(feats2), np.asarray(feats),
                                   rtol=1e-5, atol=1e-6)


def test_nat_dag_loss_banded_extraction_matches_full():
    """nat_dag_loss with banded_dp now sources [B, L, W] links directly
    from the model; grads and loss must match the full-matrix path."""
    from daspeech_tpu.losses import nat_dag_loss

    W, L = 4, 12
    model, cfg, variables, fbank, sl, prev = _banded_model(W, L)
    rng = np.random.default_rng(8)
    T = 6
    tgt = jnp.asarray(rng.integers(4, 16, size=(2, T)), jnp.int32)
    tgt = tgt.at[:, 0].set(0).at[:, T - 1].set(2)
    batch = {"fbank": fbank, "src_lengths": sl, "target": tgt,
             "prev_output_tokens": prev}

    def loss(banded_dp):
        def f(p):
            l, aux = nat_dag_loss(
                model, {"params": p,
                        "batch_stats": variables.get("batch_stats", {})},
                batch, jax.random.key(3), jnp.asarray(0.5), cfg.vocab,
                max_transition_length=W, banded_dp=banded_dp)
            return l
        return jax.value_and_grad(f)(variables["params"])

    l_full, g_full = loss(False)
    l_band, g_band = loss(True)
    np.testing.assert_allclose(float(l_band), float(l_full), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(g_full), jax.tree.leaves(g_band)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-3, atol=1e-5)
