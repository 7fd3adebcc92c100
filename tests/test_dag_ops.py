"""Property tests for the DAG dynamic programs against brute-force oracles.

Mirrors the reference's kernel self-verification harness
(``DASpeech/custom_ops/dag_loss.py:432-704``): random banded DAGs, loss and
gradient cross-checks, and alignment-path validity via independent replay.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from daspeech_tpu.ops import (
    band_to_full,
    dag_best_alignment,
    dag_logsoftmax_gather,
    dag_loss,
    dag_loss_forward,
    dag_loss_with_alpha_beta,
    full_to_band,
    torch_style_dag_loss,
)


def make_random_dag(rng, B=3, T=6, L=12, peaky=False):
    """Random problem with valid upper-triangular log-softmax links."""
    output_length = rng.integers(T, L + 1, size=B)
    output_length[0] = L  # always one full-size sample
    target_length = rng.integers(2, T + 1, size=B)
    target_length[0] = T

    scale = 5.0 if peaky else 1.0
    logits = rng.normal(size=(B, L, L)).astype(np.float32) * scale
    mask = np.triu(np.ones((L, L), dtype=bool), 1)[None].repeat(B, 0)
    for b in range(B):
        mask[b, :, output_length[b]:] = False
        mask[b, output_length[b]:, :] = False
    logits = np.where(mask, logits, -np.inf)
    with np.errstate(invalid="ignore"):
        links = logits - logsumexp_np(logits, axis=-1, keepdims=True)
    links = np.where(mask, links, -np.inf)

    match_all = (rng.normal(size=(B, T, L)).astype(np.float32) * scale - 2.0)
    for b in range(B):
        match_all[b, :, output_length[b]:] = -np.inf
    return (
        jnp.asarray(match_all),
        jnp.asarray(links),
        jnp.asarray(output_length, dtype=jnp.int32),
        jnp.asarray(target_length, dtype=jnp.int32),
    )


def logsumexp_np(x, axis=None, keepdims=False):
    m = np.max(x, axis=axis, keepdims=True)
    m = np.where(np.isfinite(m), m, 0.0)
    out = np.log(np.sum(np.exp(x - m), axis=axis, keepdims=True)) + m
    if not keepdims:
        out = np.squeeze(out, axis=axis)
    return out


def brute_force_logZ(match, links, ol, tl):
    """Enumerate all vertex paths 0 = j_0 < j_1 < ... < j_{tl-1} = ol-1."""
    import itertools

    total = []
    for mids in itertools.combinations(range(1, ol - 1), tl - 2):
        path = (0,) + mids + (ol - 1,)
        s = 0.0
        for t, j in enumerate(path):
            s += match[t, j]
        for a, b in zip(path[:-1], path[1:]):
            s += links[a, b]
        total.append(s)
    return logsumexp_np(np.array(total)) if total else -np.inf


class TestDagLoss:
    def test_matches_brute_force(self):
        rng = np.random.default_rng(0)
        match, links, ol, tl = make_random_dag(rng, B=4, T=5, L=9)
        got = np.asarray(dag_loss(match, links, ol, tl))
        for b in range(4):
            want = brute_force_logZ(
                np.asarray(match[b]), np.asarray(links[b]),
                int(ol[b]), int(tl[b]))
            assert got[b] == pytest.approx(want, rel=1e-4, abs=1e-4), b

    def test_alpha_beta_consistency(self):
        """logsumexp_j(alpha[t] + beta[t] - match[t]) == logZ for every t."""
        rng = np.random.default_rng(1)
        match, links, ol, tl = make_random_dag(rng, B=3, T=6, L=12)
        logprob, alpha, beta = dag_loss_forward(match, links, ol, tl)
        alpha, beta = np.asarray(alpha), np.asarray(beta)
        for b in range(3):
            for t in range(int(tl[b])):
                joint = alpha[b, t] + beta[b, t] - np.asarray(match[b, t])
                joint = np.where(np.isnan(joint), -np.inf, joint)
                z = logsumexp_np(joint)
                assert z == pytest.approx(float(logprob[b]), rel=1e-4, abs=1e-3)

    def test_beta00_equals_alpha_final(self):
        rng = np.random.default_rng(2)
        match, links, ol, tl = make_random_dag(rng, B=3, T=4, L=10)
        logprob, alpha, beta = dag_loss_forward(match, links, ol, tl)
        batch = np.arange(3)
        a_final = np.asarray(alpha)[batch, np.asarray(tl) - 1, np.asarray(ol) - 1]
        np.testing.assert_allclose(np.asarray(logprob), a_final, rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("peaky", [False, True])
    def test_custom_vjp_matches_autodiff(self, peaky):
        """Closed-form alpha/beta gradients vs autodiff-through-scan."""
        rng = np.random.default_rng(3)
        match, links, ol, tl = make_random_dag(rng, B=3, T=5, L=10, peaky=peaky)

        def loss_custom(m, l):
            return jnp.sum(dag_loss(m, l, ol, tl))

        def loss_auto(m, l):
            return jnp.sum(torch_style_dag_loss(m, l, ol, tl))

        gm1, gl1 = jax.grad(loss_custom, argnums=(0, 1))(match, links)
        gm2, gl2 = jax.grad(loss_auto, argnums=(0, 1))(match, links)
        assert np.isfinite(np.asarray(gm1)).all()
        assert np.isfinite(np.asarray(gl1)).all()
        # fp32 roundoff between different summation orders; the closed-form
        # grads are exact in float64 (verified against finite differences).
        np.testing.assert_allclose(np.asarray(gm1), np.asarray(gm2),
                                   rtol=2e-2, atol=2e-3)
        np.testing.assert_allclose(np.asarray(gl1), np.asarray(gl2),
                                   rtol=2e-2, atol=2e-3)

    def test_grad_match_rows_sum_to_one(self):
        """d logZ / d match[t, :] sums to 1 per valid t (posterior mass)."""
        rng = np.random.default_rng(4)
        match, links, ol, tl = make_random_dag(rng, B=2, T=5, L=8)
        gm = jax.grad(lambda m: jnp.sum(dag_loss(m, links, ol, tl)))(match)
        gm = np.asarray(gm)
        for b in range(2):
            for t in range(int(tl[b])):
                assert gm[b, t].sum() == pytest.approx(1.0, abs=1e-3)

    def test_with_alpha_beta_drops_ab_cotangents(self):
        rng = np.random.default_rng(5)
        match, links, ol, tl = make_random_dag(rng, B=2, T=4, L=8)

        def f(m):
            lp, alpha, beta = dag_loss_with_alpha_beta(m, links, ol, tl)
            # poke alpha/beta with a spurious loss; must not contribute grads
            return jnp.sum(lp) + 0.0 * jnp.sum(jnp.where(
                jnp.isfinite(alpha), alpha, 0.0))

        def f_plain(m):
            return jnp.sum(dag_loss(m, links, ol, tl))

        np.testing.assert_allclose(
            np.asarray(jax.grad(f)(match)), np.asarray(jax.grad(f_plain)(match)),
            rtol=1e-5, atol=1e-6)


class TestBestAlignment:
    def test_path_valid_and_optimal_small(self):
        """Replay the returned path and compare with brute-force max path."""
        import itertools

        rng = np.random.default_rng(6)
        match, links, ol, tl = make_random_dag(rng, B=4, T=4, L=8)
        path = np.asarray(dag_best_alignment(match, links, ol, tl))
        match_np, links_np = np.asarray(match), np.asarray(links)
        for b in range(4):
            olb, tlb = int(ol[b]), int(tl[b])
            # extract vertices in order
            verts = [j for j in range(olb) if path[b, j] >= 0]
            ts = [path[b, j] for j in verts]
            assert ts == list(range(tlb)), (b, ts)
            assert verts[0] == 0 and verts[-1] == olb - 1
            score = sum(match_np[b, t, j] for t, j in zip(ts, verts)) + sum(
                links_np[b, a, c] for a, c in zip(verts[:-1], verts[1:]))
            # brute force best
            best = -np.inf
            for mids in itertools.combinations(range(1, olb - 1), tlb - 2):
                p = (0,) + mids + (olb - 1,)
                s = sum(match_np[b, t, j] for t, j in enumerate(p)) + sum(
                    links_np[b, a, c] for a, c in zip(p[:-1], p[1:]))
                best = max(best, s)
            assert score == pytest.approx(best, rel=1e-4, abs=1e-4)

    def test_unused_vertices_are_minus_one(self):
        rng = np.random.default_rng(7)
        match, links, ol, tl = make_random_dag(rng, B=2, T=3, L=7)
        path = np.asarray(dag_best_alignment(match, links, ol, tl))
        for b in range(2):
            n_aligned = (path[b] >= 0).sum()
            assert n_aligned == int(tl[b])
            assert (path[b, int(ol[b]):] == -1).all()


class TestLogsoftmaxGather:
    def test_matches_naive(self):
        rng = np.random.default_rng(8)
        B, L, V, T = 2, 5, 11, 4
        logits = jnp.asarray(rng.normal(size=(B, L, V)).astype(np.float32) * 3)
        idx = jnp.asarray(rng.integers(0, V, size=(B, L, T)), dtype=jnp.int32)
        got = dag_logsoftmax_gather(logits, idx)
        want = jax.nn.log_softmax(logits, axis=-1)
        want = jnp.take_along_axis(want, idx, axis=-1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    def test_grad_flows(self):
        rng = np.random.default_rng(9)
        logits = jnp.asarray(rng.normal(size=(2, 4, 7)).astype(np.float32))
        idx = jnp.zeros((2, 4, 3), dtype=jnp.int32)
        g = jax.grad(lambda x: jnp.sum(dag_logsoftmax_gather(x, idx)))(logits)
        assert np.isfinite(np.asarray(g)).all()


class TestBandConversions:
    def test_roundtrip(self):
        rng = np.random.default_rng(10)
        B, L, W = 2, 9, 4
        band = rng.normal(size=(B, L, W)).astype(np.float32)
        # entries past the edge of the graph must be -inf to round trip
        for i in range(L):
            for d in range(W):
                if i + d + 1 >= L:
                    band[:, i, d] = -np.inf
        full = band_to_full(jnp.asarray(band))
        back = full_to_band(full, W)
        np.testing.assert_allclose(np.asarray(back), band)
        # full is strictly upper triangular within the band
        full_np = np.asarray(full)
        for i in range(L):
            for j in range(L):
                d = j - i - 1
                if 0 <= d < W:
                    assert full_np[0, i, j] == pytest.approx(band[0, i, d])
                else:
                    assert np.isinf(full_np[0, i, j])

    def test_banded_loss_equals_full(self):
        rng = np.random.default_rng(11)
        match, links, ol, tl = make_random_dag(rng, B=2, T=4, L=8)
        W = 3
        band = full_to_band(links, W)
        full_again = band_to_full(band)
        # with the band restriction, both layouts must give identical loss
        l1 = dag_loss(match, full_again, ol, tl)
        l2 = dag_loss(match, band_to_full(full_to_band(full_again, W)), ol, tl)
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-5)


class TestGatherTokensVariant:
    def test_matches_general_gather(self):
        from daspeech_tpu.ops import (
            dag_logsoftmax_gather, dag_logsoftmax_gather_tokens)

        rng = np.random.default_rng(0)
        B, L, V, T = 3, 10, 17, 5
        logits = jnp.asarray(rng.normal(size=(B, L, V)).astype(np.float32))
        tgt = jnp.asarray(rng.integers(0, V, size=(B, T)), jnp.int32)
        want = dag_logsoftmax_gather(
            logits, jnp.broadcast_to(tgt[:, None, :], (B, L, T)))
        got = dag_logsoftmax_gather_tokens(logits, tgt)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)
        # large-vocab fallback path
        got2 = dag_logsoftmax_gather_tokens(logits, tgt, onehot_max_vocab=4)
        np.testing.assert_allclose(np.asarray(got2), np.asarray(want),
                                   rtol=1e-6)

    def test_gradients_match(self):
        from daspeech_tpu.ops import (
            dag_logsoftmax_gather, dag_logsoftmax_gather_tokens)

        rng = np.random.default_rng(1)
        B, L, V, T = 2, 6, 9, 4
        logits = jnp.asarray(rng.normal(size=(B, L, V)).astype(np.float32))
        tgt = jnp.asarray(rng.integers(0, V, size=(B, T)), jnp.int32)
        g1 = jax.grad(lambda x: jnp.sum(dag_logsoftmax_gather(
            x, jnp.broadcast_to(tgt[:, None, :], (B, L, T)))**2))(logits)
        g2 = jax.grad(lambda x: jnp.sum(
            dag_logsoftmax_gather_tokens(x, tgt)**2))(logits)
        np.testing.assert_allclose(np.asarray(g2), np.asarray(g1),
                                   rtol=1e-4, atol=1e-6)
