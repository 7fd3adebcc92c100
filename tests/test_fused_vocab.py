"""Fused vocab projection + logsoftmax + gather vs the direct computation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from daspeech_tpu.ops import dag_logsoftmax_gather
from daspeech_tpu.ops.fused_vocab import fused_logsoftmax_gather


def direct(feat, W, bias, targets):
    logits = feat @ W + bias                     # [B, L, V]
    B, L, _ = logits.shape
    T = targets.shape[1]
    m = dag_logsoftmax_gather(
        logits, jnp.broadcast_to(targets[:, None, :], (B, L, T)))
    return jnp.swapaxes(m, 1, 2)                 # [B, T, L]


def make(rng, B=2, L=6, D=8, V=37, T=5):
    feat = jnp.asarray(rng.normal(size=(B, L, D)).astype(np.float32))
    W = jnp.asarray(rng.normal(size=(D, V)).astype(np.float32) * 0.3)
    bias = jnp.asarray(rng.normal(size=(V,)).astype(np.float32) * 0.1)
    targets = jnp.asarray(rng.integers(0, V, size=(B, T)), dtype=jnp.int32)
    return feat, W, bias, targets


class TestFusedVocab:
    @pytest.mark.parametrize("chunk", [8, 16, 64])
    def test_forward_matches_direct(self, chunk):
        rng = np.random.default_rng(0)
        feat, W, bias, targets = make(rng)
        got = fused_logsoftmax_gather(feat, W, bias, targets, chunk)
        want = direct(feat, W, bias, targets)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    def test_gradients_match_direct(self):
        rng = np.random.default_rng(1)
        feat, W, bias, targets = make(rng)
        gouter = jnp.asarray(
            rng.normal(size=(2, 5, 6)).astype(np.float32))

        def loss_fused(f, w, b):
            return jnp.sum(fused_logsoftmax_gather(f, w, b, targets, 16)
                           * gouter)

        def loss_direct(f, w, b):
            return jnp.sum(direct(f, w, b, targets) * gouter)

        g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(feat, W, bias)
        g2 = jax.grad(loss_direct, argnums=(0, 1, 2))(feat, W, bias)
        for a, b, name in zip(g1, g2, ("dfeat", "dW", "dbias")):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5,
                err_msg=name)

    def test_odd_vocab_padding(self):
        rng = np.random.default_rng(2)
        feat, W, bias, targets = make(rng, V=13)
        got = fused_logsoftmax_gather(feat, W, bias, targets, 8)
        want = direct(feat, W, bias, targets)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)
