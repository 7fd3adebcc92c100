"""Fused vocab projection + logsoftmax + gather vs the direct computation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from daspeech_tpu.ops import dag_logsoftmax_gather
from daspeech_tpu.ops.fused_vocab import fused_logsoftmax_gather

pytestmark = pytest.mark.slow


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


class TestFusedCriterion:
    def test_nat_dag_loss_fused_matches_dense(self):
        """The fused-vocab criterion path must match the dense path (same
        rng, same params) in loss and gradients."""
        import sys
        sys.path.insert(0, "tests")
        from testutils import fast_init
        from test_models import tiny_dag_cfg
        from test_train import make_batch
        from daspeech_tpu.losses import nat_dag_loss
        from daspeech_tpu.models import S2TConformerDAG

        cfg = tiny_dag_cfg()
        model = S2TConformerDAG(cfg)
        rng = np.random.default_rng(3)
        batch = make_batch(rng, cfg)
        variables = fast_init(
            model, jax.random.key(0), batch["fbank"], batch["src_lengths"],
            batch["prev_output_tokens"])
        key = jax.random.key(5)

        def run(fused):
            def lossf(params):
                loss, aux = nat_dag_loss(
                    model,
                    {"params": params,
                     "batch_stats": variables.get("batch_stats", {})},
                    batch, key, jnp.asarray(0.4), cfg.vocab,
                    fused_vocab_chunk=8 if fused else None)
                return loss
            return jax.value_and_grad(lossf)(variables["params"])

        l_dense, g_dense = run(False)
        l_fused, g_fused = run(True)
        np.testing.assert_allclose(float(l_fused), float(l_dense),
                                   rtol=1e-4, atol=1e-5)
        for a, b in zip(jax.tree.leaves(g_dense), jax.tree.leaves(g_fused)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=5e-3, atol=1e-4)
