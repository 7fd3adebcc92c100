"""Checkpoint manager tests: keep-N pruning, best tracking, averaging,
component transfer."""

import numpy as np
import pytest

import jax.numpy as jnp

from daspeech_tpu.train.checkpoint import (
    CheckpointManager,
    average_checkpoints,
    load_pretrained_component,
    transfer_dag_params,
    transfer_tts_params,
)


def make_state(value):
    return {"params": {"w": np.full((3,), float(value), np.float32)},
            "step": np.asarray(value, np.int32)}


class TestManager:
    def test_keep_last_and_best(self, tmp_path):
        m = CheckpointManager(tmp_path, keep_last=2, maximize_best=False)
        for step, metric in [(1, 5.0), (2, 2.0), (3, 4.0), (4, 3.0)]:
            m.save(make_state(step), step, metric=metric)
        steps = m.all_steps()
        assert 4 in steps and 3 in steps
        assert 2 in steps          # best (lowest metric) is never pruned
        assert 1 not in steps
        assert m._best_step() == 2

    def test_restore_latest(self, tmp_path):
        m = CheckpointManager(tmp_path)
        m.save(make_state(7), 7)
        got = m.restore(make_state(0))
        assert float(got["params"]["w"][0]) == 7.0

    def test_average_checkpoints(self, tmp_path):
        m = CheckpointManager(tmp_path, keep_last=10)
        for step in (1, 2, 3):
            m.save(make_state(step), step)
        avg = average_checkpoints(m, make_state(0), last_n=3)
        np.testing.assert_allclose(avg["w"], 2.0)
        avg2 = average_checkpoints(m, make_state(0), last_n=2)
        np.testing.assert_allclose(avg2["w"], 2.5)


class TestTransfer:
    def test_dag_transfer_with_vocab_reset(self):
        tgt = {"dag": {"encoder": {"k": np.zeros(2)},
                       "decoder": {"embed_tokens": {"embedding": np.zeros(3)},
                                   "layers_0": {"k": np.zeros(2)}}},
               "tts": {"k": np.zeros(2)}}
        src = {"encoder": {"k": np.ones(2)},
               "decoder": {"embed_tokens": {"embedding": np.ones(3)},
                           "layers_0": {"k": np.ones(2)}}}
        out = transfer_dag_params(tgt, src, reset_vocab=True)
        assert out["dag"]["encoder"]["k"][0] == 1
        assert out["dag"]["decoder"]["layers_0"]["k"][0] == 1
        # vocab swap: embedding stays fresh (zeros)
        assert out["dag"]["decoder"]["embed_tokens"]["embedding"][0] == 0
        assert out["tts"]["k"][0] == 0

    def test_tts_transfer_drops_embed(self):
        tgt = {"tts": {"old": np.zeros(1)}}
        src = {"encoder_fft_0": {"k": np.ones(1)},
               "embed_tokens": {"embedding": np.ones(3)}}
        out = transfer_tts_params(tgt, src)
        assert "embed_tokens" not in out["tts"]
        assert out["tts"]["encoder_fft_0"]["k"][0] == 1

    def test_component_loading(self):
        tgt = {"encoder": 1, "decoder": 2}
        src = {"encoder": 10}
        out = load_pretrained_component(tgt, src, "encoder")
        assert out["encoder"] == 10 and out["decoder"] == 2
        with pytest.raises(KeyError):
            load_pretrained_component(tgt, src, "decoder")

pytestmark = pytest.mark.slow
