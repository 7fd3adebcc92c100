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

    def test_async_save_then_restore_exact(self, tmp_path):
        """Non-blocking save: restore waits for the in-flight write and
        returns the exact state (``fairseq_cli/train.py:76-84`` async-save
        analogue)."""
        m = CheckpointManager(tmp_path)
        st = {"params": {"w": np.arange(12, dtype=np.float32).reshape(3, 4)},
              "step": np.asarray(9, np.int32)}
        m.save(st, 9, blocking=False)
        got = m.restore({"params": {"w": np.zeros((3, 4), np.float32)},
                         "step": np.asarray(0, np.int32)})
        np.testing.assert_array_equal(got["params"]["w"], st["params"]["w"])
        assert int(got["step"]) == 9

    def test_async_saves_serialize(self, tmp_path):
        """Back-to-back non-blocking saves: the second waits for the first
        (AsyncCheckpointer refuses overlap); both restore exactly."""
        m = CheckpointManager(tmp_path, keep_last=5)
        for step in (1, 2, 3):
            m.save(make_state(step), step, blocking=False)
        m.wait_until_finished()
        assert m.all_steps() == [1, 2, 3]
        for step in (1, 2, 3):
            got = m.restore(make_state(0), step=step)
            assert float(got["params"]["w"][0]) == float(step)

    def test_all_steps_skips_orbax_tmp_dirs(self, tmp_path):
        """In-flight/abandoned orbax tmp dirs must not be listed as
        checkpoints (they are not restorable)."""
        m = CheckpointManager(tmp_path)
        m.save(make_state(4), 4)
        (tmp_path / "checkpoint_7.orbax-checkpoint-tmp-123").mkdir()
        assert m.all_steps() == [4]
        assert m.latest_step() == 4

    def test_resume_after_abandoned_async_save(self, tmp_path):
        """Crash during an in-flight async save (VERDICT r4 item 9, the
        reference's crash.pt-era bug class): a process commits step 3, then
        dies mid-save of step 5 leaving an orbax ``*-tmp`` dir with partial
        contents AND the meta json the non-blocking save already wrote. A
        fresh manager (the restarted process) must resume from step 3, and
        a later re-save of step 5 must supersede the wreckage cleanly."""
        m1 = CheckpointManager(tmp_path)
        m1.save(make_state(3), 3)
        # simulated kill mid-serialization
        tmp = tmp_path / "checkpoint_5.orbax-checkpoint-tmp-1234567"
        (tmp / "d").mkdir(parents=True)
        (tmp / "d" / "partial.bin").write_bytes(b"\x00" * 128)
        (tmp_path / "checkpoint_5.json").write_text(
            '{"step": 5, "epoch": 9, "batch_idx": 99}')

        m2 = CheckpointManager(tmp_path)       # restarted process
        assert m2.all_steps() == [3]
        assert m2.latest_step() == 3
        got = m2.restore(make_state(0))
        assert float(got["params"]["w"][0]) == 3.0
        # the stale step-5 meta json is never consulted: the resume reads
        # checkpoint_{latest_step()}.json (cli/train.py:364-375)
        import json as _json
        meta = _json.loads(
            (tmp_path / f"checkpoint_{m2.latest_step()}.json").read_text())
        assert meta["step"] == 3

        m2.save(make_state(5), 5)
        assert m2.latest_step() == 5
        got5 = m2.restore(make_state(0))
        assert float(got5["params"]["w"][0]) == 5.0

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
