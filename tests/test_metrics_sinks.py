"""Progress-sink protocol tests (reference: ``logging/progress_bar.py`` —
the TensorBoard/W&B optional backends).

The W&B sink is exercised against a stub ``wandb`` module so the test runs
on this image (no wandb package); the stub records the exact (payload, step)
calls the real client would receive.
"""

import sys
import types

import pytest

from daspeech_tpu.train.metrics import JsonProgressLogger, WandBSink


class _StubRun:
    def __init__(self):
        self.finished = False

    def finish(self):
        self.finished = True


def _install_stub_wandb(monkeypatch):
    stub = types.ModuleType("wandb")
    stub.calls = []
    stub.init_kwargs = None
    stub._run = _StubRun()

    def init(**kw):
        stub.init_kwargs = kw
        return stub._run

    def log(payload, step=None):
        stub.calls.append((dict(payload), step))

    stub.init = init
    stub.log = log
    monkeypatch.setitem(sys.modules, "wandb", stub)
    return stub


class TestWandBSink:
    def test_logs_tagged_scalars(self, monkeypatch):
        stub = _install_stub_wandb(monkeypatch)
        sink = WandBSink("daspeech", run_name="run1")
        assert stub.init_kwargs["project"] == "daspeech"
        assert stub.init_kwargs["name"] == "run1"

        sink({"loss": 1.5, "epoch": 3, "update": 7, "note": "str"}, 7, "train")
        sink({"valid_bleu": 21.0}, 7, "valid")
        assert stub.calls == [
            ({"train/loss": 1.5}, 7),
            ({"valid/valid_bleu": 21.0}, 7),
        ]

        sink.close()
        assert stub._run.finished

    def test_empty_payload_not_sent(self, monkeypatch):
        stub = _install_stub_wandb(monkeypatch)
        sink = WandBSink("daspeech")
        sink({"note": "only-strings", "epoch": 1, "update": 2}, 2, "train")
        assert stub.calls == []

    def test_import_gated(self, monkeypatch):
        monkeypatch.setitem(sys.modules, "wandb", None)
        with pytest.raises(ImportError, match="wandb"):
            WandBSink("daspeech")

    def test_through_progress_logger(self, monkeypatch, capsys):
        stub = _install_stub_wandb(monkeypatch)
        logger = JsonProgressLogger(
            log_interval=1, sinks=[WandBSink("daspeech")])
        logger.print({"loss": 0.25}, step=11, epoch=2)
        logger.print({"valid_loss": 0.5}, step=11, epoch=2, tag="valid")
        capsys.readouterr()
        assert ({"train/loss": 0.25}, 11) in stub.calls
        assert ({"valid/valid_loss": 0.5}, 11) in stub.calls
