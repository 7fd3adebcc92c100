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


class _StubAimRun:
    def __init__(self, run_hash=None, repo=None):
        self.repo, self.run_hash = repo, run_hash
        self.tracked = []
        self.closed = False

    def track(self, value, name=None, step=None, context=None):
        self.tracked.append((name, value, step, dict(context or {})))

    def close(self):
        self.closed = True


class TestAimSink:
    """``progress_bar.py::AimProgressBarWrapper`` (``:340-403``) analogue."""

    def _install(self, monkeypatch):
        stub = types.ModuleType("aim")
        stub.Run = _StubAimRun
        monkeypatch.setitem(sys.modules, "aim", stub)
        return stub

    def test_tracks_scalars_with_context(self, monkeypatch):
        from daspeech_tpu.train.metrics import AimSink

        self._install(monkeypatch)
        sink = AimSink("/tmp/aim_repo", run_hash="abc")
        run = sink._run
        assert (run.repo, run.run_hash) == ("/tmp/aim_repo", "abc")
        sink({"loss": 1.5, "update": 7, "note": "text"}, step=7, tag="train")
        assert run.tracked == [
            ("loss", 1.5, 7, {"tag": "train", "subset": "train"})]
        sink({"bleu": 30.0}, step=8, tag="valid")
        assert run.tracked[-1] == (
            "bleu", 30.0, 8, {"tag": "valid", "subset": "val"})
        sink.close()
        assert run.closed

    def test_import_gated(self, monkeypatch):
        from daspeech_tpu.train.metrics import AimSink

        monkeypatch.setitem(sys.modules, "aim", None)
        with pytest.raises(ImportError, match="aim"):
            AimSink("/tmp/repo")


class _StubAzureRun:
    rows = []
    completed = False

    @classmethod
    def get_context(cls):
        return cls

    @classmethod
    def log_row(cls, name=None, **kw):
        cls.rows.append((name, dict(kw)))

    @classmethod
    def complete(cls):
        cls.completed = True


class TestAzureMLSink:
    """``progress_bar.py::AzureMLProgressBarWrapper`` (``:537-582``)."""

    def _install(self, monkeypatch):
        azureml = types.ModuleType("azureml")
        core = types.ModuleType("azureml.core")
        _StubAzureRun.rows = []
        _StubAzureRun.completed = False
        core.Run = _StubAzureRun
        azureml.core = core
        monkeypatch.setitem(sys.modules, "azureml", azureml)
        monkeypatch.setitem(sys.modules, "azureml.core", core)

    def test_log_rows_with_step(self, monkeypatch):
        from daspeech_tpu.train.metrics import AzureMLSink

        self._install(monkeypatch)
        sink = AzureMLSink()
        sink({"loss": 2.0, "epoch": 1}, step=42, tag="train")
        assert _StubAzureRun.rows == [
            ("train/loss", {"step": 42, "loss": 2.0})]
        sink.close()
        assert _StubAzureRun.completed

    def test_import_gated(self, monkeypatch):
        from daspeech_tpu.train.metrics import AzureMLSink

        monkeypatch.setitem(sys.modules, "azureml", None)
        monkeypatch.setitem(sys.modules, "azureml.core", None)
        with pytest.raises(ImportError, match="azureml"):
            AzureMLSink()
