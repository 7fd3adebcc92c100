"""Persistent-compilation-cache wiring (core/cache.py).

The reference amortizes warmup per process; our CLIs persist XLA
executables across runs (VERDICT r3 item 2). These tests only exercise the
resolution/config logic — the actual cache behavior is jax's own.
"""

import jax
import pytest

from daspeech_tpu.core.cache import enable_compilation_cache


@pytest.fixture(autouse=True)
def _restore_cfg():
    prev = jax.config.jax_compilation_cache_dir
    yield
    jax.config.update("jax_compilation_cache_dir", prev)


class TestEnableCompilationCache:
    def test_explicit_dir(self, tmp_path):
        d = tmp_path / "xla_cache"
        got = enable_compilation_cache(str(d))
        assert got == str(d)
        assert d.is_dir()
        assert jax.config.jax_compilation_cache_dir == str(d)

    def test_empty_string_disables(self):
        assert enable_compilation_cache("") is None

    def test_env_var_default(self, tmp_path, monkeypatch):
        d = tmp_path / "from_env"
        monkeypatch.setenv("DASPEECH_COMPILE_CACHE", str(d))
        assert enable_compilation_cache(None) == str(d)
        assert d.is_dir()

    def test_env_var_empty_disables(self, monkeypatch):
        monkeypatch.setenv("DASPEECH_COMPILE_CACHE", "")
        assert enable_compilation_cache(None) is None

    def test_default_expands_home(self, monkeypatch, tmp_path):
        monkeypatch.delenv("DASPEECH_COMPILE_CACHE", raising=False)
        monkeypatch.setenv("HOME", str(tmp_path))
        got = enable_compilation_cache(None)
        assert got == str(tmp_path / ".cache" / "daspeech_tpu" / "xla")

    def test_cli_flags_exist(self):
        """Every CLI exposes --compilation-cache-dir."""
        import daspeech_tpu.cli.train as t
        import daspeech_tpu.cli.generate as g
        import daspeech_tpu.cli.train_vocoder as tv
        import daspeech_tpu.cli.eval_pipeline as ep
        import daspeech_tpu.cli.parity as pa
        for mod, extra in ((t, ["data"]), (g, ["data"]), (tv, ["data"]),
                           (ep, ["data", "--checkpoint-dir", "x"]),
                           (pa, ["data", "--results-path", "r"])):
            args = mod.parse_args(extra + ["--compilation-cache-dir", "/tmp/x"])
            assert args.compilation_cache_dir == "/tmp/x"
