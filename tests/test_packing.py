"""Single-buffer batch transfer (``data/packing.py`` + cli.train's
packed-H2D path): the whole batch ships as ONE uint8[B, bytes] device_put
and is reconstructed bit-exactly inside the step jit. Roundtrip is
bit-identical, so packed vs unpacked training must produce the SAME
logged losses."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml

from daspeech_tpu.data.packing import pack_host, unpack_device

pytestmark = pytest.mark.slow


class TestPackRoundtrip:
    def _batch(self, B=4):
        rng = np.random.default_rng(0)
        return {
            "fbank": rng.normal(size=(B, 17, 80)).astype(np.float32),
            "src_lengths": rng.integers(1, 17, size=(B,)).astype(np.int32),
            "prev_output_tokens": rng.integers(
                0, 50, size=(B, 9)).astype(np.int32),
            "sample_mask": (rng.random(B) < 0.8).astype(np.float32),
        }

    def test_bit_exact_roundtrip(self):
        batch = self._batch()
        layout, buf = pack_host(batch)
        assert buf.dtype == np.uint8 and buf.shape[0] == 4
        out = jax.jit(lambda b: unpack_device(layout, b))(jnp.asarray(buf))
        assert sorted(out) == sorted(batch)
        for k, v in batch.items():
            got = np.asarray(out[k])
            assert got.dtype == v.dtype, k
            np.testing.assert_array_equal(got, v, err_msg=k)

    def test_bf16_wire_keys(self):
        """float32 leaves named in bf16_keys travel as bfloat16 and come
        back as float32 values rounded through bf16 — exactly the
        --h2d-dtype bfloat16 semantics — at half the wire bytes."""
        import ml_dtypes

        batch = self._batch()
        l32, b32 = pack_host(batch)
        lb, bb = pack_host(batch, bf16_keys=("fbank",))
        assert bb.shape[1] == b32.shape[1] - batch["fbank"][0].nbytes // 2
        out = jax.jit(lambda b: unpack_device(lb, b))(jnp.asarray(bb))
        want = batch["fbank"].astype(ml_dtypes.bfloat16).astype(np.float32)
        assert np.asarray(out["fbank"]).dtype == np.float32
        np.testing.assert_array_equal(np.asarray(out["fbank"]), want)
        np.testing.assert_array_equal(np.asarray(out["sample_mask"]),
                                      batch["sample_mask"])

    def test_unpackable_batches_fall_through(self):
        assert pack_host({}) is None
        assert pack_host({"a": np.zeros((2, 3), np.float32),
                          "nested": {"x": 1}}) is None
        assert pack_host({"a": np.zeros((2, 3), np.float32),
                          "b": np.zeros((3, 3), np.float32)}) is None


class TestPackedTrainingEquivalence:
    def test_packed_equals_unpacked_losses(self, tmp_path, capsys):
        """3 updates through the real cli.train loop, packed (default)
        vs --no-packed-h2d: the transfer is bit-exact, so the logged
        per-update losses must be identical."""
        from test_cli import TINY_MODEL, write_corpus

        from daspeech_tpu.cli.train import main as train_main

        rng = np.random.default_rng(0)
        write_corpus(tmp_path, rng, s2s=False)
        (tmp_path / "model.yaml").write_text(yaml.safe_dump(TINY_MODEL))

        def run(extra, save):
            rc = train_main([
                str(tmp_path), "--task", "nat_speech_to_text",
                "--criterion", "nat_dag_loss",
                "--model-yaml", str(tmp_path / "model.yaml"),
                "--save-dir", str(tmp_path / save),
                "--max-update", "3", "--max-tokens", "512",
                "--num-buckets", "1", "--lr", "1e-3",
                "--warmup-updates", "2", "--log-interval", "1",
                "--max-source-positions", "100",
                "--max-target-positions", "32",
                "--valid-subset", "missing", *extra,
            ])
            assert rc == 0
            recs = [json.loads(ln) for ln in
                    capsys.readouterr().out.strip().splitlines()]
            return [r["loss"] for r in recs if r.get("tag") == "train"
                    and "loss" in r and not r.get("done")]

        packed = run([], "ckpt_p")
        plain = run(["--no-packed-h2d"], "ckpt_u")
        assert packed and packed == plain