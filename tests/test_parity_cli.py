"""cli.parity result-tree comparison (the checkpoint-in parity harness's
scoring half; the generation half is cli.generate, covered elsewhere)."""

import json

import numpy as np

from daspeech_tpu.cli.parity import compare_trees, main


def _tree(root, mels, hypos):
    (root / "feat").mkdir(parents=True)
    for utt, m in mels.items():
        np.save(root / "feat" / f"{utt}.npy", m)
    with open(root / "hypos.txt", "w") as f:
        for utt, text in hypos.items():
            f.write(f"{utt}\t{text}\n")


class TestCompareTrees:
    def test_identical_trees_score_perfect(self, tmp_path):
        rng = np.random.default_rng(0)
        mels = {f"u{i}": rng.normal(size=(80, 10 + i)).astype(np.float32)
                for i in range(3)}
        hypos = {f"u{i}": "a b c" for i in range(3)}
        _tree(tmp_path / "ours", mels, hypos)
        _tree(tmp_path / "ref", mels, hypos)
        rec = compare_trees(tmp_path / "ours", tmp_path / "ref")
        assert rec["token_exact_match"] == 1.0
        assert rec["token_accuracy"] == 1.0
        assert rec["mel_mse"] == 0.0
        assert rec["mel_frames_match"] == 1.0

    def test_divergent_trees_measured(self, tmp_path):
        rng = np.random.default_rng(1)
        mels = {"u0": rng.normal(size=(80, 10)).astype(np.float32)}
        _tree(tmp_path / "ours", mels, {"u0": "a b c d"})
        # reference tree: transposed layout (T x 80 is auto-detected),
        # one extra frame, one token different
        ref_mel = np.concatenate(
            [mels["u0"] + 0.1, np.zeros((80, 1), np.float32)], axis=1)
        _tree(tmp_path / "ref", {"u0": ref_mel.T.copy()}, {"u0": "a b x d"})
        rec = compare_trees(tmp_path / "ours", tmp_path / "ref")
        assert rec["token_exact_match"] == 0.0
        assert rec["token_accuracy"] == 0.75
        np.testing.assert_allclose(rec["mel_mse"], 0.01, rtol=1e-3)
        assert rec["mel_frames_match"] == 0.0


class TestParityCLI:
    def test_compare_only_invocation(self, tmp_path, capsys):
        rng = np.random.default_rng(2)
        mels = {"u0": rng.normal(size=(80, 8)).astype(np.float32)}
        _tree(tmp_path / "ours", mels, {"u0": "x y"})
        _tree(tmp_path / "ref", mels, {"u0": "x y"})
        # minimal manifest for the (gated-off) ASR stage
        (tmp_path / "test.tsv").write_text(
            "id\tsrc_audio\tsrc_n_frames\ttgt_text\nu0\ta.npy\t10\tx y\n")
        rc = main([str(tmp_path),
                   "--skip-generate", "--skip-asr",
                   "--results-path", str(tmp_path / "ours"),
                   "--reference-results", str(tmp_path / "ref")])
        assert rc == 0
        rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rec["token_exact_match"] == 1.0
        assert rec["mel_mse"] == 0.0
