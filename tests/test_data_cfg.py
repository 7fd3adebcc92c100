"""config.yaml per-split feature-transform semantics
(``fairseq/fairseq/data/audio/data_cfg.py:35-243``): SpecAugment + CMVN on
train splits, CMVN-only on eval, global_cmvn stats resolution — wired all
the way through task.load_dataset."""

import csv

import numpy as np
import yaml

from test_data import make_dataset

from daspeech_tpu.data.data_cfg import S2TDataConfig
from daspeech_tpu.data.transforms import (
    Compose,
    GlobalCMVN,
    SpecAugment,
    UtteranceCMVN,
)
from daspeech_tpu.tasks import NATSpeechToTextTask, TaskConfig

CFG = {
    "vocab_filename": "vocab.txt",
    "transforms": {
        "_train": ["utterance_cmvn", "specaugment"],
        "*": ["utterance_cmvn"],
    },
    "specaugment": {"freq_mask_N": 1, "freq_mask_F": 10,
                    "time_mask_N": 1, "time_mask_T": 5, "time_mask_p": 1.0},
    "global_cmvn": {"stats_npz_path": "gcmvn_stats.npz"},
}


def write_corpus_with_cfg(tmp_path, rng, n=4):
    d, rows, feats = make_dataset(tmp_path, rng, n=n, s2s=False)
    for split in ("train", "dev"):
        with open(tmp_path / f"{split}.tsv", "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(rows[0].keys()),
                               delimiter="\t")
            w.writeheader()
            for r in rows:
                w.writerow(r)
    d.save(tmp_path / "vocab.txt")
    (tmp_path / "config.yaml").write_text(yaml.safe_dump(CFG))
    np.savez(tmp_path / "gcmvn_stats.npz",
             mean=np.zeros(80, np.float32), std=np.ones(80, np.float32))
    return d, feats


class TestTransformResolution:
    def test_wildcard_order(self, tmp_path):
        (tmp_path / "config.yaml").write_text(yaml.safe_dump(CFG))
        cfg = S2TDataConfig(tmp_path / "config.yaml")
        assert cfg.transform_names("train", True) == [
            "utterance_cmvn", "specaugment"]
        assert cfg.transform_names("train_fr", True) == [
            "utterance_cmvn", "specaugment"]
        assert cfg.transform_names("dev", False) == ["utterance_cmvn"]
        assert cfg.transform_names("test", False) == ["utterance_cmvn"]

    def test_exact_split_beats_wildcards(self, tmp_path):
        c = dict(CFG)
        c["transforms"] = {"dev": ["specaugment"], "*": ["utterance_cmvn"]}
        (tmp_path / "config.yaml").write_text(yaml.safe_dump(c))
        cfg = S2TDataConfig(tmp_path / "config.yaml")
        assert cfg.transform_names("dev", False) == ["specaugment"]

    def test_gcmvn_path_resolves_relative(self, tmp_path):
        (tmp_path / "config.yaml").write_text(yaml.safe_dump(CFG))
        np.savez(tmp_path / "gcmvn_stats.npz",
                 mean=np.zeros(80, np.float32),
                 std=np.ones(80, np.float32))
        cfg = S2TDataConfig(tmp_path / "config.yaml")
        assert cfg.global_cmvn_stats_npz == str(tmp_path / "gcmvn_stats.npz")

    def test_builds_parameterized_specaugment(self, tmp_path):
        (tmp_path / "config.yaml").write_text(yaml.safe_dump(CFG))
        cfg = S2TDataConfig(tmp_path / "config.yaml")
        pipe = cfg.get_feature_transforms("train", True)
        assert isinstance(pipe, Compose)
        kinds = [type(t) for t in pipe.transforms]
        assert kinds == [UtteranceCMVN, SpecAugment]
        assert pipe.transforms[1].freq_mask_f == 10


class TestTaskWiring:
    def test_train_split_augmented_eval_not(self, tmp_path):
        """Through task.load_dataset: the train split gets CMVN+SpecAugment,
        the dev split CMVN only (the round-1 bug was transforms=None on
        both)."""
        rng = np.random.default_rng(0)
        _, feats = write_corpus_with_cfg(tmp_path, rng)
        task = NATSpeechToTextTask.setup_task(TaskConfig(data_dir=str(tmp_path)))
        train = task.load_dataset("train")
        dev = task.load_dataset("dev")

        train_kinds = [type(t) for t in train.transforms.transforms]
        dev_kinds = [type(t) for t in dev.transforms.transforms]
        assert train_kinds == [UtteranceCMVN, SpecAugment]
        assert dev_kinds == [UtteranceCMVN]

        # dev features are utterance-CMVN'd: per-utterance mean ~0, std ~1
        x = dev[0].fbank
        np.testing.assert_allclose(x.mean(axis=0), 0.0, atol=1e-4)
        np.testing.assert_allclose(x.std(axis=0), 1.0, atol=1e-2)
        # the raw features were NOT normalized (the transform did something)
        assert abs(float(feats[0].mean())) > 1e-3 or \
            abs(float(feats[0].std()) - 1.0) > 1e-3

    def test_explicit_transforms_override(self, tmp_path):
        rng = np.random.default_rng(1)
        write_corpus_with_cfg(tmp_path, rng)
        task = NATSpeechToTextTask.setup_task(TaskConfig(data_dir=str(tmp_path)))
        ds = task.load_dataset("train", transforms=Compose([]))
        assert list(ds.transforms.transforms) == []

    def test_no_config_yaml_means_no_transforms(self, tmp_path):
        rng = np.random.default_rng(2)
        d, rows, _ = make_dataset(tmp_path, rng, n=3, s2s=False)
        with open(tmp_path / "train.tsv", "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(rows[0].keys()),
                               delimiter="\t")
            w.writeheader()
            for r in rows:
                w.writerow(r)
        d.save(tmp_path / "vocab.txt")
        task = NATSpeechToTextTask.setup_task(TaskConfig(data_dir=str(tmp_path)))
        ds = task.load_dataset("train")
        assert ds.transforms is None


class TestEncoders:
    """Pre-tokenizer / BPE registry (``fairseq/fairseq/data/encoders/``)."""

    def test_identity_default(self):
        from daspeech_tpu.data.encoders import build_bpe, build_tokenizer

        t = build_tokenizer(None)
        b = build_bpe({"bpe": None})
        assert t.encode("a  b") == "a  b"
        assert b.decode(t.decode("x y")) == "x y"

    def test_space_tokenizer(self):
        from daspeech_tpu.data.encoders import build_tokenizer

        t = build_tokenizer({"tokenizer": "space"})
        assert t.encode(" a\t b\n c ") == "a b c"
        assert t.decode("a b c") == "a b c"

    def test_characters_roundtrip(self):
        from daspeech_tpu.data.encoders import build_bpe

        b = build_bpe({"bpe": "characters"})
        enc = b.encode("ab cd")
        assert enc.split() == ["a", "b", "▁", "c", "d"]
        assert b.decode(enc) == "ab cd"

    def test_bytes_roundtrip(self):
        from daspeech_tpu.data.encoders import build_bpe

        b = build_bpe({"bpe": "bytes"})
        s = "héllo"
        assert b.decode(b.encode(s)) == s

    def test_unknown_name_raises(self):
        import pytest

        from daspeech_tpu.data.encoders import build_bpe, build_tokenizer

        with pytest.raises(ValueError):
            build_tokenizer({"tokenizer": "nope"})
        with pytest.raises(ValueError):
            build_bpe({"bpe": "nope"})

    def test_data_cfg_tokenizer_dicts(self, tmp_path):
        import yaml

        from daspeech_tpu.data.data_cfg import S2TDataConfig

        y = tmp_path / "config.yaml"
        y.write_text(yaml.safe_dump({
            "vocab_filename": "vocab.txt",
            "pre_tokenizer": {"tokenizer": "space"},
            "bpe_tokenizer": {"bpe": "characters"},
        }))
        cfg = S2TDataConfig(y)
        assert cfg.pre_tokenizer == {"tokenizer": "space"}
        assert cfg.bpe_tokenizer == {"bpe": "characters"}
