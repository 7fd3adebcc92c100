"""End-to-end CLI tests for the AR baseline family: train a tiny
tts_transformer / s2s_multidecoder through the train CLI, then decode with
``--generator-type at_tts`` / ``at_s2s`` (the reference's
``generate_features.py:29-76`` 4-way dispatch)."""

import csv
import json

import numpy as np
import pytest
import yaml

from test_cli import write_corpus
from test_data import make_dataset

pytestmark = pytest.mark.slow

TINY_AR_TTS = {"embed_dim": 16, "ffn_dim": 32, "encoder_layers": 1,
               "decoder_layers": 1, "num_heads": 2, "prenet_dim": 16}

TINY_MDEC = {"encoder_embed_dim": 16, "encoder_layers": 1,
             "encoder_heads": 2, "mt_embed_dim": 16, "mt_layers": 1,
             "mt_heads": 2, "ffn_dim": 32, "synth_encoder_layers": 1,
             "tts_decoder_layers": 1, "prenet_dim": 16,
             "conv_channels": 16, "depthwise_kernel_size": 7}


def write_tts_corpus(tmp_path, rng, splits=("train", "test")):
    d, rows, _ = make_dataset(tmp_path, rng, n=6, s2s=True)
    tts_rows = [{
        "id": r["id"], "audio": r["tgt_audio"],
        "n_frames": r["tgt_n_frames"], "tgt_text": r["tgt_text"],
        "duration": r["duration"], "pitch": r["pitch"],
        "energy": r["energy"]} for r in rows]
    for split in splits:
        with open(tmp_path / f"{split}.tsv", "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(tts_rows[0].keys()),
                               delimiter="\t")
            w.writeheader()
            for r in tts_rows:
                w.writerow(r)
    d.save(tmp_path / "vocab.txt")
    return d


class TestATTTSCLI:
    def test_tts_transformer_train_and_at_tts_generate(
            self, tmp_path, capsys):
        rng = np.random.default_rng(0)
        write_tts_corpus(tmp_path, rng)
        (tmp_path / "ar.yaml").write_text(yaml.safe_dump(TINY_AR_TTS))

        from daspeech_tpu.cli.train import main as train_main

        rc = train_main([
            str(tmp_path), "--task", "text_to_speech",
            "--criterion", "tts_transformer",
            "--model-yaml", str(tmp_path / "ar.yaml"),
            "--save-dir", str(tmp_path / "ckpt"),
            "--max-update", "2", "--max-sentences", "4",
            "--warmup-updates", "2", "--log-interval", "1",
            "--save-interval-updates", "2",
            "--valid-subset", "missing",
        ])
        assert rc == 0
        out = capsys.readouterr().out.strip().splitlines()
        recs = [json.loads(line) for line in out]
        losses = [r["loss"] for r in recs if "loss" in r]
        assert losses and all(np.isfinite(losses))
        assert any("stop-loss" in r for r in recs)

        from daspeech_tpu.cli.generate import main as gen_main

        rc = gen_main([
            str(tmp_path), "--generator-type", "at_tts",
            "--checkpoint-dir", str(tmp_path / "ckpt"),
            "--model-yaml", str(tmp_path / "ar.yaml"),
            "--gen-subset", "test", "--max-mel-len", "32",
            "--results-path", str(tmp_path / "results"),
        ])
        assert rc == 0
        capsys.readouterr()
        feats = list((tmp_path / "results" / "feat").glob("*.npy"))
        assert len(feats) == 6
        m = np.load(feats[0])
        assert m.shape[0] == 80 and np.isfinite(m).all()


class TestATS2SCLI:
    def test_multidecoder_train_and_at_s2s_generate(self, tmp_path, capsys):
        rng = np.random.default_rng(1)
        write_corpus(tmp_path, rng, s2s=True)
        (tmp_path / "mdec.yaml").write_text(yaml.safe_dump(TINY_MDEC))

        from daspeech_tpu.cli.train import main as train_main

        rc = train_main([
            str(tmp_path), "--task", "nat_speech_to_speech",
            "--criterion", "s2s_multidecoder",
            "--model-yaml", str(tmp_path / "mdec.yaml"),
            "--save-dir", str(tmp_path / "ckpt"),
            "--max-update", "2", "--max-tokens", "2048",
            "--warmup-updates", "2", "--log-interval", "1",
            "--save-interval-updates", "2",
            "--validate-interval-updates", "2",
            "--valid-subset", "dev",
        ])
        assert rc == 0
        out = capsys.readouterr().out.strip().splitlines()
        recs = [json.loads(line) for line in out]
        losses = [r["loss"] for r in recs if "loss" in r]
        assert losses and all(np.isfinite(losses))
        vlosses = [r["valid_loss"] for r in recs if "valid_loss" in r]
        assert vlosses and all(np.isfinite(vlosses))

        from daspeech_tpu.cli.generate import main as gen_main

        rc = gen_main([
            str(tmp_path), "--generator-type", "at_s2s",
            "--checkpoint-dir", str(tmp_path / "ckpt"),
            "--model-yaml", str(tmp_path / "mdec.yaml"),
            "--gen-subset", "test", "--max-mel-len", "32",
            "--max-text-len", "16",
            "--results-path", str(tmp_path / "results"),
        ])
        assert rc == 0
        capsys.readouterr()
        feats = list((tmp_path / "results" / "feat").glob("*.npy"))
        assert len(feats) == 8
        m = np.load(feats[0])
        assert m.shape[0] == 80 and np.isfinite(m).all()
        hyp_lines = (tmp_path / "results" / "hypos.txt"
                     ).read_text().strip().splitlines()
        assert len(hyp_lines) == 8


class TestRerankCLI:
    def test_length_beam_with_ar_reranker(self, tmp_path, capsys):
        """Train a DAG (stage 1) and an AR multidecoder on the same corpus,
        then decode the DAG with --length-beam 3 reranked by the AR model
        (the reference's last-ensemble-checkpoint reranker)."""
        rng = np.random.default_rng(23)
        write_corpus(tmp_path, rng, s2s=True)
        from test_cli import TINY_MODEL

        (tmp_path / "dag.yaml").write_text(yaml.safe_dump(TINY_MODEL))
        (tmp_path / "mdec.yaml").write_text(yaml.safe_dump(TINY_MDEC))

        from daspeech_tpu.cli.train import main as train_main

        common = ["--max-tokens", "512", "--num-buckets", "1",
                  "--warmup-updates", "2", "--log-interval", "1",
                  "--max-source-positions", "100",
                  "--max-target-positions", "16",
                  "--valid-subset", "missing", "--max-update", "1"]
        rc = train_main([str(tmp_path), "--task", "nat_speech_to_text",
                         "--criterion", "nat_dag_loss",
                         "--model-yaml", str(tmp_path / "dag.yaml"),
                         "--save-dir", str(tmp_path / "dag_ckpt")] + common)
        assert rc == 0
        rc = train_main([str(tmp_path), "--task", "nat_speech_to_speech",
                         "--criterion", "s2s_multidecoder",
                         "--model-yaml", str(tmp_path / "mdec.yaml"),
                         "--save-dir", str(tmp_path / "mdec_ckpt")] + common)
        assert rc == 0
        capsys.readouterr()

        from daspeech_tpu.cli.generate import main as gen_main

        rc = gen_main([
            str(tmp_path), "--task", "nat_speech_to_text",
            "--checkpoint-dir", str(tmp_path / "dag_ckpt"),
            "--model-yaml", str(tmp_path / "dag.yaml"),
            "--gen-subset", "test", "--max-tokens", "512",
            "--length-beam", "3",
            "--reranker-dir", str(tmp_path / "mdec_ckpt"),
            "--reranker-yaml", str(tmp_path / "mdec.yaml"),
            "--results-path", str(tmp_path / "results"),
        ])
        assert rc == 0
        capsys.readouterr()
        hypos = (tmp_path / "results" / "hypos.txt"
                 ).read_text().strip().splitlines()
        assert len(hypos) == 8
