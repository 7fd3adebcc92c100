"""End-to-end CLI tests on tiny synthetic data — the analogue of the
reference's ``tests/test_binaries.py`` (train a tiny model for a few updates
through the real entry point, then decode with the generate CLI)."""

import csv
import json
import sys
from pathlib import Path

import numpy as np
import pytest
import yaml

from test_data import make_dataset

pytestmark = pytest.mark.slow

TINY_MODEL = {
    "encoder": {"embed_dim": 16, "ffn_dim": 32, "num_layers": 1,
                "num_heads": 2, "conv_channels": 32,
                "depthwise_kernel_size": 7},
    "decoder": {"embed_dim": 16, "ffn_dim": 32, "num_layers": 1,
                "num_heads": 2, "max_target_positions": 64},
}

TINY_S2S = {
    "dag": TINY_MODEL,
    "tts": {"encoder_layers": 1, "encoder_embed_dim": 16,
            "encoder_heads": 2, "decoder_layers": 1,
            "decoder_embed_dim": 16, "decoder_heads": 2,
            "fft_hidden_dim": 32, "var_pred_hidden_dim": 16,
            "var_pred_n_bins": 8},
    "adaptor_ffn_dim": 32,
}


def write_corpus(tmp_path, rng, s2s=False, n=8):
    d, rows, _ = make_dataset(tmp_path, rng, n=n, s2s=s2s)
    for split in ("train", "dev", "test"):
        with open(tmp_path / f"{split}.tsv", "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(rows[0].keys()),
                               delimiter="\t")
            w.writeheader()
            for r in rows:
                w.writerow(r)
    d.save(tmp_path / "vocab.txt")
    return d


class TestTrainCLI:
    def test_s2t_train_and_generate(self, tmp_path, capsys):
        rng = np.random.default_rng(0)
        write_corpus(tmp_path, rng, s2s=False)
        (tmp_path / "model.yaml").write_text(yaml.safe_dump(TINY_MODEL))

        from daspeech_tpu.cli.train import main as train_main

        rc = train_main([
            str(tmp_path), "--task", "nat_speech_to_text",
            "--criterion", "nat_dag_loss",
            "--model-yaml", str(tmp_path / "model.yaml"),
            "--save-dir", str(tmp_path / "ckpt"),
            "--max-update", "3", "--max-tokens", "512",
            "--num-buckets", "1", "--lr", "1e-3",
            "--warmup-updates", "2", "--log-interval", "1",
            "--max-source-positions", "100",
            "--max-target-positions", "32",
            "--save-interval-updates", "2",
        ])
        assert rc == 0
        out = capsys.readouterr().out.strip().splitlines()
        recs = [json.loads(line) for line in out]
        assert any(r.get("done") for r in recs)
        losses = [r["loss"] for r in recs if "loss" in r]
        assert losses and all(np.isfinite(losses))
        # checkpoints written
        ckpts = list((tmp_path / "ckpt").glob("checkpoint_*"))
        assert ckpts

        from daspeech_tpu.cli.generate import main as gen_main

        rc = gen_main([
            str(tmp_path), "--task", "nat_speech_to_text",
            "--checkpoint-dir", str(tmp_path / "ckpt"),
            "--gen-subset", "test",
            "--results-path", str(tmp_path / "results"),
            "--model-yaml", str(tmp_path / "model.yaml"),
            "--max-tokens", "512",
        ])
        assert rc == 0
        hypos = (tmp_path / "results" / "hypos.txt").read_text().splitlines()
        assert len(hypos) == 8
        for line in hypos:
            utt, *text = line.split("\t")
            assert utt.startswith("utt")



    def test_bf16_training(self, tmp_path, capsys):
        """--dtype bfloat16 trains with finite loss (bf16 compute, fp32
        params; the fp16-recipe analogue)."""
        rng = np.random.default_rng(7)
        write_corpus(tmp_path, rng, s2s=False, n=6)
        (tmp_path / "model.yaml").write_text(yaml.safe_dump(TINY_MODEL))

        from daspeech_tpu.cli.train import main as train_main

        rc = train_main([
            str(tmp_path), "--task", "nat_speech_to_text",
            "--criterion", "nat_dag_loss",
            "--model-yaml", str(tmp_path / "model.yaml"),
            "--save-dir", str(tmp_path / "ckpt"),
            "--max-update", "2", "--max-tokens", "2000",
            "--warmup-updates", "2", "--log-interval", "1",
            "--valid-subset", "missing", "--dtype", "bfloat16",
        ])
        assert rc == 0
        out = capsys.readouterr().out.strip().splitlines()
        recs = [json.loads(line) for line in out]
        losses = [r["loss"] for r in recs if "loss" in r]
        assert losses and all(np.isfinite(losses))


    def test_fsdp_training(self, tmp_path, capsys):
        """--fsdp trains with finite loss on the multi-device CPU mesh
        (ZeRO-sharded params + Adam moments; the reference's
        --ddp-backend=fully_sharded)."""
        import jax
        if len(jax.devices()) < 2:
            pytest.skip("needs a multi-device mesh")
        rng = np.random.default_rng(9)
        write_corpus(tmp_path, rng, s2s=False, n=6)
        (tmp_path / "model.yaml").write_text(yaml.safe_dump(TINY_MODEL))

        from daspeech_tpu.cli.train import main as train_main

        rc = train_main([
            str(tmp_path), "--task", "nat_speech_to_text",
            "--criterion", "nat_dag_loss",
            "--model-yaml", str(tmp_path / "model.yaml"),
            "--save-dir", str(tmp_path / "ckpt"),
            "--max-update", "2", "--max-tokens", "2000",
            "--warmup-updates", "2", "--log-interval", "1",
            "--valid-subset", "missing",
            "--fsdp", "--min-fsdp-size", "64",
        ])
        assert rc == 0
        out = capsys.readouterr().out.strip().splitlines()
        recs = [json.loads(line) for line in out]
        losses = [r["loss"] for r in recs if "loss" in r]
        assert losses and all(np.isfinite(losses))


class TestTTSCLI:
    def test_fastspeech2_pretraining(self, tmp_path, capsys):
        """Stage-2 recipe: --task text_to_speech --criterion fastspeech2."""
        rng = np.random.default_rng(1)
        d, rows, _ = make_dataset(tmp_path, rng, n=6, s2s=True)
        # TTS tsv: audio column = target mel, plus duration/pitch/energy
        tts_rows = []
        for r in rows:
            tts_rows.append({
                "id": r["id"], "audio": r["tgt_audio"],
                "n_frames": r["tgt_n_frames"], "tgt_text": r["tgt_text"],
                "duration": r["duration"], "pitch": r["pitch"],
                "energy": r["energy"]})
        with open(tmp_path / "train.tsv", "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(tts_rows[0].keys()),
                               delimiter="\t")
            w.writeheader()
            for r in tts_rows:
                w.writerow(r)
        d.save(tmp_path / "vocab.txt")
        tts_yaml = {"encoder_layers": 1, "encoder_embed_dim": 16,
                    "encoder_heads": 2, "decoder_layers": 1,
                    "decoder_embed_dim": 16, "decoder_heads": 2,
                    "fft_hidden_dim": 32, "var_pred_hidden_dim": 16,
                    "var_pred_n_bins": 8}
        (tmp_path / "tts.yaml").write_text(yaml.safe_dump(tts_yaml))

        from daspeech_tpu.cli.train import main as train_main

        rc = train_main([
            str(tmp_path), "--task", "text_to_speech",
            "--criterion", "fastspeech2",
            "--model-yaml", str(tmp_path / "tts.yaml"),
            "--save-dir", str(tmp_path / "ckpt"),
            "--max-update", "2", "--max-sentences", "4",
            "--warmup-updates", "2", "--log-interval", "1",
            "--valid-subset", "missing",
        ])
        assert rc == 0
        out = capsys.readouterr().out.strip().splitlines()
        recs = [json.loads(line) for line in out]
        losses = [r["loss"] for r in recs if "loss" in r]
        assert losses and all(np.isfinite(losses))
        assert any("l1-loss" in r for r in recs)

    def test_tts_eval_inference_reports_mcd(self, tmp_path, capsys):
        """--eval-inference synthesizes with predicted durations during TTS
        validation and logs corpus MCD (``tasks/text_to_speech.py``)."""
        rng = np.random.default_rng(2)
        d, rows, _ = make_dataset(tmp_path, rng, n=6, s2s=True)
        tts_rows = []
        for r in rows:
            tts_rows.append({
                "id": r["id"], "audio": r["tgt_audio"],
                "n_frames": r["tgt_n_frames"], "tgt_text": r["tgt_text"],
                "duration": r["duration"], "pitch": r["pitch"],
                "energy": r["energy"]})
        for split in ("train", "dev"):
            with open(tmp_path / f"{split}.tsv", "w", newline="") as f:
                w = csv.DictWriter(f, fieldnames=list(tts_rows[0].keys()),
                                   delimiter="\t")
                w.writeheader()
                for r in tts_rows:
                    w.writerow(r)
        d.save(tmp_path / "vocab.txt")
        tts_yaml = {"encoder_layers": 1, "encoder_embed_dim": 16,
                    "encoder_heads": 2, "decoder_layers": 1,
                    "decoder_embed_dim": 16, "decoder_heads": 2,
                    "fft_hidden_dim": 32, "var_pred_hidden_dim": 16,
                    "var_pred_n_bins": 8}
        (tmp_path / "tts.yaml").write_text(yaml.safe_dump(tts_yaml))

        from daspeech_tpu.cli.train import main as train_main

        rc = train_main([
            str(tmp_path), "--task", "text_to_speech",
            "--criterion", "fastspeech2",
            "--model-yaml", str(tmp_path / "tts.yaml"),
            "--save-dir", str(tmp_path / "ckpt"),
            "--max-update", "2", "--max-sentences", "4",
            "--warmup-updates", "2", "--log-interval", "1",
            "--validate-interval-updates", "2",
            "--valid-subset", "dev", "--eval-inference",
        ])
        assert rc == 0
        out = capsys.readouterr().out.strip().splitlines()
        recs = [json.loads(line) for line in out]
        mcds = [r["valid_mcd"] for r in recs if "valid_mcd" in r]
        assert mcds and all(np.isfinite(m) and m > 0 for m in mcds)

    def test_nat_tts_generate(self, tmp_path, capsys):
        """--generator-type nat_tts: FastSpeech2-only mel dump through the
        generate CLI over a stage-2 checkpoint (generate_features.py:62-74)."""
        rng = np.random.default_rng(3)
        d, rows, _ = make_dataset(tmp_path, rng, n=6, s2s=True)
        tts_rows = []
        for r in rows:
            tts_rows.append({
                "id": r["id"], "audio": r["tgt_audio"],
                "n_frames": r["tgt_n_frames"], "tgt_text": r["tgt_text"],
                "duration": r["duration"], "pitch": r["pitch"],
                "energy": r["energy"]})
        for split in ("train", "test"):
            with open(tmp_path / f"{split}.tsv", "w", newline="") as f:
                w = csv.DictWriter(f, fieldnames=list(tts_rows[0].keys()),
                                   delimiter="\t")
                w.writeheader()
                for r in tts_rows:
                    w.writerow(r)
        d.save(tmp_path / "vocab.txt")
        tts_yaml = {"encoder_layers": 1, "encoder_embed_dim": 16,
                    "encoder_heads": 2, "decoder_layers": 1,
                    "decoder_embed_dim": 16, "decoder_heads": 2,
                    "fft_hidden_dim": 32, "var_pred_hidden_dim": 16,
                    "var_pred_n_bins": 8}
        (tmp_path / "tts.yaml").write_text(yaml.safe_dump(tts_yaml))

        from daspeech_tpu.cli.train import main as train_main

        rc = train_main([
            str(tmp_path), "--task", "text_to_speech",
            "--criterion", "fastspeech2",
            "--model-yaml", str(tmp_path / "tts.yaml"),
            "--save-dir", str(tmp_path / "ckpt"),
            "--max-update", "2", "--max-sentences", "4",
            "--warmup-updates", "2", "--log-interval", "1",
            "--save-interval-updates", "2",
            "--valid-subset", "missing",
        ])
        assert rc == 0

        from daspeech_tpu.cli.generate import main as gen_main

        rc = gen_main([
            str(tmp_path), "--generator-type", "nat_tts",
            "--checkpoint-dir", str(tmp_path / "ckpt"),
            "--model-yaml", str(tmp_path / "tts.yaml"),
            "--gen-subset", "test",
            "--results-path", str(tmp_path / "results"),
        ])
        assert rc == 0
        capsys.readouterr()
        feats = list((tmp_path / "results" / "feat").glob("*.npy"))
        assert len(feats) == 6
        m = np.load(feats[0])
        assert m.shape[0] == 80 and np.isfinite(m).all()


class TestValidationBLEU:
    def test_s2t_with_eval_bleu_validation(self, tmp_path, capsys):
        rng = np.random.default_rng(2)
        write_corpus(tmp_path, rng, s2s=False, n=6)
        (tmp_path / "model.yaml").write_text(yaml.safe_dump(TINY_MODEL))

        from daspeech_tpu.cli.train import main as train_main

        rc = train_main([
            str(tmp_path), "--task", "nat_speech_to_text",
            "--criterion", "nat_dag_loss",
            "--model-yaml", str(tmp_path / "model.yaml"),
            "--save-dir", str(tmp_path / "ckpt"),
            "--max-update", "2", "--max-tokens", "512",
            "--num-buckets", "1", "--warmup-updates", "2",
            "--log-interval", "1", "--max-source-positions", "100",
            "--max-target-positions", "32",
            "--validate-interval-updates", "2",
            "--valid-subset", "dev",
        ])
        assert rc == 0
        out = capsys.readouterr().out.strip().splitlines()
        recs = [json.loads(line) for line in out]
        bleus = [r["valid_bleu"] for r in recs if "valid_bleu" in r]
        assert bleus, "validation BLEU was not logged"
        assert all(0 <= b <= 100 for b in bleus)


class TestValidationLoss:
    def test_s2s_valid_loss_selects_best_checkpoint(self, tmp_path, capsys):
        """Stages 2/3 validate on valid loss and pick checkpoint_best by it
        (``fairseq_cli/train.py:375-448``) — round 1 used smoothed train
        loss."""
        rng = np.random.default_rng(7)
        write_corpus(tmp_path, rng, s2s=True, n=6)
        (tmp_path / "s2s.yaml").write_text(yaml.safe_dump(TINY_S2S))

        from daspeech_tpu.cli.train import main as train_main

        rc = train_main([
            str(tmp_path), "--task", "nat_speech_to_speech",
            "--criterion", "s2s_dag_fastspeech2_loss",
            "--model-yaml", str(tmp_path / "s2s.yaml"),
            "--save-dir", str(tmp_path / "ckpt"),
            "--max-update", "2", "--max-tokens", "512",
            "--num-buckets", "1", "--warmup-updates", "2",
            "--log-interval", "1", "--max-source-positions", "100",
            "--max-target-positions", "16",
            "--validate-interval-updates", "1",
            "--save-interval-updates", "1",
            "--valid-subset", "dev",
        ])
        assert rc == 0
        out = capsys.readouterr().out.strip().splitlines()
        recs = [json.loads(line) for line in out]
        vlosses = [r["valid_loss"] for r in recs if "valid_loss" in r]
        assert len(vlosses) == 2, "valid loss not logged every interval"
        assert all(np.isfinite(vlosses))
        best = json.loads((tmp_path / "ckpt" / "best.json").read_text())
        # best checkpoint corresponds to the step with the lowest valid loss
        want_step = 1 + int(np.argmin(vlosses))
        assert best["step"] == want_step
        assert best["metric"] == pytest.approx(min(vlosses), rel=1e-6)


class TestS2SFinetuning:
    def test_three_stage_recipe(self, tmp_path, capsys):
        """Full recipe: S2TT pretrain -> TTS pretrain -> S2ST finetune with
        component transfer (``README.md:224-323``)."""
        rng = np.random.default_rng(3)
        d, rows, _ = make_dataset(tmp_path, rng, n=6, s2s=True)
        with open(tmp_path / "train.tsv", "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(rows[0].keys()),
                               delimiter="\t")
            w.writeheader()
            for r in rows:
                w.writerow(r)
        d.save(tmp_path / "vocab.txt")
        (tmp_path / "dag.yaml").write_text(yaml.safe_dump(TINY_MODEL))
        (tmp_path / "s2s.yaml").write_text(yaml.safe_dump(TINY_S2S))
        (tmp_path / "tts.yaml").write_text(yaml.safe_dump(TINY_S2S["tts"]))

        from daspeech_tpu.cli.train import main as train_main

        common = ["--max-tokens", "512", "--num-buckets", "1",
                  "--warmup-updates", "2", "--log-interval", "1",
                  "--max-source-positions", "100",
                  "--max-target-positions", "16",
                  "--valid-subset", "missing"]
        # stage 1: S2TT DAG pretraining
        rc = train_main([str(tmp_path), "--task", "nat_speech_to_text",
                         "--criterion", "nat_dag_loss",
                         "--model-yaml", str(tmp_path / "dag.yaml"),
                         "--save-dir", str(tmp_path / "dag_ckpt"),
                         "--max-update", "1"] + common)
        assert rc == 0
        # stage 2: FastSpeech2 pretraining
        rc = train_main([str(tmp_path), "--task", "text_to_speech",
                         "--criterion", "fastspeech2",
                         "--model-yaml", str(tmp_path / "tts.yaml"),
                         "--save-dir", str(tmp_path / "tts_ckpt"),
                         "--max-update", "1", "--max-sentences", "4"]
                        + common)
        assert rc == 0
        # stage 3: joint finetuning with transferred components
        rc = train_main([str(tmp_path), "--task", "nat_speech_to_speech",
                         "--criterion", "s2s_dag_fastspeech2_loss",
                         "--model-yaml", str(tmp_path / "s2s.yaml"),
                         "--save-dir", str(tmp_path / "s2s_ckpt"),
                         "--max-update", "2",
                         "--training-strategy", "expect",
                         "--tts-loss-weight", "5.0",
                         "--load-pretrained-dag-from",
                         str(tmp_path / "dag_ckpt"),
                         "--load-pretrained-fastspeech-from",
                         str(tmp_path / "tts_ckpt")] + common)
        assert rc == 0
        out = capsys.readouterr()
        recs = [json.loads(x) for x in out.out.strip().splitlines()]
        losses = [r["loss"] for r in recs if "loss" in r]
        assert losses and all(np.isfinite(losses))
        assert any("tts-loss" in r for r in recs)
        assert "loaded pretrained DA-Transformer" in out.err
        assert "loaded pretrained FastSpeech2" in out.err


class TestResume:
    def test_mid_epoch_resume(self, tmp_path, capsys):
        rng = np.random.default_rng(4)
        write_corpus(tmp_path, rng, s2s=False, n=8)
        (tmp_path / "model.yaml").write_text(yaml.safe_dump(TINY_MODEL))

        from daspeech_tpu.cli.train import main as train_main

        common = [str(tmp_path), "--task", "nat_speech_to_text",
                  "--criterion", "nat_dag_loss",
                  "--model-yaml", str(tmp_path / "model.yaml"),
                  "--save-dir", str(tmp_path / "ckpt"),
                  "--max-tokens", "256", "--num-buckets", "1",
                  "--warmup-updates", "2", "--log-interval", "1",
                  "--max-source-positions", "100",
                  "--max-target-positions", "32",
                  "--save-interval-updates", "2",
                  "--valid-subset", "missing"]
        assert train_main(common + ["--max-update", "2"]) == 0
        capsys.readouterr()
        assert train_main(common + ["--max-update", "4", "--restore"]) == 0
        out = capsys.readouterr()
        assert "restored checkpoint at step 2" in out.err
        recs = [json.loads(x) for x in out.out.strip().splitlines()]
        final = [r for r in recs if r.get("done")][0]
        assert final["update"] == 4


class TestEvalPipeline:
    def test_five_stage_pipeline(self, tmp_path, capsys):
        """generate (averaged ckpt) -> wav naming -> ASR gate (cache-less
        host reports gracefully)."""
        rng = np.random.default_rng(5)
        d, rows, _ = make_dataset(tmp_path, rng, n=4, s2s=True)
        for split in ("train", "test"):
            with open(tmp_path / f"{split}.tsv", "w", newline="") as f:
                w = csv.DictWriter(f, fieldnames=list(rows[0].keys()),
                                   delimiter="\t")
                w.writeheader()
                for r in rows:
                    w.writerow(r)
        d.save(tmp_path / "vocab.txt")
        (tmp_path / "s2s.yaml").write_text(yaml.safe_dump(TINY_S2S))

        from daspeech_tpu.cli.train import main as train_main

        rc = train_main([
            str(tmp_path), "--task", "nat_speech_to_speech",
            "--criterion", "s2s_dag_fastspeech2_loss",
            "--model-yaml", str(tmp_path / "s2s.yaml"),
            "--save-dir", str(tmp_path / "ckpt"),
            "--max-update", "2", "--max-tokens", "512", "--num-buckets", "1",
            "--warmup-updates", "2", "--log-interval", "1",
            "--max-source-positions", "100", "--max-target-positions", "16",
            "--save-interval-updates", "1", "--valid-subset", "missing"])
        assert rc == 0
        capsys.readouterr()

        from daspeech_tpu.cli.eval_pipeline import main as eval_main

        rc = eval_main([
            str(tmp_path), "--checkpoint-dir", str(tmp_path / "ckpt"),
            "--gen-subset", "test",
            "--results-path", str(tmp_path / "results"),
            "--model-yaml", str(tmp_path / "s2s.yaml"),
            "--max-tokens", "512", "--max-mel-len", "32",
            "--average-last-n", "2"])
        assert rc == 0
        out = capsys.readouterr().out.strip().splitlines()
        rec = json.loads(out[-1])
        assert rec["results"].endswith("results")
        # decoded features exist for every utterance
        feats = list((tmp_path / "results" / "feat").glob("*.npy"))
        assert len(feats) == 4


class TestTensorboardSink:
    def test_tb_events_written(self, tmp_path, capsys):
        """--tensorboard-logdir mirrors progress stats to event files."""
        rng = np.random.default_rng(4)
        write_corpus(tmp_path, rng, s2s=False, n=6)
        tiny = dict(TINY_MODEL)
        (tmp_path / "model.yaml").write_text(yaml.safe_dump(tiny))

        from daspeech_tpu.cli.train import main as train_main

        rc = train_main([
            str(tmp_path), "--task", "nat_speech_to_text",
            "--criterion", "nat_dag_loss",
            "--model-yaml", str(tmp_path / "model.yaml"),
            "--save-dir", str(tmp_path / "ckpt"),
            "--max-update", "2", "--max-tokens", "2000",
            "--warmup-updates", "2", "--log-interval", "1",
            "--valid-subset", "missing",
            "--tensorboard-logdir", str(tmp_path / "tb"),
        ])
        assert rc == 0
        capsys.readouterr()
        events = list((tmp_path / "tb").glob("events.out.tfevents.*"))
        assert events and events[0].stat().st_size > 0
