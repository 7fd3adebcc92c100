"""Data pipeline tests: zip-npy path grammar, dictionary round-trip, CMVN /
SpecAugment, bucketed collation (the fixture factory mirrors
``fairseq/tests/utils.py``'s create_dummy_data)."""

import zipfile
from pathlib import Path

import numpy as np
import pytest

from daspeech_tpu.core.config import VocabConfig
from daspeech_tpu.data import (
    BucketBatcher,
    Dictionary,
    NATSpeechToSpeechDataset,
    NATSpeechToTextDataset,
    SpecAugment,
    UtteranceCMVN,
    get_features_or_waveform,
    load_tsv,
    make_buckets,
    parse_path,
)


def make_feature_zip(tmp_path: Path, n: int, rng, dim=80):
    """Pack n random feature matrices into a zip (stored, not deflated) and
    return 'zip:offset:length' paths — the reference's packed-audio layout."""
    zip_path = tmp_path / "feats.zip"
    feats = []
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_STORED) as zf:
        for i in range(n):
            T = int(rng.integers(20, 60))
            f = rng.normal(size=(T, dim)).astype(np.float32)
            feats.append(f)
            import io
            buf = io.BytesIO()
            np.save(buf, f)
            zf.writestr(f"utt{i}.npy", buf.getvalue())
    paths = []
    with zipfile.ZipFile(zip_path) as zf:
        for i, info in enumerate(zf.infolist()):
            offset = info.header_offset + len(info.FileHeader())
            paths.append(f"{zip_path}:{offset}:{info.file_size}")
    return paths, feats


def make_dataset(tmp_path, rng, n=12, s2s=False):
    d = Dictionary()
    for ph in ["AA", "AE", "IH", "K", "T", "S"]:
        d.add_symbol(ph)
    paths, feats = make_feature_zip(tmp_path, n, rng)
    mel_paths = mels = None
    if s2s:
        mel_dir = tmp_path / "mel"
        mel_dir.mkdir(exist_ok=True)
        mel_paths, mels = make_feature_zip(mel_dir, n, rng)
    rows = []
    for i in range(n):
        n_words = int(rng.integers(2, 6))
        words = [d.symbols[4 + int(rng.integers(0, 6))] for _ in range(n_words)]
        row = {
            "id": f"utt{i}",
            "audio": paths[i],
            "n_frames": str(len(feats[i])),
            "tgt_text": " ".join(words),
        }
        if s2s:
            row["src_audio"] = row.pop("audio")
            row["src_n_frames"] = row.pop("n_frames")
            row["tgt_audio"] = mel_paths[i]
            row["tgt_n_frames"] = str(len(mels[i]))
            row["duration"] = " ".join(
                [str(int(rng.integers(1, 5))) for _ in range(n_words + 1)] )
            row["pitch"] = " ".join(
                [f"{rng.uniform(0, 300):.1f}" for _ in range(n_words + 1)])
            row["energy"] = " ".join(
                [f"{rng.uniform(0, 50):.1f}" for _ in range(n_words + 1)])
        rows.append(row)
    return d, rows, feats


class TestAudioIO:
    def test_zip_path_roundtrip(self, tmp_path):
        rng = np.random.default_rng(0)
        paths, feats = make_feature_zip(tmp_path, 3, rng)
        for p, f in zip(paths, feats):
            got = get_features_or_waveform(p)
            np.testing.assert_array_equal(got, f)

    def test_parse_path(self):
        assert parse_path("/a/b.zip:100:2000") == ("/a/b.zip", 100, 2000)
        assert parse_path("/a/b.npy") == ("/a/b.npy", 0, -1)


class TestDictionary:
    def test_roundtrip(self, tmp_path):
        d = Dictionary()
        for s in ["AA", "B", "C"]:
            d.add_symbol(s)
        ids = d.encode_line("AA C B", prepend_bos=True)
        assert ids[0] == d.bos() and ids[-1] == d.eos()
        assert d.string(ids) == "AA C B"
        d.save(tmp_path / "dict.txt")
        d2 = Dictionary.load(tmp_path / "dict.txt")
        assert d2.indices == d.indices
        assert d2.index("UNSEEN") == d2.unk()


class TestTransforms:
    def test_utterance_cmvn(self):
        rng = np.random.default_rng(1)
        x = rng.normal(3.0, 2.0, size=(50, 8)).astype(np.float32)
        y = UtteranceCMVN()(x)
        np.testing.assert_allclose(y.mean(0), 0, atol=1e-5)
        np.testing.assert_allclose(y.std(0), 1, atol=1e-3)

    def test_specaugment_masks(self):
        rng = np.random.default_rng(2)
        x = rng.normal(size=(60, 20)).astype(np.float32)
        y = SpecAugment(rng=np.random.default_rng(0))(x)
        assert y.shape == x.shape
        assert (y != x).any()  # something masked

    def test_specaugment_time_warp(self):
        """cv2-free linear time warp (``specaugment.py:96-111``):
        shape-preserving, finite, and actually displaces content."""
        rng = np.random.default_rng(3)
        x = rng.normal(size=(80, 16)).astype(np.float32)
        sa = SpecAugment(freq_mask_n=0, time_mask_n=0, time_warp_w=20,
                         rng=np.random.default_rng(2))  # draws w0=53, w=-9
        y = sa(x)
        assert y.shape == x.shape
        assert np.isfinite(y).all()
        assert (y != x).any()
        # warp preserves total energy approximately (pure interpolation)
        assert abs(y.mean() - x.mean()) < 0.2

    def test_delta_deltas_matches_regression_oracle(self):
        """``delta_deltas.py`` parity against a naive per-element
        implementation of torchaudio's ``compute_deltas`` regression
        formula (replicate edge padding, N = (win-1)//2)."""
        from daspeech_tpu.data.transforms import DeltaDeltas

        def naive_delta(x, N=2):
            T, F = x.shape
            denom = 2 * sum(i * i for i in range(1, N + 1))
            out = np.zeros_like(x)
            for t in range(T):
                for i in range(1, N + 1):
                    out[t] += i * (x[min(t + i, T - 1)]
                                   - x[max(t - i, 0)])
            return out / denom

        rng = np.random.default_rng(4)
        x = rng.normal(size=(30, 8)).astype(np.float32)
        out = DeltaDeltas(win_length=5)(x)
        assert out.shape == (30, 24)
        d = naive_delta(x)
        dd = naive_delta(d)
        ref = np.concatenate([x, d, dd], axis=1)
        np.testing.assert_allclose(out, ref, atol=1e-5)


class TestDatasetsAndBatching:
    def test_s2t_items_and_feasibility_filter(self, tmp_path):
        rng = np.random.default_rng(3)
        d, rows, feats = make_dataset(tmp_path, rng)
        ds = NATSpeechToTextDataset(rows, d, upsample_scale=0.5)
        item = ds[0]
        assert item.target[0] == d.bos() and item.target[-1] == d.eos()
        np.testing.assert_array_equal(item.fbank, feats[0])
        keep = ds.filter_indices(max_source=1000, max_target=100)
        for i in keep:
            assert int(ds.n_frames(i) * 0.5) >= ds.tgt_len(i) + 2

    def test_bucket_collation_shapes(self, tmp_path):
        rng = np.random.default_rng(4)
        d, rows, _ = make_dataset(tmp_path, rng)
        ds = NATSpeechToTextDataset(rows, d)
        vocab = VocabConfig(size=len(d))
        specs = make_buckets([ds.n_frames(i) for i in range(len(ds))],
                             max_tokens=256, num_buckets=2, src_mult=16,
                             tgt_cap=16)
        b = BucketBatcher(ds, range(len(ds)), specs, vocab=vocab)
        seen = 0
        for batch in b:
            B, S, _ = batch["fbank"].shape
            assert batch["prev_output_tokens"].shape[0] == B
            assert batch["target"].shape == (B, 16)
            assert (batch["src_lengths"] <= S).all()
            # static shapes come from the bucket set
            assert any(s.batch == B and s.src == S for s in specs)
            seen += int(batch["sample_mask"].sum())
        assert seen == len(ds)

    def test_s2s_collation(self, tmp_path):
        rng = np.random.default_rng(5)
        d, rows, _ = make_dataset(tmp_path, rng, s2s=True)
        ds = NATSpeechToSpeechDataset(rows, d)
        vocab = VocabConfig(size=len(d))
        specs = make_buckets([ds.n_frames(i) for i in range(len(ds))],
                             max_tokens=256, num_buckets=2, src_mult=16,
                             tgt_cap=16, mel_per_src=1.0, mel_mult=16)
        b = BucketBatcher(ds, range(len(ds)), specs, vocab=vocab,
                          for_s2s=True)
        batch = next(iter(b))
        assert "target_text" in batch and "target_audio" in batch
        assert batch["durations"].shape[1] == 15      # tgt_cap - 1
        assert batch["target_audio"].shape[2] == 80
        assert (batch["target_audio_lengths"] <=
                batch["target_audio"].shape[1]).all()

    def test_epoch_shuffling_deterministic(self, tmp_path):
        rng = np.random.default_rng(6)
        d, rows, _ = make_dataset(tmp_path, rng)
        ds = NATSpeechToTextDataset(rows, d)
        vocab = VocabConfig(size=len(d))
        specs = make_buckets([ds.n_frames(i) for i in range(len(ds))],
                             max_tokens=256, num_buckets=2, src_mult=16)
        b = BucketBatcher(ds, range(len(ds)), specs, seed=7, vocab=vocab)
        e0a = b.batches_for_epoch(0)
        e0b = b.batches_for_epoch(0)
        e1 = b.batches_for_epoch(1)
        assert [i for _, ix in e0a for i in ix] == [
            i for _, ix in e0b for i in ix]
        assert [i for _, ix in e0a for i in ix] != [
            i for _, ix in e1 for i in ix]


class TestPrefetch:
    def test_prefetcher_preserves_order_and_errors(self):
        from daspeech_tpu.data.prefetch import Prefetcher

        out = list(Prefetcher(lambda: iter(range(20)), depth=3))
        assert out == list(range(20))

        def bad():
            yield 1
            raise ValueError("boom")

        it = iter(Prefetcher(bad, depth=2))
        assert next(it) == 1
        import pytest as _pytest
        with _pytest.raises(ValueError):
            list(it)

    def test_prefetch_epoch_matches_direct(self, tmp_path):
        from daspeech_tpu.core.config import VocabConfig
        from daspeech_tpu.data.prefetch import prefetch_epoch

        rng = np.random.default_rng(9)
        d, rows, _ = make_dataset(tmp_path, rng)
        ds = NATSpeechToTextDataset(rows, d)
        vocab = VocabConfig(size=len(d))
        specs = make_buckets([ds.n_frames(i) for i in range(len(ds))],
                             max_tokens=256, num_buckets=2, src_mult=16)
        b = BucketBatcher(ds, range(len(ds)), specs, vocab=vocab)
        direct = [(spec, b.collate(spec, idxs))
                  for spec, idxs in b.batches_for_epoch(1)]
        fetched = list(prefetch_epoch(b, 1))
        assert len(direct) == len(fetched)
        for (s1, b1), (s2, b2) in zip(direct, fetched):
            assert s1 == s2
            np.testing.assert_array_equal(b1["fbank"], b2["fbank"])


class TestTTSSpeakerPlumbing:
    """Multi-speaker conditioning must flow TSV 'speaker' column ->
    speaker_to_id -> collate 'speaker' key -> FastSpeech2 embed_speaker
    (fairseq ``text_to_speech_dataset.py:135-139``; closing the dead-
    plumbing finding from the round-3 review)."""

    def _rows(self, tmp_path):
        from daspeech_tpu.data.datasets import TextToSpeechDataset
        from daspeech_tpu.data.dictionary import Dictionary

        d = Dictionary()
        for sym in ["AA", "B", "C"]:
            d.add_symbol(sym)
        rows = []
        for i, spk in enumerate(["alice", "bob", "alice"]):
            mel = np.random.default_rng(i).normal(
                size=(12, 80)).astype(np.float32)
            path = tmp_path / f"mel{i}.npy"
            np.save(path, mel)
            rows.append({
                "id": f"u{i}", "audio": str(path), "n_frames": "12",
                "tgt_text": "AA B C", "duration": "4 4 3",
                "pitch": "1.0 2.0 3.0", "energy": "0.5 0.5 0.5",
                "speaker": spk,
            })
        s2i = {"alice": 0, "bob": 1}
        return TextToSpeechDataset(rows, d, speaker_to_id=s2i), d

    def test_dataset_maps_and_collate_emits_speaker(self, tmp_path):
        from daspeech_tpu.data.datasets import collate_tts

        ds, d = self._rows(tmp_path)
        assert [ds[i].speaker for i in range(3)] == [0, 1, 0]
        batch = collate_tts([ds[i] for i in range(3)], d.pad(),
                            tok_cap=8, mel_cap=64, batch=4)
        np.testing.assert_array_equal(batch["speaker"], [0, 1, 0, 0])

    @pytest.mark.slow  # ~35 s: two full multi-speaker criterion evaluations
    def test_criterion_is_speaker_dependent(self, tmp_path):
        import dataclasses

        import jax
        import jax.numpy as jnp

        from daspeech_tpu.core.config import FastSpeech2Config, VocabConfig
        from daspeech_tpu.data.datasets import collate_tts
        from daspeech_tpu.losses.tts_loss import fastspeech2_criterion
        from daspeech_tpu.models.fastspeech2 import FastSpeech2Encoder

        ds, d = self._rows(tmp_path)
        batch = collate_tts([ds[i] for i in range(3)], d.pad(),
                            tok_cap=8, mel_cap=64, batch=3)
        cfg = FastSpeech2Config(
            encoder_layers=1, decoder_layers=1, encoder_embed_dim=16,
            decoder_embed_dim=16, encoder_heads=2, decoder_heads=2,
            fft_hidden_dim=16, var_pred_hidden_dim=8, var_pred_n_bins=8,
            num_speakers=2, speaker_embed_dim=4, mel_mult=8)
        vocab = VocabConfig(size=len(d), pad=d.pad())
        model = FastSpeech2Encoder(cfg, vocab_size=len(d), pad=d.pad())
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        params = model.init(
            {"params": jax.random.PRNGKey(0)},
            src_tokens=jb["src_tokens"], max_out_len=64,
            durations=jb["durations"], pitches=jb["pitches"],
            energies=jb["energies"], speaker=jb["speaker"])
        assert "embed_speaker" in params["params"]
        loss1, _ = fastspeech2_criterion(
            model, params, jb, jax.random.key(0, impl="rbg"), vocab,
            train=False)
        jb2 = dict(jb)
        jb2["speaker"] = 1 - jb["speaker"]      # flip speakers
        loss2, _ = fastspeech2_criterion(
            model, params, jb2, jax.random.key(0, impl="rbg"), vocab,
            train=False)
        assert float(loss1) != float(loss2)
