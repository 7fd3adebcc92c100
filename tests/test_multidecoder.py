"""UnitY-style two-pass AR S2ST family: model forward, criterion gradients,
the MultiDecoder speech generator (text stop, mel stop, gcmvn-denormalized
vocoder input), and the multitask text-target dataset."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from testutils import fast_init

from daspeech_tpu.core.config import VocabConfig
from daspeech_tpu.data.dictionary import Dictionary
from daspeech_tpu.data.datasets import (
    NATSpeechToTextMultitaskDataset,
    NATTextTargetMultitaskData,
)
from daspeech_tpu.decode.speech_generator import MultiDecoderSpeechGenerator
from daspeech_tpu.losses import multidecoder_criterion
from daspeech_tpu.models import S2SMultiDecoderModel

pytestmark = pytest.mark.slow

VOCAB = VocabConfig(size=16)


def tiny_model():
    return S2SMultiDecoderModel(
        vocab_size=VOCAB.size, pad=VOCAB.pad, bos=VOCAB.bos, eos=VOCAB.eos,
        encoder_embed_dim=16, encoder_layers=1, encoder_heads=2,
        mt_embed_dim=16, mt_layers=1, mt_heads=2, ffn_dim=32,
        synth_encoder_layers=1, tts_decoder_layers=1, prenet_dim=16,
        conv_channels=16, dropout=0.0)


def make_batch(B=2, S=16, T=6, M=8, seed=0):
    rng = np.random.default_rng(seed)
    tgt = np.full((B, T), VOCAB.pad, np.int32)
    for b in range(B):
        n = T - b
        tgt[b, 0] = VOCAB.bos
        tgt[b, 1:n - 1] = rng.integers(4, VOCAB.size, size=n - 2)
        tgt[b, n - 1] = VOCAB.eos
    return {
        "fbank": jnp.asarray(rng.normal(size=(B, S, 80)).astype(np.float32)),
        "src_lengths": jnp.full((B,), S, jnp.int32),
        "target_text": jnp.asarray(tgt),
        "target_audio": jnp.asarray(
            rng.normal(size=(B, M, 80)).astype(np.float32)),
        "target_audio_lengths": jnp.asarray([M, M - 2], jnp.int32),
    }


def init_model(model, batch):
    B, T = batch["target_text"].shape
    M = batch["target_audio"].shape[1]
    prev_tok = jnp.concatenate(
        [jnp.full((B, 1), VOCAB.eos, jnp.int32),
         batch["target_text"][:, :-1]], axis=1)
    prev_mel = jnp.concatenate(
        [jnp.zeros((B, 1, 80)), batch["target_audio"][:, :-1]], axis=1)
    return fast_init(model, jax.random.key(0), batch["fbank"],
                     batch["src_lengths"], prev_tok, prev_mel)


class TestModel:
    def test_teacher_forced_forward_shapes(self):
        model = tiny_model()
        batch = make_batch()
        variables = init_model(model, batch)
        B, T = batch["target_text"].shape
        M = batch["target_audio"].shape[1]
        prev_tok = jnp.roll(batch["target_text"], 1, axis=1).at[:, 0].set(
            VOCAB.eos)
        prev_mel = jnp.zeros((B, M, 80))
        logits, mel, stop = model.apply(
            variables, batch["fbank"], batch["src_lengths"], prev_tok,
            prev_mel)
        assert logits.shape == (B, T, VOCAB.size)
        assert mel.shape == (B, M, 80)
        assert stop.shape == (B, M)
        assert np.isfinite(np.asarray(logits)).all()

    def test_criterion_grads_flow_to_both_passes(self):
        model = tiny_model()
        batch = make_batch()
        variables = init_model(model, batch)

        def lossf(params):
            loss, _ = multidecoder_criterion(
                model, {"params": params,
                        "batch_stats": variables.get("batch_stats", {})},
                batch, jax.random.key(1), VOCAB, train=False)
            return loss

        grads = jax.grad(lossf)(variables["params"])
        tot = lambda t: sum(float(jnp.abs(x).sum())
                            for x in jax.tree.leaves(t))
        assert tot(grads["mt_decoder"]) > 0
        assert tot(grads["encoder"]) > 0
        assert tot(grads["mel_out"]) > 0
        assert tot(grads["stop_out"]) > 0

    def test_criterion_sample_mask(self):
        model = tiny_model()
        real = make_batch()
        variables = init_model(model, real)
        padded = {k: v[np.asarray([0, 1, 0])] for k, v in real.items()}
        padded["sample_mask"] = jnp.asarray([1.0, 1.0, 0.0])

        def run(b):
            loss, _ = multidecoder_criterion(
                model, dict(variables), b,
                jax.random.key(1), VOCAB, train=False)
            return float(loss)

        np.testing.assert_allclose(run(padded), run(real), rtol=1e-5)


class StubVocoder:
    def apply(self, params, mel):
        return jnp.repeat(jnp.mean(mel, axis=-1), 4, axis=-1)


class TestGenerator:
    def test_generate_shapes_and_stops(self):
        from daspeech_tpu.data.transforms import GlobalCMVN

        model = tiny_model()
        batch = make_batch()
        variables = init_model(model, batch)
        gcmvn = GlobalCMVN(mean=np.full((80,), 2.0, np.float32),
                           std=np.full((80,), 3.0, np.float32))
        gen = MultiDecoderSpeechGenerator(
            model, VOCAB, max_text_len=8, max_mel_len=12,
            vocoder=StubVocoder(), vocoder_params=None, gcmvn=gcmvn, hop=4)
        out = gen.generate(dict(variables), batch)
        assert len(out) == 2
        for h in out:
            assert 0 <= len(h["tokens"]) <= 8
            assert h["feature"].shape[1] == 80
            assert h["feature"].shape[0] <= 12
            assert len(h["waveform"]) == h["feature"].shape[0] * 4
            assert np.isfinite(h["feature"]).all()
        # the vocoder consumed DEnormalized mel: stub wav == mean of
        # (mel * std + mean) per frame
        h = out[0]
        np.testing.assert_allclose(
            h["waveform"][::4], h["feature"].mean(-1), rtol=1e-4, atol=1e-5)


class TestMultitaskData:
    def test_text_target_multitask_data(self):
        d = Dictionary()
        for ph in ["AA", "BB", "CC"]:
            d.add_symbol(ph)
        rows = [{"id": "u1", "tgt_text": "AA BB"},
                {"id": "u2", "tgt_text": "CC"}]
        mt = NATTextTargetMultitaskData(rows, d)
        t1 = mt.get("u1")
        assert t1[0] == d.bos() and t1[-1] == d.eos() and len(t1) == 4
        assert len(mt.get("missing")) == 0
        out = mt.collater([mt.get("u1"), mt.get("u2")])
        assert out["target"].shape == (2, 4)
        assert out["target"][1, -1] == d.pad()
        assert out["ntokens"] == 7
        capped = mt.collater([mt.get("u1")], cap=3)
        assert capped["target"].shape == (1, 3)

    def test_multitask_dataset_attaches_targets(self, tmp_path):
        from test_data import make_dataset

        rng = np.random.default_rng(0)
        d, rows, _ = make_dataset(tmp_path, rng, n=4, s2s=False)
        ds = NATSpeechToTextMultitaskDataset(rows, d)
        ds.add_multitask_dataset(
            "source_text", NATTextTargetMultitaskData(rows, d))
        targets = ds.multitask_targets(0)
        assert set(targets) == {"source_text"}
        assert targets["source_text"][0] == d.bos()

        # collate path: the bucketed batch carries the aux targets
        from daspeech_tpu.data.datasets import BucketBatcher, make_buckets

        vocab = VocabConfig(size=len(d), bos=d.bos(), pad=d.pad(),
                            eos=d.eos(), unk=d.unk())
        specs = make_buckets([ds.n_frames(i) for i in range(len(ds))],
                             max_tokens=512, num_buckets=1)
        bb = BucketBatcher(ds, list(range(len(ds))), specs, vocab=vocab)
        spec, idxs = bb.batches_for_epoch(0)[0]
        batch = bb.collate(spec, idxs)
        assert "multitask" in batch
        aux = batch["multitask"]["source_text"]
        assert aux["target"].shape[0] == spec.batch
        assert aux["target"].shape[1] <= spec.tgt
