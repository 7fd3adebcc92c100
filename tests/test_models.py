"""Shape/finiteness tests for the model stack on tiny configs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from testutils import fast_init

from daspeech_tpu.core.config import (
    ConformerConfig,
    DAGDecoderConfig,
    DAGModelConfig,
    FastSpeech2Config,
    HiFiGANConfig,
    S2SModelConfig,
    VocabConfig,
)
from daspeech_tpu.models import (
    ConformerEncoder,
    HiFiGANGenerator,
    S2SConformerDAGFastSpeech2,
    S2TConformerDAG,
    graph_lengths,
    initialize_output_tokens,
    length_regulate,
)
from daspeech_tpu.models.fastspeech2 import FastSpeech2Encoder


def tiny_dag_cfg(vocab_size=20):
    return DAGModelConfig(
        vocab=VocabConfig(size=vocab_size),
        encoder=ConformerConfig(
            embed_dim=16, ffn_dim=32, num_layers=2, num_heads=2,
            conv_channels=32, depthwise_kernel_size=7),
        decoder=DAGDecoderConfig(
            embed_dim=16, ffn_dim=32, num_layers=2, num_heads=2,
            max_target_positions=64),
    )


def tiny_fs2_cfg():
    return FastSpeech2Config(
        encoder_layers=1, encoder_embed_dim=16, encoder_heads=2,
        decoder_layers=1, decoder_embed_dim=16, decoder_heads=2,
        fft_hidden_dim=32, var_pred_hidden_dim=16, var_pred_n_bins=8)


class TestDropout:
    """u16-threshold dropout (``models/layers.py::Dropout``) — the fast
    drop-in for ``nn.Dropout``."""

    def test_statistics_and_scaling(self):
        from daspeech_tpu.models.layers import Dropout

        x = jnp.ones((2000, 256), jnp.float32)
        y = np.asarray(Dropout(0.1, deterministic=False).apply(
            {}, x, rngs={"dropout": jax.random.key(0)}))
        frac = (y == 0).mean()
        assert abs(frac - 0.1) < 0.01, frac
        kept = y[y != 0]
        # keep prob is quantized to q/65536; scale is exactly 65536/q
        q = int(round(0.9 * 65536))
        np.testing.assert_allclose(kept, 65536 / q, rtol=1e-6)

    def test_deterministic_and_zero_rate_passthrough(self):
        from daspeech_tpu.models.layers import Dropout

        x = jnp.arange(24.0).reshape(4, 6)
        out = Dropout(0.3, deterministic=True).apply(
            {}, x, rngs={"dropout": jax.random.key(0)})
        np.testing.assert_array_equal(np.asarray(out), np.asarray(x))
        out = Dropout(0.0, deterministic=False).apply({}, x)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(x))
        a = Dropout(0.5, deterministic=False).apply(
            {}, x, rngs={"dropout": jax.random.key(7)})
        b = Dropout(0.5, deterministic=False).apply(
            {}, x, rngs={"dropout": jax.random.key(7)})
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_call_time_deterministic_arg(self):
        from daspeech_tpu.models.layers import Dropout

        x = jnp.ones((8, 8))
        out = Dropout(0.4).apply({}, x, deterministic=True)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


class TestConformer:
    def test_forward_shapes_and_masking(self):
        enc = ConformerEncoder(
            embed_dim=16, ffn_dim=32, num_layers=2, num_heads=2,
            conv_channels=32, depthwise_kernel_size=7)
        rng = np.random.default_rng(0)
        B, T, F = 2, 37, 80
        fbank = jnp.asarray(rng.normal(size=(B, T, F)).astype(np.float32))
        lengths = jnp.asarray([37, 20], dtype=jnp.int32)
        params = fast_init(enc, jax.random.key(0), fbank, lengths)
        out, pad_mask, out_lens = enc.apply(params, fbank, lengths)
        # 4x subsample: (37-1)//2+1 = 19 -> (19-1)//2+1 = 10
        assert out.shape == (B, 10, 16)
        np.testing.assert_array_equal(np.asarray(out_lens), [10, 5])
        assert np.isfinite(np.asarray(out)).all()
        # padded frames zeroed
        assert np.abs(np.asarray(out)[1, 5:]).max() == 0.0

    def test_padding_invariance(self):
        """Extending the padded region must not change valid outputs."""
        enc = ConformerEncoder(
            embed_dim=16, ffn_dim=32, num_layers=1, num_heads=2,
            conv_channels=32, depthwise_kernel_size=7, dropout=0.0,
            attn_dropout=0.0)
        rng = np.random.default_rng(1)
        T1, T2 = 24, 32
        x = rng.normal(size=(1, T2, 80)).astype(np.float32)
        x[:, T1:] = 0.0
        lengths = jnp.asarray([T1], dtype=jnp.int32)
        params = fast_init(enc, jax.random.key(0), jnp.asarray(x[:, :T1]), lengths)
        o1, _, l1 = enc.apply(params, jnp.asarray(x[:, :T1]), lengths)
        o2, _, l2 = enc.apply(params, jnp.asarray(x), lengths)
        n = int(l1[0])
        np.testing.assert_allclose(
            np.asarray(o1)[0, :n], np.asarray(o2)[0, :n],
            rtol=2e-4, atol=1e-5)


class TestDAGModel:
    def test_forward_and_links_are_log_probs(self):
        cfg = tiny_dag_cfg()
        model = S2TConformerDAG(cfg)
        rng = np.random.default_rng(2)
        B, T = 2, 33
        fbank = jnp.asarray(rng.normal(size=(B, T, 80)).astype(np.float32))
        src_lengths = jnp.asarray([33, 21], dtype=jnp.int32)
        L = 16
        glen = graph_lengths(src_lengths, 0.5, 64)
        np.testing.assert_array_equal(np.asarray(glen), [16, 10])
        prev = initialize_output_tokens(glen, L, cfg.vocab)
        # bos/eos placement
        p = np.asarray(prev)
        assert p[0, 0] == cfg.vocab.bos and p[0, 15] == cfg.vocab.eos
        assert p[1, 9] == cfg.vocab.eos and (p[1, 10:] == cfg.vocab.pad).all()

        params = fast_init(model, jax.random.key(0), fbank, src_lengths, prev)
        logits, links, feats = model.apply(params, fbank, src_lengths, prev)
        assert logits.shape == (B, L, cfg.vocab.size)
        assert links.shape == (B, L, L)
        assert feats.shape == (B, L, cfg.decoder.embed_dim)
        ln = np.asarray(links)
        # rows over valid successors sum to 1 in prob space
        for b, gl in enumerate([16, 10]):
            for i in range(gl - 1):
                row = ln[b, i]
                s = np.exp(row[np.isfinite(row)]).sum()
                assert s == pytest.approx(1.0, abs=1e-4), (b, i)
            # strictly upper triangular: no backward transitions
            assert not np.isfinite(ln[b][np.tril_indices(L, 0)]).any()
            # no transitions into padding
            assert not np.isfinite(ln[b][:, gl:]).any()

    def test_dropout_rng_paired_passes(self):
        """Same rng key => identical stochastic forward (GLAT pairing)."""
        cfg = tiny_dag_cfg()
        model = S2TConformerDAG(cfg)
        rng = np.random.default_rng(3)
        fbank = jnp.asarray(rng.normal(size=(1, 17, 80)).astype(np.float32))
        sl = jnp.asarray([17], dtype=jnp.int32)
        prev = initialize_output_tokens(
            graph_lengths(sl, 0.5, 64), 8, cfg.vocab)
        variables = fast_init(model, jax.random.key(0), fbank, sl, prev)
        params = {"params": variables["params"]}
        key = jax.random.key(42)
        out1 = model.apply(params, fbank, sl, prev, train=True,
                           rngs={"dropout": key},
                           mutable=["batch_stats"])[0]
        out2 = model.apply(params, fbank, sl, prev, train=True,
                           rngs={"dropout": key},
                           mutable=["batch_stats"])[0]
        np.testing.assert_array_equal(np.asarray(out1[0]), np.asarray(out2[0]))
        out3 = model.apply(params, fbank, sl, prev, train=True,
                           rngs={"dropout": jax.random.key(43)},
                           mutable=["batch_stats"])[0]
        assert np.abs(np.asarray(out1[0]) - np.asarray(out3[0])).max() > 0


class TestLengthRegulator:
    def test_matches_naive_repeat(self):
        rng = np.random.default_rng(4)
        B, T, C, M = 3, 5, 4, 20
        x = rng.normal(size=(B, T, C)).astype(np.float32)
        dur = rng.integers(0, 4, size=(B, T)).astype(np.int32)
        out, out_lens = length_regulate(jnp.asarray(x), jnp.asarray(dur), M)
        out = np.asarray(out)
        for b in range(B):
            want = np.repeat(x[b], dur[b], axis=0)
            assert int(out_lens[b]) == want.shape[0]
            np.testing.assert_allclose(out[b, : want.shape[0]], want, rtol=1e-6)
            assert np.abs(out[b, want.shape[0]:]).max() == 0.0


class TestFastSpeech2:
    def test_token_path_teacher_forced(self):
        cfg = tiny_fs2_cfg()
        model = FastSpeech2Encoder(cfg, vocab_size=11, pad=1)
        rng = np.random.default_rng(5)
        B, T, M = 2, 7, 30
        tokens = jnp.asarray(rng.integers(3, 11, size=(B, T)), dtype=jnp.int32)
        tokens = tokens.at[1, 5:].set(1)
        dur = jnp.asarray(rng.integers(1, 4, size=(B, T)), dtype=jnp.int32)
        dur = dur * (tokens != 1)
        pitch = jnp.asarray(rng.uniform(0, 300, size=(B, T)).astype(np.float32))
        energy = jnp.asarray(rng.uniform(0, 100, size=(B, T)).astype(np.float32))
        params = fast_init(
            model, jax.random.key(0), src_tokens=tokens, max_out_len=M,
            durations=dur, pitches=pitch, energies=energy)
        mel, mel_post, out_lens, log_dur, p_out, e_out = model.apply(
            params, src_tokens=tokens, max_out_len=M,
            durations=dur, pitches=pitch, energies=energy)
        assert mel.shape == (B, M, 80)
        assert np.isfinite(np.asarray(mel)).all()
        np.testing.assert_array_equal(
            np.asarray(out_lens), np.asarray(dur.sum(axis=1)))
        assert log_dur.shape == (B, T) and p_out.shape == (B, T)

    def test_speaker_embedding_conditions_output(self):
        """``speaker_embed_dim``/``num_speakers`` (``fastspeech2.py:
        226-238,305-309``): different speaker ids must produce different
        mels; omitting ``speaker`` defaults to id 0."""
        import dataclasses

        cfg = dataclasses.replace(tiny_fs2_cfg(), num_speakers=3,
                                  speaker_embed_dim=8)
        model = FastSpeech2Encoder(cfg, vocab_size=11, pad=1)
        rng = np.random.default_rng(6)
        B, T, M = 2, 5, 20
        tokens = jnp.asarray(rng.integers(3, 11, size=(B, T)), jnp.int32)
        dur = jnp.full((B, T), M // T, jnp.int32)
        pitch = jnp.zeros((B, T), jnp.float32)
        energy = jnp.zeros((B, T), jnp.float32)
        spk = jnp.asarray([0, 0], jnp.int32)
        params = fast_init(
            model, jax.random.key(0), src_tokens=tokens, max_out_len=M,
            durations=dur, pitches=pitch, energies=energy, speaker=spk)
        assert "embed_speaker" in params["params"]

        def run(speaker):
            mel, *_ = model.apply(
                params, src_tokens=tokens, max_out_len=M, durations=dur,
                pitches=pitch, energies=energy, speaker=speaker)
            return np.asarray(mel)

        m0 = run(jnp.asarray([0, 0], jnp.int32))
        m1 = run(jnp.asarray([1, 2], jnp.int32))
        m_default = run(None)
        assert np.abs(m0 - m1).max() > 1e-4     # speaker changes the mel
        np.testing.assert_allclose(m_default, m0)  # None -> speaker 0

    def test_noemb_inference_path(self):
        cfg = tiny_fs2_cfg()
        model = FastSpeech2Encoder(cfg, vocab_size=0, pad=1)
        rng = np.random.default_rng(6)
        B, T, M = 2, 6, 40
        x = jnp.asarray(rng.normal(size=(B, T, 16)).astype(np.float32))
        pad_mask = jnp.zeros((B, T), dtype=bool).at[1, 4:].set(True)
        params = fast_init(model, jax.random.key(0), x=x, enc_pad_mask=pad_mask,
                           max_out_len=M)
        mel, _, out_lens, _, _, _ = model.apply(
            params, x=x, enc_pad_mask=pad_mask, max_out_len=M)
        assert mel.shape == (B, M, 80)
        assert np.isfinite(np.asarray(mel)).all()
        assert (np.asarray(out_lens) >= 0).all()


class TestHiFiGAN:
    def test_generator_output_length_and_range(self):
        cfg = HiFiGANConfig(
            upsample_rates=(4, 4), upsample_kernel_sizes=(8, 8),
            upsample_initial_channel=16, resblock_kernel_sizes=(3,),
            resblock_dilation_sizes=((1, 3),))
        gen = HiFiGANGenerator(cfg)
        rng = np.random.default_rng(7)
        mel = jnp.asarray(rng.normal(size=(2, 25, 80)).astype(np.float32))
        params = gen.init(jax.random.key(0), mel)
        wav = gen.apply(params, mel)
        assert wav.shape == (2, 25 * 16)
        w = np.asarray(wav)
        assert np.isfinite(w).all() and np.abs(w).max() <= 1.0

    def test_folded_serving_path_matches_direct(self):
        """fold_to > 0 (space-to-depth tail, models/hifigan.py) must produce
        the exact same waveform with the same parameter tree — it is a
        reshuffled computation, not an approximation."""
        cfg = HiFiGANConfig(
            upsample_rates=(4, 2, 2), upsample_kernel_sizes=(8, 4, 4),
            upsample_initial_channel=32, resblock_kernel_sizes=(3, 5),
            resblock_dilation_sizes=((1, 3), (1, 3)))
        direct = HiFiGANGenerator(cfg)
        folded = HiFiGANGenerator(cfg, fold_to=16)   # folds the 8/4-ch tail
        rng = np.random.default_rng(8)
        mel = jnp.asarray(rng.normal(size=(2, 16, 80)).astype(np.float32))
        params = direct.init(jax.random.key(0), mel)
        # identical parameter structure: folded runs straight off them
        wav_d = np.asarray(direct.apply(params, mel))
        wav_f = np.asarray(folded.apply(params, mel))
        assert wav_f.shape == wav_d.shape
        np.testing.assert_allclose(wav_f, wav_d, rtol=1e-5, atol=1e-5)

    def test_folded_resblock2_matches(self):
        cfg = HiFiGANConfig(
            resblock="2",
            upsample_rates=(4, 4), upsample_kernel_sizes=(8, 8),
            upsample_initial_channel=16, resblock_kernel_sizes=(3,),
            resblock_dilation_sizes=((1, 3),))
        direct = HiFiGANGenerator(cfg)
        folded = HiFiGANGenerator(cfg, fold_to=8)
        rng = np.random.default_rng(9)
        mel = jnp.asarray(rng.normal(size=(1, 8, 80)).astype(np.float32))
        params = direct.init(jax.random.key(0), mel)
        np.testing.assert_allclose(
            np.asarray(folded.apply(params, mel)),
            np.asarray(direct.apply(params, mel)), rtol=1e-5, atol=1e-5)


class TestS2SModel:
    def test_end_to_end_synthesize(self):
        cfg = S2SModelConfig(dag=tiny_dag_cfg(), tts=tiny_fs2_cfg(),
                             adaptor_ffn_dim=32)
        model = S2SConformerDAGFastSpeech2(cfg)
        rng = np.random.default_rng(8)
        B, T, L, M = 2, 33, 16, 50
        fbank = jnp.asarray(rng.normal(size=(B, T, 80)).astype(np.float32))
        sl = jnp.asarray([33, 25], dtype=jnp.int32)
        prev = initialize_output_tokens(
            graph_lengths(sl, 0.5, 64), L, cfg.dag.vocab)

        def run(m):
            logits, links, feats = m(fbank, sl, prev)
            pad = jnp.zeros((B, L), dtype=bool)
            return m.synthesize(feats, pad, M)

        params = fast_init(model, jax.random.key(0), method=run)
        mel, _, out_lens, log_dur, _, _ = model.apply(params, method=run)
        assert mel.shape == (B, M, 80)
        assert np.isfinite(np.asarray(mel)).all()

pytestmark = pytest.mark.slow
