"""Golden end-to-end numerics: frozen random-weight fixtures for the full
two-pass S2ST forward and the HiFi-GAN vocoder (VERDICT r3 item 8).

The slow torch-parity suites catch cross-framework drift but take minutes;
this fast-tier gate catches UNINTENDED numeric drift between those runs —
a kernel rewrite, a refactor, or a strategy-selection change that shifts
the pipeline's numbers. Fixtures are fp32 on CPU at fixed seeds
(``tests/golden/e2e_golden.npz``). Decoded tokens must match EXACTLY;
mel/waveform match to 1e-4 (float reassociation headroom for XLA version
bumps — anything above that is a real semantic change).

Regenerate deliberately after an INTENDED numeric change:
    GOLDEN_REGEN=1 python -m pytest tests/test_golden_e2e.py -q
and commit the new .npz with a note on what changed.
"""

import os
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from daspeech_tpu.core.config import (
    ConformerConfig, DAGDecoderConfig, DAGModelConfig, FastSpeech2Config,
    HiFiGANConfig, S2SModelConfig, VocabConfig)
from daspeech_tpu.decode import gather_path_features, greedy_or_lookahead_decode
from daspeech_tpu.models import (
    HiFiGANGenerator, S2SConformerDAGFastSpeech2, graph_lengths,
    initialize_output_tokens)

GOLDEN = Path(__file__).parent / "golden" / "e2e_golden.npz"

B, S, L, T_PHONE, M = 2, 40, 20, 8, 32


def build_pipeline():
    vocab = VocabConfig(size=32)
    cfg = S2SModelConfig(
        dag=DAGModelConfig(
            vocab=vocab,
            encoder=ConformerConfig(
                embed_dim=16, ffn_dim=32, num_heads=2, num_layers=1,
                conv_channels=8, depthwise_kernel_size=7, dropout=0.0),
            decoder=DAGDecoderConfig(
                embed_dim=16, ffn_dim=32, num_heads=2, num_layers=1,
                dropout=0.0)),
        tts=FastSpeech2Config(
            encoder_layers=1, encoder_embed_dim=16, encoder_heads=2,
            decoder_layers=1, decoder_embed_dim=16, decoder_heads=2,
            fft_hidden_dim=32, var_pred_hidden_dim=16, dropout=0.0,
            attention_dropout=0.0))
    model = S2SConformerDAGFastSpeech2(cfg)
    voc_cfg = HiFiGANConfig(
        upsample_rates=(2, 2), upsample_kernel_sizes=(4, 4),
        upsample_initial_channel=32,
        resblock_kernel_sizes=(3, 7), resblock_dilation_sizes=((1, 3),) * 2,
        resblock="1", num_mels=80)
    voc = HiFiGANGenerator(voc_cfg, fold_to=128)
    return cfg, model, voc


def run_pipeline():
    cfg, model, voc = build_pipeline()
    vocab = cfg.dag.vocab
    rng = np.random.default_rng(0)
    fbank = jnp.asarray(rng.normal(size=(B, S, 80)).astype(np.float32))
    src_lengths = jnp.asarray([S, S - 5], jnp.int32)
    prev = initialize_output_tokens(
        graph_lengths(src_lengths, cfg.dag.decoder.src_upsample_scale,
                      cfg.dag.decoder.max_target_positions), L, vocab)

    def full(m):
        logits, links, feats = m(fbank, src_lengths, prev)
        return m.synthesize(feats[:, :T_PHONE],
                            jnp.zeros((B, T_PHONE), bool), M)

    params = model.init(jax.random.PRNGKey(7), method=full)
    logits, links, feats = model.apply(params, fbank, src_lengths, prev)
    ol = jnp.sum(prev != vocab.pad, axis=1)
    res = greedy_or_lookahead_decode(logits, links, ol, vocab.pad, 1.0, True)
    z, zmask = gather_path_features(feats, res, skip_first=True)
    per = M // T_PHONE
    durs = np.full((B, T_PHONE), per, np.int32)
    durs[:, -1] += M - per * T_PHONE
    mel, _, mel_lens, _, _, _ = model.apply(
        params, z[:, :T_PHONE], zmask[:, :T_PHONE], M, jnp.asarray(durs),
        method=model.synthesize)
    vparams = voc.init(jax.random.PRNGKey(11), jnp.zeros((B, M, 80)))
    wav = voc.apply(vparams, mel[..., :80])
    return {
        "tokens": np.asarray(res.tokens, np.int32),
        "mel": np.asarray(mel, np.float32),
        "wav": np.asarray(wav, np.float32),
    }


class TestGoldenE2E:
    def test_pipeline_matches_golden(self):
        got = run_pipeline()
        if os.environ.get("GOLDEN_REGEN"):
            GOLDEN.parent.mkdir(parents=True, exist_ok=True)
            np.savez_compressed(GOLDEN, **got)
            pytest.skip(f"regenerated {GOLDEN}")
        assert GOLDEN.exists(), (
            "golden fixture missing — run GOLDEN_REGEN=1 pytest "
            "tests/test_golden_e2e.py")
        want = np.load(GOLDEN)
        np.testing.assert_array_equal(got["tokens"], want["tokens"],
                                      err_msg="decoded tokens drifted")
        np.testing.assert_allclose(
            got["mel"], want["mel"], rtol=1e-4, atol=1e-4,
            err_msg="FastSpeech2 mel drifted")
        np.testing.assert_allclose(
            got["wav"], want["wav"], rtol=1e-4, atol=1e-4,
            err_msg="vocoder waveform drifted")
