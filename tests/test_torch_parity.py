"""Numerical parity vs the PyTorch reference implementations.

These tests instantiate the *reference* torch modules (read-only at
/root/reference) with random weights, import the weights through
``daspeech_tpu.train.torch_import``, and compare outputs — the strongest
correctness check available without trained checkpoints (zero-egress host).
"""

import sys
from pathlib import Path

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

pytestmark = pytest.mark.slow

REF = Path("/root/reference")


@pytest.mark.skipif(not REF.exists(), reason="reference repo not mounted")
class TestHiFiGANParity:
    def test_generator_waveform_matches(self):
        torch = pytest.importorskip("torch")
        # the reference imports its own top-level `utils`/`models`/`env`;
        # drop any same-named modules loaded earlier in the test session
        for mod in ("utils", "models", "env"):
            sys.modules.pop(mod, None)
        sys.path.insert(0, str(REF / "hifi-gan"))
        from env import AttrDict
        from models import Generator

        from daspeech_tpu.core.config import HiFiGANConfig
        from daspeech_tpu.models import HiFiGANGenerator
        from daspeech_tpu.train.torch_import import import_hifigan

        h = AttrDict({
            "resblock": "1",
            "upsample_rates": [4, 4],
            "upsample_kernel_sizes": [8, 8],
            "upsample_initial_channel": 32,
            "resblock_kernel_sizes": [3, 5],
            "resblock_dilation_sizes": [[1, 3, 5], [1, 3, 5]],
        })
        torch.manual_seed(0)
        ref = Generator(h).eval()

        cfg = HiFiGANConfig(
            resblock="1", upsample_rates=(4, 4), upsample_kernel_sizes=(8, 8),
            upsample_initial_channel=32, resblock_kernel_sizes=(3, 5),
            resblock_dilation_sizes=((1, 3, 5), (1, 3, 5)))
        params = import_hifigan(ref.state_dict(), cfg)

        rng = np.random.default_rng(0)
        mel = rng.normal(size=(2, 23, 80)).astype(np.float32)
        with torch.no_grad():
            want = ref(torch.from_numpy(mel).transpose(1, 2)).numpy()[:, 0]

        gen = HiFiGANGenerator(cfg)
        got = np.asarray(gen.apply(params, jnp.asarray(mel)))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.skipif(not REF.exists(), reason="reference repo not mounted")
class TestFastSpeech2Parity:
    def _build_ref(self, torch):
        """Instantiate the fairseq FastSpeech2Encoder via the import shim
        (the fork's package __init__ breaks on python >= 3.12)."""
        from argparse import Namespace

        import fairseq_shim

        fs2_mod = fairseq_shim.install()
        FastSpeech2Encoder = fs2_mod.FastSpeech2Encoder

        class _Dict:
            def __len__(self):
                return 9

            def pad(self):
                return 1

        d = _Dict()
        args = Namespace(
            dropout=0.0, output_frame_dim=80, speaker_embed_dim=0,
            fft_hidden_dim=32, fft_kernel_size=9, attention_dropout=0.0,
            encoder_layers=1, encoder_embed_dim=16, encoder_attention_heads=2,
            decoder_layers=1, decoder_embed_dim=16, decoder_attention_heads=2,
            var_pred_n_bins=8, var_pred_hidden_dim=16, var_pred_kernel_size=3,
            var_pred_dropout=0.0, add_postnet=False, postnet_dropout=0.0,
            postnet_layers=0, postnet_conv_dim=8, postnet_conv_kernel_size=1,
            pitch_min=0.0, pitch_max=300.0, energy_min=0.0, energy_max=100.0,
            n_frames_per_step=1, max_source_positions=256,
        )
        torch.manual_seed(0)
        enc = FastSpeech2Encoder(args, d, None).eval()
        return enc, d, args

    def test_teacher_forced_mel_matches(self):
        torch = pytest.importorskip("torch")
        try:
            ref, d, args = self._build_ref(torch)
        except Exception as e:  # fairseq fork may fail to import
            pytest.skip(f"reference fairseq unimportable: {e}")

        from daspeech_tpu.core.config import FastSpeech2Config
        from daspeech_tpu.models.fastspeech2 import FastSpeech2Encoder as Ours
        from daspeech_tpu.train.torch_import import import_fastspeech2

        cfg = FastSpeech2Config(
            encoder_layers=1, encoder_embed_dim=16, encoder_heads=2,
            decoder_layers=1, decoder_embed_dim=16, decoder_heads=2,
            fft_hidden_dim=32, fft_kernel_size=9, dropout=0.0,
            attention_dropout=0.0, var_pred_n_bins=8, var_pred_hidden_dim=16,
            var_pred_kernel_size=3, var_pred_dropout=0.0,
            pitch_min=0.0, pitch_max=300.0, energy_min=0.0, energy_max=100.0)

        sd = {k: v for k, v in ref.state_dict().items()}
        params = import_fastspeech2(sd, cfg, prefix="")
        # token embedding
        params["params"]["embed_tokens"] = {
            "embedding": ref.embed_tokens.weight.detach().numpy()}

        rng = np.random.default_rng(1)
        B, T = 2, 6
        tokens = rng.integers(4, len(d), size=(B, T)).astype(np.int64)
        durations = rng.integers(1, 4, size=(B, T)).astype(np.int64)
        pitches = rng.uniform(0, 300, size=(B, T)).astype(np.float32)
        energies = rng.uniform(0, 100, size=(B, T)).astype(np.float32)

        with torch.no_grad():
            want_mel, _, want_lens, want_logdur, want_pitch, want_energy = ref(
                torch.from_numpy(tokens),
                durations=torch.from_numpy(durations),
                pitches=torch.from_numpy(pitches),
                energies=torch.from_numpy(energies))

        ours = Ours(cfg, vocab_size=len(d), pad=d.pad())
        M = int(durations.sum(1).max())
        got_mel, _, got_lens, got_logdur, got_pitch, got_energy = ours.apply(
            params, src_tokens=jnp.asarray(tokens.astype(np.int32)),
            max_out_len=M,
            durations=jnp.asarray(durations.astype(np.int32)),
            pitches=jnp.asarray(pitches), energies=jnp.asarray(energies))

        np.testing.assert_array_equal(np.asarray(got_lens), want_lens.numpy())
        np.testing.assert_allclose(
            np.asarray(got_logdur), want_logdur.numpy(), rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(got_pitch), want_pitch.numpy(), rtol=1e-4, atol=1e-4)
        # compare mel on valid frames only
        for b in range(B):
            n = int(want_lens[b])
            np.testing.assert_allclose(
                np.asarray(got_mel)[b, :n], want_mel.numpy()[b, :n],
                rtol=1e-3, atol=1e-3)


@pytest.mark.skipif(not REF.exists(), reason="reference repo not mounted")
class TestConformerParity:
    def test_conformer_layer_matches(self):
        torch = pytest.importorskip("torch")
        import fairseq_shim

        fairseq_shim.install()
        import fairseq

        ConfLayer = fairseq.conformer_layer.ConformerEncoderLayer
        RelPos = fairseq.positional_encoding.RelPositionalEncoding

        torch.manual_seed(0)
        D, H, FFN, K = 16, 2, 32, 7
        ref = ConfLayer(embed_dim=D, ffn_embed_dim=FFN, attention_heads=H,
                        dropout=0.0, use_fp16=False,
                        depthwise_conv_kernel_size=K,
                        attn_type="espnet", pos_enc_type="rel_pos").eval()
        pos_enc = RelPos(100, D)

        rng = np.random.default_rng(0)
        B, T = 2, 12
        x = rng.normal(size=(B, T, D)).astype(np.float32)
        lengths = np.array([T, T - 3], np.int64)
        pad_mask_np = np.arange(T)[None, :] >= lengths[:, None]

        xt = torch.from_numpy(x).transpose(0, 1)       # T x B x C
        pos = pos_enc(xt)                              # takes T x B x C
        with torch.no_grad():
            want, _ = ref(xt, torch.from_numpy(pad_mask_np), pos)
        want = want.transpose(0, 1).numpy()

        from daspeech_tpu.models.conformer import ConformerEncoderLayer as Ours
        from daspeech_tpu.train.torch_import import import_conformer_layer

        imported = import_conformer_layer(
            {k: v for k, v in ref.state_dict().items()}, "")
        ours = Ours(embed_dim=D, ffn_dim=FFN, num_heads=H, dropout=0.0,
                    depthwise_kernel_size=K, attn_dropout=0.0)
        got = np.asarray(ours.apply(
            {"params": imported["params"],
             "batch_stats": imported["batch_stats"]},
            jnp.asarray(x), jnp.asarray(pad_mask_np)))

        # our conv module masks padded frames (deliberate improvement), so
        # the reference's conv leaks padding into the last (K-1)/2 valid
        # frames of padded samples; compare everything before that boundary
        half_k = (K - 1) // 2
        for b in range(B):
            n = int(lengths[b])
            cut = n if n == T else n - half_k
            np.testing.assert_allclose(got[b, :cut], want[b, :cut],
                                       rtol=2e-4, atol=2e-4)

    def test_subsampler_matches(self):
        torch = pytest.importorskip("torch")
        import fairseq_shim

        fairseq_shim.install()
        import fairseq

        Conv1dSub = fairseq.convolution.Conv1dSubsampler
        torch.manual_seed(1)
        ref = Conv1dSub(80, 32, 16, [5, 5]).eval()
        rng = np.random.default_rng(1)
        B, T = 2, 37
        x = rng.normal(size=(B, T, 80)).astype(np.float32)
        lengths = np.array([T, T], np.int64)
        with torch.no_grad():
            want, want_lens = ref(torch.from_numpy(x),
                                  torch.from_numpy(lengths))
        want = want.transpose(0, 1).numpy()           # B x T' x C

        from daspeech_tpu.models.conformer import Conv1dSubsampler as Ours
        from daspeech_tpu.train.torch_import import _conv

        sd = ref.state_dict()
        params = {"params": {
            "conv0": _conv(sd, "conv_layers.0"),
            "conv1": _conv(sd, "conv_layers.1"),
        }}
        got, got_lens = Ours(32, 16).apply(
            params, jnp.asarray(x), jnp.asarray(lengths.astype(np.int32)))
        np.testing.assert_array_equal(np.asarray(got_lens),
                                      want_lens.numpy())
        np.testing.assert_allclose(np.asarray(got), want,
                                   rtol=2e-4, atol=2e-4)
