"""The vocoder must consume gcmvn-DEnormalized (raw-domain) mels: the
reference denormalizes before get_waveform (``speech_generator.py`` /
``s2s_nat_generator.py:242-285``); vocoding the normalized mel corrupts
every generated waveform when --gcmvn-stats is set."""

import jax
import jax.numpy as jnp
import numpy as np

from testutils import fast_init

from daspeech_tpu.core.config import FastSpeech2Config, VocabConfig
from daspeech_tpu.data.transforms import GlobalCMVN
from daspeech_tpu.decode.speech_generator import (
    NonAutoregressiveSpeechGenerator,
)
from daspeech_tpu.models.fastspeech2 import FastSpeech2Encoder

HOP = 4


class StubVocoder:
    """Linear 'vocoder': wav[b, m*HOP + k] = mel[b, m].mean() — enough to
    detect whether it was fed normalized or denormalized mels."""

    def apply(self, params, mel):
        frame = jnp.mean(mel, axis=-1)                     # [B, M]
        return jnp.repeat(frame, HOP, axis=-1)             # [B, M*HOP]


def test_nar_generator_vocodes_denormalized_mel():
    vocab = VocabConfig(size=16)
    cfg = FastSpeech2Config(
        encoder_layers=1, encoder_embed_dim=16, encoder_heads=2,
        decoder_layers=1, decoder_embed_dim=16, decoder_heads=2,
        fft_hidden_dim=32, var_pred_hidden_dim=8, var_pred_n_bins=4,
        dropout=0.0, attention_dropout=0.0, var_pred_dropout=0.0)
    model = FastSpeech2Encoder(cfg, vocab_size=vocab.size, pad=vocab.pad)
    rng = np.random.default_rng(0)
    B, T, M = 2, 4, 16
    toks = jnp.asarray(rng.integers(4, vocab.size, size=(B, T)), jnp.int32)
    variables = fast_init(model, jax.random.key(0), src_tokens=toks,
                          max_out_len=M)

    mean = np.full((80,), 3.0, np.float32)
    std = np.full((80,), 2.0, np.float32)
    gcmvn = GlobalCMVN(mean=mean, std=std)
    gen = NonAutoregressiveSpeechGenerator(
        model, vocab, max_mel_len=M, vocoder=StubVocoder(),
        vocoder_params=None, gcmvn=gcmvn, hop=HOP)
    out = gen.generate({"params": variables["params"]},
                       {"src_tokens": toks})

    # raw model mel (normalized domain), same jit-free forward
    mel, mel_post, out_lens, _, _, _ = model.apply(
        {"params": variables["params"]}, src_tokens=toks, max_out_len=M)
    mel_final = np.asarray(mel_post if mel_post is not None else mel)
    lens = np.asarray(out_lens)
    for b in range(B):
        want_mel_voc = mel_final[b] * std + mean        # denormalized
        want_wav = np.repeat(want_mel_voc.mean(-1), HOP)[: lens[b] * HOP]
        np.testing.assert_allclose(
            out[b]["waveform"], want_wav, rtol=1e-4, atol=1e-5)
        # dumped feature stays the denormalized mel (unchanged behavior)
        np.testing.assert_allclose(
            out[b]["feature"], want_mel_voc[: lens[b]], rtol=1e-4,
            atol=1e-5)
