"""COMPOSED torch-vs-jax parity of the full two-pass S2ST pipeline.

A complete reference-side model — real fairseq Conformer encoder modules +
a GlatLinkDecoder built from real fairseq MultiheadAttention/positional
embeddings + the real ``DASpeech/models/fastspeech2_noemb.py`` executed
against the shim + the reference FFNAdapter — is run end to end at random
weights: fbank -> encoder -> DAG decode (lookahead AND joint-viterbi, via a
numpy oracle transcribed from ``s2s_conformer_dag_fastspeech2.py:210-305``)
-> hidden-state gather -> adaptor -> FastSpeech2NoEmb -> mel. The same
state dict is imported with ``import_s2s_daspeech`` and the same inputs are
pushed through the production ``S2SNATGenerator``; decoded tokens must
match exactly and mels to ~1e-3.

This is the composed counterpart of the per-module parity tests in
``test_torch_parity.py`` / ``test_dag_import_parity.py`` — the weight
mapping a released DASpeech .pt needs, validated through the whole model.
"""

import math
import sys

import numpy as np
import pytest

import jax.numpy as jnp

pytestmark = pytest.mark.slow

torch = pytest.importorskip("torch")

import fairseq_shim  # noqa: E402

fairseq_shim.install()

import fairseq  # noqa: E402

from test_dag_import_parity import (  # noqa: E402
    D, ENC_DIM, FFN, H, LAYERS, MAX_POS, PAD, V, TorchGlatLinkDecoder)

from daspeech_tpu.core.config import (  # noqa: E402
    ConformerConfig,
    DAGDecoderConfig,
    DAGModelConfig,
    DecodeConfig,
    FastSpeech2Config,
    S2SModelConfig,
    VocabConfig,
)
from daspeech_tpu.decode.generator import S2SNATGenerator  # noqa: E402
from daspeech_tpu.models.s2s_model import (  # noqa: E402
    S2SConformerDAGFastSpeech2)
from daspeech_tpu.train.torch_import import import_s2s_daspeech  # noqa: E402

CC = 16          # subsampler mid channels
TTS_D, TTS_FFN = 16, 32
UPSAMPLE = 0.5


# ---------------------------------------------------------------- torch side
class TorchConformerEncoder(torch.nn.Module):
    """``S2TConformerEncoder`` assembled from the real fairseq modules
    (``s2t_conformer.py:60-138``), rel_pos attention, no dropout."""

    def __init__(self, num_layers=2):
        super().__init__()
        Conv1dSub = fairseq.convolution.Conv1dSubsampler
        ConfLayer = fairseq.conformer_layer.ConformerEncoderLayer
        RelPos = fairseq.positional_encoding.RelPositionalEncoding
        self.subsample = Conv1dSub(80, CC, ENC_DIM, [5, 5])
        self.embed_scale = math.sqrt(ENC_DIM)
        self.embed_positions = RelPos(6000, ENC_DIM)
        self.linear = torch.nn.Linear(ENC_DIM, ENC_DIM)
        self.conformer_layers = torch.nn.ModuleList([
            ConfLayer(embed_dim=ENC_DIM, ffn_embed_dim=32,
                      attention_heads=2, dropout=0.0, use_fp16=False,
                      depthwise_conv_kernel_size=7, attn_type="espnet",
                      pos_enc_type="rel_pos")
            for _ in range(num_layers)])

    def forward(self, fbank, src_lengths):
        from fairseq.data.data_utils import lengths_to_padding_mask

        x, input_lengths = self.subsample(fbank, src_lengths)  # T x B x C
        pad_mask = lengths_to_padding_mask(input_lengths)
        x = self.embed_scale * x
        positions = self.embed_positions(x)
        x = self.linear(x)
        for layer in self.conformer_layers:
            x, _ = layer(x, pad_mask, positions)
        return x.transpose(0, 1), pad_mask, input_lengths   # B x T x C


class TorchFFNAdapter(torch.nn.Module):
    """``FFNAdapter`` (``s2s_conformer_dag_fastspeech2.py:24-39``)."""

    def __init__(self):
        super().__init__()
        self.fc1 = torch.nn.Linear(D, TTS_FFN)
        self.fc2 = torch.nn.Linear(TTS_FFN, TTS_D)

    def forward(self, x):
        return self.fc2(torch.relu(self.fc1(x)))


def load_noemb():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "daspeech_fs2_noemb",
        "/root/reference/DASpeech/models/fastspeech2_noemb.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["daspeech_fs2_noemb"] = mod
    spec.loader.exec_module(mod)
    return mod


class _DictStub:
    def pad(self):
        return PAD

    def __len__(self):
        return V


def tts_args():
    from argparse import Namespace

    return Namespace(
        tts_encoder_embed_dim=TTS_D, tts_encoder_attention_heads=2,
        tts_encoder_layers=1, tts_decoder_embed_dim=TTS_D,
        tts_decoder_attention_heads=2, tts_decoder_layers=1,
        fft_hidden_dim=TTS_FFN, fft_kernel_size=9, dropout=0.0,
        attention_dropout=0.0, var_pred_hidden_dim=8,
        var_pred_kernel_size=3, var_pred_dropout=0.0, var_pred_n_bins=8,
        pitch_min=0.0, pitch_max=300.0, energy_min=0.0, energy_max=100.0,
        n_frames_per_step=1, output_frame_dim=80, max_target_positions=64,
        add_postnet=False, speaker_embed_dim=0)


def flax_cfg():
    return S2SModelConfig(
        dag=DAGModelConfig(
            vocab=VocabConfig(size=V),
            encoder=ConformerConfig(
                embed_dim=ENC_DIM, ffn_dim=32, num_layers=2, num_heads=2,
                dropout=0.0, attn_dropout=0.0, depthwise_kernel_size=7,
                conv_channels=CC, conv_kernel_sizes=(5, 5)),
            decoder=DAGDecoderConfig(
                embed_dim=D, ffn_dim=FFN, num_layers=LAYERS, num_heads=H,
                dropout=0.0, attn_dropout=0.0, activation_dropout=0.0,
                max_target_positions=MAX_POS,
                src_upsample_scale=UPSAMPLE)),
        tts=FastSpeech2Config(
            encoder_layers=1, encoder_embed_dim=TTS_D, encoder_heads=2,
            decoder_layers=1, decoder_embed_dim=TTS_D, decoder_heads=2,
            fft_hidden_dim=TTS_FFN, fft_kernel_size=9, dropout=0.0,
            attention_dropout=0.0, var_pred_hidden_dim=8,
            var_pred_kernel_size=3, var_pred_dropout=0.0,
            var_pred_n_bins=8, pitch_min=0.0, pitch_max=300.0,
            energy_min=0.0, energy_max=100.0, max_positions=64),
        adaptor_ffn_dim=TTS_FFN, adaptor_dropout=0.0)


# ------------------------------------------------- numpy decode oracles
def oracle_lookahead(logits, links, output_length, beta=1.0):
    """``s2s_conformer_dag_fastspeech2.py:210-243`` transcribed to numpy:
    per-sentence pointer-chase with duplicate collapse. Returns per-sentence
    (tokens, feature_vertex_indices)."""
    logp = torch.log_softmax(torch.from_numpy(logits), dim=-1).numpy()
    unreduced_logits = logp.max(-1)
    unreduced_tokens = logp.argmax(-1)
    links_idx = (links + beta * unreduced_logits[:, None, :]).argmax(-1)
    out = []
    for i, length in enumerate(output_length):
        last = unreduced_tokens[i][0]
        j = 0
        res, res_idx = [last], []
        while j != length - 1:
            j = links_idx[i][j]
            now = unreduced_tokens[i][j]
            if now != PAD and now != last:
                res.append(now)
                res_idx.append(j)
            last = now
        out.append((res, res_idx))
    return out


def oracle_jointviterbi(logits, links, output_length, beta=1.0,
                        viterbibeta=1.0, max_length=4):
    """``s2s_conformer_dag_fastspeech2.py:243-304`` transcribed to numpy."""
    logp = torch.log_softmax(torch.from_numpy(logits), dim=-1).numpy()
    unreduced_logits = logp.max(-1)
    unreduced_tokens = logp.argmax(-1)
    B, L, _ = links.shape
    links = np.maximum(links, -1e9)
    scores, indexs = [], []
    alpha_t = links[:, 0] + beta * unreduced_logits[:, 0][:, None]
    alpha_t = alpha_t + beta * unreduced_logits
    scores.append(alpha_t.copy())
    for _ in range(max_length - 1):
        cand = alpha_t[:, :, None] + links           # [B, L(from), L(to)]
        index = cand.argmax(1)
        alpha_t = cand.max(1) + beta * unreduced_logits
        scores.append(alpha_t.copy())
        indexs.append(index)
    indexs = np.stack(indexs, 0)                     # [max_length-1, B, L]
    scores = np.stack(scores, 0)                     # [max_length, B, L]
    link_last = np.take_along_axis(
        links, (output_length - 1)[:, None, None].repeat(L, 1), axis=2
    )[None, :, :, 0]
    scores = scores + link_last
    max_idx = scores.argmax(-1)
    scores = scores.max(-1)
    lengths = np.arange(max_length)[:, None] + 1.0
    scores = scores / lengths ** viterbibeta
    pred_length = scores.argmax(0) + 1
    out = []
    for i in range(B):
        length = int(pred_length[i])
        j = int(max_idx[length - 1][i])
        last = unreduced_tokens[i][j]
        res, res_idx = [last], [j]
        for k in range(length - 1):
            j = int(indexs[length - k - 2][i][j])
            now = unreduced_tokens[i][j]
            if now != PAD and now != last:
                res.insert(0, now)
                res_idx.insert(0, j)
            last = now
        out.append((res, res_idx))
    return out


# ---------------------------------------------------------------- the test
class TestComposedS2SParity:
    @pytest.fixture(scope="class")
    def pipeline(self):
        torch.manual_seed(7)
        noemb = load_noemb()
        enc = TorchConformerEncoder().eval()
        dec = TorchGlatLinkDecoder().eval()
        adaptor = TorchFFNAdapter().eval()
        tts = noemb.FastSpeech2EncoderNoEmb(
            tts_args(), _DictStub(), None).eval()
        with torch.no_grad():
            # at random weights log-dur ~ 0 => round(exp(0)-1) = 0 frames,
            # a zero-length mel that crashes BOTH implementations (trained
            # models never predict all-zero). Bias to ~2.7 frames/token and
            # shrink the head so predictions sit far from the round()
            # boundaries — a 1e-6 float divergence must not flip a frame
            # count and turn a numerics comparison into a shape mismatch.
            tts.var_adaptor.duration_predictor.proj.bias.fill_(1.3)
            tts.var_adaptor.duration_predictor.proj.weight.mul_(0.02)

        sd = {}
        for prefix, mod in (("encoder", enc), ("decoder", dec),
                            ("adaptor", adaptor), ("tts", tts)):
            for k, v in mod.state_dict().items():
                sd[f"{prefix}.{k}"] = v

        rng = np.random.default_rng(0)
        B, S = 2, 37
        fbank = rng.normal(size=(B, S, 80)).astype(np.float32)
        src_lengths = np.array([S, S - 7], np.int64)
        graph_len = np.clip((src_lengths * UPSAMPLE).astype(np.int64),
                            2, MAX_POS)
        L = int(graph_len.max())
        prev = np.full((B, L), PAD, np.int64)
        for b in range(B):
            n = int(graph_len[b])
            prev[b, :n] = 3                                  # unk
            prev[b, 0] = 0                                   # bos
            prev[b, n - 1] = 2                               # eos

        with torch.no_grad():
            enc_out, enc_pad, _ = enc(torch.from_numpy(fbank),
                                      torch.from_numpy(src_lengths))
            t_logits, t_links, t_feats = dec(
                torch.from_numpy(prev), enc_out, enc_pad)

        variables = import_s2s_daspeech(
            sd, enc_layers=2, dec_layers=LAYERS, tts_cfg=flax_cfg().tts,
            tied_embeddings=True)
        params = {"params": variables["params"],
                  "batch_stats": variables["batch_stats"]}
        model = S2SConformerDAGFastSpeech2(flax_cfg())
        batch = {
            "fbank": fbank, "src_lengths": src_lengths.astype(np.int32),
            "prev_output_tokens": prev.astype(np.int32),
        }
        return dict(sd=sd, model=model, params=params, batch=batch,
                    adaptor=adaptor, tts=tts,
                    torch_out=(t_logits.numpy(), t_links.numpy(),
                               t_feats.numpy()),
                    graph_len=graph_len)

    def _torch_mel(self, pipeline, gathered, width):
        """adaptor -> FastSpeech2NoEmb (predicted durations), batched and
        padded to ``width`` feature slots — the same layout our generator
        feeds the TTS. Neither implementation's conv FFNs are padding-
        invariant (the reference computes on batch-padded tensors too), so
        parity holds only at MATCHED pad widths on both the feature and mel
        axes; returns (per-sentence mels, torch decoder width)."""
        adaptor, tts = pipeline["adaptor"], pipeline["tts"]
        B = len(gathered)
        z_np = np.zeros((B, width, D), np.float32)
        lens = np.zeros((B,), np.int64)
        for b, g in enumerate(gathered):
            z_np[b, : len(g)] = g
            lens[b] = len(g)
        pad = torch.from_numpy(np.arange(width)[None, :] >= lens[:, None])
        with torch.no_grad():
            z = adaptor(torch.from_numpy(z_np))
            mel, _mel_post, out_lens, *_ = tts(z, pad)
        mels = [mel[b, : int(out_lens[b])].numpy() for b in range(B)]
        return mels, mel.shape[1]

    def _run_ours(self, pipeline, strategy, max_mel_len):
        gen = S2SNATGenerator(
            pipeline["model"], VocabConfig(size=V),
            DecodeConfig(strategy=strategy, beta=1.0, viterbibeta=1.0,
                         max_output_length=4),
            max_mel_len=max_mel_len)
        return gen.generate(pipeline["params"], pipeline["batch"],
                            generate_waveform=False)

    @pytest.mark.parametrize("strategy", ["lookahead", "jointviterbi"])
    def test_tokens_and_mel_match(self, pipeline, strategy):
        t_logits, t_links, t_feats = pipeline["torch_out"]
        graph_len = pipeline["graph_len"]
        if strategy == "lookahead":
            oracle = oracle_lookahead(t_logits, t_links, graph_len)
        else:
            oracle = oracle_jointviterbi(t_logits, t_links, graph_len)

        gathered = [t_feats[b][np.asarray(idx, np.int64)]
                    for b, (_, idx) in enumerate(oracle)]
        # our gather pads features to the graph width L; run the torch TTS
        # at the same width, then synthesize ours at torch's mel width
        L = pipeline["batch"]["prev_output_tokens"].shape[1]
        ref_mels, mel_width = self._torch_mel(pipeline, gathered, L)

        hypos = self._run_ours(pipeline, strategy, mel_width)
        for b, (ref_toks, _idx) in enumerate(oracle):
            got = hypos[b]["tokens"].tolist()
            assert got == ref_toks, (strategy, b, got, ref_toks)
        for b in range(len(ref_mels)):
            ours = hypos[b]["feature"]
            assert ours.shape == ref_mels[b].shape, (
                strategy, b, ours.shape, ref_mels[b].shape)
            # composed tolerance: six chained modules accumulate ~1e-2
            # float drift (each is 1e-4-1e-3 at module level; the variance
            # adaptor's bin bucketization can amplify boundary cases)
            diff = np.abs(ours - ref_mels[b])
            assert diff.max() < 0.05, (strategy, b, diff.max())
            assert np.median(diff) < 5e-3, (strategy, b, np.median(diff))
