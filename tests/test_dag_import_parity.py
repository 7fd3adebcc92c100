"""DAG decoder torch-import parity: a torch GlatLinkDecoder assembled from
REAL fairseq modules (MultiheadAttention, learned PositionalEmbedding via
tests/fairseq_shim.py) with random weights must produce the same logits and
links as the flax GlatLinkDecoder running the imported parameters.

This validates the weight mapping a released DASpeech .pt needs
(``s2s_conformer_dag_fastspeech2.py:66-84`` load path), including the
enc_proj zero-pad reparameterization of fairseq's kdim/vdim cross-attention.
"""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

import fairseq_shim  # noqa: E402

fairseq_shim.install()

import sys  # noqa: E402

MHA = sys.modules["fairseq.modules.multihead_attention"].MultiheadAttention
PositionalEmbedding = sys.modules[
    "fairseq.modules.positional_embedding"].PositionalEmbedding

from daspeech_tpu.models.dag_model import GlatLinkDecoder  # noqa: E402
from daspeech_tpu.train.torch_import import (  # noqa: E402
    import_dag_decoder,
    pad_cross_attention_kv,
)

PAD = 1
V, D, H, FFN, LAYERS = 24, 32, 4, 64, 2
ENC_DIM = 16
MAX_POS = 32


class TorchDecoderLayer(torch.nn.Module):
    """fairseq TransformerDecoderLayer, post-norm, non-causal self-attn
    (``transformer_layer.py`` forward order), with kdim/vdim-typed
    cross-attention like the reference's 256->512 bridge."""

    def __init__(self):
        super().__init__()
        self.self_attn = MHA(D, H, dropout=0.0, self_attention=True)
        self.self_attn_layer_norm = torch.nn.LayerNorm(D)
        self.encoder_attn = MHA(D, H, kdim=ENC_DIM, vdim=ENC_DIM,
                                dropout=0.0,
                                encoder_decoder_attention=True)
        self.encoder_attn_layer_norm = torch.nn.LayerNorm(D)
        self.fc1 = torch.nn.Linear(D, FFN)
        self.fc2 = torch.nn.Linear(FFN, D)
        self.final_layer_norm = torch.nn.LayerNorm(D)

    def forward(self, x, self_kpm, enc, enc_kpm):
        # x: [L, B, D] (fairseq TBC layout)
        residual = x
        x, _ = self.self_attn(x, x, x, key_padding_mask=self_kpm)
        x = self.self_attn_layer_norm(residual + x)
        residual = x
        x, _ = self.encoder_attn(x, enc, enc, key_padding_mask=enc_kpm)
        x = self.encoder_attn_layer_norm(residual + x)
        residual = x
        x = self.fc2(torch.nn.functional.gelu(self.fc1(x)))
        x = self.final_layer_norm(residual + x)
        return x


class TorchGlatLinkDecoder(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.embed_tokens = torch.nn.Embedding(V, D, padding_idx=PAD)
        self.embed_positions = PositionalEmbedding(MAX_POS, D, PAD,
                                                   learned=True)
        self.layers = torch.nn.ModuleList(
            [TorchDecoderLayer() for _ in range(LAYERS)])
        self.link_positional = PositionalEmbedding(MAX_POS, D, PAD,
                                                   learned=True)
        self.query_linear = torch.nn.Linear(2 * D, D)
        self.key_linear = torch.nn.Linear(2 * D, D)
        self.gate_linear = torch.nn.Linear(2 * D, H)

    def forward(self, prev, enc, enc_kpm):
        x = math.sqrt(D) * self.embed_tokens(prev)
        x = x + self.embed_positions(prev)
        self_kpm = prev.eq(PAD)
        x = x.transpose(0, 1)                      # [L, B, D]
        enc_t = enc.transpose(0, 1)
        for layer in self.layers:
            x = layer(x, self_kpm, enc_t, enc_kpm)
        features = x.transpose(0, 1)               # [B, L, D]
        logits = torch.nn.functional.linear(features,
                                            self.embed_tokens.weight)
        links = self.extract_links(features, prev)
        return logits, links, features

    def extract_links(self, features, prev):
        # the reference's full-matrix branch (s2t_conformer_dag.py:196-210)
        feats = torch.cat([features, self.link_positional(prev)], dim=-1)
        B, L, _ = features.shape
        dk = D // H
        q = self.query_linear(feats).reshape(B, L, H, dk).float()
        k = self.key_linear(feats).reshape(B, L, H, dk).float()
        log_gates = torch.nn.functional.log_softmax(
            self.gate_linear(feats).float(), dim=-1)
        scores = torch.einsum("bihd,bjhd->bijh", q, k) / math.sqrt(dk)
        out_len = prev.ne(PAD).sum(-1)
        i_idx = torch.arange(L)[None, :, None]
        j_idx = torch.arange(L)[None, None, :]
        valid = (j_idx > i_idx) & (j_idx < out_len[:, None, None])
        scores = scores.masked_fill(~valid[..., None], float("-inf"))
        log_attn = torch.nn.functional.log_softmax(scores, dim=2)
        combined = log_attn + log_gates[:, :, None, :]
        links = torch.logsumexp(combined, dim=-1)
        return links.masked_fill(~valid, float("-inf"))


class Container(torch.nn.Module):
    def __init__(self, decoder):
        super().__init__()
        self.decoder = decoder


def test_dag_decoder_import_parity():
    torch.manual_seed(0)
    tdec = TorchGlatLinkDecoder().eval()
    sd = Container(tdec).state_dict()

    B, L, S = 2, 10, 7
    rng = np.random.default_rng(0)
    prev = np.full((B, L), PAD, np.int64)
    for b, n in enumerate((L, L - 3)):
        prev[b, 0] = 0                       # bos
        prev[b, 1:n - 1] = rng.integers(4, V, size=n - 2)
        prev[b, n - 1] = 2                   # eos
    enc = rng.normal(size=(B, S, ENC_DIM)).astype(np.float32)
    enc_pad = np.zeros((B, S), bool)
    enc_pad[1, -2:] = True

    with torch.no_grad():
        t_logits, t_links, t_feats = tdec(
            torch.tensor(prev), torch.tensor(enc), torch.tensor(enc_pad))

    # ---- import into flax
    imported = import_dag_decoder(sd, LAYERS, prefix="decoder",
                                  tied_embeddings=True)
    enc_proj = pad_cross_attention_kv(imported["params"], LAYERS, ENC_DIM, D)

    model = GlatLinkDecoder(
        vocab_size=V, pad=PAD, embed_dim=D, ffn_dim=FFN, num_layers=LAYERS,
        num_heads=H, dropout=0.0, attn_dropout=0.0, activation_dropout=0.0,
        activation="gelu", learned_pos=True, share_input_output_embed=True,
        max_target_positions=MAX_POS)

    enc_projed = jnp.asarray(enc) @ enc_proj["kernel"] + enc_proj["bias"]

    def run(m):
        feats = m.extract_features(jnp.asarray(prev.astype(np.int32)),
                                   enc_projed, jnp.asarray(enc_pad))
        return m.output_layer(feats), m.extract_links(
            feats, jnp.asarray(prev.astype(np.int32))), feats

    f_logits, f_links, f_feats = GlatLinkDecoder.apply(
        model, {"params": imported["params"]}, method=run)

    np.testing.assert_allclose(np.asarray(f_feats), t_feats.numpy(),
                               rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(f_logits), t_logits.numpy(),
                               rtol=1e-4, atol=2e-3)
    t_l = t_links.numpy()
    f_l = np.asarray(f_links)
    fin = np.isfinite(t_l)
    np.testing.assert_array_equal(fin, np.isfinite(f_l))
    np.testing.assert_allclose(f_l[fin], t_l[fin], rtol=1e-4, atol=2e-3)

pytestmark = pytest.mark.slow
