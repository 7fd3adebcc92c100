"""Full-checkpoint import plumbing: a fabricated DASpeech S2S ``model``
state dict (exact fairseq key naming, random values) must map through
``import_s2s_daspeech`` onto a parameter tree with exactly the structure and
shapes the flax ``S2SConformerDAGFastSpeech2`` initializes, and the model
must run with it. Per-component numerics are covered by
``test_torch_parity.py`` (conformer, fastspeech2, hifigan) and
``test_dag_import_parity.py`` (DAG decoder); this test pins the end-to-end
key mapping of the release .pt layout
(``s2s_conformer_dag_fastspeech2.py:43-100``)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from testutils import fast_init

from daspeech_tpu.core.config import (
    ConformerConfig,
    DAGDecoderConfig,
    DAGModelConfig,
    FastSpeech2Config,
    S2SModelConfig,
    VocabConfig,
)
from daspeech_tpu.models import (
    S2SConformerDAGFastSpeech2,
    graph_lengths,
    initialize_output_tokens,
)
from daspeech_tpu.train.torch_import import import_s2s_daspeech

pytestmark = pytest.mark.slow

V, D_ENC, D_DEC, H, FFN = 24, 16, 32, 4, 64
CC = 8              # conformer subsampler conv channels
TTS_D, TTS_FFN, NBINS = 16, 32, 8
MAXPOS = 32
PAD = 1


def w(*shape):
    return np.random.default_rng(hash(shape) % 2**31).normal(
        0, 0.05, size=shape).astype(np.float32)


def fabricate_sd():
    sd = {}

    def dense(p, out, inp, bias=True):
        sd[f"{p}.weight"] = w(out, inp)
        if bias:
            sd[f"{p}.bias"] = w(out)

    def conv(p, out, inp, k):
        sd[f"{p}.weight"] = w(out, inp, k)
        sd[f"{p}.bias"] = w(out)

    def ln(p, dim):
        sd[f"{p}.weight"] = np.ones(dim, np.float32)
        sd[f"{p}.bias"] = np.zeros(dim, np.float32)

    # ---- conformer encoder (S2TConformerEncoder naming); the GLU halves
    # each conv's output, so the mid conv emits CC and feeds CC//2 onward
    conv("encoder.subsample.conv_layers.0", CC, 80, 5)
    conv("encoder.subsample.conv_layers.1", 2 * D_ENC, CC // 2, 5)
    dense("encoder.linear", D_ENC, D_ENC)
    p = "encoder.conformer_layers.0"
    for f in ("ffn1", "ffn2"):
        ln(f"{p}.{f}.layer_norm", D_ENC)
        dense(f"{p}.{f}.w_1", 2 * D_ENC, D_ENC)
        dense(f"{p}.{f}.w_2", D_ENC, 2 * D_ENC)
    ln(f"{p}.self_attn_layer_norm", D_ENC)
    for name in ("linear_q", "linear_k", "linear_v", "linear_out"):
        dense(f"{p}.self_attn.{name}", D_ENC, D_ENC)
    dense(f"{p}.self_attn.linear_pos", D_ENC, D_ENC, bias=False)
    sd[f"{p}.self_attn.pos_bias_u"] = w(2, D_ENC // 2)
    sd[f"{p}.self_attn.pos_bias_v"] = w(2, D_ENC // 2)
    ln(f"{p}.conv_module.layer_norm", D_ENC)
    conv(f"{p}.conv_module.pointwise_conv1", 2 * D_ENC, D_ENC, 1)
    del sd[f"{p}.conv_module.pointwise_conv1.bias"]
    sd[f"{p}.conv_module.depthwise_conv.weight"] = w(D_ENC, 1, 7)
    sd[f"{p}.conv_module.batch_norm.weight"] = np.ones(D_ENC, np.float32)
    sd[f"{p}.conv_module.batch_norm.bias"] = np.zeros(D_ENC, np.float32)
    sd[f"{p}.conv_module.batch_norm.running_mean"] = np.zeros(
        D_ENC, np.float32)
    sd[f"{p}.conv_module.batch_norm.running_var"] = np.ones(
        D_ENC, np.float32)
    conv(f"{p}.conv_module.pointwise_conv2", D_ENC, D_ENC, 1)
    del sd[f"{p}.conv_module.pointwise_conv2.bias"]
    ln(f"{p}.final_layer_norm", D_ENC)

    # ---- DAG decoder (NATransformerDecoder + GlatLinkDecoder naming)
    sd["decoder.embed_tokens.weight"] = w(V, D_DEC)
    sd["decoder.embed_positions.weight"] = w(MAXPOS + PAD + 1, D_DEC)
    q = "decoder.layers.0"
    for name in ("q_proj", "out_proj"):
        dense(f"{q}.self_attn.{name}", D_DEC, D_DEC)
        dense(f"{q}.encoder_attn.{name}", D_DEC, D_DEC)
    for name in ("k_proj", "v_proj"):
        dense(f"{q}.self_attn.{name}", D_DEC, D_DEC)
        dense(f"{q}.encoder_attn.{name}", D_DEC, D_ENC)   # kdim bridge
    ln(f"{q}.self_attn_layer_norm", D_DEC)
    ln(f"{q}.encoder_attn_layer_norm", D_DEC)
    dense(f"{q}.fc1", FFN, D_DEC)
    dense(f"{q}.fc2", D_DEC, FFN)
    ln(f"{q}.final_layer_norm", D_DEC)
    sd["decoder.link_positional.weight"] = w(MAXPOS + PAD + 1, D_DEC)
    dense("decoder.query_linear", D_DEC, 2 * D_DEC)
    dense("decoder.key_linear", D_DEC, 2 * D_DEC)
    dense("decoder.gate_linear", H, 2 * D_DEC)

    # ---- adaptor + FastSpeech2NoEmb
    dense("adaptor.fc1", TTS_FFN, D_DEC)
    dense("adaptor.fc2", TTS_D, TTS_FFN)
    sd["tts.pos_emb_alpha"] = w(1)
    sd["tts.dec_pos_emb_alpha"] = w(1)
    dense("tts.out_proj", 80, TTS_D)
    for side in ("encoder", "decoder"):
        f = f"tts.{side}_fft_layers.0"
        for name in ("q_proj", "k_proj", "v_proj", "out_proj"):
            dense(f"{f}.self_attn.{name}", TTS_D, TTS_D)
        ln(f"{f}.layer_norm", TTS_D)
        conv(f"{f}.ffn.ffn.0", TTS_FFN, TTS_D, 9)
        conv(f"{f}.ffn.ffn.2", TTS_D, TTS_FFN, 9)
        ln(f"{f}.ffn.layer_norm", TTS_D)
    for vp in ("duration_predictor", "pitch_predictor", "energy_predictor"):
        b = f"tts.var_adaptor.{vp}"
        conv(f"{b}.conv1.0", TTS_FFN, TTS_D, 3)
        ln(f"{b}.ln1", TTS_FFN)
        conv(f"{b}.conv2.0", TTS_FFN, TTS_FFN, 3)
        ln(f"{b}.ln2", TTS_FFN)
        dense(f"{b}.proj", 1, TTS_FFN)
    sd["tts.var_adaptor.embed_pitch.weight"] = w(NBINS, TTS_D)
    sd["tts.var_adaptor.embed_energy.weight"] = w(NBINS, TTS_D)
    return sd


def flax_cfg():
    return S2SModelConfig(
        dag=DAGModelConfig(
            vocab=VocabConfig(size=V),
            encoder=ConformerConfig(
                embed_dim=D_ENC, ffn_dim=2 * D_ENC, num_layers=1,
                num_heads=2, conv_channels=CC, depthwise_kernel_size=7),
            decoder=DAGDecoderConfig(
                embed_dim=D_DEC, ffn_dim=FFN, num_layers=1, num_heads=H,
                max_target_positions=MAXPOS)),
        tts=FastSpeech2Config(
            encoder_layers=1, encoder_embed_dim=TTS_D, encoder_heads=2,
            decoder_layers=1, decoder_embed_dim=TTS_D, decoder_heads=2,
            fft_hidden_dim=TTS_FFN, fft_kernel_size=9,
            var_pred_hidden_dim=TTS_FFN, var_pred_kernel_size=3,
            var_pred_n_bins=NBINS),
        adaptor_ffn_dim=TTS_FFN)


def tree_spec(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        path = f"{prefix}/{k}"
        if isinstance(v, dict):
            out.update(tree_spec(v, path))
        else:
            out[path] = tuple(np.shape(v))
    return out


def test_full_s2s_import_matches_model_structure():
    sd = fabricate_sd()
    cfg = flax_cfg()
    variables = import_s2s_daspeech(sd, enc_layers=1, dec_layers=1,
                                    tts_cfg=cfg.tts)

    model = S2SConformerDAGFastSpeech2(cfg)
    B, S, L, M = 2, 16, 8, 12
    rng = np.random.default_rng(0)
    fbank = jnp.asarray(rng.normal(size=(B, S, 80)).astype(np.float32))
    sl = jnp.full((B,), S, jnp.int32)
    prev = initialize_output_tokens(
        graph_lengths(sl, 0.5, 64), L, cfg.dag.vocab)

    def full(m):
        _, _, feats = m(fbank, sl, prev)
        return m.synthesize(feats, jnp.zeros((B, L), bool), M)

    want = fast_init(model, jax.random.key(0), method=full)

    got_spec = tree_spec(variables["params"])
    want_spec = tree_spec(want["params"])
    assert got_spec == want_spec, (
        sorted(set(want_spec) - set(got_spec))[:5],
        sorted(set(got_spec) - set(want_spec))[:5],
        {k: (got_spec[k], want_spec[k]) for k in got_spec
         if k in want_spec and got_spec[k] != want_spec[k]})
    assert tree_spec(variables["batch_stats"]) == tree_spec(
        want.get("batch_stats", {}))

    # the imported tree must actually run
    logits, links, feats = model.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]}, fbank, sl, prev)
    mel = model.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        feats, jnp.zeros((B, L), bool), M, method=model.synthesize)[0]
    assert np.isfinite(np.asarray(logits)).all()
    assert np.isfinite(np.asarray(mel)).all()


def test_generate_cli_from_torch_checkpoint(tmp_path, capsys):
    """cli.generate --model-torch decodes straight from a fairseq-format
    .pt (the released-checkpoint path) without an orbax checkpoint."""
    torch = pytest.importorskip("torch")
    import csv
    import json

    import yaml

    from test_data import make_dataset

    rng = np.random.default_rng(7)
    d, rows, _ = make_dataset(tmp_path, rng, n=3, s2s=True)
    # pad the dictionary to the fabricated checkpoint's vocab size
    while len(d) < V:
        d.add_symbol(f"PH{len(d)}")
    assert len(d) == V
    with open(tmp_path / "test.tsv", "w", newline="") as f:
        w_ = csv.DictWriter(f, fieldnames=list(rows[0].keys()),
                            delimiter="\t")
        w_.writeheader()
        for r in rows:
            w_.writerow(r)
    d.save(tmp_path / "vocab.txt")

    cfg = flax_cfg()
    model_yaml = {
        "dag": {
            "encoder": {"embed_dim": D_ENC, "ffn_dim": 2 * D_ENC,
                        "num_layers": 1, "num_heads": 2,
                        "conv_channels": CC, "depthwise_kernel_size": 7},
            "decoder": {"embed_dim": D_DEC, "ffn_dim": FFN,
                        "num_layers": 1, "num_heads": H,
                        "max_target_positions": MAXPOS}},
        "tts": {"encoder_layers": 1, "encoder_embed_dim": TTS_D,
                "encoder_heads": 2, "decoder_layers": 1,
                "decoder_embed_dim": TTS_D, "decoder_heads": 2,
                "fft_hidden_dim": TTS_FFN, "fft_kernel_size": 9,
                "var_pred_hidden_dim": TTS_FFN, "var_pred_kernel_size": 3,
                "var_pred_n_bins": NBINS},
        "adaptor_ffn_dim": TTS_FFN,
    }
    (tmp_path / "s2s.yaml").write_text(yaml.safe_dump(model_yaml))

    sd = {k: torch.tensor(v) for k, v in fabricate_sd().items()}
    torch.save({"model": sd}, tmp_path / "daspeech.pt")

    from daspeech_tpu.cli.generate import main as gen_main

    rc = gen_main([
        str(tmp_path), "--task", "nat_speech_to_speech",
        "--model-torch", str(tmp_path / "daspeech.pt"),
        "--gen-subset", "test",
        "--results-path", str(tmp_path / "results"),
        "--model-yaml", str(tmp_path / "s2s.yaml"),
        "--max-tokens", "512", "--max-mel-len", "32"])
    assert rc == 0
    out = capsys.readouterr()
    assert "imported torch checkpoint" in out.err
    rec = json.loads(out.out.strip().splitlines()[-1])
    assert rec["generated"] == 3
    assert len(list((tmp_path / "results" / "feat").glob("*.npy"))) == 3
