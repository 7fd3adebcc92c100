"""CTC auxiliary of the FastSpeech2 criterion vs the torch oracle.

Reference: ``fairseq/fairseq/criterions/fastspeech2_loss.py:70-88`` (the
``ctc_weight`` branch) and the model-side ``ctc_proj`` head
(``fairseq/fairseq/models/text_to_speech/fastspeech2.py:401-416``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from daspeech_tpu.losses.tts_loss import fastspeech2_ctc_loss


def _rand_case(rng, B=4, M=24, V=11, T=6):
    logits = rng.normal(0, 1.5, size=(B, M, V)).astype(np.float32)
    in_lens = rng.integers(T + 2, M + 1, size=(B,))
    lab_lens = rng.integers(1, T + 1, size=(B,))
    labels = rng.integers(2, V, size=(B, T))   # avoid blank(0)/pad-ish ids
    mel_mask = np.arange(M)[None] < in_lens[:, None]
    src_mask = np.arange(T)[None] < lab_lens[:, None]
    labels = np.where(src_mask, labels, 1)     # pad id 1 outside
    return logits, mel_mask, labels, src_mask, in_lens, lab_lens


def _torch_ctc_mean(logits, in_lens, labels, lab_lens):
    lp = F.log_softmax(torch.from_numpy(logits), dim=-1).transpose(0, 1)
    flat = torch.cat([torch.from_numpy(labels[b, :lab_lens[b]])
                      for b in range(labels.shape[0])])
    return F.ctc_loss(
        lp, flat, torch.from_numpy(in_lens), torch.from_numpy(lab_lens),
        reduction="mean", zero_infinity=True).item()


class TestCTCOracle:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_matches_torch(self, seed):
        rng = np.random.default_rng(seed)
        logits, mel_mask, labels, src_mask, in_lens, lab_lens = \
            _rand_case(rng)
        got = float(fastspeech2_ctc_loss(
            jnp.asarray(logits), jnp.asarray(mel_mask),
            jnp.asarray(labels), jnp.asarray(src_mask)))
        want = _torch_ctc_mean(logits, in_lens, labels, lab_lens)
        assert got == pytest.approx(want, rel=2e-4, abs=2e-5)

    def test_infeasible_sentence_zeroed(self):
        """zero_infinity=True: more labels than frames contributes 0.

        The infeasible row must contribute exactly 0 (optax clamps the
        impossible alignment at log_epsilon and returns ~1e5 FINITE, so a
        mere isfinite check would pass even when the row leaks in)."""
        rng = np.random.default_rng(3)
        logits, mel_mask, labels, src_mask, in_lens, lab_lens = \
            _rand_case(rng, B=3, M=8, V=9, T=4)
        mel_mask[0, 2:] = False            # 2 frames, 4 labels: infeasible
        src_mask[0, :] = True
        labels[0] = [4, 5, 4, 6]
        in_lens[0], lab_lens[0] = 2, 4
        got = float(fastspeech2_ctc_loss(
            jnp.asarray(logits), jnp.asarray(mel_mask),
            jnp.asarray(labels), jnp.asarray(src_mask)))
        # torch oracle with zero_infinity=True zeroes the row but still
        # divides by B=3 — the jax emulation must match it exactly
        want = _torch_ctc_mean(logits, in_lens, labels, lab_lens)
        assert got == pytest.approx(want, rel=2e-4, abs=2e-5)
        # and equal the mean computed with the infeasible row zeroed by hand
        feas = float(fastspeech2_ctc_loss(
            jnp.asarray(logits[1:]), jnp.asarray(mel_mask[1:]),
            jnp.asarray(labels[1:]), jnp.asarray(src_mask[1:])))
        assert got == pytest.approx(feas * 2 / 3, rel=1e-5)
        assert got < 0.5e5

    def test_adjacent_repeat_feasibility(self):
        """label_len == input_len but adjacent repeats need blanks: the
        row is infeasible and must contribute 0 (torch oracle agrees)."""
        rng = np.random.default_rng(7)
        logits, mel_mask, labels, src_mask, in_lens, lab_lens = \
            _rand_case(rng, B=2, M=8, V=9, T=4)
        mel_mask[0, 4:] = False            # 4 frames, 4 labels, one repeat
        src_mask[0, :] = True              # -> needs 5 frames: infeasible
        labels[0] = [4, 4, 5, 6]
        in_lens[0], lab_lens[0] = 4, 4
        got = float(fastspeech2_ctc_loss(
            jnp.asarray(logits), jnp.asarray(mel_mask),
            jnp.asarray(labels), jnp.asarray(src_mask)))
        want = _torch_ctc_mean(logits, in_lens, labels, lab_lens)
        assert got == pytest.approx(want, rel=2e-4, abs=2e-5)
        # exactly-enough frames (4 frames, 4 distinct labels) stays counted
        labels[0] = [4, 5, 4, 6]
        got2 = float(fastspeech2_ctc_loss(
            jnp.asarray(logits), jnp.asarray(mel_mask),
            jnp.asarray(labels), jnp.asarray(src_mask)))
        want2 = _torch_ctc_mean(logits, in_lens, labels, lab_lens)
        assert got2 == pytest.approx(want2, rel=2e-4, abs=2e-5)
        assert got2 > got

    def test_filler_rows_drop_out(self):
        rng = np.random.default_rng(4)
        logits, mel_mask, labels, src_mask, _, _ = _rand_case(rng, B=4)
        full = float(fastspeech2_ctc_loss(
            jnp.asarray(logits), jnp.asarray(mel_mask),
            jnp.asarray(labels), jnp.asarray(src_mask)))
        # masking row 3 out entirely (sample_mask semantics) changes the
        # denominator to 3 real rows and drops its numerator term
        src_mask3 = src_mask.copy()
        src_mask3[3] = False
        got = float(fastspeech2_ctc_loss(
            jnp.asarray(logits), jnp.asarray(mel_mask),
            jnp.asarray(labels), jnp.asarray(src_mask3)))
        only3 = float(fastspeech2_ctc_loss(
            jnp.asarray(logits[:3]), jnp.asarray(mel_mask[:3]),
            jnp.asarray(labels[:3]), jnp.asarray(src_mask[:3])))
        assert got == pytest.approx(only3, rel=1e-6)
        assert got != pytest.approx(full, rel=1e-3)


class TestModelIntegration:
    @pytest.mark.slow  # ~55 s: full FastSpeech2 + criterion forward/backward
    def test_ctc_head_and_criterion(self):
        from daspeech_tpu.core.config import FastSpeech2Config
        from daspeech_tpu.losses.tts_loss import fastspeech2_criterion
        from daspeech_tpu.models.fastspeech2 import FastSpeech2Encoder

        cfg = FastSpeech2Config(
            encoder_layers=1, encoder_embed_dim=16, encoder_heads=2,
            decoder_layers=1, decoder_embed_dim=16, decoder_heads=2,
            fft_hidden_dim=32, var_pred_hidden_dim=16, var_pred_n_bins=8,
            fused_attention=False, ctc_weight=0.3)
        model = FastSpeech2Encoder(cfg, vocab_size=12, pad=1)
        B, T, M = 2, 5, 20
        rng = np.random.default_rng(0)
        tokens = jnp.asarray(rng.integers(2, 12, size=(B, T)))
        durations = jnp.full((B, T), M // T, jnp.int32)
        batch = {
            "src_tokens": tokens,
            "target_audio": jnp.asarray(
                rng.normal(size=(B, M, 80)).astype(np.float32)),
            "target_audio_lengths": jnp.asarray([M, M - 4]),
            "durations": durations,
            "pitches": jnp.zeros((B, T)),
            "energies": jnp.zeros((B, T)),
        }
        key = jax.random.PRNGKey(0)
        params = model.init(
            key, src_tokens=tokens, max_out_len=M, durations=durations,
            pitches=batch["pitches"], energies=batch["energies"])
        assert "ctc_proj" in params["params"], "ctc head must exist"

        class V:
            pad = 1

        loss, aux = fastspeech2_criterion(
            model, params, batch, key, V(), train=False)
        assert np.isfinite(float(loss))
        assert "ctc-loss" in aux["metrics"]
        assert float(aux["metrics"]["ctc-loss"]) > 0

        # gradients reach the CTC head
        def f(p):
            return fastspeech2_criterion(
                model, p, batch, key, V(), train=False)[0]

        g = jax.grad(f)(params)
        gnorm = float(jnp.linalg.norm(
            g["params"]["ctc_proj"]["kernel"].ravel()))
        assert gnorm > 0

        # ctc_weight=0 keeps the head out of the param tree entirely
        model0 = FastSpeech2Encoder(
            FastSpeech2Config(
                encoder_layers=1, encoder_embed_dim=16, encoder_heads=2,
                decoder_layers=1, decoder_embed_dim=16, decoder_heads=2,
                fft_hidden_dim=32, var_pred_hidden_dim=16,
                var_pred_n_bins=8, fused_attention=False),
            vocab_size=12, pad=1)
        params0 = model0.init(
            key, src_tokens=tokens, max_out_len=M, durations=durations,
            pitches=batch["pitches"], energies=batch["energies"])
        assert "ctc_proj" not in params0["params"]
        loss0, aux0 = fastspeech2_criterion(
            model0, params0, batch, key, V(), train=False)
        assert "ctc-loss" not in aux0["metrics"]
        assert np.isfinite(float(loss0))
