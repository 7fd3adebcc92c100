"""Fused MRF level kernel vs the unfused folded/direct XLA paths.

The kernel (ops/fused_mrf.py) must compute the same 18-conv ResBlock stack
as models/hifigan.py's ResBlock1 modules (reference
``/root/reference/hifi-gan/models.py:11-49,101-113``), with identical
parameter trees. CPU runs use interpret mode with fp32 operands, so the
comparison is tight; on TPU the kernel uses bf16 multiplies like XLA's
default-precision convs (covered by tools/verify_chip.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from daspeech_tpu.core.config import HiFiGANConfig
from daspeech_tpu.models.hifigan import HiFiGANGenerator
from daspeech_tpu.ops import fused_mrf


def small_cfg():
    # two levels: ch 128 (f=1) and 64 (f=2) — both hit the fused gate
    return HiFiGANConfig(
        upsample_rates=(2, 2), upsample_kernel_sizes=(4, 4),
        upsample_initial_channel=256,
        resblock_kernel_sizes=(3, 7, 11),
        resblock_dilation_sizes=((1, 3, 5), (1, 3, 5), (1, 3, 5)),
        resblock="1")


@pytest.fixture(scope="module")
def setup():
    cfg = small_cfg()
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.normal(size=(2, 96, 80)).astype(np.float32))
    ref_model = HiFiGANGenerator(cfg, fold_to=128)
    params = ref_model.init(jax.random.PRNGKey(0), mel)
    return cfg, mel, ref_model, params


class TestFusedMRF:
    def test_matches_folded_path(self, setup):
        cfg, mel, ref_model, params = setup
        want = ref_model.apply(params, mel)
        fused = HiFiGANGenerator(cfg, fold_to=128, fused_mrf=True,
                                 mrf_interpret=True, mrf_tile=64)
        got = fused.apply(params, mel)
        assert got.shape == want.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-5)

    def test_matches_direct_path(self, setup):
        """Fused (folded taps) == the reference-exact unfolded layout."""
        cfg, mel, ref_model, params = setup
        direct = HiFiGANGenerator(cfg, fold_to=0)
        want = direct.apply(params, mel)
        fused = HiFiGANGenerator(cfg, fold_to=128, fused_mrf=True,
                                 mrf_interpret=True, mrf_tile=64)
        got = fused.apply(params, mel)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-5)

    def test_param_tree_identical(self, setup):
        """fused_mrf must not change the checkpoint format."""
        cfg, mel, _, params = setup
        fused = HiFiGANGenerator(cfg, fold_to=128, fused_mrf=True,
                                 mrf_interpret=True, mrf_tile=64)
        p2 = fused.init(jax.random.PRNGKey(0), mel)
        t1 = jax.tree_util.tree_structure(params)
        t2 = jax.tree_util.tree_structure(p2)
        assert t1 == t2
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
            assert a.shape == b.shape

    @pytest.mark.slow  # ~45 s: sweeps tile sizes over the interpreted kernel
    def test_tile_boundaries_exact(self, setup):
        """Different tile sizes give the same answer (halo exchange)."""
        cfg, mel, ref_model, params = setup
        outs = []
        for tile in (48, 96, 1024):
            m = HiFiGANGenerator(cfg, fold_to=128, fused_mrf=True,
                                 mrf_interpret=True, mrf_tile=tile)
            outs.append(np.asarray(m.apply(params, mel)))
        np.testing.assert_allclose(outs[0], outs[1], rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(outs[0], outs[2], rtol=1e-5, atol=1e-6)

    @pytest.mark.slow  # ~18 s; test_matches_folded_path stays in the fast tier
    def test_non_divisible_length_padded(self, setup):
        """G not a multiple of the tile: padded run == unfused run."""
        cfg, mel, ref_model, params = setup
        mel2 = mel[:, :83]
        want = ref_model.apply(params, mel2)
        got = HiFiGANGenerator(cfg, fold_to=128, fused_mrf=True,
                               mrf_interpret=True, mrf_tile=64
                               ).apply(params, mel2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-5)

    def test_direct_dilated_alternate_matches(self, setup, monkeypatch):
        """The direct-dilated per-conv alternate (prefer_direct_dilated is
        a measured in-situ negative, default off) must stay numerically
        equal to the folded tap form when forced on."""
        import daspeech_tpu.models.hifigan as hg

        cfg, mel, ref_model, params = setup
        want = ref_model.apply(params, mel)
        monkeypatch.setattr(hg, "prefer_direct_dilated",
                            lambda C, f, k, d: f > 1 and d > 1)
        got = HiFiGANGenerator(cfg, fold_to=128).apply(params, mel)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-5)

    def test_decimated_alternate_matches(self, setup, monkeypatch):
        """The decimated-dilated alternate (prefer_decimated is a measured
        in-situ negative — sub-lane relayout copies at ~10 GB/s swamp the
        3.9x executed-FLOP cut, see models/hifigan.py — default off) must
        stay numerically equal to the folded tap form when forced on."""
        import daspeech_tpu.models.hifigan as hg

        cfg, mel, ref_model, params = setup
        want = ref_model.apply(params, mel)
        monkeypatch.setattr(hg, "prefer_decimated",
                            lambda C, f, k, d: f > 1 and d > 1)
        got = HiFiGANGenerator(cfg, fold_to=128).apply(params, mel)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-5)

    def test_im2col_alternate_matches(self, setup, monkeypatch):
        """The im2col alternate (the round-4 bound analysis's 'contract
        over k*C >= 128' lever, measured in situ in round 5 via
        tools/profile_vocoder.py --dilated-backend im2col; default off)
        must stay numerically equal to the folded tap form when forced."""
        import daspeech_tpu.models.hifigan as hg

        cfg, mel, ref_model, params = setup
        want = ref_model.apply(params, mel)
        monkeypatch.setattr(hg, "FORCE_DILATED_BACKEND", "im2col")
        got = HiFiGANGenerator(cfg, fold_to=128).apply(params, mel)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-5)

    def test_small_input_falls_back(self, setup):
        """Below the 128-frame gate the unfused path runs (same output)."""
        cfg, _, ref_model, _ = setup
        rng = np.random.default_rng(1)
        mel = jnp.asarray(rng.normal(size=(1, 20, 80)).astype(np.float32))
        params = ref_model.init(jax.random.PRNGKey(0), mel)
        want = ref_model.apply(params, mel)
        got = HiFiGANGenerator(cfg, fold_to=128, fused_mrf=True,
                               mrf_interpret=True).apply(params, mel)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)
