"""Chunked/streaming vocoding must be EXACTLY the one-shot forward.

``models/hifigan.py::vocode_chunked`` extends each chunk's mel window by
the receptive-field halo (``receptive_halo_mel``) and crops, so interior
samples see their true context and edge chunks reproduce the one-shot
run's own SAME zero padding. The reference has no streaming vocoder
(``/root/reference/hifi-gan/inference_e2e.py`` vocodes whole utterances);
this is a TPU-serving addition for latency-bounded pipelines.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from daspeech_tpu.core.config import HiFiGANConfig
from daspeech_tpu.models.hifigan import (
    HiFiGANGenerator, receptive_halo_mel, vocode_chunked)


def small_cfg():
    return HiFiGANConfig(
        upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
        upsample_initial_channel=64,
        resblock_kernel_sizes=(3, 7),
        resblock_dilation_sizes=((1, 3, 5), (1, 3, 5)),
        resblock="1")


@pytest.fixture(scope="module")
def setup():
    cfg = small_cfg()
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.normal(size=(2, 150, 80)).astype(np.float32))
    model = HiFiGANGenerator(cfg, fold_to=128)
    # real normal init (not zeros/constants) so halo bugs cannot cancel
    params = model.init(jax.random.PRNGKey(3), mel)
    return cfg, mel, model, params


class TestChunkedVocoding:
    def test_halo_is_tight_enough(self, setup):
        """Perturbing one mel frame must not change samples outside the
        claimed halo (empirical receptive-field check)."""
        cfg, mel, model, params = setup
        halo = receptive_halo_mel(cfg)
        hop = int(np.prod(cfg.upsample_rates))
        base = np.asarray(model.apply(params, mel))
        bumped = mel.at[:, 75, :].add(10.0)
        out = np.asarray(model.apply(params, bumped))
        changed = np.where(np.any(base != out, axis=(0,)))[0]
        lo, hi = changed.min() // hop, changed.max() // hop
        assert 75 - halo <= lo and hi <= 75 + halo, (lo, hi, halo)

    def test_chunked_equals_full(self, setup):
        cfg, mel, model, params = setup
        full = np.asarray(model.apply(params, mel))
        for chunk in (32, 64, 70):   # even, power-ish, non-divisor
            got = np.asarray(vocode_chunked(model, params, mel,
                                            chunk=chunk))
            assert got.shape == full.shape
            np.testing.assert_allclose(got, full, rtol=0, atol=1e-5,
                                       err_msg=f"chunk={chunk}")

    def test_single_chunk_shortcut(self, setup):
        cfg, mel, model, params = setup
        full = np.asarray(model.apply(params, mel))
        got = np.asarray(vocode_chunked(model, params, mel, chunk=4096))
        np.testing.assert_array_equal(got, full)

    def test_one_window_shape_and_memoized_jit(self, setup):
        """Round-4 advisor finding: vocode_chunked re-jitted per call and
        compiled up to four window shapes. Now every window has ONE fixed
        shape (chunk + 2*halo, edge windows shifted not clipped) and the
        jitted apply is memoized across utterances."""
        from daspeech_tpu.models.hifigan import make_chunked_run

        cfg, mel, model, params = setup
        assert make_chunked_run(model, params) is make_chunked_run(
            model, params)
        shapes = []
        inner = make_chunked_run(model, params)

        def spy(m):
            shapes.append(m.shape)
            return inner(m)

        full = np.asarray(model.apply(params, mel))
        # M=150, chunk=64, halo clips the penultimate window in the OLD
        # scheme — the case that used to compile a fourth shape
        got = np.asarray(vocode_chunked(model, params, mel, chunk=64,
                                        run=spy))
        np.testing.assert_allclose(got, full, rtol=0, atol=1e-5)
        assert len(set(shapes)) == 1, shapes

    def test_chunked_int8_static_scales(self, setup):
        """quant_int8 with frozen static scales is position-independent,
        so chunked must equal the one-shot int8 forward exactly."""
        cfg, mel, model, params = setup
        q = HiFiGANGenerator(cfg, fold_to=128, quant_int8=True)
        qc = HiFiGANGenerator(cfg, fold_to=128, quant_int8=True,
                              calibrate=True)
        _, upd = qc.apply(params, mel, mutable=["quant"])
        v = {"params": params["params"], "quant": upd["quant"]}
        full = np.asarray(q.apply(v, mel))
        got = np.asarray(vocode_chunked(q, v, mel, chunk=64))
        np.testing.assert_allclose(got, full, rtol=0, atol=1e-5)
