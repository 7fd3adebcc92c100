"""HiFi-GAN generator (flax.linen), mel [B, T, 80] -> waveform [B, T*256].

TPU-native rebuild of ``/root/reference/hifi-gan/models.py:75-125``
(config_v1: upsample rates 8,8,2,2, kernels 16,16,4,4, 512 initial channels,
3 MRF ResBlocks with kernels 3/7/11 and dilations 1/3/5). Weight-norm is
folded into plain conv weights at checkpoint import (the reference removes
weight norm for inference too, ``models.py:118-125``).

Layout is channels-last [B, T, C]; XLA lowers the stacks to fused MXU convs.
"""

from __future__ import annotations

import math
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from daspeech_tpu.core.config import HiFiGANConfig

LRELU_SLOPE = 0.1


def leaky_relu(x):
    return jax.nn.leaky_relu(x, LRELU_SLOPE)


# --------------------------------------------------------------------------
# Folded (space-to-depth) conv execution.
#
# Measured on one v5e at config_v1 shapes, the low-channel tail (64/32
# channels at 50k-100k samples) runs its convs "pass-limited": a k=3 conv
# costs the same wall clock as k=11 (~1.5-3.3 ms) because only 32 of the
# 128 MXU lanes carry data, while the identical FLOPs at 128 channels run
# at ~48 TFLOP/s. Folding time into channels ([B, T, C] -> [B, T/f, f*C],
# a free row-major reshape) with block-rearranged kernels computes the SAME
# convolution as dense [f*C_in, f*C_out] matmuls. Every conv here is
# expressed in "tap form" — a list of (frame_offset, [C_in, C_out] weight)
# — which composes folding with dilation and with the sub-pixel form of
# ConvTranspose (stride-u transposed conv == stride-1 conv emitting u
# output phases as channels).


def prefer_direct_dilated(C: int, f: int, k: int, d: int) -> bool:
    """Per-conv backend choice for the folded serving path — MEASURED
    NEGATIVE in situ, so always False (the alternate stays tested via
    ``direct_dilated_conv``).

    The round-4 strategy matrix on one v5e (chained-conv microbench)
    showed XLA's native dilated conv beating the dense folded tap form
    exactly where folding multiplies the tap count by the dilation —
    C=64: k7d5 0.97 vs 1.22 ms, k11d5 1.10 vs 1.52 ms — but switching
    those convs inside the full generator made level 2 48% SLOWER
    (6.68 -> 9.79 ms, 70.6% -> 40.6% MFU, tools/profile_vocoder.py): the
    microbench chained identical convs, while in situ every folded<->
    direct switch pays XLA layout transitions on the 64-channel tensors
    that cost more than the 0.25-0.42 ms/conv tap savings. A win here
    needs a whole-level direct formulation, not per-conv swaps."""
    return False


def prefer_decimated(C: int, f: int, k: int, d: int) -> bool:
    """Per-conv gate for the decimated-dilated formulation (below) —
    MEASURED NEGATIVE in situ (round 4), so always False; the alternate
    stays exactness-tested via ``decimated_dilated_conv``.

    The idea: a dilation-d conv only connects samples of equal residue
    mod d, so it splits EXACTLY into d independent dense k-tap convs over
    the stride-d subsequences; folded by f those execute ~(k-1)/f+1
    frame-taps instead of ~(k-1)*d/f+1 (k=11 d=5 f=2: 27 -> 7, a 3.9x
    executed-FLOP cut). XLA's cost analysis confirmed the cut (L2
    1027 -> 651, L3 665 -> 483 GFLOP) — and the level still ran 5-11x
    SLOWER (L2 6.6 -> 32.4 ms at 20 TF/s, L3 5.1 -> 57.3 ms at 8 TF/s,
    tools/profile_vocoder.py). The xplane trace shows why: the
    [B, M, d, C] <-> [B, d, M, C] phase transposes lower to sub-lane
    relayout copies (minor dim C=32/64 < the 128-lane tile) running at
    ~10 GB/s — 1.33 ms EACH, ~3 per conv — plus DMA-staged slices; pure
    data movement swamps the saved matmul time. Isolated, every piece is
    fast (the [40, 5325, 128] conv runs 54 TF/s, the transpose pair
    0.48 ms); composed in the generator, XLA's layout assignment turns
    the shuffles into the dominant cost. A fix would need the phase
    shuffle to ride the MXU (a [d*f*C]^2 permutation matmul costs ~0.5 ms
    per conv round trip — still a net loss at these shapes).

    Formulation bound (why this is near the end of the road): with C
    channels < the 128 MXU lanes, ANY matmul-form execution of a
    dilation-d conv (d coprime to the fold f) pays >= f x true FLOPs —
    each tap needs f distinct input blocks to serve the f output phases —
    and leaving the level unfolded idles (128-C)/128 of the lanes, the
    same factor. The in-VMEM im2col escape (contract over k*C >= 128)
    pays k x VMEM moves instead. The dense folded path already averages
    2.29x (L2) / 2.92x (L3) executed/true against bounds of ~2.0x/2.63x,
    at 66-79% MFU on the executed FLOPs — i.e. ~85% of the reachable
    ceiling. With fp32 convs running as single-pass bf16 on the MXU by
    default (measured: fp32-default == bf16-default == 87 TF/s at L1
    shapes; Precision.HIGHEST is 3.3x slower), the fp32-parity
    speed-of-light for config_v1 is ~3,700x RT at 100% MFU on true
    FLOPs and ~2,000-2,150x at the demonstrated 70-80% MFU."""
    return False


def decimated_dilated_conv(x: jnp.ndarray, kernel: jnp.ndarray, d: int,
                           f: int, dtype=jnp.float32) -> jnp.ndarray:
    """Exact SAME-padded dilation-d conv on folded activations [B, G, f*C]
    via residue decimation: reshape to the d stride-d subsequences (batch
    axis), run ONE dense k-tap folded conv, and interleave back. Same sums
    as the dense folded tap form; tested against it bit-for-bit."""
    B, G, FC = x.shape
    k, cin, cout = kernel.shape
    T = G * f
    xt = x.reshape(B, T, cin)
    Tp = -(-T // (d * f)) * (d * f)
    if Tp != T:
        # trailing zeros reproduce SAME zero padding for the cropped range
        xt = jnp.pad(xt, ((0, 0), (0, Tp - T), (0, 0)))
    M = Tp // d
    xd = (xt.reshape(B, M, d, cin).transpose(0, 2, 1, 3)
          .reshape(B * d, M // f, f * cin))
    y = apply_taps(xd, fold_taps(conv_taps(kernel, 1), f, cin, cout), dtype)
    y = (y.reshape(B, d, M, cout).transpose(0, 2, 1, 3)
         .reshape(B, Tp, cout)[:, :T])
    return y.reshape(B, G, f * cout)


def direct_dilated_conv(x_folded: jnp.ndarray, kernel: jnp.ndarray,
                        d: int, f: int, dtype=jnp.float32) -> jnp.ndarray:
    """SAME-padded dilated conv on the UNFOLDED view of folded activations
    ([B, G, f*C] -> [B, G*f, C] is a free reshape). Same sums as the
    folded tap form; used where the measured matrix says XLA's native
    dilated conv is faster (``prefer_direct_dilated``)."""
    B, G, FC = x_folded.shape
    k, cin, cout = kernel.shape
    p = (k - 1) // 2 * d
    y = jax.lax.conv_general_dilated(
        x_folded.reshape(B, G * f, cin).astype(dtype),
        kernel.astype(dtype), (1,), [(p, p)], rhs_dilation=(d,),
        dimension_numbers=("NWC", "WIO", "NWC"))
    return y.reshape(B, G, f * cout)


def im2col_dilated_conv(x_folded: jnp.ndarray, kernel: jnp.ndarray,
                        d: int, f: int, dtype=jnp.float32) -> jnp.ndarray:
    """SAME-padded dilation-d conv via explicit im2col: the k dilated
    time-shifted views are concatenated channel-wise ([B, T, k*C_in]) and
    contracted in ONE [k*C_in, C_out] matmul — the 'contract over
    k*C >= 128' lever named by the round-4 formulation-bound analysis.
    Exact (same sums as the dense folded tap form; tested). The counting
    bound predicts it cannot win at C < 128 output channels (the matmul
    pads C_out to the 128 lanes => 128/C inflation, and the im2col matrix
    costs k x activation traffic). MEASURED NEGATIVE in situ (round 5,
    tools/profile_vocoder.py --dilated-backend im2col): L2 6.6 -> 17.9 ms
    (33 TF/s), L3 5.1 -> 22.9 ms (18 TF/s), generator total 22.4 -> 51.0
    ms (757x RT) — the fourth negative on this path, and the bound's
    prediction confirmed. Kept as an exactness-tested alternate."""
    B, G, FC = x_folded.shape
    k, cin, cout = kernel.shape
    T = G * f
    xt = x_folded.reshape(B, T, cin)
    c = (k - 1) // 2
    xp = jnp.pad(xt, ((0, 0), (c * d, c * d), (0, 0)))
    cols = [jax.lax.dynamic_slice_in_dim(xp, j * d, T, axis=1)
            for j in range(k)]
    im = jnp.concatenate(cols, axis=-1)              # [B, T, k*cin]
    w = kernel.reshape(k * cin, cout)                # row j*cin+ci matches
    y = im.astype(dtype) @ w.astype(dtype)
    return y.reshape(B, G, f * cout)


# Profiling override for the dilated-conv backend inside select_conv:
# None = the measured production choice (dense folded taps); "im2col" /
# "direct" / "decimated" force the named alternate for d>1 convs so
# tools/profile_vocoder.py can A/B whole-generator formulations in situ.
FORCE_DILATED_BACKEND: str | None = None


def conv_taps(kernel: jnp.ndarray, dilation: int = 1):
    """[k, C_in, C_out] SAME-padded dilated conv -> tap list."""
    k = kernel.shape[0]
    c = (k - 1) // 2
    return [((j - c) * dilation, kernel[j]) for j in range(k)]


def convT_subpixel_taps(kernel: jnp.ndarray, stride: int, padding: int):
    """torch ConvTranspose1d(stride=u, padding=p) as a stride-1 conv whose
    output packs the u phases into channels: y_sub[m, q*C_out+co] =
    y[m*u + q, co]. Returns tap list with [C_in, u*C_out] weights."""
    k, cin, cout = kernel.shape
    pad = k - 1 - padding          # the flipped-kernel conv's padding
    flipped = kernel[::-1]
    taps = {}
    for q in range(stride):
        for j in range(k):
            o = q + j - pad
            if o % stride != 0:
                continue
            delta = o // stride
            w = jnp.zeros((cin, stride * cout), kernel.dtype)
            w = w.at[:, q * cout:(q + 1) * cout].set(flipped[j])
            taps[delta] = taps.get(delta, 0) + w
    return [(d, taps[d]) for d in sorted(taps)]


def fold_taps(taps, f: int, cin: int, cout: int):
    """Re-express stride-1 taps over time as taps over folded frames of f
    steps ([B, T/f, f*C] layout). Exact: pure index rearrangement."""
    if f == 1:
        return taps
    folded = {}
    for off, w in taps:
        for p_out in range(f):
            o = p_out + off
            dg, p_in = o // f, o % f
            blk = folded.setdefault(dg, jnp.zeros(
                (f * cin, f * cout), w.dtype))
            folded[dg] = blk.at[
                p_in * cin:(p_in + 1) * cin,
                p_out * cout:(p_out + 1) * cout].add(w)
    return [(d, folded[d]) for d in sorted(folded)]


def apply_taps(x: jnp.ndarray, taps, dtype=jnp.float32) -> jnp.ndarray:
    """Run a tap-form conv: x [B, G, C_in] -> [B, G, C_out] (zero-padded
    frames outside [0, G), matching SAME zero padding). Offsets may be
    sparse; the dense kernel covers the full [min, max] range."""
    offs = [d for d, _ in taps]
    lo, hi = -min(offs), max(offs)
    zero = jnp.zeros_like(taps[0][1])
    by_off = dict(taps)
    kernel = jnp.stack([by_off.get(d, zero)
                        for d in range(min(offs), max(offs) + 1)])
    return jax.lax.conv_general_dilated(
        x.astype(dtype), kernel.astype(dtype), (1,), [(lo, hi)],
        dimension_numbers=("NWC", "WIO", "NWC"))


# --------------------------------------------------------------------------
# int8 serving path (opt-in, `HiFiGANGenerator(quant_int8=True)`).
#
# Measured on one v5e at the folded serving shapes: the dense folded convs
# run 1.65-1.7x faster in int8 (193 vs 118 TF/s isolated; the v5e MXU does
# 394 TOPS int8 vs 197 TFLOPS bf16), AND the fp32 path is partially
# HBM-bound (L3 fully: 19 convs x 2 x 109 MB = 4.1 GB = 5.1 ms at 819 GB/s
# vs 5.13 ms measured), which int8 activations cut 4x. Scheme: symmetric
# per-tensor dynamic activation scales, per-output-channel weight scales,
# int32 MXU accumulation, dequantized residual spine in `dtype`. This mode
# trades waveform parity for speed — the fp32 folded path stays the
# default; quality vs fp32 is measured and documented in COVERAGE.md.


def quantize_sym(x: jnp.ndarray, per_channel: bool = False):
    """Symmetric int8 quantization -> (q, scale). ``per_channel`` scales
    per trailing output channel (weights); otherwise one scale per tensor
    (activations, computed dynamically on device)."""
    if per_channel:
        amax = jnp.max(jnp.abs(x), axis=tuple(range(x.ndim - 1)))
    else:
        amax = jnp.max(jnp.abs(x))
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _dense_tap_kernel(taps):
    """Tap list -> (dense [W, C_in, C_out] kernel, (lo, hi) padding)."""
    offs = [d for d, _ in taps]
    lo, hi = -min(offs), max(offs)
    zero = jnp.zeros_like(taps[0][1])
    by_off = dict(taps)
    kernel = jnp.stack([by_off.get(d, zero)
                        for d in range(min(offs), max(offs) + 1)])
    return kernel, (lo, hi)


def conv_int8(x: jnp.ndarray, kernel: jnp.ndarray, pad, dilation: int = 1,
              out_dtype=jnp.float32, x_scale=None) -> jnp.ndarray:
    """SAME-ish padded conv on the int8 MXU path: quantize activations
    and weights (per output channel), accumulate in int32, dequantize to
    ``out_dtype``.

    ``x_scale``: static calibrated activation scale (a scalar). Dynamic
    per-tensor quantization (``None``) was MEASURED SLOWER than fp32 in
    situ on a v5e (25.8 vs 22.4 ms for the full generator): the global
    max-reduction forces the producer's fp32 tensor through HBM three
    extra times per conv (write f32 / reduce / re-read to quantize),
    which outweighs the 2x MXU rate. With a static scale the f32->int8
    cast fuses into the producing elementwise chain and the fp32
    activation never reaches HBM."""
    wq, sw = quantize_sym(kernel, per_channel=True)
    if x_scale is None:
        xq, sx = quantize_sym(x)
    else:
        sx = x_scale
        xq = jnp.clip(jnp.round(x / sx), -127, 127).astype(jnp.int8)
    y = jax.lax.conv_general_dilated(
        xq, wq, (1,), [pad], rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * (sx * sw)).astype(out_dtype)


def apply_taps_int8(x: jnp.ndarray, taps, out_dtype=jnp.float32,
                    x_scale=None):
    """int8 variant of ``apply_taps`` (same dense folded kernel, quantized
    execution)."""
    kernel, pad = _dense_tap_kernel(taps)
    return conv_int8(x, kernel, pad, 1, out_dtype, x_scale)


def select_conv(xt, kernel, d, *, C, f, quant, dtype, x_scale=None):
    """One dilated conv on the selected backend — int8 serving path,
    folded tap form, or the measured-negative alternates — without bias.
    ``kernel`` is the unfolded [k, C, C] parameter."""
    k = kernel.shape[0]
    if quant:
        if f == 1:
            p = (k - 1) // 2 * d
            return conv_int8(xt, kernel, (p, p), d, dtype, x_scale)
        return apply_taps_int8(
            xt, fold_taps(conv_taps(kernel, d), f, C, C), dtype, x_scale)
    if d > 1 and FORCE_DILATED_BACKEND == "im2col":
        return im2col_dilated_conv(xt, kernel, d, f, dtype)
    if d > 1 and FORCE_DILATED_BACKEND == "direct":
        return direct_dilated_conv(xt, kernel, d, f, dtype)
    if d > 1 and FORCE_DILATED_BACKEND == "decimated":
        return decimated_dilated_conv(xt, kernel, d, f, dtype)
    if prefer_direct_dilated(C, f, k, d):
        return direct_dilated_conv(xt, kernel, d, f, dtype)
    if prefer_decimated(C, f, k, d):
        return decimated_dilated_conv(xt, kernel, d, f, dtype)
    return apply_taps(xt, fold_taps(conv_taps(kernel, d), f, C, C), dtype)


def act_scale(mod: nn.Module, name: str, x: jnp.ndarray, calibrate: bool):
    """Per-site activation amax in the ``quant`` variable collection.

    Calibration flow: ``init()`` (and any ``apply(..., calibrate=True,
    mutable=["quant"])`` pass) records a running max|x| per conv site and
    quantizes dynamically; a later plain ``apply({"params": ..., "quant":
    ...})`` uses the stored STATIC scale, which is what makes the int8
    path faster than fp32 (see ``conv_int8``). Returns ``None`` while
    calibrating (= use dynamic per-tensor quantization this pass)."""
    v = mod.variable("quant", name, lambda: jnp.zeros((), jnp.float32))
    if calibrate or mod.is_initializing():
        if not mod.is_mutable_collection("quant"):
            raise ValueError(
                "calibrate=True needs apply(..., mutable=['quant'])")
        v.value = jnp.maximum(
            v.value, jnp.max(jnp.abs(x)).astype(jnp.float32))
        return None
    return jnp.maximum(v.value, 1e-8) / 127.0


class FoldedConvParams(nn.Module):
    """Parameter container matching ``nn.Conv``'s {kernel, bias} tree so
    folded execution stays checkpoint-compatible."""

    kernel_shape: Tuple[int, int, int]
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.normal(0.01),
                            self.kernel_shape)
        bias = (self.param("bias", nn.initializers.zeros,
                           (self.kernel_shape[-1],))
                if self.use_bias else None)
        return kernel, bias


class ConvTranspose1dTorch(nn.Module):
    """Exact equivalent of ``torch.nn.ConvTranspose1d(stride=u, padding=p)``:
    fractionally-strided conv with flipped kernel and edge cropping, so
    imported checkpoints are bit-compatible.

    out_len = (in_len - 1) * stride - 2 * padding + kernel_size
    """

    features: int
    kernel_size: int
    stride: int
    padding: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: [B, T, C_in]
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.normal(0.01),
            (self.kernel_size, in_ch, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        pad = self.kernel_size - 1 - self.padding
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            jnp.flip(kernel, 0).astype(self.dtype),
            window_strides=(1,),
            padding=[(pad, pad)],
            lhs_dilation=(self.stride,),
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        return y + bias.astype(self.dtype)


class ResBlock1(nn.Module):
    """MRF ResBlock type '1' (``models.py:11-49``): 3x (dilated conv +
    plain conv), leaky-relu pre-activation, additive residuals.

    ``fold > 1`` runs on a folded [B, T/f, f*C] view with block-rearranged
    kernels (identical math; parameter tree unchanged)."""

    channels: int
    kernel_size: int
    dilations: Tuple[int, ...] = (1, 3, 5)
    dtype: jnp.dtype = jnp.float32
    fold: int = 1
    quant: bool = False            # int8 serving path (see conv_int8)
    calibrate: bool = False        # record activation amax (see act_scale)
    collect_params: bool = False   # return (k1,b1,k2,b2) per iteration
    # instead of computing (the fused MRF kernel consumes the raw taps;
    # declaring the same FoldedConvParams keeps the param tree identical)

    @nn.compact
    def __call__(self, x):
        C, f = self.channels, self.fold
        collected = []
        for i, d in enumerate(self.dilations):
            if self.collect_params:
                k1, b1 = FoldedConvParams(
                    (self.kernel_size, C, C), name=f"convs1_{i}")()
                k2, b2 = FoldedConvParams(
                    (self.kernel_size, C, C), name=f"convs2_{i}")()
                collected.append((k1, b1, k2, b2))
                continue
            xt = leaky_relu(x)
            if f == 1 and not self.quant:
                p1 = (self.kernel_size - 1) // 2 * d
                xt = nn.Conv(C, (self.kernel_size,),
                             kernel_dilation=(d,), padding=[(p1, p1)],
                             dtype=self.dtype, name=f"convs1_{i}")(xt)
            else:
                k1, b1 = FoldedConvParams(
                    (self.kernel_size, C, C), name=f"convs1_{i}")()
                s1 = (act_scale(self, f"convs1_{i}_amax", xt,
                                self.calibrate) if self.quant else None)
                xt = select_conv(xt, k1, d, C=C, f=f, quant=self.quant,
                                 dtype=self.dtype, x_scale=s1) \
                    + jnp.tile(b1, f)
            xt = leaky_relu(xt)
            if f == 1 and not self.quant:
                p2 = (self.kernel_size - 1) // 2
                xt = nn.Conv(C, (self.kernel_size,),
                             padding=[(p2, p2)], dtype=self.dtype,
                             name=f"convs2_{i}")(xt)
            else:
                k2, b2 = FoldedConvParams(
                    (self.kernel_size, C, C), name=f"convs2_{i}")()
                s2 = (act_scale(self, f"convs2_{i}_amax", xt,
                                self.calibrate) if self.quant else None)
                xt = select_conv(xt, k2, 1, C=C, f=f, quant=self.quant,
                                 dtype=self.dtype, x_scale=s2) \
                    + jnp.tile(b2, f)
            x = x + xt
        if self.collect_params:
            return collected
        return x


class ResBlock2(nn.Module):
    """MRF ResBlock type '2' (``models.py:52-72``)."""

    channels: int
    kernel_size: int
    dilations: Tuple[int, ...] = (1, 3)
    dtype: jnp.dtype = jnp.float32
    fold: int = 1
    quant: bool = False
    calibrate: bool = False

    @nn.compact
    def __call__(self, x):
        C, f = self.channels, self.fold
        for i, d in enumerate(self.dilations):
            xt = leaky_relu(x)
            if f == 1 and not self.quant:
                p = (self.kernel_size - 1) // 2 * d
                xt = nn.Conv(C, (self.kernel_size,),
                             kernel_dilation=(d,), padding=[(p, p)],
                             dtype=self.dtype, name=f"convs_{i}")(xt)
            else:
                k1, b1 = FoldedConvParams(
                    (self.kernel_size, C, C), name=f"convs_{i}")()
                s1 = (act_scale(self, f"convs_{i}_amax", xt,
                                self.calibrate) if self.quant else None)
                xt = select_conv(xt, k1, d, C=C, f=f, quant=self.quant,
                                 dtype=self.dtype, x_scale=s1) \
                    + jnp.tile(b1, f)
            x = x + xt
        return x


def receptive_halo_mel(cfg: HiFiGANConfig) -> int:
    """Conservative one-sided receptive field of the generator in MEL
    frames. An output sample depends on at most this many mel frames to
    each side; it is the exactness halo for chunked/streaming vocoding
    (config_v1: 15 frames ~ 0.17 s)."""
    halo = (7 - 1) // 2  # conv_post, at the output sample rate
    for u, k in reversed(list(zip(cfg.upsample_rates,
                                  cfg.upsample_kernel_sizes))):
        halo += max(
            sum((rk - 1) // 2 * d + (rk - 1) // 2 for d in rd)
            for rk, rd in zip(cfg.resblock_kernel_sizes,
                              cfg.resblock_dilation_sizes))
        # through the stride-u transposed conv: input index range for
        # output o is [(o + p - k + 1) / u, (o + p) / u], p = (k-u)//2
        halo = -(-(halo + k - 1) // u)
    return halo + (7 - 1) // 2  # conv_pre


def fold_window_multiple(voc: "HiFiGANGenerator") -> int:
    """Smallest multiple a mel window width must be for the folded serving
    path (``fold_to > 0``): each level's post-upsample length
    W * prod(u_0..u_i) is space-to-depth reshaped by that level's fold
    factor f_i = fold_to / ch_i, so W must clear f_i / gcd(f_i, prod(u)).
    1 for the unfolded path and for config_v1 shapes (whose upsample
    products outgrow the folds); > 1 only for tiny test configs."""
    ft = getattr(voc, "fold_to", 0)
    if not ft:
        return 1
    c = voc.cfg
    m, P = 1, 1
    for i, u in enumerate(c.upsample_rates):
        P *= u
        ch = c.upsample_initial_channel // (2 ** (i + 1))
        f = max(1, ft // ch)
        need = f // math.gcd(f, P)
        m = m * need // math.gcd(m, need)
    return m


# jitted per-window apply cache for vocode_chunked: keyed on the (voc,
# variables) identities so repeated utterances reuse ONE compiled program
# instead of re-tracing per call (strong refs pin the keys so ids cannot
# be recycled; bounded by the number of distinct serving vocoders).
_CHUNKED_RUN_CACHE: dict = {}


def make_chunked_run(voc: "HiFiGANGenerator", variables):
    """Memoized ``jax.jit(lambda mel_window: voc.apply(variables, ...))``
    used by :func:`vocode_chunked`; reusable across utterances."""
    key = (id(voc), id(variables))
    hit = _CHUNKED_RUN_CACHE.get(key)
    if hit is not None and hit[0] is voc and hit[1] is variables:
        return hit[2]
    run = jax.jit(lambda m: voc.apply(variables, m))
    _CHUNKED_RUN_CACHE[key] = (voc, variables, run)
    return run


def vocode_chunked(voc: "HiFiGANGenerator", variables, mel: jnp.ndarray,
                   chunk: int = 64, halo: int | None = None,
                   run=None) -> jnp.ndarray:
    """EXACT chunked vocoding: bit-identical samples to the one-shot
    forward (``tests/test_hifigan_chunked.py``).

    Streaming serving needs latency of one chunk, not one utterance; the
    reference's HiFi-GAN has no streaming mode (``inference_e2e.py``
    vocodes whole utterances). Every chunk vocodes ONE fixed-width mel
    window of ``chunk + 2 * halo`` frames — edge windows are shifted to
    stay inside ``[0, M)`` instead of clipped, so exactly one window
    shape compiles — and the jitted window apply is memoized across
    calls (``make_chunked_run``), so only the first utterance ever pays
    a compile. Exactness: interior samples get >= halo frames of true
    context on each side, and where a window is flush against a TRUE
    sequence end the one-shot forward's own SAME zero padding applies
    identically. Output windows are cropped to [s, e)*prod(u) and
    concatenated. Works for the fp32 path and for ``quant_int8`` with
    frozen static scales (per-window math is position-independent).
    ``run``: optional prebuilt jitted window apply (overrides the cache).
    """
    if halo is None:
        halo = receptive_halo_mel(voc.cfg)
    B, M, _ = mel.shape
    hop = 1
    for u in voc.cfg.upsample_rates:
        hop *= u
    fm = fold_window_multiple(voc)
    W = -(-(chunk + 2 * halo) // fm) * fm
    if M <= W:
        return voc.apply(variables, mel)
    if run is None:
        run = make_chunked_run(voc, variables)
    outs = []
    for s in range(0, M, chunk):
        e = min(s + chunk, M)
        ws = max(0, min(s - halo, M - W))
        w = run(mel[:, ws:ws + W])
        outs.append(w[:, (s - ws) * hop:(e - ws) * hop])
    return jnp.concatenate(outs, axis=1)


class HiFiGANGenerator(nn.Module):
    """``Generator`` (``models.py:75-125``).

    ``fold_to > 0`` (e.g. 128) enables the folded execution path: each
    level's activations are kept in a [B, T/f, f*ch] space-to-depth view
    with f = fold_to // ch (so the MXU always sees >= fold_to channels) and
    the transposed convs run in sub-pixel form. Numerically identical to
    the direct path (same parameters, same sums) and ~2x faster at
    config_v1 serving shapes on a v5e; 0 keeps the reference-exact layout.
    """

    cfg: HiFiGANConfig
    dtype: jnp.dtype = jnp.float32
    fold_to: int = 0
    # int8 serving path (opt-in; see conv_int8 above): all upsample and
    # MRF convs run quantized W8A8 on the int8 MXU; conv_pre/conv_post and
    # the residual spine stay in `dtype`. Parameter tree unchanged —
    # weights quantize on the fly at dispatch (the kernels are tiny).
    # NOT the default: it trades the 2.5e-4 torch waveform parity for
    # speed (quality vs fp32 measured in COVERAGE.md). Activation scales
    # live in the "quant" variable collection; init() records a first
    # calibration, apply(..., calibrate=True, mutable=["quant"]) refines
    # it (see act_scale).
    quant_int8: bool = False
    calibrate: bool = False
    # int8 quality mitigation: keep the FIRST N upsample levels (highest
    # channel count, earliest in the chain — their quantization error
    # propagates through everything downstream) in fp32 and quantize only
    # the rest. Level 0 holds ~11% of the serving FLOPs at config_v1, so
    # skip_levels=1 keeps most of the int8 speed win; the measured
    # speed/quality ladder lives in COVERAGE.md.
    quant_skip_levels: int = 0
    # Serving knobs read by decode/speech_generator.py::make_vocode_fn —
    # static module fields so they flow through every generator/task
    # without signature changes. serve_chunk > 0 vocodes in fixed
    # chunk-frame windows via ``vocode_chunked`` (exact; first-audio
    # latency of one chunk instead of one utterance; forces the
    # out-of-jit serving path). serve_calib_batches is the number of
    # served batches the int8 mode calibrates its static activation
    # scales over before freezing them.
    serve_chunk: int = 0
    serve_calib_batches: int = 4
    # Pallas fused MRF levels (alternate backend, off by default): when a
    # level's folded view is exactly one lane tile (f*ch == 128), run its
    # 18-conv ResBlock stack in one VMEM-resident kernel (ops/fused_mrf.py)
    # instead of 18 XLA convs. Correct (exact vs this module, tested) but a
    # measured NEGATIVE on one v5e: 61-67% MFU vs XLA's 65-78% on the same
    # dense folded tap FLOPs (the chain is compute-bound, so fusing buys no
    # bandwidth, and the kernel pays halo recompute + misaligned shifted
    # reads). Kept as a cross-checked alternate, like ops/fused_ffn.py.
    fused_mrf: bool = False
    mrf_interpret: bool = False    # CPU test mode for the kernel
    mrf_tile: int = 1024

    @nn.compact
    def __call__(self, mel: jnp.ndarray, stop_at_level: int = -1
                 ) -> jnp.ndarray:
        # mel: [B, T, num_mels] -> wav [B, T * prod(upsample_rates)]
        # stop_at_level (static; profiling only): -1 = full forward;
        # -2 = return after conv_pre; i >= 0 = return the level-i
        # activations right after its MRF average (folded view).
        c = self.cfg
        B = mel.shape[0]
        x = nn.Conv(c.upsample_initial_channel, (7,), padding=[(3, 3)],
                    dtype=self.dtype, name="conv_pre")(mel)
        if stop_at_level == -2:
            return x
        res_cls = ResBlock1 if c.resblock == "1" else ResBlock2
        num_kernels = len(c.resblock_kernel_sizes)
        f = 1                           # current fold of x
        ch = c.upsample_initial_channel
        for i, (u, k) in enumerate(zip(c.upsample_rates,
                                       c.upsample_kernel_sizes)):
            lvl_quant = self.quant_int8 and i >= self.quant_skip_levels
            x = leaky_relu(x)
            ch = c.upsample_initial_channel // (2 ** (i + 1))
            f_next = max(1, self.fold_to // ch) if self.fold_to else 1
            if self.fold_to:
                kernel, bias = FoldedConvParams(
                    (k, x.shape[-1] // f, ch), name=f"ups_{i}")()
                taps = convT_subpixel_taps(kernel, u, (k - u) // 2)
                taps = fold_taps(taps, f, x.shape[-1] // f, u * ch)
                if lvl_quant:
                    su = act_scale(self, f"ups_{i}_amax", x, self.calibrate)
                    x = apply_taps_int8(x, taps, self.dtype, su) \
                        + jnp.tile(bias, f * u)
                else:
                    x = apply_taps(x, taps, self.dtype) \
                        + jnp.tile(bias, f * u)
                # [B, G, f*u*ch] is time-major: refold to f_next for free
                x = x.reshape(B, -1, f_next * ch)
            else:
                x = ConvTranspose1dTorch(
                    ch, k, u, (k - u) // 2, dtype=self.dtype,
                    name=f"ups_{i}")(x)
            f = f_next
            # fused path gate (all static): one lane tile per folded frame,
            # ResBlock type 1, and enough frames for the halo exchange
            use_fused = (self.fused_mrf and c.resblock == "1"
                         and f * ch == 128 and x.shape[1] >= 128)
            if use_fused:
                conv_params = [
                    res_cls(ch, rk, tuple(rd), dtype=self.dtype, fold=f,
                            collect_params=True,
                            name=f"resblocks_{i * num_kernels + j}")(x)
                    for j, (rk, rd) in enumerate(
                        zip(c.resblock_kernel_sizes,
                            c.resblock_dilation_sizes))]
                from daspeech_tpu.ops import fused_mrf as _fm

                W, bias, offs, H = _fm.prepare_level(
                    conv_params, f, ch, c.resblock_kernel_sizes,
                    c.resblock_dilation_sizes,
                    dtype=(jnp.float32 if self.mrf_interpret
                           else jnp.bfloat16))
                x = _fm.mrf_level(
                    x.astype(jnp.float32), W, bias, offsets=offs, H=H,
                    tile=self.mrf_tile, n_blocks=num_kernels,
                    interpret=self.mrf_interpret)
            else:
                xs = None
                for j, (rk, rd) in enumerate(zip(c.resblock_kernel_sizes,
                                                 c.resblock_dilation_sizes)):
                    block = res_cls(ch, rk, tuple(rd), dtype=self.dtype,
                                    fold=f, quant=lvl_quant,
                                    calibrate=self.calibrate,
                                    name=f"resblocks_{i * num_kernels + j}")(x)
                    xs = block if xs is None else xs + block
                x = xs / num_kernels
            if stop_at_level == i:
                return x
        # the reference's final activation uses torch's default slope 0.01,
        # not LRELU_SLOPE (``models.py:121``: plain F.leaky_relu(x))
        x = jax.nn.leaky_relu(x, 0.01)
        if f > 1:
            kernel, bias = FoldedConvParams((7, ch, 1), name="conv_post")()
            x = apply_taps(x, fold_taps(conv_taps(kernel, 1), f, ch, 1),
                           self.dtype) + bias
            x = jnp.tanh(x)
            return x.reshape(B, -1)
        x = nn.Conv(1, (7,), padding=[(3, 3)], dtype=self.dtype,
                    name="conv_post")(x)
        return jnp.tanh(x)[..., 0]
