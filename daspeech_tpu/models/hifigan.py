"""HiFi-GAN generator (flax.linen), mel [B, T, 80] -> waveform [B, T*256].

TPU-native rebuild of ``/root/reference/hifi-gan/models.py:75-125``
(config_v1: upsample rates 8,8,2,2, kernels 16,16,4,4, 512 initial channels,
3 MRF ResBlocks with kernels 3/7/11 and dilations 1/3/5). Weight-norm is
folded into plain conv weights at checkpoint import (the reference removes
weight norm for inference too, ``models.py:118-125``).

Layout is channels-last [B, T, C]; XLA lowers the stacks to fused MXU convs.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from daspeech_tpu.core.config import HiFiGANConfig

LRELU_SLOPE = 0.1


def leaky_relu(x):
    return jax.nn.leaky_relu(x, LRELU_SLOPE)


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
    plain conv), leaky-relu pre-activation, additive residuals."""

    channels: int
    kernel_size: int
    dilations: Tuple[int, ...] = (1, 3, 5)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dilations):
            p1 = (self.kernel_size - 1) // 2 * d
            xt = leaky_relu(x)
            xt = nn.Conv(self.channels, (self.kernel_size,),
                         kernel_dilation=(d,), padding=[(p1, p1)],
                         dtype=self.dtype, name=f"convs1_{i}")(xt)
            xt = leaky_relu(xt)
            p2 = (self.kernel_size - 1) // 2
            xt = nn.Conv(self.channels, (self.kernel_size,),
                         padding=[(p2, p2)], dtype=self.dtype,
                         name=f"convs2_{i}")(xt)
            x = x + xt
        return x


class ResBlock2(nn.Module):
    """MRF ResBlock type '2' (``models.py:52-72``)."""

    channels: int
    kernel_size: int
    dilations: Tuple[int, ...] = (1, 3)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dilations):
            p = (self.kernel_size - 1) // 2 * d
            xt = leaky_relu(x)
            xt = nn.Conv(self.channels, (self.kernel_size,),
                         kernel_dilation=(d,), padding=[(p, p)],
                         dtype=self.dtype, name=f"convs_{i}")(xt)
            x = x + xt
        return x


class HiFiGANGenerator(nn.Module):
    """``Generator`` (``models.py:75-125``)."""

    cfg: HiFiGANConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, mel: jnp.ndarray) -> jnp.ndarray:
        # mel: [B, T, num_mels] -> wav [B, T * prod(upsample_rates)]
        c = self.cfg
        x = nn.Conv(c.upsample_initial_channel, (7,), padding=[(3, 3)],
                    dtype=self.dtype, name="conv_pre")(mel)
        res_cls = ResBlock1 if c.resblock == "1" else ResBlock2
        num_kernels = len(c.resblock_kernel_sizes)
        for i, (u, k) in enumerate(zip(c.upsample_rates,
                                       c.upsample_kernel_sizes)):
            x = leaky_relu(x)
            ch = c.upsample_initial_channel // (2 ** (i + 1))
            x = ConvTranspose1dTorch(
                ch, k, u, (k - u) // 2, dtype=self.dtype, name=f"ups_{i}")(x)
            xs = None
            for j, (rk, rd) in enumerate(zip(c.resblock_kernel_sizes,
                                             c.resblock_dilation_sizes)):
                block = res_cls(ch, rk, tuple(rd), dtype=self.dtype,
                                name=f"resblocks_{i * num_kernels + j}")(x)
                xs = block if xs is None else xs + block
            x = xs / num_kernels
        # the reference's final activation uses torch's default slope 0.01,
        # not LRELU_SLOPE (``models.py:121``: plain F.leaky_relu(x))
        x = jax.nn.leaky_relu(x, 0.01)
        x = nn.Conv(1, (7,), padding=[(3, 3)], dtype=self.dtype,
                    name="conv_post")(x)
        return jnp.tanh(x)[..., 0]
