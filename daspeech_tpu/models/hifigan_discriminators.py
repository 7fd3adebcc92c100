"""HiFi-GAN discriminators (for vocoder training).

Rebuild of ``/root/reference/hifi-gan/models.py:128-254``: the multi-period
discriminator (periods 2/3/5/7/11, 2D conv stacks over a [T/p, p] fold) and
the multi-scale discriminator (3 scales of grouped 1D conv stacks with
avg-pool downsampling). Weight/spectral norm are training-time
reparameterizations in torch; on TPU the plain parameterization trains
stably with the same losses, so convs here are unnormalized.
"""

from __future__ import annotations

from typing import List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

LRELU_SLOPE = 0.1


def leaky_relu(x):
    return jax.nn.leaky_relu(x, LRELU_SLOPE)


class DiscriminatorP(nn.Module):
    """Period discriminator (``models.py:128-161``)."""

    period: int
    kernel_size: int = 5
    stride: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        # x: [B, T] waveform
        B, T = x.shape
        p = self.period
        if T % p:
            pad = p - (T % p)
            x = jnp.pad(x, ((0, 0), (0, pad)), mode="reflect")
            T = T + pad
        x = x.reshape(B, T // p, p, 1)        # NHWC: [B, T/p, p, 1]
        fmap = []
        chans = [32, 128, 512, 1024]
        kp = (self.kernel_size - 1) // 2
        for i, ch in enumerate(chans):
            x = nn.Conv(ch, (self.kernel_size, 1), strides=(self.stride, 1),
                        padding=[(kp, kp), (0, 0)], dtype=self.dtype,
                        name=f"convs_{i}")(x)
            x = leaky_relu(x)
            fmap.append(x)
        x = nn.Conv(1024, (self.kernel_size, 1), strides=(1, 1),
                    padding=[(2, 2), (0, 0)], dtype=self.dtype,
                    name="convs_4")(x)
        x = leaky_relu(x)
        fmap.append(x)
        x = nn.Conv(1, (3, 1), padding=[(1, 1), (0, 0)], dtype=self.dtype,
                    name="conv_post")(x)
        fmap.append(x)
        return x.reshape(B, -1), fmap


class DiscriminatorS(nn.Module):
    """Scale discriminator (``models.py:192-216``)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        # x: [B, T]
        B = x.shape[0]
        x = x[:, :, None]                    # [B, T, 1]
        fmap = []
        spec = [
            (128, 15, 1, 1, 7), (128, 41, 2, 4, 20), (256, 41, 2, 16, 20),
            (512, 41, 4, 16, 20), (1024, 41, 4, 16, 20),
            (1024, 41, 1, 16, 20), (1024, 5, 1, 1, 2),
        ]
        for i, (ch, k, s, g, pad) in enumerate(spec):
            x = nn.Conv(ch, (k,), strides=(s,), padding=[(pad, pad)],
                        feature_group_count=g, dtype=self.dtype,
                        name=f"convs_{i}")(x)
            x = leaky_relu(x)
            fmap.append(x)
        x = nn.Conv(1, (3,), padding=[(1, 1)], dtype=self.dtype,
                    name="conv_post")(x)
        fmap.append(x)
        return x.reshape(B, -1), fmap


def _split_pair(out, fmap, B):
    """Split a [2B, ...] pair-batched output back into (real, gen)."""
    return (out[:B], out[B:],
            [f[:B] for f in fmap], [f[B:] for f in fmap])


class MultiPeriodDiscriminator(nn.Module):
    """``pair_batch``: run each sub-discriminator ONCE on
    ``concat([y, y_hat])`` instead of twice on B — convs are
    batch-parallel so the sums are the same math (losses/grads agree up
    to float reassociation of the batch reductions), and the conv grid
    doubles its batch tile occupancy (the per-call fixed cost and any
    sub-full MXU tiles amortize over 2B). Exactness:
    ``tests/test_vocoder_train.py``."""

    periods: Tuple[int, ...] = (2, 3, 5, 7, 11)
    dtype: jnp.dtype = jnp.float32
    pair_batch: bool = False

    @nn.compact
    def __call__(self, y: jnp.ndarray, y_hat: jnp.ndarray):
        rs, gs, fr, fg = [], [], [], []
        B = y.shape[0]
        for p in self.periods:
            d = DiscriminatorP(p, dtype=self.dtype, name=f"disc_p{p}")
            if self.pair_batch:
                out, fmap = d(jnp.concatenate([y, y_hat], axis=0))
                r, g, fmr, fmg = _split_pair(out, fmap, B)
            else:
                r, fmr = d(y)
                g, fmg = d(y_hat)
            rs.append(r)
            gs.append(g)
            fr.append(fmr)
            fg.append(fmg)
        return rs, gs, fr, fg


def avg_pool_1d(x: jnp.ndarray, window: int = 4, stride: int = 2,
                padding: int = 2) -> jnp.ndarray:
    """torch AvgPool1d(4, 2, padding=2) with count_include_pad=True."""
    xp = jnp.pad(x, ((0, 0), (padding, padding)))
    n = 1 + (xp.shape[1] - window) // stride
    idx = jnp.arange(window)[None, :] + stride * jnp.arange(n)[:, None]
    return jnp.mean(xp[:, idx], axis=-1)


class MultiScaleDiscriminator(nn.Module):
    dtype: jnp.dtype = jnp.float32
    pair_batch: bool = False

    @nn.compact
    def __call__(self, y: jnp.ndarray, y_hat: jnp.ndarray):
        rs, gs, fr, fg = [], [], [], []
        B = y.shape[0]
        for i in range(3):
            if i:
                y = avg_pool_1d(y)
                y_hat = avg_pool_1d(y_hat)
            d = DiscriminatorS(dtype=self.dtype, name=f"disc_s{i}")
            if self.pair_batch:
                out, fmap = d(jnp.concatenate([y, y_hat], axis=0))
                r, g, fmr, fmg = _split_pair(out, fmap, B)
            else:
                r, fmr = d(y)
                g, fmg = d(y_hat)
            rs.append(r)
            gs.append(g)
            fr.append(fmr)
            fg.append(fmg)
        return rs, gs, fr, fg


# ------------------------------------------------------------------ losses

def feature_loss(fmap_r: List, fmap_g: List) -> jnp.ndarray:
    """``models.py:256-262``; real-side maps are stop-grad (the torch
    version detaches via separate D forward without grad to G)."""
    loss = 0.0
    for dr, dg in zip(fmap_r, fmap_g):
        for rl, gl in zip(dr, dg):
            loss = loss + jnp.mean(
                jnp.abs(jax.lax.stop_gradient(rl) - gl),
                dtype=jnp.float32)
    return loss * 2.0


def discriminator_loss(real_outs: List, gen_outs: List):
    """LSGAN D loss (``models.py:265-277``). Means accumulate in f32 so
    the bf16 discriminator option keeps f32 loss/grad scales."""
    loss = 0.0
    for dr, dg in zip(real_outs, gen_outs):
        loss = loss + jnp.mean((1.0 - dr) ** 2, dtype=jnp.float32) \
            + jnp.mean(dg ** 2, dtype=jnp.float32)
    return loss


def generator_loss(gen_outs: List):
    """LSGAN G loss (``models.py:280-288``)."""
    loss = 0.0
    for dg in gen_outs:
        loss = loss + jnp.mean((1.0 - dg) ** 2, dtype=jnp.float32)
    return loss
