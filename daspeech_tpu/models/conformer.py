"""Conformer speech encoder (flax.linen), batch-first.

TPU-native rebuild of ``fairseq/fairseq/models/speech_to_text/s2t_conformer.py``
(+ ``modules/conformer_layer.py``, ``modules/espnet_multihead_attention.py``,
``modules/positional_encoding.py``, ``models/speech_to_text/modules/
convolution.py``): Conv1d 2x-stride-2 GLU subsampler (4x downsample), scaled
embedding, Transformer-XL relative-position MHSA, macaron FFNs, depthwise-conv
module, all as fused XLA ops in a single [B, T, C] layout.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from daspeech_tpu.models.layers import ACTIVATIONS, Dropout, Dtype


class Conv1dSubsampler(nn.Module):
    """Two stride-2 Conv1d + GLU; output length = floor((l - 1)/2 + 1) twice.

    Mirrors ``Conv1dSubsampler`` (``convolution.py:13-61``).
    """

    mid_channels: int      # 1024
    out_channels: int      # encoder_embed_dim
    kernel_sizes: Tuple[int, ...] = (5, 5)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths: jnp.ndarray):
        # x: [B, T, F]. Frames beyond `lengths` are zeroed at every stage so
        # the output is invariant to the bucket's padded length (the
        # reference leaks batch padding through these convs).
        n = len(self.kernel_sizes)
        for i, k in enumerate(self.kernel_sizes):
            mask = jnp.arange(x.shape[1])[None, :] < lengths[:, None]
            x = jnp.where(mask[:, :, None], x, 0.0)
            out_ch = self.mid_channels if i < n - 1 else self.out_channels * 2
            x = nn.Conv(
                out_ch, kernel_size=(k,), strides=(2,),
                padding=[(k // 2, k // 2)], dtype=self.dtype, name=f"conv{i}",
            )(x)
            x = jax.nn.glu(x, axis=-1)
            lengths = jnp.floor((lengths.astype(jnp.float32) - 1) / 2 + 1).astype(
                jnp.int32)
        mask = jnp.arange(x.shape[1])[None, :] < lengths[:, None]
        x = jnp.where(mask[:, :, None], x, 0.0)
        return x, lengths

    @staticmethod
    def out_length(in_len: int, n_layers: int = 2) -> int:
        out = in_len
        for _ in range(n_layers):
            out = (out - 1) // 2 + 1
        return out


def rel_positional_encoding(seq_len: int, dim: int, dtype=jnp.float32):
    """Symmetric +/-T sinusoids, [1, 2*seq_len-1, dim]; index 0 is relative
    position +(seq_len-1), the center is 0, the end is -(seq_len-1).
    Mirrors ``RelPositionalEncoding`` (``positional_encoding.py:66-128``).

    The production attention no longer consumes this table — the rotation
    form rebuilds the same frequencies as ``ops/fused_relpos.relpos_basis``
    — but it stays as the reference oracle for the rotation-identity test
    (``tests/test_fused_relpos.py::TestRotationIdentity``).
    """
    position = jnp.arange(seq_len, dtype=jnp.float32)[:, None]
    div_term = jnp.exp(jnp.arange(0, dim, 2, dtype=jnp.float32)
                       * -(math.log(10000.0) / dim))
    pe_pos = jnp.zeros((seq_len, dim))
    pe_pos = pe_pos.at[:, 0::2].set(jnp.sin(position * div_term))
    pe_pos = pe_pos.at[:, 1::2].set(jnp.cos(position * div_term))
    pe_neg = jnp.zeros((seq_len, dim))
    pe_neg = pe_neg.at[:, 0::2].set(jnp.sin(-position * div_term))
    pe_neg = pe_neg.at[:, 1::2].set(jnp.cos(-position * div_term))
    pe = jnp.concatenate([pe_pos[::-1], pe_neg[1:]], axis=0)
    return pe[None].astype(dtype)


class _PosKernel(nn.Module):
    """Bare ``linear_pos`` kernel with the same param tree as a bias-free
    ``nn.Dense`` ([in, out], lecun_normal) — the rotation formulation below
    needs W_p^T, which a Dense application cannot express."""

    dim: int

    @nn.compact
    def __call__(self) -> jnp.ndarray:
        return self.param("kernel", nn.initializers.lecun_normal(),
                          (self.dim, self.dim))


class RelPosMultiHeadAttention(nn.Module):
    """Transformer-XL style relative-position MHSA with learned pos_bias_u/v.

    Mirrors ``RelPositionMultiHeadedAttention``
    (``espnet_multihead_attention.py:111-210``), but computes the position
    score WITHOUT the [B, H, T, 2T-1] tensor and its ``rel_shift``
    pad/reshape copies: by the sinusoid angle-addition identity,
    ``bd[i,j] = q_v[i]·(W_p pe(i-j)) = rotate(W_p^T q_v[i]; s_i, c_i)·e[j]``
    — one matmul against a constant [T, C] basis
    (``ops/fused_relpos.relpos_basis``; exact to f32 roundoff vs the shift
    path, locked by a test). With ``fused=True`` on TPU the whole
    ``softmax((q@kᵀ + a@eᵀ)·scale)·V`` block runs as one VMEM-resident
    Pallas program per batch row (``ops/fused_relpos.py``).
    """

    embed_dim: int
    num_heads: int
    dropout: float = 0.0
    fused: bool = False       # Pallas fused rel-pos attention (TPU only)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,                     # [B, T, C]
        key_padding_mask: Optional[jnp.ndarray] = None,  # [B, T] True=pad
        train: bool = False,
    ) -> jnp.ndarray:
        from daspeech_tpu.ops import fused_relpos as _fr

        B, T, _ = x.shape
        H = self.num_heads
        C = self.embed_dim
        d = C // H
        dense = lambda name: nn.Dense(C, dtype=self.dtype, name=name)

        q = dense("linear_q")(x)            # [B, T, H*d] packed
        k = dense("linear_k")(x)
        v = dense("linear_v")(x)
        K = _PosKernel(C, name="linear_pos")()          # [C, C]

        bias_u = self.param("pos_bias_u", nn.initializers.xavier_uniform(), (H, d))
        bias_v = self.param("pos_bias_v", nn.initializers.xavier_uniform(), (H, d))

        q_u = q + bias_u.astype(self.dtype).reshape(-1)
        q_v = (q + bias_v.astype(self.dtype).reshape(-1)).reshape(B, T, H, d)

        # rotated position queries: z = W_p^T q_v per head, channels in
        # split-half (sin | cos) order via a row permutation of W_p
        perm = jnp.concatenate([jnp.arange(0, C, 2), jnp.arange(1, C, 2)])
        Kr = K[perm].astype(self.dtype).reshape(C, H, d)
        z = jnp.einsum("bthm,chm->bthc", q_v, Kr)       # [B, T, H, C]
        s_i, c_i, e = _fr.relpos_basis(T, C)
        a = _fr.relpos_rotate(z, s_i[:, None].astype(self.dtype),
                              c_i[:, None].astype(self.dtype))  # [B,T,H,C]
        e = e.astype(self.dtype)                        # [T, C]

        if (self.fused and d <= 128 and T >= _fr.KERNEL_MIN_T
                and _fr.available() and _fr.relpos_fits_vmem(T, C, H)):
            if key_padding_mask is not None:
                all_masked = jnp.all(key_padding_mask, axis=-1)
                kpm = key_padding_mask & ~all_masked[:, None]
                bias = jnp.where(kpm, _fr.NEG, 0.0).astype(jnp.float32)
            else:
                bias = jnp.zeros((B, T), jnp.float32)
            use_drop = train and self.dropout > 0.0
            # per-row seeds: the dropout stream travels with its rows
            seeds = (jax.random.bits(self.make_rng("dropout"), (B,),
                                     jnp.uint32).astype(jnp.int32)
                     if use_drop else jnp.zeros((B,), jnp.int32))
            out = _fr.fused_attention_relpos(
                q_u, k, v, a.reshape(B, T, H * C), e, bias, seeds,
                1.0 / math.sqrt(d),
                self.dropout if use_drop else 0.0, use_drop, H)
            return nn.Dense(C, dtype=self.dtype, name="linear_out")(out)

        q_u4 = q_u.reshape(B, T, H, d)
        k4 = k.reshape(B, T, H, d)
        v4 = v.reshape(B, T, H, d)
        ac = jnp.einsum("bqhd,bkhd->bhqk", q_u4, k4,
                        preferred_element_type=jnp.float32)
        bd = jnp.einsum("bqhc,kc->bhqk", a, e,
                        preferred_element_type=jnp.float32)
        scores = (ac + bd) / math.sqrt(d)
        if key_padding_mask is not None:
            scores = jnp.where(
                key_padding_mask[:, None, None, :], -jnp.inf, scores)
        probs = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
        probs = Dropout(self.dropout, deterministic=not train)(probs)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v4).reshape(B, T, C)
        return nn.Dense(C, dtype=self.dtype, name="linear_out")(out)

    @staticmethod
    def _rel_shift(x: jnp.ndarray) -> jnp.ndarray:
        """[B, H, T, 2T-1] -> [B, H, T, T]; the espnet pad/reshape trick so
        row q sees relative positions (q - k)."""
        B, H, T, P = x.shape
        zero_pad = jnp.zeros((B, H, T, 1), dtype=x.dtype)
        x_padded = jnp.concatenate([zero_pad, x], axis=-1)       # [B,H,T,2T]
        x_padded = x_padded.reshape(B, H, P + 1, T)
        x = x_padded[:, :, 1:].reshape(B, H, T, P)
        return x[:, :, :, : P // 2 + 1]


class MaskedBatchNorm(nn.Module):
    """BatchNorm whose batch statistics exclude padded frames.

    The reference's ``torch.nn.BatchNorm1d`` (``conformer_layer.py:68``)
    averages over padding, making outputs depend on batch composition; with
    fixed-shape bucketed batching on TPU that would make results
    bucket-dependent, so statistics here are masked.
    """

    features: int
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, valid_mask, use_running_average: bool):
        # x: [B, T, C]; valid_mask: [B, T] True = valid
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros(self.features))
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones(self.features))
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            w = valid_mask[:, :, None].astype(jnp.float32)
            n = jnp.maximum(jnp.sum(w), 1.0)
            mean = jnp.sum(x * w, axis=(0, 1)) / n
            var = jnp.sum(jnp.square(x - mean) * w, axis=(0, 1)) / n
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1 - self.momentum) * var)
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        return y * scale + bias


class ConvolutionModule(nn.Module):
    """Pointwise-GLU -> depthwise (k=31) -> BatchNorm -> swish -> pointwise.

    Mirrors ``ConvolutionModule`` (``conformer_layer.py:21-102``), but padded
    frames are zeroed before the depthwise convolution and excluded from the
    batch statistics (see :class:`MaskedBatchNorm`).
    """

    embed_dim: int
    kernel_size: int = 31
    dropout: float = 0.1
    activation: str = "swish"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, pad_mask: Optional[jnp.ndarray],
                 train: bool = False) -> jnp.ndarray:
        valid = (None if pad_mask is None else ~pad_mask)
        x = nn.LayerNorm(dtype=self.dtype, name="layer_norm")(x)
        x = nn.Dense(2 * self.embed_dim, use_bias=False, dtype=self.dtype,
                     name="pointwise_conv1")(x)
        x = jax.nn.glu(x, axis=-1)
        if valid is not None:
            x = jnp.where(valid[:, :, None], x, 0.0)
        pad = (self.kernel_size - 1) // 2
        # pin the depthwise conv to the surrounding batch/time sharding:
        # without the constraint GSPMD propagates a channel sharding into
        # the grouped conv and falls back to involuntary full
        # rematerialization under a data x seq x model mesh (no-op outside
        # jit_sharded; parallel/partition.py::constrain_btc)
        from daspeech_tpu.parallel.partition import constrain_btc

        x = constrain_btc(x)
        x = nn.Conv(
            self.embed_dim, kernel_size=(self.kernel_size,),
            padding=[(pad, pad)], feature_group_count=self.embed_dim,
            use_bias=False, dtype=self.dtype, name="depthwise_conv",
        )(x)
        x = constrain_btc(x)
        x = MaskedBatchNorm(
            self.embed_dim, dtype=self.dtype, name="batch_norm",
        )(x, valid if valid is not None
          else jnp.ones(x.shape[:2], dtype=bool),
          use_running_average=not train)
        x = ACTIVATIONS[self.activation](x)
        x = nn.Dense(self.embed_dim, use_bias=False, dtype=self.dtype,
                     name="pointwise_conv2")(x)
        return Dropout(self.dropout, deterministic=not train)(x)


class _DenseParams(nn.Module):
    """Bare Dense params (same tree/init as ``nn.Dense``) for kernels
    that need the raw weights."""

    din: int
    dout: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.din, self.dout))
        b = self.param("bias", nn.initializers.zeros_init(), (self.dout,))
        return k, b


class _LNParams(nn.Module):
    """Bare LayerNorm params (same tree/init as ``nn.LayerNorm``)."""

    dim: int

    @nn.compact
    def __call__(self):
        return (self.param("scale", nn.initializers.ones_init(),
                           (self.dim,)),
                self.param("bias", nn.initializers.zeros_init(),
                           (self.dim,)))


class FeedForwardModule(nn.Module):
    """Macaron FFN (``conformer_layer.py:103-147``).  ``fused=True``
    routes the whole LN -> W1 -> swish -> dropout -> W2 -> dropout chain
    through one VMEM-resident Pallas program (``ops/fused_ffn.py``;
    identical parameters either way).  Default OFF by measurement: at the
    recipe shape the kernel TIES the XLA path forward (0.33 vs 0.34 ms —
    XLA already keeps traffic near the roofline here) and LOSES backward
    (0.77 vs 0.46 ms: the per-row dW matmuls have K=T'~120 while XLA
    computes one [C, B*T']@[B*T', F] dW at full MXU efficiency), so the
    kernel stays a verified alternate backend like ``ops/dag_pallas.py``.
    """

    embed_dim: int
    ffn_dim: int
    dropout: float = 0.1
    activation: str = "swish"
    fused: bool = False         # Pallas fused FFN (TPU, single device)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        from daspeech_tpu.ops import fused_ffn as _ff

        if (self.fused and self.activation == "swish" and x.ndim == 3
                and _ff.available()
                and _ff.ffn_fits_vmem(x.shape[1], self.embed_dim,
                                      self.ffn_dim)):
            B = x.shape[0]
            gamma, beta = _LNParams(self.embed_dim, name="layer_norm")()
            w1, b1 = _DenseParams(self.embed_dim, self.ffn_dim,
                                  name="w_1")()
            w2, b2 = _DenseParams(self.ffn_dim, self.embed_dim,
                                  name="w_2")()
            use_drop = train and self.dropout > 0.0
            seeds = (jax.random.bits(self.make_rng("dropout"), (B,),
                                     jnp.uint32).astype(jnp.int32)
                     if use_drop else jnp.zeros((B,), jnp.int32))
            p = self.dropout if use_drop else 0.0
            return _ff.fused_ffn(
                x, gamma, beta,
                w1.astype(self.dtype), b1.astype(self.dtype),
                w2.astype(self.dtype), b2.astype(self.dtype),
                seeds, p, p, use_drop)

        x = nn.LayerNorm(dtype=self.dtype, name="layer_norm")(x)
        x = nn.Dense(self.ffn_dim, dtype=self.dtype, name="w_1")(x)
        x = ACTIVATIONS[self.activation](x)
        x = Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Dense(self.embed_dim, dtype=self.dtype, name="w_2")(x)
        return Dropout(self.dropout, deterministic=not train)(x)


class ConformerEncoderLayer(nn.Module):
    """Macaron block (``conformer_layer.py:149-290``)."""

    embed_dim: int
    ffn_dim: int
    num_heads: int
    dropout: float = 0.1
    depthwise_kernel_size: int = 31
    attn_dropout: float = 0.1
    fused_attention: bool = False   # Pallas fused kernel (TPU only)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        pad_mask: Optional[jnp.ndarray],
        train: bool = False,
    ) -> jnp.ndarray:
        x = x + 0.5 * FeedForwardModule(
            self.embed_dim, self.ffn_dim, self.dropout, dtype=self.dtype,
            name="ffn1")(x, train=train)

        residual = x
        y = nn.LayerNorm(dtype=self.dtype, name="self_attn_layer_norm")(x)
        y = RelPosMultiHeadAttention(
            self.embed_dim, self.num_heads, self.attn_dropout,
            fused=self.fused_attention, dtype=self.dtype, name="self_attn",
        )(y, key_padding_mask=pad_mask, train=train)
        y = Dropout(self.dropout, deterministic=not train)(y)
        x = residual + y

        x = x + ConvolutionModule(
            self.embed_dim, self.depthwise_kernel_size, self.dropout,
            dtype=self.dtype, name="conv_module")(x, pad_mask, train=train)

        x = x + 0.5 * FeedForwardModule(
            self.embed_dim, self.ffn_dim, self.dropout, dtype=self.dtype,
            name="ffn2")(x, train=train)
        return nn.LayerNorm(dtype=self.dtype, name="final_layer_norm")(x)


class ConformerEncoder(nn.Module):
    """``S2TConformerEncoder`` (``s2t_conformer.py:33-141``), rel_pos variant.

    Input: fbank [B, T, 80] + lengths. Output: states [B, T', C] and a
    padding mask [B, T'] (True = pad), T' = 4x subsampled.
    """

    embed_dim: int = 256
    ffn_dim: int = 2048
    num_layers: int = 12
    num_heads: int = 4
    dropout: float = 0.1
    attn_dropout: float = 0.1
    depthwise_kernel_size: int = 31
    conv_channels: int = 1024
    conv_kernel_sizes: Tuple[int, ...] = (5, 5)
    input_feat_dim: int = 80
    no_scale_embedding: bool = False
    fused_attention: bool = False   # Pallas fused kernel (TPU only)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, fbank: jnp.ndarray, lengths: jnp.ndarray, train: bool = False
    ):
        x, out_lengths = Conv1dSubsampler(
            self.conv_channels, self.embed_dim, self.conv_kernel_sizes,
            dtype=self.dtype, name="subsample",
        )(fbank, lengths)
        T = x.shape[1]
        pad_mask = jnp.arange(T)[None, :] >= out_lengths[:, None]

        scale = 1.0 if self.no_scale_embedding else math.sqrt(self.embed_dim)
        x = x * scale
        x = nn.Dense(self.embed_dim, dtype=self.dtype, name="linear")(x)
        x = Dropout(self.dropout, deterministic=not train)(x)

        for i in range(self.num_layers):
            x = ConformerEncoderLayer(
                self.embed_dim, self.ffn_dim, self.num_heads, self.dropout,
                self.depthwise_kernel_size, self.attn_dropout,
                fused_attention=self.fused_attention,
                dtype=self.dtype, name=f"layers_{i}",
            )(x, pad_mask, train=train)

        # zero out padded frames so downstream cross-attention averages and
        # matmuls cannot leak padding garbage
        x = jnp.where(pad_mask[:, :, None], 0.0, x)
        return x, pad_mask, out_lengths
