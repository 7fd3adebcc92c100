"""Banded <-> full transition-matrix conversions.

The reference stores transitions in a banded layout for its CUDA kernels
(``links[b, i, d] = log P(v_i -> v_{i+d+1})``, ``DASpeech/custom_ops/
dag_loss.py:89-91``) and converts to a full strictly-upper-triangular matrix
for the torch path (``DASpeech/models/s2t_conformer_dag.py:157-169``
``restore_valid_links``). The JAX ops operate on the full layout; these
helpers provide the banded views for the Pallas kernels and for parity tests.
"""

from __future__ import annotations

import jax.numpy as jnp


def band_to_full(links_band: jnp.ndarray) -> jnp.ndarray:
    """[B, L, W] banded -> [B, L, L] full (log space, -inf outside band).

    ``full[b, i, i + d + 1] = band[b, i, d]``.
    Mirrors ``restore_valid_links`` (``s2t_conformer_dag.py:157-169``).
    """
    B, L, W = links_band.shape
    i = jnp.arange(L)[:, None]
    d = jnp.arange(W)[None, :]
    tgt = i + d + 1                                   # [L, W]
    valid = tgt < L
    # full[b, i, j] = band[b, i, j - i - 1] where 0 <= j - i - 1 < W
    j = jnp.arange(L)[None, :]                        # [1, L]
    dd = j - jnp.arange(L)[:, None] - 1               # [L, L], d index
    in_band = (dd >= 0) & (dd < W)
    dd_c = jnp.where(in_band, dd, 0)
    gathered = jnp.take_along_axis(
        links_band, jnp.broadcast_to(dd_c[None], (B, L, L)), axis=2)
    return jnp.where(in_band[None], gathered, -jnp.inf)


def full_to_band(links_full: jnp.ndarray, width: int) -> jnp.ndarray:
    """[B, L, L] full -> [B, L, W] banded (``band[b,i,d] = full[b,i,i+d+1]``).

    Mirrors ``extract_valid_links`` (``s2t_conformer_dag.py:140-155``).
    """
    B, L, _ = links_full.shape
    W = min(width, L - 1)
    i = jnp.arange(L)[:, None]
    d = jnp.arange(W)[None, :]
    tgt = i + d + 1
    valid = tgt < L
    tgt_c = jnp.where(valid, tgt, 0)
    band = links_full[:, jnp.arange(L)[:, None], tgt_c]
    return jnp.where(valid[None], band, -jnp.inf)
