"""ctypes bindings for the native host-side data engine
(``native/daspeech_native.cpp``), with pure-numpy fallbacks.

The shared library is built on first use with g++ (mirroring the
reference's JIT ``torch.utils.cpp_extension.load`` pattern,
``DASpeech/custom_ops/dag_loss.py:37-64``); if no compiler is available the
numpy implementations are used transparently.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import List, Optional, Sequence

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_SO_PATH = _NATIVE_DIR / "libdaspeech_native.so"
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    src = _NATIVE_DIR / "daspeech_native.cpp"
    try:
        if (not _SO_PATH.exists()
                or _SO_PATH.stat().st_mtime < src.stat().st_mtime):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", str(src),
                 "-o", str(_SO_PATH)],
                check=True, capture_output=True, timeout=120)
        lib = ctypes.CDLL(str(_SO_PATH))
        lib.batch_by_size.restype = ctypes.c_int64
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def native_available() -> bool:
    return _load() is not None


def batch_by_size(
    indices: np.ndarray,
    num_tokens: np.ndarray,
    max_tokens: int = 0,
    max_sentences: int = 0,
    bsz_mult: int = 1,
) -> List[np.ndarray]:
    """fairseq-style token-budget batching (``data_utils_fast.pyx``):
    ``num_tokens`` is indexed by sample id; ``indices`` gives the
    (typically length-sorted) visit order. Returns a list of index arrays.
    """
    indices = np.ascontiguousarray(indices, dtype=np.int64)
    num_tokens = np.ascontiguousarray(num_tokens, dtype=np.int64)
    n = len(indices)
    if n == 0:
        return []
    lib = _load()
    if lib is not None:
        out = np.empty(n, dtype=np.int64)
        n_batches = lib.batch_by_size(
            indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            num_tokens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            ctypes.c_int64(n), ctypes.c_int64(max_tokens),
            ctypes.c_int64(max_sentences), ctypes.c_int64(max(bsz_mult, 1)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        return [indices[out == b] for b in range(n_batches)]
    return _batch_by_size_py(indices, num_tokens, max_tokens,
                             max_sentences, max(bsz_mult, 1))


def _batch_by_size_py(indices, num_tokens, max_tokens, max_sentences,
                      bsz_mult):
    batches: List[np.ndarray] = []
    start = 0
    max_len = 0
    i = 0
    n = len(indices)
    while i < n:
        tok = int(num_tokens[indices[i]])
        cand_max = max(max_len, tok)
        count = i - start + 1
        full = ((max_sentences and count > max_sentences)
                or (max_tokens and count * cand_max > max_tokens))
        if full and count > 1:
            size = i - start
            mod = size % bsz_mult
            keep = size - mod if (size > bsz_mult and mod) else size
            keep = keep or size
            batches.append(np.asarray(indices[start:start + keep]))
            start += keep
            max_len = max((int(num_tokens[j])
                           for j in indices[start:i + 1]), default=0)
        else:
            max_len = cand_max
        i += 1
    if start < n:
        batches.append(np.asarray(indices[start:]))
    return batches


def pack_frames(mats: Sequence[np.ndarray], t_cap: int) -> np.ndarray:
    """Collate [Ti, F] float32 matrices into zero-padded [B, t_cap, F]."""
    B = len(mats)
    F = mats[0].shape[1]
    out = np.zeros((B, t_cap, F), dtype=np.float32)
    lib = _load()
    if lib is not None:
        flat = np.concatenate(
            [np.ascontiguousarray(m, dtype=np.float32).reshape(-1)
             for m in mats])
        offsets = np.zeros(B + 1, dtype=np.int64)
        np.cumsum([m.size for m in mats], out=offsets[1:])
        lib.pack_frames(
            flat.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            ctypes.c_int64(B), ctypes.c_int64(F), ctypes.c_int64(t_cap),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        return out
    for b, m in enumerate(mats):
        rows = min(len(m), t_cap)
        out[b, :rows] = m[:rows]
    return out


def pack_tokens(seqs: Sequence[np.ndarray], t_cap: int,
                pad_value: int) -> np.ndarray:
    """Collate int32 token sequences into pad-filled [B, t_cap]."""
    B = len(seqs)
    out = np.full((B, t_cap), pad_value, dtype=np.int32)
    lib = _load()
    if lib is not None:
        flat = np.concatenate(
            [np.ascontiguousarray(s, dtype=np.int32).reshape(-1)
             for s in seqs]) if B else np.zeros(0, np.int32)
        offsets = np.zeros(B + 1, dtype=np.int64)
        np.cumsum([len(s) for s in seqs], out=offsets[1:])
        lib.pack_tokens(
            flat.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            ctypes.c_int64(B), ctypes.c_int64(t_cap),
            ctypes.c_int32(pad_value),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        return out
    for b, s in enumerate(seqs):
        n = min(len(s), t_cap)
        out[b, :n] = s[:n]
    return out
