"""Per-utterance feature transforms (host-side numpy, composable).

Rebuild of ``fairseq/fairseq/data/audio/feature_transforms/``:
utterance-CMVN (``utterance_cmvn.py``), global-CMVN (``global_cmvn.py``),
SpecAugment (``specaugment.py`` — freq/time masking; the optional cv2
time-warp is omitted as the recipe never enables it: LB/LD/SM/SS policies
all use W but warp requires cv2 at runtime; masking dominates the effect).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np


class UtteranceCMVN:
    """Per-utterance mean/variance normalization."""

    def __init__(self, norm_means: bool = True, norm_vars: bool = True):
        self.norm_means, self.norm_vars = norm_means, norm_vars

    def __call__(self, x: np.ndarray) -> np.ndarray:
        mean = x.mean(axis=0)
        square_sums = (x ** 2).sum(axis=0)
        if self.norm_means:
            x = np.subtract(x, mean)
        if self.norm_vars:
            var = square_sums / x.shape[0] - mean ** 2
            std = np.sqrt(np.maximum(var, 1e-10))
            x = np.divide(x, std)
        return x.astype(np.float32)


class GlobalCMVN:
    """Normalization by precomputed corpus statistics
    (``gcmvn_stats.npz`` with 'mean' and 'std')."""

    def __init__(self, stats_npz_path: Optional[str] = None,
                 mean: Optional[np.ndarray] = None,
                 std: Optional[np.ndarray] = None):
        if stats_npz_path is not None:
            stats = np.load(stats_npz_path)
            mean, std = stats["mean"], stats["std"]
        self.mean = np.asarray(mean, dtype=np.float32)
        self.std = np.asarray(std, dtype=np.float32)

    def __call__(self, x: np.ndarray) -> np.ndarray:
        return ((x - self.mean) / self.std).astype(np.float32)

    def denormalize(self, x: np.ndarray) -> np.ndarray:
        """gcmvn_denormalize for generated mels
        (``fairseq/fairseq/speech_generator.py``)."""
        return (x * self.std + self.mean).astype(np.float32)


class SpecAugment:
    """Frequency & time masking (policy defaults = LD,
    ``specaugment.py:14-96``)."""

    def __init__(
        self,
        freq_mask_n: int = 2,
        freq_mask_f: int = 27,
        time_mask_n: int = 2,
        time_mask_t: int = 100,
        time_mask_p: float = 1.0,
        rng: Optional[np.random.Generator] = None,
    ):
        self.freq_mask_n, self.freq_mask_f = freq_mask_n, freq_mask_f
        self.time_mask_n, self.time_mask_t = time_mask_n, time_mask_t
        self.time_mask_p = time_mask_p
        self.rng = rng or np.random.default_rng()

    def __call__(self, x: np.ndarray) -> np.ndarray:
        x = x.copy()
        T, F = x.shape
        fill = x.mean()
        for _ in range(self.freq_mask_n):
            f = self.rng.integers(0, self.freq_mask_f + 1)
            if f and f < F:
                f0 = self.rng.integers(0, F - f)
                x[:, f0:f0 + f] = fill
        max_t = min(self.time_mask_t, int(self.time_mask_p * T))
        for _ in range(self.time_mask_n):
            t = self.rng.integers(0, max_t + 1) if max_t > 0 else 0
            if t and t < T:
                t0 = self.rng.integers(0, T - t)
                x[t0:t0 + t, :] = fill
        return x


class Compose:
    def __init__(self, transforms: Sequence):
        self.transforms = [t for t in transforms if t is not None]

    def __call__(self, x: np.ndarray) -> np.ndarray:
        for t in self.transforms:
            x = t(x)
        return x
