"""Tasks: dataset/vocab setup, noise injection, train/valid glue, generator
construction.

Rebuild of ``DASpeech/tasks/nat_speech_to_text.py`` and
``nat_speech_to_speech.py`` on top of the functional train/decode modules.
A task owns the host-side state (dictionary, datasets, bucket specs) while
all device computation lives in jitted pure functions.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any, Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from daspeech_tpu.core.config import (
    DAGModelConfig,
    DecodeConfig,
    S2SModelConfig,
    TrainingConfig,
    VocabConfig,
)
from daspeech_tpu.core.registry import register_task
from daspeech_tpu.data import (
    BucketBatcher,
    Dictionary,
    NATSpeechToSpeechDataset,
    NATSpeechToTextDataset,
    load_tsv,
    make_buckets,
)
from daspeech_tpu.decode.generator import S2SNATGenerator, S2TNATGenerator


def inject_noise(
    rng: np.random.Generator,
    target: np.ndarray,          # [B, T] padded targets
    vocab: VocabConfig,
    noise: str = "full_mask",
) -> np.ndarray:
    """``inject_noise`` (``nat_speech_to_text.py:138-219``): build the
    corrupted ``prev_target`` for CMLM-style NAT models. The DAG criterion
    builds its own graph input, but the task keeps the full noise API.
    """
    t = target.copy()
    special = (t == vocab.pad) | (t == vocab.bos) | (t == vocab.eos)

    if noise == "full_mask":
        t = np.where(special, t, vocab.unk)
    elif noise == "random_mask":
        u = rng.uniform(size=t.shape)
        ratio = rng.uniform(size=(t.shape[0], 1))
        t = np.where(~special & (u < ratio), vocab.unk, t)
    elif noise == "random_delete":
        out = np.full_like(t, vocab.pad)
        for b in range(t.shape[0]):
            toks = t[b][t[b] != vocab.pad]
            inner = toks[1:-1]
            keep = rng.uniform(size=len(inner)) >= rng.uniform()
            kept = np.concatenate([toks[:1], inner[keep], toks[-1:]])
            out[b, : len(kept)] = kept
        t = out
    elif noise == "no_noise":
        pass
    else:
        raise ValueError(f"unknown noise {noise!r}")
    return t


@dataclasses.dataclass
class TaskConfig:
    data_dir: str = ""
    vocab_filename: str = "vocab.txt"
    config_yaml: str = "config.yaml"   # per-dataset data config (data_cfg.py)
    noise: str = "full_mask"
    max_source_positions: int = 6000
    max_target_positions: int = 1024
    max_target_audio_positions: int = 1200
    max_tokens: int = 40000
    num_buckets: int = 8


class NATSpeechToTextTask:
    """``nat_speech_to_text`` (``DASpeech/tasks/nat_speech_to_text.py``)."""

    dataset_cls = NATSpeechToTextDataset
    for_s2s = False

    def __init__(self, cfg: TaskConfig, tgt_dict: Dictionary, data_cfg=None):
        self.cfg = cfg
        self.tgt_dict = tgt_dict
        self.data_cfg = data_cfg     # S2TDataConfig from config.yaml, or None
        self.datasets: Dict[str, Any] = {}

    @classmethod
    def setup_task(cls, cfg: TaskConfig) -> "NATSpeechToTextTask":
        from daspeech_tpu.data.data_cfg import S2SDataConfig, S2TDataConfig

        data_cfg = None
        yaml_path = Path(cfg.data_dir) / cfg.config_yaml
        if yaml_path.is_file():
            cfg_cls = S2SDataConfig if cls.for_s2s else S2TDataConfig
            data_cfg = cfg_cls(yaml_path)
        vocab_name = (data_cfg.vocab_filename if data_cfg is not None
                      else cfg.vocab_filename)
        vocab_path = Path(cfg.data_dir) / vocab_name
        if not vocab_path.is_file():
            vocab_path = Path(cfg.data_dir) / cfg.vocab_filename
        tgt_dict = Dictionary.load(vocab_path)
        return cls(cfg, tgt_dict, data_cfg=data_cfg)

    @property
    def vocab(self) -> VocabConfig:
        d = self.tgt_dict
        return VocabConfig(size=len(d), bos=d.bos(), pad=d.pad(),
                           eos=d.eos(), unk=d.unk())

    def load_dataset(self, split: str, transforms=None,
                     upsample_scale: float = 0.5):
        """``transforms=None`` resolves the split's feature transforms from
        config.yaml (SpecAugment+CMVN on ``_train`` splits, CMVN on eval —
        ``data_cfg.py:155-166``); pass an explicit Compose to override."""
        if transforms is None and self.data_cfg is not None:
            transforms = self.data_cfg.get_feature_transforms(
                split, is_train=split.startswith("train"))
        rows = load_tsv(Path(self.cfg.data_dir) / f"{split}.tsv")
        self.datasets[split] = self.dataset_cls(
            rows, self.tgt_dict, transforms=transforms,
            upsample_scale=upsample_scale)
        return self.datasets[split]

    def get_batch_iterator(self, split: str, max_tokens: Optional[int] = None,
                           seed: int = 1, upsample_scale: float = 0.5,
                           num_buckets: Optional[int] = None):
        ds = self.datasets[split]
        keep = ds.filter_indices(self.cfg.max_source_positions,
                                 self.cfg.max_target_positions)
        lengths = [ds.n_frames(i) for i in keep]
        tgt_cap = min(self.cfg.max_target_positions,
                      max(ds.tgt_len(i) for i in keep) if keep else 8)
        specs = make_buckets(
            lengths, max_tokens or self.cfg.max_tokens,
            num_buckets=num_buckets or self.cfg.num_buckets,
            upsample_scale=upsample_scale, tgt_cap=tgt_cap,
            mel_per_src=(1.0 if self.for_s2s else 0.0))
        return BucketBatcher(ds, keep, specs, seed=seed, vocab=self.vocab,
                             upsample_scale=upsample_scale,
                             max_graph=self.cfg.max_target_positions,
                             for_s2s=self.for_s2s)

    def build_generator(self, model, decode_cfg: DecodeConfig,
                        reranker=None, reranker_params=None):
        return S2TNATGenerator(model, self.vocab, decode_cfg,
                               reranker=reranker,
                               reranker_params=reranker_params)

    def inject_noise(self, rng, target):
        return inject_noise(rng, target, self.vocab, self.cfg.noise)


class NATSpeechToSpeechTask(NATSpeechToTextTask):
    """``nat_speech_to_speech`` (``DASpeech/tasks/nat_speech_to_speech.py``);
    S2S dataset rows add mel/duration/pitch/energy, size checks use the
    3-tuple (src, tgt, tgt_audio) max positions (``:279-280``)."""

    dataset_cls = NATSpeechToSpeechDataset
    for_s2s = True

    def build_generator(self, model, decode_cfg: DecodeConfig,
                        max_mel_len: int = 1024, vocoder=None,
                        vocoder_params=None, gcmvn=None,
                        reranker=None, reranker_params=None):
        return S2SNATGenerator(
            model, self.vocab, decode_cfg, max_mel_len=max_mel_len,
            vocoder=vocoder, vocoder_params=vocoder_params, gcmvn=gcmvn,
            reranker=reranker, reranker_params=reranker_params)


class TextToSpeechTask(NATSpeechToTextTask):
    """``text_to_speech`` (``fairseq/fairseq/tasks/text_to_speech.py``) —
    FastSpeech2 pretraining: phoneme tokens -> mel with teacher-forced
    duration/pitch/energy (recipe stage 2, ``README.md:262-283``)."""

    for_s2s = False

    def load_dataset(self, split: str, transforms=None, **kw):
        from daspeech_tpu.data.datasets import TextToSpeechDataset

        rows = load_tsv(Path(self.cfg.data_dir) / f"{split}.tsv")
        self.datasets[split] = TextToSpeechDataset(
            rows, self.tgt_dict, speaker_to_id=self.speaker_to_id())
        return self.datasets[split]

    def speaker_to_id(self):
        """Speaker table from the data config's ``speaker_set_filename``
        (one name per line — ``text_to_speech.py:71-95``); None when the
        config is single-speaker."""
        path = (self.data_cfg.speaker_set_filename
                if self.data_cfg is not None else None)
        if not path:
            return None
        with open(path) as f:
            names = [ln.strip() for ln in f if ln.strip()]
        return {name: i for i, name in enumerate(names)}

    def get_batch_iterator(self, split: str, max_sentences: int = 64,
                           seed: int = 1, **kw):
        from daspeech_tpu.data.datasets import collate_tts, round_up

        ds = self.datasets[split]
        tok_cap = round_up(max(ds.tgt_len(i) for i in range(len(ds))), 8)
        mel_cap = round_up(max(ds.n_frames(i) for i in range(len(ds))), 64)
        vocab = self.vocab

        class _It:
            dataset = ds

            def batches_for_epoch(self, epoch):
                rng = np.random.default_rng(seed + epoch)
                order = rng.permutation(len(ds))
                return [(None, [int(i) for i in order[k:k + max_sentences]])
                        for k in range(0, len(order), max_sentences)]

            def collate(self, spec, idxs):
                return collate_tts([ds[i] for i in idxs], vocab.pad,
                                   tok_cap, mel_cap, max_sentences)

            def __iter__(self):
                for spec, idxs in self.batches_for_epoch(0):
                    yield self.collate(spec, idxs)

        return _It()


register_task("nat_speech_to_text")(NATSpeechToTextTask)
register_task("nat_speech_to_speech")(NATSpeechToSpeechTask)
register_task("text_to_speech")(TextToSpeechTask)
