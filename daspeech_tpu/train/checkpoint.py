"""Checkpointing: orbax save/load with keep-N pruning, best-metric tracking,
post-training parameter averaging, and component-wise loading.

Rebuild of ``fairseq/fairseq/checkpoint_utils.py`` +
``fairseq/scripts/average_checkpoints.py``: state includes model params,
batch stats, optimizer state, step, and the data-iterator epoch — restored
atomically by orbax instead of torch.save/load.
"""

from __future__ import annotations

import json
import shutil
from pathlib import Path
from typing import Any, Dict, List, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    """save/load with keep-last-N and best-metric policies
    (``CheckpointConfig``, ``fairseq/fairseq/dataclass/configs.py:643-781``)."""

    def __init__(self, directory, keep_last: int = 5,
                 maximize_best: bool = False):
        self.dir = Path(directory)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.keep_last = keep_last
        self.maximize_best = maximize_best
        self._ckptr = ocp.StandardCheckpointer()

    def _path(self, step: int) -> Path:
        return self.dir / f"checkpoint_{step}"

    def save(self, state, step: int, extra: Optional[Dict[str, Any]] = None,
             metric: Optional[float] = None, blocking: bool = True) -> Path:
        """Save a checkpoint.

        ``blocking=False`` returns as soon as the device arrays are copied
        to host; serialization to disk proceeds on orbax's background
        thread (the reference saves asynchronously via iopath,
        ``fairseq/fairseq_cli/train.py:76-84``). The step loop then only
        stalls if a save is still in flight at the NEXT save point. Use
        ``blocking=True`` (default) for final/crash saves that must be
        durable before the process exits.
        """
        path = self._path(step)
        # one write in flight at a time: block on the previous save first
        # (AsyncCheckpointer refuses overlapping saves)
        self._ckptr.wait_until_finished()
        if path.exists():
            shutil.rmtree(path)
        self._ckptr.save(path.resolve(), state)
        if blocking:
            self._ckptr.wait_until_finished()
        meta = {"step": step, "metric": metric, **(extra or {})}
        (self.dir / f"checkpoint_{step}.json").write_text(json.dumps(meta))
        self._prune()
        self._update_best(step, metric)
        return path

    def wait_until_finished(self):
        """Block until any in-flight async save has committed."""
        self._ckptr.wait_until_finished()

    def _prune(self):
        steps = self.all_steps()
        for s in steps[: max(0, len(steps) - self.keep_last)]:
            if self._best_step() == s:
                continue
            shutil.rmtree(self._path(s), ignore_errors=True)
            (self.dir / f"checkpoint_{s}.json").unlink(missing_ok=True)

    def _update_best(self, step: int, metric: Optional[float]):
        if metric is None:
            return
        best_file = self.dir / "best.json"
        best = (json.loads(best_file.read_text())
                if best_file.exists() else None)
        better = (best is None or
                  (metric > best["metric"] if self.maximize_best
                   else metric < best["metric"]))
        if better:
            best_file.write_text(json.dumps({"step": step, "metric": metric}))

    def _best_step(self) -> Optional[int]:
        best_file = self.dir / "best.json"
        if best_file.exists():
            return json.loads(best_file.read_text())["step"]
        return None

    def all_steps(self) -> List[int]:
        # only committed checkpoints: orbax writes async saves to a sibling
        # "checkpoint_N.orbax-checkpoint-tmp-<ts>" dir and renames on commit,
        # so non-integer suffixes (in-flight/abandoned tmp dirs) are skipped
        out = []
        for p in self.dir.glob("checkpoint_*"):
            suffix = p.name.split("_", 1)[1]
            if p.is_dir() and suffix.isdigit():
                out.append(int(suffix))
        return sorted(out)

    def latest_step(self) -> Optional[int]:
        steps = self.all_steps()
        return steps[-1] if steps else None

    def restore(self, state_like=None, step: Optional[int] = None):
        # an async save may still be committing — wait so latest_step() and
        # the restore itself see a complete checkpoint
        self._ckptr.wait_until_finished()
        step = step if step is not None else self.latest_step()
        if step is None:
            return None
        path = self._path(step).resolve()
        if state_like is None:
            return self._ckptr.restore(path)
        return self._ckptr.restore(path, state_like)


def average_checkpoints(manager: CheckpointManager, state_like,
                        last_n: int = 5, max_step: Optional[int] = None):
    """Average model params of the last-N checkpoints
    (``fairseq/scripts/average_checkpoints.py:17-98``)."""
    steps = [s for s in manager.all_steps()
             if max_step is None or s <= max_step][-last_n:]
    if not steps:
        raise ValueError("no checkpoints to average")
    acc = None
    for s in steps:
        st = manager.restore(state_like, step=s)
        params = st.params if hasattr(st, "params") else st["params"]
        if acc is None:
            acc = jax.tree.map(lambda x: np.asarray(x, np.float64), params)
        else:
            acc = jax.tree.map(lambda a, x: a + np.asarray(x, np.float64),
                               acc, params)
    n = len(steps)
    return jax.tree.map(lambda a: (a / n).astype(np.float32), acc)


def load_pretrained_component(target_params: Dict, source_params: Dict,
                              component: str) -> Dict:
    """Copy a sub-tree (e.g. 'encoder', 'tts') from a source param tree into
    the target (``checkpoint_utils.load_pretrained_component_from_model``)."""
    out = dict(target_params)
    if component not in source_params:
        raise KeyError(f"{component!r} not in source checkpoint")
    out[component] = source_params[component]
    return out


def transfer_dag_params(target_params: Dict, source_params: Dict,
                        reset_vocab: bool = False) -> Dict:
    """Load a pretrained DA-Transformer into an S2S (or fresh S2T) model
    (``--load-pretrained-dag-from``, ``s2s_conformer_dag_fastspeech2.py:66-70``).

    With ``reset_vocab`` the decoder token embedding (and, when untied, the
    output projection) keep the target model's fresh values — the two-stage
    multilingual pretraining's vocabulary swap
    (``s2t_conformer_dag.py:94-99``, ``README.md:325-331``).
    """
    import copy

    src = copy.deepcopy(source_params)
    if "dag" in src:                     # source is an S2S tree
        src = src["dag"]
    tgt_sub = target_params["dag"] if "dag" in target_params else target_params
    if reset_vocab and "decoder" in src and "decoder" in tgt_sub:
        for name in ("embed_tokens", "output_projection"):
            if name in src["decoder"] and name in tgt_sub["decoder"]:
                src["decoder"][name] = tgt_sub["decoder"][name]
    new_sub = dict(tgt_sub)
    for key in ("encoder", "enc_proj", "decoder"):
        if key in src:
            new_sub[key] = src[key]
    out = dict(target_params)
    if "dag" in target_params:
        out["dag"] = new_sub
        return out
    return new_sub


def transfer_tts_params(target_params: Dict, source_params: Dict) -> Dict:
    """Load pretrained FastSpeech2 params into the S2S model's ``tts``
    sub-tree (``--load-pretrained-fastspeech-from``,
    ``s2s_conformer_dag_fastspeech2.py:79-83``). ``source_params`` is the
    param tree of a standalone FastSpeech2Encoder; embed_tokens (absent in
    the NoEmb consumer) is dropped."""
    import copy

    tts = copy.deepcopy(source_params)
    tts.pop("embed_tokens", None)
    out = dict(target_params)
    out["tts"] = tts
    return out
