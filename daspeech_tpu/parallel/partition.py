"""Multi-axis (data x sequence x tensor) GSPMD partitioning.

The reference ships megatron-style tensor-parallel plumbing it never uses on
the DASpeech path (``fairseq/fairseq/distributed/utils.py:506-525``) and does
all scaling with bucketed-NCCL data parallelism. The TPU-native design goes
further with zero runtime machinery: parameters carry Megatron partition
specs (column-parallel fc1/qkv, row-parallel fc2/out-proj, vocab-sharded
embedding — exactly the TP layout SURVEY.md section 2d prescribes for the
vocab projection / logsoftmax_gather), the batch is split over ``data`` and
the encoder's frame axis over ``seq``, and XLA GSPMD inserts every collective
(psum over ICI for grads and row-parallel matmuls, all-gather for the
sequence axis at attention) from those annotations alone. One jit replaces
LegacyDistributedDataParallel + process groups + fast-stat-sync.

Sharding annotations never change semantics — a step jitted over any mesh
computes the same numbers (up to float reassociation) as a single device,
which is what ``tests/test_parallel.py`` asserts on the 8-device CPU mesh.

ZeRO/FSDP is one more annotation: ``fsdp_partition_spec`` shards each large
parameter (and, via suffix matching, its Adam moments) over the data axis,
and GSPMD emits the per-layer all-gather + grad reduce-scatter that fairseq's
``fully_sharded_data_parallel.py:23-130`` implements with fairscale wrapper
modules and flattened buffers. It composes with the Megatron rules: a TP
leaf gets its remaining dim ZeRO-sharded.

No pipeline/expert axes: the reference uses neither on this path (its
torchpipe/MoE code is dead on DASpeech — SURVEY.md section 2d), the models
are far too small to need PP (<100M params fits one v5e chip dozens of times
over), and there is no MoE layer anywhere in the family.
"""

from __future__ import annotations

import contextlib
import re
import threading
from typing import Optional, Sequence, Tuple

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# one batch-sharding implementation, shared with the DP-only path
from daspeech_tpu.train.step import shard_batch_specs

# ---------------------------------------------------------------------------
# Activation sharding hints.
#
# GSPMD propagates shardings op-to-op; where propagation picks conflicting
# layouts it falls back to "involuntary full rematerialization"
# (replicate-then-repartition). The encoder's depthwise conv is the one op
# in the family that trips this under a data x seq x model mesh (the conv
# inherits a channel sharding from the pointwise projections while its
# neighbors are batch/time sharded). Modules pin such activations with
# :func:`constrain_btc`; the hints are installed by jit_sharded /
# jit_sharded_infer DURING TRACING (the context manager wraps the traced
# body), and the call is a no-op anywhere else — single-device jits, tests,
# and CPU runs never see a constraint.

_hints = threading.local()


@contextlib.contextmanager
def activation_hints(mesh: Mesh, data_axis: Optional[str],
                     seq_axis: Optional[str], model_axis: Optional[str]):
    prev = getattr(_hints, "cur", None)
    _hints.cur = (mesh, data_axis, seq_axis, model_axis)
    try:
        yield
    finally:
        _hints.cur = prev


def constrain_btc(x: jax.Array, channels_model: bool = False) -> jax.Array:
    """Constrain a [batch, time, channel] activation to the hinted mesh:
    batch over ``data``, time over ``seq``, channels over ``model`` only if
    ``channels_model`` (else replicated). Dims that don't divide their
    axis, missing axes, and runs with no hints installed are skipped."""
    cur = getattr(_hints, "cur", None)
    if cur is None or getattr(x, "ndim", 0) != 3:
        return x
    mesh, data_axis, seq_axis, model_axis = cur
    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))

    def ax(axis, dim):
        if axis is None or sizes.get(axis, 1) <= 1:
            return None
        return axis if x.shape[dim] % sizes[axis] == 0 else None

    spec = P(ax(data_axis, 0), ax(seq_axis, 1),
             ax(model_axis if channels_model else None, 2))
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, spec))


# (path regex, rank, spec builder) — first match wins. The path is the
# "/"-joined flax param path INCLUDING the optimizer-state prefix (optax
# mu/nu trees repeat the param subtree, so suffix matching covers them too).
def _rules(model_axis: str):
    m = model_axis
    return [
        # Column-parallel up-projections: FFN fc1 / macaron w_1, the
        # adaptor's fc1 (s2s_conformer_dag_fastspeech2.py:24-39), and fused
        # qkv inputs. Output dim sharded; bias lives on the sharded dim.
        (re.compile(r"(fc1|w_1)/kernel$"), 2, P(None, m)),
        (re.compile(r"(fc1|w_1)/bias$"), 1, P(m)),
        # Row-parallel down-projections: XLA inserts the psum.
        (re.compile(r"(fc2|w_2)/kernel$"), 2, P(m, None)),
        # Attention: head-sharded q/k/v (column) + row-parallel out.
        (re.compile(r"(q_proj|k_proj|v_proj|linear_q|linear_k|linear_v|"
                    r"linear_pos)/kernel$"), 2, P(None, m)),
        (re.compile(r"(q_proj|k_proj|v_proj|linear_q|linear_k|linear_v)"
                    r"/bias$"), 1, P(m)),
        (re.compile(r"(out_proj|linear_out)/kernel$"), 2, P(m, None)),
        # Rel-pos biases are per-head [H, dk]; heads follow the q/k shards.
        (re.compile(r"pos_bias_[uv]$"), 2, P(m, None)),
        # Vocab-sharded embedding => tied output projection emits
        # vocab-sharded logits and the streaming logsoftmax_gather's
        # logsumexp reduces over `model` (SURVEY.md section 2d's "TP of the
        # vocab projection").
        (re.compile(r"embed_tokens/embedding$"), 2, P(m, None)),
    ]


def param_partition_spec(path: str, leaf, model_axis: str = "model",
                         mesh: Optional[Mesh] = None) -> P:
    """PartitionSpec for one parameter, by path suffix + rank.

    Anything unmatched (norms, conv modules, positional tables, variance
    predictors, HiFi-GAN convs) stays replicated — they are tiny next to
    the matmuls. When ``mesh`` is given, a rule only applies if every
    sharded dim divides evenly; otherwise the leaf falls back to
    replication (keeps tiny test models and odd vocab sizes valid).
    """
    for rx, rank, spec in _rules(model_axis):
        if rx.search(path) and getattr(leaf, "ndim", None) == rank:
            if mesh is not None:
                size = dict(zip(mesh.axis_names, mesh.devices.shape)).get(
                    model_axis, 1)
                ok = all(ax is None or leaf.shape[d] % size == 0
                         for d, ax in enumerate(spec))
                if not ok:
                    return P()
            return spec
    return P()


def fsdp_partition_spec(leaf, base: P, fsdp_axis: str, mesh: Mesh,
                        min_size: int = 2 ** 12) -> P:
    """ZeRO-style augmentation of a (possibly tensor-parallel) spec.

    Shards the largest still-unsharded dim of ``leaf`` over ``fsdp_axis``
    when it divides evenly, so parameters AND their optax mu/nu moments live
    split across the data axis — the reference's selectable
    ``--ddp-backend=fully_sharded`` (fairseq
    ``distributed/fully_sharded_data_parallel.py:23-130``, fairscale ZeRO-3)
    expressed as annotations only: XLA GSPMD inserts the per-layer
    all-gather on use and reduce-scatters the grads, replacing FSDP's
    wrapper modules, flattened buffers, and hand-rolled collectives.

    Leaves smaller than ``min_size`` elements stay as-is (fairseq's
    ``--min-params-to-wrap`` cutoff): gathering a bias costs more latency
    than replicating it ever saves.
    """
    ndim = getattr(leaf, "ndim", 0)
    shape = getattr(leaf, "shape", ())
    if ndim == 0 or int(np.prod(shape)) < min_size:
        return base
    size = dict(zip(mesh.axis_names, mesh.devices.shape)).get(fsdp_axis, 1)
    if size <= 1:
        return base
    dims = list(tuple(base) + (None,) * (ndim - len(tuple(base))))
    free = [d for d in range(ndim)
            if dims[d] is None and shape[d] % size == 0]
    if ndim >= 3:
        # rank-3+ leaves are convolution kernels [k, c_in, c_out]: sharding
        # a feature dim makes GSPMD compute the conv feature-sharded and
        # then pay an involuntary full rematerialization back to the
        # batch/time-sharded activation layout (observed on the encoder's
        # depthwise conv under dp x seq x tp). Only the tap dim may shard;
        # otherwise the (small) conv kernel stays replicated.
        free = [d for d in free if d == 0]
    if not free:
        return base
    dims[max(free, key=lambda d: shape[d])] = fsdp_axis
    return P(*dims)


def tree_shardings(tree, mesh: Mesh, model_axis: str = "model",
                   fsdp_axis: Optional[str] = None,
                   min_fsdp_size: int = 2 ** 12):
    """NamedShardings for a param-like pytree (params, grads, or the full
    TrainState whose optax mu/nu subtrees repeat the param paths).

    ``fsdp_axis`` additionally ZeRO-shards every large leaf over that mesh
    axis (usually ``"data"``) on top of the Megatron rules.
    """
    tp = model_axis in mesh.axis_names
    fsdp = fsdp_axis is not None and fsdp_axis in mesh.axis_names
    if not tp and not fsdp:
        return jax.tree.map(lambda _: NamedSharding(mesh, P()), tree)

    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    out = []
    for path, leaf in flat:
        p = "/".join(str(getattr(k, "key", getattr(k, "name", k)))
                     for k in path)
        spec = param_partition_spec(p, leaf, model_axis, mesh) if tp else P()
        if fsdp:
            spec = fsdp_partition_spec(leaf, spec, fsdp_axis, mesh,
                                       min_fsdp_size)
        out.append(NamedSharding(mesh, spec))
    return jax.tree_util.tree_unflatten(treedef, out)


def state_shardings(state, mesh: Mesh, model_axis: str = "model",
                    fsdp_axis: Optional[str] = None,
                    min_fsdp_size: int = 2 ** 12):
    """Shardings for a TrainState: step replicated, params/opt-state by the
    partition rules (suffix matching reaches through mu/nu wrappers)."""
    return tree_shardings(state, mesh, model_axis, fsdp_axis, min_fsdp_size)


def make_mesh(n_devices: int,
              axes: Sequence[Tuple[str, int]] = (("data", -1),),
              devices=None) -> Mesh:
    """Build a Mesh over the first ``n_devices`` jax devices.

    ``axes`` is ((name, size), ...) with at most one -1 wildcard, e.g.
    (("data", -1), ("seq", 2), ("model", 2)) on 8 devices -> data=2.
    """
    devs = list(devices if devices is not None else jax.devices())[:n_devices]
    names = [a for a, _ in axes]
    sizes = [s for _, s in axes]
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1]))
        sizes[sizes.index(-1)] = max(1, n_devices // known)
    total = int(np.prod(sizes))
    if total != len(devs):
        raise ValueError(f"mesh {dict(zip(names, sizes))} needs {total} "
                         f"devices, have {len(devs)}")
    return Mesh(np.array(devs).reshape(sizes), tuple(names))


def jit_sharded_infer(fn, mesh: Mesh, params, data_axis: str = "data",
                      model_axis: str = "model"):
    """jit an inference fn ``(params, batch_pytree) -> outputs`` over a
    data x model mesh: params tensor-parallel by the Megatron rules, every
    batch leaf split on its leading dim, outputs replicated. The serving
    analogue of ``jit_sharded`` (multi-chip decode: TP shrinks per-chip
    weights and the link-predictor matmul; DP scales utterance throughput).
    Call as ``jitted(params, batch)``.
    """
    p_sh = tree_shardings(params, mesh, model_axis)
    replicated = NamedSharding(mesh, P())

    def wrapped(params, batch):
        def spec(v):
            dims = [None] * v.ndim
            if v.ndim and data_axis in mesh.axis_names:
                dims[0] = data_axis
            return NamedSharding(mesh, P(*dims))
        batch = jax.tree.map(
            lambda a: jax.lax.with_sharding_constraint(a, spec(a)), batch)
        with activation_hints(mesh, data_axis, None, model_axis):
            return fn(params, batch)

    return jax.jit(wrapped, in_shardings=(p_sh, None),
                   out_shardings=replicated)


def jit_sharded(step_fn, mesh: Mesh, state, data_axis: str = "data",
                seq_axis: Optional[str] = None,
                model_axis: str = "model", batch_dim: int = 0,
                donate: bool = True, fsdp_axis: Optional[str] = None,
                min_fsdp_size: int = 2 ** 12):
    """jit a ``(state, batch, rng) -> (state, metrics)`` step over a
    multi-axis mesh: TrainState sharded by the Megatron rules, batch split
    over ``data`` (+frames over ``seq``), metrics replicated. The pure-DP
    special case (mesh with only a data axis) degenerates to
    ``train.jit_data_parallel`` semantics; ``fsdp_axis="data"`` turns it
    into ZeRO-3 (params + Adam moments sharded over the data axis too).
    """
    st_sh = state_shardings(state, mesh, model_axis, fsdp_axis,
                            min_fsdp_size)
    replicated = NamedSharding(mesh, P())

    def wrapped(state, batch, rng):
        batch = jax.lax.with_sharding_constraint(
            batch, shard_batch_specs(batch, mesh, data_axis, batch_dim,
                                     seq_axis=seq_axis))
        with activation_hints(mesh, data_axis, seq_axis, model_axis):
            return step_fn(state, batch, rng)

    return jax.jit(
        wrapped,
        in_shardings=(st_sh, None, replicated),
        out_shardings=(st_sh, replicated),
        donate_argnums=(0,) if donate else (),
    )
