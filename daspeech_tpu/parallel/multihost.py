"""Multi-host (multi-process / multi-slice) training initialization.

Replaces the reference's rendezvous + pickled-collective layer
(``fairseq/fairseq/distributed/utils.py:87-157`` SLURM/env init,
``:273-347`` ``distributed_init``, ``:526-667`` ``all_gather_list``) with
the JAX runtime's native facilities:

- rendezvous: :func:`jax.distributed.initialize` (coordinator address +
  process count + process id, each from flags, env vars, or the cluster
  autodetect JAX ships for TPU pods/SLURM/GKE);
- per-process data feeding: each host loads ITS shard of the batch and
  :func:`host_local_batch_to_global` assembles the global ``jax.Array``
  from process-local shards (``jax.make_array_from_process_local_data``) —
  the moral equivalent of the reference's per-rank DataLoader shards
  (``EpochBatchIterator`` shard-by-rank, ``data/iterators.py``);
- host-side object exchange: :func:`all_gather_host` via
  ``jax.experimental.multihost_utils`` (SURVEY.md §2d maps
  ``all_gather_list`` -> ``multihost_utils``).

Single-process use is a no-op throughout: every function degrades to local
behavior when ``jax.process_count() == 1``, so the train CLI calls these
unconditionally. A real DCN rendezvous cannot run on this one-host harness;
the mesh/spec/shard logic is unit-tested with a mocked process topology
(``tests/test_multihost.py``) and the single-process degradation runs on
the 8-device CPU mesh.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ENV_COORDINATOR = "DASPEECH_COORDINATOR"
ENV_NUM_PROCESSES = "DASPEECH_NUM_PROCESSES"
ENV_PROCESS_ID = "DASPEECH_PROCESS_ID"


def initialize_distributed(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> bool:
    """Join the global runtime. Resolution order per field: explicit arg ->
    ``DASPEECH_*`` env var -> JAX cluster autodetect (TPU pod metadata,
    SLURM, GKE — ``jax.distributed.initialize()`` with no args).

    Returns True if a multi-process runtime was (or already is) up, False
    for the single-process fallback. Safe to call twice (second call is a
    no-op). The reference's equivalent is ``infer_init_method`` +
    ``distributed_init`` (``distributed/utils.py:46-180,273-347``).
    """
    coordinator = coordinator or os.environ.get(ENV_COORDINATOR)
    if num_processes is None and os.environ.get(ENV_NUM_PROCESSES):
        num_processes = int(os.environ[ENV_NUM_PROCESSES])
    if process_id is None and os.environ.get(ENV_PROCESS_ID):
        process_id = int(os.environ[ENV_PROCESS_ID])

    # NOTE: must not touch jax.process_count()/jax.devices() before
    # jax.distributed.initialize() — any backend query initializes XLA and
    # makes the later initialize() raise. is_initialized() is the one
    # runtime probe that is safe here.
    if jax.distributed.is_initialized():
        return jax.process_count() > 1   # runner already joined the mesh
    explicit = coordinator is not None
    autodetect = (not explicit and num_processes is None
                  and _cluster_env_present())
    if not explicit and not autodetect:
        if num_processes is not None or process_id is not None:
            # a partial topology spec silently falling back to N
            # independent single-process runs would be a data-parallel
            # correctness bug, not a convenience
            raise ValueError(
                "--num-processes/--process-id (or DASPEECH_NUM_PROCESSES/"
                "DASPEECH_PROCESS_ID) were given without --coordinator/"
                "DASPEECH_COORDINATOR — refusing to start a silent "
                "single-process run with a partial multi-host spec")
        return False              # plain single-process run
    if explicit and (num_processes is None or process_id is None):
        raise ValueError(
            "--coordinator requires --num-processes and --process-id "
            "(or their DASPEECH_* env vars)")
    kwargs = {}
    if explicit:
        kwargs = dict(coordinator_address=coordinator,
                      num_processes=num_processes, process_id=process_id)
        if local_device_ids is not None:
            kwargs["local_device_ids"] = list(local_device_ids)
    jax.distributed.initialize(**kwargs)
    return jax.process_count() > 1


def _cluster_env_present() -> bool:
    """True when a known cluster environment advertises a MULTI-worker
    topology JAX can autodetect (mirrors the reference's SLURM sniffing,
    ``distributed/utils.py:87-157``). Single-worker signals (e.g. a
    one-host ``TPU_WORKER_HOSTNAMES``) must NOT trigger rendezvous."""
    hostnames = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    if len([h for h in hostnames.split(",") if h.strip()]) > 1:
        return True
    if (os.environ.get("SLURM_JOB_ID")
            and int(os.environ.get("SLURM_NTASKS", "1") or 1) > 1):
        return True
    return "MEGASCALE_COORDINATOR_ADDRESS" in os.environ


def global_data_mesh(axis: str = "data",
                     devices: Optional[Sequence] = None) -> Mesh:
    """1-D mesh over ALL devices in the global runtime (every process sees
    every device in ``jax.devices()``); single-process it equals the local
    mesh the CLI built before."""
    devs = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devs.reshape(-1), (axis,))


def process_batch_slice(num_items: int,
                        process_index: Optional[int] = None,
                        process_count: Optional[int] = None) -> slice:
    """Which rows of the GLOBAL batch this process should load — the
    shard-by-rank contract of the reference's ``EpochBatchIterator``
    (contiguous block per process; ``num_items`` must divide evenly, which
    the fixed-shape bucket batcher guarantees by construction)."""
    pc = jax.process_count() if process_count is None else process_count
    pi = jax.process_index() if process_index is None else process_index
    if num_items % pc:
        raise ValueError(
            f"global batch of {num_items} does not divide over {pc} "
            f"processes — pick max_sentences as a multiple of {pc}")
    per = num_items // pc
    return slice(pi * per, (pi + 1) * per)


def host_local_batch_to_global(batch: Dict[str, np.ndarray], mesh: Mesh,
                               axis: str = "data", batch_dim: int = 0
                               ) -> Dict[str, jax.Array]:
    """Assemble global ``jax.Array``s from each process's local shard
    (``jax.make_array_from_process_local_data``). ``batch`` holds THIS
    process's rows only; the result behaves like the full global batch
    sharded over ``axis``. Single-process this is just device_put with a
    sharding."""
    out = {}
    for k, v in batch.items():
        v = np.asarray(v)
        spec = P(*([None] * batch_dim + [axis])) if v.ndim else P()
        sharding = NamedSharding(mesh, spec)
        out[k] = jax.make_array_from_process_local_data(sharding, v)
    return out


def all_gather_host(value):
    """Gather a (pytree of) host values from every process
    (``multihost_utils.process_allgather`` ≡ the reference's pickled
    ``all_gather_list``, ``distributed/utils.py:526-667``). Identity-like
    (adds a leading axis of size 1) in single-process runs."""
    from jax.experimental import multihost_utils

    return multihost_utils.process_allgather(value)


def shard_batches(batches, process_index: Optional[int] = None,
                  process_count: Optional[int] = None):
    """Round-robin an eval batch stream over processes: process ``i`` keeps
    batches ``i, i+pc, i+2pc, ...``. The validation analogue of the
    shard-by-rank train iterator (the reference shards validation the same
    way and combines with fast-stat-sync, ``fairseq/trainer.py:1442-1481``);
    single-process it yields everything."""
    pc = jax.process_count() if process_count is None else process_count
    pi = jax.process_index() if process_index is None else process_index
    for i, b in enumerate(batches):
        if i % pc == pi:
            yield b


def all_gather_host_objects(obj):
    """Gather one arbitrary picklable host object from every process;
    returns ``[obj_process0, obj_process1, ...]`` on all processes (the
    reference's ``all_gather_list``, ``distributed/utils.py:526-667``,
    which pickles into a padded byte tensor and all-gathers — same scheme
    here over ``process_allgather``). Single-process: ``[obj]``."""
    if jax.process_count() == 1:
        return [obj]
    import pickle

    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(obj), dtype=np.uint8)
    sizes = multihost_utils.process_allgather(
        np.asarray(len(payload), np.int64))
    buf = np.zeros(int(sizes.max()), np.uint8)
    buf[: len(payload)] = payload
    gathered = multihost_utils.process_allgather(buf)
    return [pickle.loads(gathered[p, : int(sizes[p])].tobytes())
            for p in range(gathered.shape[0])]


class HeartbeatWatchdog:
    """Kill the process if training makes no progress within ``timeout``
    seconds — the reference's ``DistributedTimeoutWrapper``
    (``fairseq/fairseq/distributed/distributed_timeout_wrapper.py:17-97``)
    without the nn.Module wrapping: the train loop calls :meth:`ping` after
    each step instead of routing ``forward`` through a wrapper. On a pod, a
    single wedged host stalls every collective on every chip with no error;
    dying loudly lets the cluster restart the job. The JAX runtime's own
    collective timeouts cover in-compiled-program hangs; this covers
    host-side hangs too (data loader, checkpoint I/O, rendezvous).

    ``timeout <= 0`` disables (the reference's convention). The timer only
    arms after the FIRST ping, so cold compiles don't trip it.
    ``on_timeout`` is injectable for tests; the default dumps all thread
    stacks to stderr and sends SIGINT to the process.
    """

    def __init__(self, timeout: float, on_timeout=None):
        import threading

        self.timeout = timeout
        self._on_timeout = on_timeout or self._default_on_timeout
        self._beat = threading.Event()
        self._stopped = False
        self._thread = None
        if timeout and timeout > 0:
            self._thread = threading.Thread(
                target=self._watch, args=(os.getpid(),), daemon=True)
            self._thread.start()

    def ping(self):
        self._beat.set()

    def stop(self):
        self._stopped = True
        self._beat.set()
        if self._thread is not None:
            self._thread.join(timeout=5)
            self._thread = None

    @staticmethod
    def _default_on_timeout(pid, timeout):
        import faulthandler
        import signal
        import sys

        print(f"[daspeech] heartbeat watchdog: no training progress in "
              f"{int(timeout)} s — dumping stacks and killing the process "
              f"(set --heartbeat-timeout -1 to disable)", file=sys.stderr,
              flush=True)
        faulthandler.dump_traceback(file=sys.stderr)
        os.kill(pid, signal.SIGINT)

    def _watch(self, pid):
        self._beat.wait()                 # arm on the first step only
        while True:
            if self._stopped:
                return
            self._beat.clear()
            alive = self._beat.wait(timeout=self.timeout)
            if self._stopped:
                return
            if not alive:
                self._on_timeout(pid, self.timeout)
                return


def broadcast_host(value):
    """Broadcast process 0's host value to all processes
    (``multihost_utils.broadcast_one_to_all`` ≡ ``distributed/utils.py``
    ``broadcast_object``). Identity in single-process runs."""
    from jax.experimental import multihost_utils

    return multihost_utils.broadcast_one_to_all(value)
