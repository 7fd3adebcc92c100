"""Multi-host initialization plumbing (``parallel/multihost.py``).

A real DCN rendezvous cannot run on this single-host harness; what CAN be
verified is exactly what the reference's own tests cover for its
distributed utils (mock-based, ``fairseq/tests/distributed/``):

- argument/env resolution and error paths of ``initialize_distributed``
  with ``jax.distributed.initialize`` mocked out,
- the shard-by-rank slice math against a mocked process topology,
- single-process degradation of the global-mesh / local-to-global batch
  path, run for real on the 8-device CPU mesh (each virtual device takes
  1/8 of the batch, values round-trip exactly).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from daspeech_tpu.parallel import multihost as mh


class TestInitializeResolution:
    def test_single_process_noop(self, monkeypatch):
        calls = []
        monkeypatch.setattr(jax.distributed, "initialize",
                            lambda **kw: calls.append(kw))
        for var in (mh.ENV_COORDINATOR, mh.ENV_NUM_PROCESSES,
                    mh.ENV_PROCESS_ID, "SLURM_JOB_ID",
                    "MEGASCALE_COORDINATOR_ADDRESS"):
            monkeypatch.delenv(var, raising=False)
        # a SINGLE-host TPU_WORKER_HOSTNAMES (this harness sets one) must
        # not trigger rendezvous either
        monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "localhost")
        assert mh.initialize_distributed() is False
        assert calls == []

    def test_explicit_args_forwarded(self, monkeypatch):
        calls = []
        monkeypatch.setattr(jax.distributed, "initialize",
                            lambda **kw: calls.append(kw))
        mh.initialize_distributed("10.0.0.1:1234", 4, 2,
                                  local_device_ids=[0])
        assert calls == [dict(coordinator_address="10.0.0.1:1234",
                              num_processes=4, process_id=2,
                              local_device_ids=[0])]

    def test_no_backend_query_before_initialize(self, monkeypatch):
        """Regression: querying jax.process_count()/jax.devices() BEFORE
        jax.distributed.initialize() initializes the XLA backend and makes
        the real rendezvous raise RuntimeError — the already-joined probe
        must be jax.distributed.is_initialized() only."""
        order = []
        monkeypatch.setattr(jax.distributed, "is_initialized",
                            lambda: order.append("probe") or False)
        monkeypatch.setattr(jax.distributed, "initialize",
                            lambda **kw: order.append("init"))

        def backend_touch(*a, **kw):
            if "init" not in order:
                raise AssertionError(
                    "backend query before jax.distributed.initialize()")
            return 1

        monkeypatch.setattr(jax, "process_count", backend_touch)
        monkeypatch.setattr(jax, "devices", backend_touch)
        mh.initialize_distributed("10.0.0.1:1234", 2, 0)
        assert order[: 2] == ["probe", "init"]

    def test_env_fallback(self, monkeypatch):
        calls = []
        monkeypatch.setattr(jax.distributed, "initialize",
                            lambda **kw: calls.append(kw))
        monkeypatch.setenv(mh.ENV_COORDINATOR, "head:9999")
        monkeypatch.setenv(mh.ENV_NUM_PROCESSES, "2")
        monkeypatch.setenv(mh.ENV_PROCESS_ID, "1")
        mh.initialize_distributed()
        assert calls and calls[0]["coordinator_address"] == "head:9999"
        assert calls[0]["num_processes"] == 2
        assert calls[0]["process_id"] == 1

    def test_cluster_autodetect(self, monkeypatch):
        calls = []
        monkeypatch.setattr(jax.distributed, "initialize",
                            lambda **kw: calls.append(kw))
        monkeypatch.delenv(mh.ENV_COORDINATOR, raising=False)
        monkeypatch.setenv("SLURM_JOB_ID", "12345")
        monkeypatch.setenv("SLURM_NTASKS", "4")
        mh.initialize_distributed()
        assert calls == [{}]          # bare initialize() -> autodetect

    def test_multiworker_tpu_hostnames_autodetect(self, monkeypatch):
        calls = []
        monkeypatch.setattr(jax.distributed, "initialize",
                            lambda **kw: calls.append(kw))
        monkeypatch.delenv("SLURM_JOB_ID", raising=False)
        monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "host0,host1,host2,host3")
        mh.initialize_distributed()
        assert calls == [{}]

    def test_incomplete_explicit_args_raise(self, monkeypatch):
        monkeypatch.setattr(jax.distributed, "initialize",
                            lambda **kw: None)
        with pytest.raises(ValueError):
            mh.initialize_distributed("head:1", None, None)


class TestShardByRank:
    def test_slices_partition_the_batch(self):
        got = [mh.process_batch_slice(32, pi, 4) for pi in range(4)]
        rows = np.arange(32)
        parts = [rows[s] for s in got]
        np.testing.assert_array_equal(np.concatenate(parts), rows)
        assert all(len(p) == 8 for p in parts)

    def test_uneven_batch_raises(self):
        with pytest.raises(ValueError):
            mh.process_batch_slice(30, 0, 4)

    def test_defaults_use_runtime_topology(self):
        # single-process runtime: the slice is the whole batch
        assert mh.process_batch_slice(16) == slice(0, 16)


class TestSingleProcessDegradation:
    def test_global_mesh_covers_all_devices(self):
        mesh = mh.global_data_mesh()
        assert mesh.devices.size == len(jax.devices()) == 8

    def test_local_to_global_roundtrip_on_8_device_mesh(self):
        mesh = mh.global_data_mesh()
        rng = np.random.default_rng(0)
        batch = {"x": rng.normal(size=(16, 5)).astype(np.float32),
                 "n": np.arange(16, dtype=np.int32)}
        out = mh.host_local_batch_to_global(batch, mesh)
        assert out["x"].sharding.spec == P("data")
        np.testing.assert_array_equal(np.asarray(out["x"]), batch["x"])
        np.testing.assert_array_equal(np.asarray(out["n"]), batch["n"])
        # each device holds exactly 1/8 of the leading axis
        shard_shapes = {s.data.shape for s in out["x"].addressable_shards}
        assert shard_shapes == {(2, 5)}

    def test_microbatch_axis_layout(self):
        """update_freq > 1 stacks microbatches on axis 0; sharding rides
        axis 1 (the real batch axis)."""
        mesh = mh.global_data_mesh()
        batch = {"x": np.zeros((2, 16, 3), np.float32)}
        out = mh.host_local_batch_to_global(batch, mesh, batch_dim=1)
        assert out["x"].sharding.spec == P(None, "data")

    def test_host_collectives_degrade(self):
        g = mh.all_gather_host(np.asarray([1.0, 2.0]))
        np.testing.assert_allclose(np.asarray(g).reshape(-1)[-2:],
                                   [1.0, 2.0])
        b = mh.broadcast_host(np.asarray(7))
        assert int(np.asarray(b)) == 7

    def test_shard_batches_single_process(self):
        assert list(mh.shard_batches(range(5))) == [0, 1, 2, 3, 4]

    def test_gather_objects_single_process(self):
        obj = {"hyps": ["a b", "c"], "n": 3}
        assert mh.all_gather_host_objects(obj) == [obj]


class TestShardedValidation:
    """Mocked-topology checks for the sharded-validation combination:
    the union of every process's round-robin share must equal the full
    set, and the gathered statistics must reproduce the single-process
    value (``fairseq/trainer.py:1442-1481`` fast-stat-sync analogue)."""

    def test_round_robin_partitions_exactly(self):
        batches = [f"b{i}" for i in range(11)]
        parts = [list(mh.shard_batches(batches, pi, 4)) for pi in range(4)]
        # disjoint, union == all, and balanced to within one batch
        flat = [b for p in parts for b in p]
        assert sorted(flat) == sorted(batches)
        assert len(flat) == len(set(flat))
        sizes = [len(p) for p in parts]
        assert max(sizes) - min(sizes) <= 1

    def test_gathered_loss_equals_single_process(self):
        rng = np.random.default_rng(0)
        losses = rng.normal(size=17)
        counts = rng.integers(1, 9, size=17)
        want = float((losses * counts).sum() / counts.sum())
        # each mocked process accumulates over its share, then "gathers"
        parts = []
        for pi in range(3):
            tot, n = 0.0, 0
            for i in mh.shard_batches(range(17), pi, 3):
                tot += float(losses[i]) * int(counts[i])
                n += int(counts[i])
            parts.append((tot, n))
        got = sum(t for t, _ in parts) / sum(c for _, c in parts)
        assert abs(got - want) < 1e-9

    def test_gather_objects_multi_process_payloads(self, monkeypatch):
        """Unequal pickle sizes across processes must round-trip (the
        padded-buffer scheme of the reference's all_gather_list)."""
        objs = [["short"], ["a much longer hypothesis string", "x"], []]
        monkeypatch.setattr(jax, "process_count", lambda: 3)

        state = {"i": 0}

        def fake_allgather(v):
            # first call: sizes; later: padded buffers
            if np.asarray(v).dtype == np.int64:
                import pickle
                state["bufs"] = [np.frombuffer(pickle.dumps(o), np.uint8)
                                 for o in objs]
                state["sizes"] = np.asarray(
                    [len(b) for b in state["bufs"]], np.int64)
                return state["sizes"]
            m = int(state["sizes"].max())
            out = np.zeros((3, m), np.uint8)
            for p, b in enumerate(state["bufs"]):
                out[p, : len(b)] = b
            return out

        from jax.experimental import multihost_utils
        monkeypatch.setattr(multihost_utils, "process_allgather",
                            fake_allgather)
        got = mh.all_gather_host_objects(objs[0])
        assert got == objs


class TestHeartbeatWatchdog:
    """Hung-rank detection (``distributed_timeout_wrapper.py:17-97``
    equivalent): fires after ``timeout`` seconds without a ping, never
    before the first ping (cold compiles), and never once stopped."""

    def _make(self, timeout):
        fired = []
        wd = mh.HeartbeatWatchdog(
            timeout, on_timeout=lambda pid, t: fired.append((pid, t)))
        return wd, fired

    def test_fires_without_progress(self):
        import time

        wd, fired = self._make(0.15)
        wd.ping()                      # arm
        time.sleep(0.6)
        assert fired, "watchdog did not fire after timeout"
        wd.stop()

    def test_pings_keep_it_alive(self):
        import time

        wd, fired = self._make(0.4)
        for _ in range(6):
            wd.ping()
            time.sleep(0.1)
        assert not fired
        wd.stop()
        time.sleep(0.5)
        assert not fired, "fired after stop()"

    def test_unarmed_until_first_ping(self):
        import time

        wd, fired = self._make(0.1)
        time.sleep(0.4)                # cold-compile window: no pings yet
        assert not fired
        wd.stop()

    def test_disabled_when_nonpositive(self):
        wd, fired = self._make(-1)
        assert wd._thread is None
        wd.ping(); wd.stop()
        assert not fired
