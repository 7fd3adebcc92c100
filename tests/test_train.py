"""Loss + training-step integration tests on tiny synthetic data, including
the 8-virtual-device data-parallel path (the reference cannot test its
distributed path without GPUs — SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from testutils import fast_init

from daspeech_tpu.core.config import VocabConfig
from daspeech_tpu.losses import nat_dag_loss
from daspeech_tpu.models import (
    S2TConformerDAG,
    graph_lengths,
    initialize_output_tokens,
)
from daspeech_tpu.train import (
    TrainState,
    anneal_value,
    inverse_sqrt_schedule,
    jit_data_parallel,
    make_optimizer,
    make_train_step,
    parse_anneal,
)
from test_models import tiny_dag_cfg

pytestmark = pytest.mark.slow


def make_batch(rng, cfg, B=2, S=33, L=16, T=6):
    fbank = jnp.asarray(rng.normal(size=(B, S, 80)).astype(np.float32))
    src_lengths = jnp.asarray([S] * B, dtype=jnp.int32)
    glen = graph_lengths(src_lengths, 0.5, 64)
    prev = initialize_output_tokens(glen, L, cfg.vocab)
    tgt = jnp.asarray(
        rng.integers(4, cfg.vocab.size, size=(B, T)), dtype=jnp.int32)
    tgt = tgt.at[:, 0].set(cfg.vocab.bos).at[:, T - 1].set(cfg.vocab.eos)
    return {
        "fbank": fbank,
        "src_lengths": src_lengths,
        "target": tgt,
        "prev_output_tokens": prev,
    }


class TestSchedules:
    def test_inverse_sqrt(self):
        s = inverse_sqrt_schedule(5e-4, 100, 1e-7)
        assert float(s(1)) < float(s(50)) < float(s(100))
        assert float(s(100)) == pytest.approx(5e-4, rel=1e-5)
        assert float(s(400)) == pytest.approx(5e-4 * 0.5, rel=1e-5)

    def test_anneal_parse(self):
        p = parse_anneal("0.5:0.1@100k")
        assert p == (0.5, 0.1, 100000)
        assert float(anneal_value(p, 0)) == pytest.approx(0.5)
        assert float(anneal_value(p, 50000)) == pytest.approx(0.3)
        assert float(anneal_value(p, 200000)) == pytest.approx(0.1)
        assert float(anneal_value(parse_anneal("0"), 123)) == 0.0


class TestNatDagLoss:
    def test_loss_and_grads_finite(self):
        cfg = tiny_dag_cfg()
        model = S2TConformerDAG(cfg)
        rng = np.random.default_rng(0)
        batch = make_batch(rng, cfg)
        variables = fast_init(
            model, jax.random.key(0), batch["fbank"], batch["src_lengths"],
            batch["prev_output_tokens"])

        def lossf(params):
            loss, aux = nat_dag_loss(
                model, {"params": params,
                        "batch_stats": variables.get("batch_stats", {})},
                batch, jax.random.key(1), jnp.asarray(0.5), cfg.vocab)
            return loss, aux

        (loss, aux), grads = jax.value_and_grad(lossf, has_aux=True)(
            variables["params"])
        assert np.isfinite(float(loss))
        flat = jax.tree.leaves(grads)
        assert all(np.isfinite(np.asarray(g)).all() for g in flat)
        # some gradient must reach the encoder and the link predictor
        gsum = sum(float(jnp.abs(g).sum()) for g in flat)
        assert gsum > 0
        m = aux["metrics"]
        assert 0 <= float(m["glat_accu"]) <= 1
        assert int(m["invalid_nsentences"]) == 0

    def test_train_step_data_parallel(self):
        """Full pjit DP train step on the 8-device CPU mesh."""
        from jax.sharding import Mesh

        devices = np.array(jax.devices()[:8]).reshape(8)
        mesh = Mesh(devices, ("data",))

        cfg = tiny_dag_cfg()
        model = S2TConformerDAG(cfg)
        rng = np.random.default_rng(1)
        batch = make_batch(rng, cfg, B=8)
        variables = fast_init(
            model, jax.random.key(0), batch["fbank"], batch["src_lengths"],
            batch["prev_output_tokens"])
        tx = make_optimizer(lr=1e-3, warmup_updates=10, clip_norm=1.0)
        state = TrainState.create(variables, tx)

        def loss_fn(params_dict, b, key, step):
            glat_p = anneal_value(parse_anneal("0.5:0.1@100k"), step)
            return nat_dag_loss(model, params_dict, b, key, glat_p, cfg.vocab)

        step_fn = jit_data_parallel(
            make_train_step(loss_fn, tx), mesh)
        key = jax.random.key(7)
        params0 = jax.tree.map(np.asarray, state.params)  # state is donated
        state1, metrics1 = step_fn(state, batch, key)
        state2, metrics2 = step_fn(state1, batch, key)
        assert int(state2.step) == 2
        assert np.isfinite(float(metrics1["loss"]))
        assert np.isfinite(float(metrics2["loss"]))
        assert float(metrics1["gnorm"]) > 0
        # params actually moved
        delta = sum(float(jnp.abs(a - b).sum()) for a, b in zip(
            jax.tree.leaves(params0), jax.tree.leaves(state2.params)))
        assert delta > 0


class TestMeshDepth:
    """Multi-chip evidence beyond one DP step: sharded eval parity,
    metrics under the mesh, update-freq accumulation under the mesh, and
    an uneven (sample_mask-padded) final batch under sharding."""

    def _mesh(self):
        from jax.sharding import Mesh

        return Mesh(np.array(jax.devices()[:8]).reshape(8), ("data",))

    def _setup(self, B=8, seed=5):
        cfg = tiny_dag_cfg()
        model = S2TConformerDAG(cfg)
        rng = np.random.default_rng(seed)
        batch = make_batch(rng, cfg, B=B)
        variables = fast_init(
            model, jax.random.key(0), batch["fbank"], batch["src_lengths"],
            batch["prev_output_tokens"])
        return cfg, model, batch, variables

    def test_sharded_eval_matches_unsharded(self):
        from jax.sharding import NamedSharding, PartitionSpec as P

        from daspeech_tpu.train.step import shard_batch_specs

        mesh = self._mesh()
        cfg, model, batch, variables = self._setup()
        pd = {"params": variables["params"],
              "batch_stats": variables.get("batch_stats", {})}

        def eval_loss(b):
            loss, aux = nat_dag_loss(
                model, pd, b, jax.random.key(3), jnp.asarray(0.0),
                cfg.vocab, glance_strategy=None, train=False)
            return loss, aux["metrics"]["ntokens"]

        plain_loss, plain_ntok = jax.jit(eval_loss)(batch)

        def sharded(b):
            b = jax.lax.with_sharding_constraint(
                b, shard_batch_specs(b, mesh, "data"))
            return eval_loss(b)

        sh_loss, sh_ntok = jax.jit(
            sharded, out_shardings=NamedSharding(mesh, P()))(batch)
        np.testing.assert_allclose(float(sh_loss), float(plain_loss),
                                   rtol=1e-5)
        assert int(sh_ntok) == int(plain_ntok)

    def test_train_metrics_match_across_shardings(self):
        mesh = self._mesh()
        cfg, model, batch, variables = self._setup()
        tx = make_optimizer(lr=1e-3, warmup_updates=10)

        def loss_fn(pd, b, key, step):
            return nat_dag_loss(model, pd, b, key, jnp.asarray(0.0),
                                cfg.vocab, glance_strategy=None)

        step = make_train_step(loss_fn, tx)
        state = TrainState.create(variables, tx)
        _, m_plain = jax.jit(step)(state, batch, jax.random.key(9))
        state2 = TrainState.create(variables, tx)
        _, m_mesh = jit_data_parallel(step, mesh)(
            state2, batch, jax.random.key(9))
        for k in ("loss", "ntokens", "nsentences", "gnorm"):
            np.testing.assert_allclose(
                float(m_mesh[k]), float(m_plain[k]), rtol=2e-3), k

    def test_accumulation_under_mesh(self):
        mesh = self._mesh()
        cfg, model, batch, variables = self._setup()
        tx = make_optimizer(lr=1e-3, warmup_updates=10)

        def loss_fn(pd, b, key, step):
            return nat_dag_loss(model, pd, b, key, jnp.asarray(0.0),
                                cfg.vocab, glance_strategy=None)

        stacked = {k: jnp.stack([v, v]) for k, v in batch.items()}
        step2 = make_train_step(loss_fn, tx, accum_steps=2)
        state = TrainState.create(variables, tx)
        params0 = jax.tree.map(np.asarray, state.params)  # state is donated
        new_state, m = jit_data_parallel(step2, mesh, batch_dim=1)(
            state, stacked, jax.random.key(1))
        assert int(new_state.step) == 1
        assert np.isfinite(float(m["loss"]))
        delta = sum(float(jnp.abs(a - b).sum()) for a, b in zip(
            jax.tree.leaves(params0),
            jax.tree.leaves(new_state.params)))
        assert delta > 0

    def test_uneven_final_batch_under_sharding(self):
        """A bucket-fill padded batch (sample_mask zeros) sharded over the
        mesh must produce the same loss as the unpadded batch unsharded."""
        mesh = self._mesh()
        cfg, model, batch, variables = self._setup(B=5)
        pd = {"params": variables["params"],
              "batch_stats": variables.get("batch_stats", {})}

        def eval_loss(b):
            loss, _ = nat_dag_loss(
                model, pd, b, jax.random.key(3), jnp.asarray(0.0),
                cfg.vocab, glance_strategy=None, train=False)
            return loss

        want = float(jax.jit(eval_loss)(batch))

        idx = np.asarray([0, 1, 2, 3, 4, 0, 0, 0])
        padded = {k: v[idx] for k, v in batch.items()}
        padded["sample_mask"] = jnp.asarray(
            [1.0] * 5 + [0.0] * 3)

        from daspeech_tpu.train.step import shard_batch_specs

        def sharded(b):
            b = jax.lax.with_sharding_constraint(
                b, shard_batch_specs(b, mesh, "data"))
            return eval_loss(b)

        got = float(jax.jit(sharded)(padded))
        np.testing.assert_allclose(got, want, rtol=1e-5)


class TestStepFeatures:
    def _setup(self, B=2):
        cfg = tiny_dag_cfg()
        model = S2TConformerDAG(cfg)
        rng = np.random.default_rng(2)
        batch = make_batch(rng, cfg, B=B)
        variables = fast_init(
            model, jax.random.key(0), batch["fbank"], batch["src_lengths"],
            batch["prev_output_tokens"])
        tx = make_optimizer(lr=1e-3, warmup_updates=10)
        state = TrainState.create(variables, tx)

        def loss_fn(params_dict, b, key, step):
            return nat_dag_loss(model, params_dict, b, key,
                                jnp.asarray(0.3), cfg.vocab)

        return model, cfg, batch, state, tx, loss_fn

    def test_gradient_accumulation(self):
        """accum_steps=2 averages microbatch grads (--update-freq)."""
        model, cfg, batch, state, tx, loss_fn = self._setup(B=2)
        stacked = {k: jnp.stack([v, v]) for k, v in batch.items()}
        step1 = make_train_step(loss_fn, tx, accum_steps=1)
        step2 = make_train_step(loss_fn, tx, accum_steps=2)
        s1, m1 = jax.jit(step1)(state, batch, jax.random.key(0))
        # identical microbatches with identical rng give ~the same grads;
        # just require the accumulated step to run and move params finitely
        s2, m2 = jax.jit(step2)(state, stacked, jax.random.key(0))
        assert np.isfinite(float(m2["loss"]))
        assert int(s2.step) == 1
        d = sum(float(jnp.abs(a - b).sum()) for a, b in zip(
            jax.tree.leaves(state.params), jax.tree.leaves(s2.params)))
        assert d > 0

    def test_nan_guard_skips_update(self):
        model, cfg, batch, state, tx, loss_fn = self._setup(B=2)

        def bad_loss(params_dict, b, key, step):
            loss, aux = loss_fn(params_dict, b, key, step)
            return loss * jnp.float32(jnp.nan), aux

        step = make_train_step(bad_loss, tx, nan_guard=True)
        params0 = jax.tree.map(lambda x: np.asarray(x), state.params)
        s1, m = jax.jit(step)(state, batch, jax.random.key(0))
        assert float(m["skipped"]) == 1.0
        for a, b in zip(jax.tree.leaves(params0), jax.tree.leaves(s1.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert int(s1.step) == 1  # step counter still advances


class TestFusedGuardedAdam:
    """The single-pass fused clip+Adam+wd+lr+guard (train_state.py::
    _fused_guarded_adam) must match the stock optax chain it replaces,
    step for step, including both schedule counts."""

    def _tree(self, rng):
        return {
            "a": jnp.asarray(rng.normal(size=(7, 5)).astype(np.float32)),
            "b": {"w": jnp.asarray(rng.normal(size=(11,))
                                   .astype(np.float32))},
        }

    @pytest.mark.parametrize("wd,clip", [(0.01, 1.0), (0.0, 1.0),
                                         (0.01, 0.0)])
    def test_matches_optax_chain(self, wd, clip):
        import optax

        tx = make_optimizer(lr=1e-3, warmup_updates=5, weight_decay=wd,
                            clip_norm=clip)
        rng = np.random.default_rng(0)
        params_c = self._tree(rng)
        params_f = jax.tree.map(jnp.array, params_c)
        st_c = tx.init(params_c)
        st_f = tx.init(params_f)
        ok = jnp.bool_(True)
        for i in range(6):
            grads = jax.tree.map(
                lambda p: jnp.asarray(
                    rng.normal(size=p.shape).astype(np.float32) * (i + 1)),
                params_c)
            gnorm = optax.global_norm(grads)
            updates, st_c = tx.update(grads, st_c, params_c)
            params_c = jax.tree.map(lambda p, u: p + u, params_c, updates)
            params_f, st_f = tx.fused_update(params_f, st_f, grads,
                                             gnorm, ok)
            for a, b in zip(jax.tree.leaves(params_c),
                            jax.tree.leaves(params_f)):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=2e-6, atol=2e-7)
            for a, b in zip(jax.tree.leaves(st_c), jax.tree.leaves(st_f)):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=2e-6, atol=2e-7)

    def test_skip_freezes_everything(self):
        tx = make_optimizer(lr=1e-3, warmup_updates=5)
        rng = np.random.default_rng(1)
        params = self._tree(rng)
        st = tx.init(params)
        # advance once so counts are nonzero
        grads = jax.tree.map(jnp.ones_like, params)
        params, st = tx.fused_update(params, st, grads,
                                     jnp.float32(1.0), jnp.bool_(True))
        bad = jax.tree.map(lambda p: jnp.full_like(p, jnp.nan), params)
        p2, st2 = tx.fused_update(params, st, bad, jnp.float32(jnp.nan),
                                  jnp.bool_(False))
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(st), jax.tree.leaves(st2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
