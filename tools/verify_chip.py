"""On-chip verification of every Pallas kernel against its XLA oracle.

The unit tests exercise the kernels in interpret mode on CPU (fast, runs
anywhere); THIS script runs them compiled on the real TPU — numerics,
dropout-stream determinism, and the sharding-invariance contract — and
prints one PASS/FAIL JSON line per check.  Run it after touching anything
under ops/.

Usage:  python tools/verify_chip.py
"""

import json
import math
import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

FAILURES = []


def check(name, ok, detail=""):
    print(json.dumps({"check": name, "pass": bool(ok), "detail": detail}))
    if not ok:
        FAILURES.append(name)


def mha_oracle(q, k, v, bias, sc, H):
    # the same canonical oracle the unit tests lock against
    from daspeech_tpu.ops.fused_attention import mha_reference_packed

    return mha_reference_packed(q, k, v, bias, sc, H)


def verify_packed_attention():
    from daspeech_tpu.ops import fused_attention as fa

    B, Tq, Tk, H, d = 4, 96, 96, 8, 64
    C = H * d
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, Tq, C)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, Tk, C)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, Tk, C)).astype(np.float32))
    valid = np.ones((B, Tk), bool)
    valid[-1, -5:] = False
    bias = jnp.asarray(np.where(valid, 0.0, fa.NEG).astype(np.float32))
    sc = 1.0 / math.sqrt(d)
    seeds = jnp.arange(B, dtype=jnp.int32) + 17

    out = jax.jit(lambda q, k, v: fa.fused_attention_packed(
        q, k, v, bias, seeds, sc, 0.0, False, H))(q, k, v)
    err = float(jnp.max(jnp.abs(out - mha_oracle(q, k, v, bias, sc, H))))
    check("packed_attn_fwd_vs_oracle", err < 2e-3, f"max diff {err:.2e}")

    p_drop = 0.3
    fd = jax.jit(lambda q, k, v, b, s: fa.fused_attention_packed(
        q, k, v, b, s, sc, p_drop, True, H))
    o1 = fd(q, k, v, bias, seeds)
    check("packed_attn_dropout_deterministic",
          bool(jnp.array_equal(o1, fd(q, k, v, bias, seeds))))
    check("packed_attn_dropout_seed_sensitivity",
          bool(jnp.any(o1 != fd(q, k, v, bias, seeds + 1))))
    perm = jnp.array([2, 0, 3, 1])
    o_perm = fd(q[perm], k[perm], v[perm], bias[perm], seeds[perm])
    check("packed_attn_per_row_streams_travel",
          bool(jnp.array_equal(o_perm, o1[perm])),
          "permuting rows with their seeds permutes outputs exactly")
    g = jax.jit(jax.grad(lambda q: jnp.sum(
        fd(q, k, v, bias, seeds) ** 2)))(q)
    check("packed_attn_dropout_grad_finite", bool(jnp.all(jnp.isfinite(g))))


def verify_perhead_attention():
    """The per-(b,h) kernel (long-sequence fallback): numerics vs the same
    oracle and the per-row dropout-stream contract it adopted in round 4
    (per-row seeds + head index, sharding-invariant like the packed one)."""
    from daspeech_tpu.ops import fused_attention as fa

    B, Tq, Tk, H, d = 4, 96, 96, 4, 64
    C = H * d
    rng = np.random.default_rng(7)
    qp = jnp.asarray(rng.normal(size=(B, Tq, C)).astype(np.float32))
    kp = jnp.asarray(rng.normal(size=(B, Tk, C)).astype(np.float32))
    vp = jnp.asarray(rng.normal(size=(B, Tk, C)).astype(np.float32))
    valid = np.ones((B, Tk), bool)
    valid[0, -4:] = False
    bias = jnp.asarray(np.where(valid, 0.0, fa.NEG).astype(np.float32))
    sc = 1.0 / math.sqrt(d)
    seeds = jnp.arange(B, dtype=jnp.int32) + 3

    def to_bhtd(x, T):
        return jnp.swapaxes(x.reshape(B, T, H, d), 1, 2)

    q, k, v = to_bhtd(qp, Tq), to_bhtd(kp, Tk), to_bhtd(vp, Tk)
    out = jax.jit(lambda q, k, v: fa.fused_attention(
        q, k, v, bias, seeds, sc, 0.0, False))(q, k, v)
    out_p = jnp.swapaxes(out, 1, 2).reshape(B, Tq, C)
    err = float(jnp.max(jnp.abs(
        out_p - mha_oracle(qp, kp, vp, bias, sc, H))))
    check("perhead_attn_fwd_vs_oracle", err < 2e-3, f"max diff {err:.2e}")

    p_drop = 0.3
    fd = jax.jit(lambda q, k, v, b, s: fa.fused_attention(
        q, k, v, b, s, sc, p_drop, True))
    o1 = fd(q, k, v, bias, seeds)
    check("perhead_attn_dropout_deterministic",
          bool(jnp.array_equal(o1, fd(q, k, v, bias, seeds))))
    check("perhead_attn_dropout_seed_sensitivity",
          bool(jnp.any(o1 != fd(q, k, v, bias, seeds + 1))))
    perm = jnp.array([2, 0, 3, 1])
    o_perm = fd(q[perm], k[perm], v[perm], bias[perm], seeds[perm])
    check("perhead_attn_per_row_streams_travel",
          bool(jnp.array_equal(o_perm, o1[perm])),
          "permuting rows with their seeds permutes outputs exactly")
    g = jax.jit(jax.grad(lambda q: jnp.sum(
        fd(q, k, v, bias, seeds) ** 2)))(q)
    check("perhead_attn_dropout_grad_finite",
          bool(jnp.all(jnp.isfinite(g))))


def verify_fused_links():
    from daspeech_tpu.ops import fused_links as fl

    B, L, H, dk = 4, 96, 8, 64
    C = H * dk
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(B, L, C)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, L, C)).astype(np.float32))
    g = jax.nn.log_softmax(
        jnp.asarray(rng.normal(size=(B, L, H)).astype(np.float32)), -1)
    ol = jnp.asarray([L, L - 3, L, L - 7], jnp.int32)
    sc = 1.0 / math.sqrt(dk)

    def oracle(q, k, g):
        qh = q.reshape(B, L, H, dk)
        kh = k.reshape(B, L, H, dk)
        s = jnp.einsum("bihd,bjhd->bijh", qh, kh) * sc
        i = jnp.arange(L)[None, :, None]
        j = jnp.arange(L)[None, None, :]
        valid = (j > i) & (j < ol[:, None, None]) & (i < ol[:, None, None])
        s = jnp.where(valid[..., None], s, -jnp.inf)
        lp = jax.nn.log_softmax(s, axis=2)
        return jax.nn.logsumexp(lp + g[:, :, None, :], axis=-1)

    links = jax.jit(lambda q, k, g: fl.fused_extract_links(
        q, k, g, ol, H, sc, None))(q, k, g)
    ref = oracle(q, k, g)
    fin = np.isfinite(np.asarray(ref))
    mask_ok = bool((np.isfinite(np.asarray(links)) == fin).all())
    err = float(np.max(np.abs(np.asarray(links)[fin] - np.asarray(ref)[fin])))
    check("fused_links_fwd_vs_oracle", mask_ok and err < 1e-3,
          f"mask_ok={mask_ok} max diff {err:.2e}")

    import dataclasses

    from bench import fast_init
    from daspeech_tpu.core.config import DAGModelConfig, VocabConfig
    from daspeech_tpu.models import (S2TConformerDAG, graph_lengths,
                                     initialize_output_tokens)

    cfg_on = DAGModelConfig(vocab=VocabConfig(size=64))
    cfg_off = dataclasses.replace(
        cfg_on,
        decoder=dataclasses.replace(cfg_on.decoder, fused_links=False))
    # Lm > max graph length so <eos> placement and ragged lengths are
    # exercised (graph_lengths(0.5 * [64, 48]) = [32, 24] < 40)
    Bm, Sm, Lm = 2, 64, 40
    fbank = jnp.asarray(rng.normal(size=(Bm, Sm, 80)).astype(np.float32))
    sl = jnp.asarray([Sm, Sm - 16], jnp.int32)
    prev = initialize_output_tokens(
        graph_lengths(sl, 0.5, 1024), Lm, cfg_on.vocab)
    m_on = S2TConformerDAG(cfg_on)
    m_off = S2TConformerDAG(cfg_off)
    params = fast_init(m_on, jax.random.key(0), lambda m: m(fbank, sl, prev))

    def model_loss(m):
        def f(p):
            links = m.apply(p, fbank, sl, prev)[1]
            return jnp.sum(jnp.where(jnp.isfinite(links), links, 0.0))
        return f

    # f32 matmul precision isolates the kernel from XLA's default
    # bf16-pass matmuls (which make the two differently-fused backward
    # programs diverge ~1e-2 on their own); compare against the GLOBAL
    # grad scale — per-leaf relatives explode on k-projection biases
    # whose true gradient is ~0 (softmax per-query shift invariance)
    with jax.default_matmul_precision("float32"):
        g_on = jax.jit(jax.grad(model_loss(m_on)))(params)
        g_off = jax.jit(jax.grad(model_loss(m_off)))(params)
    gscale = max(float(jnp.max(jnp.abs(b)))
                 for b in jax.tree.leaves(g_off))
    gerr = max(float(jnp.max(jnp.abs(a - b)))
               for a, b in zip(jax.tree.leaves(g_on),
                               jax.tree.leaves(g_off))) / (gscale + 1e-9)
    check("fused_links_grads_vs_xla_model_path", gerr < 5e-3,
          f"max param-grad diff {gerr:.2e} of global grad scale "
          "(f32 matmul precision)")


def verify_relpos():
    from daspeech_tpu.models.conformer import (RelPosMultiHeadAttention,
                                               rel_positional_encoding)
    from daspeech_tpu.ops import fused_relpos as fr

    B, T, C, H = 4, 512, 256, 4    # T >= KERNEL_MIN_T so the kernel runs
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(B, T, C)).astype(np.float32))
    mask = np.zeros((B, T), bool)
    mask[-1, -9:] = True
    mask = jnp.asarray(mask)
    m_xla = RelPosMultiHeadAttention(C, H, 0.0, fused=False)
    m_fus = RelPosMultiHeadAttention(C, H, 0.0, fused=True)
    variables = m_xla.init({"params": jax.random.PRNGKey(0)}, x,
                           key_padding_mask=mask, train=False)
    o1 = m_xla.apply(variables, x, key_padding_mask=mask, train=False)
    o2 = m_fus.apply(variables, x, key_padding_mask=mask, train=False)
    err = float(jnp.max(jnp.abs(o1 - o2)))
    check("relpos_kernel_vs_xla_rotation", err < 5e-3, f"max diff {err:.2e}")

    # rotation identity vs the espnet rel_shift formulation
    d = C // H
    qv = jnp.asarray(rng.normal(size=(2, 17, H, d)).astype(np.float32))
    K = jnp.asarray((rng.normal(size=(C, C)) * 0.2).astype(np.float32))
    pe = rel_positional_encoding(17, C)[0]
    with jax.default_matmul_precision("float32"):
        p = (pe @ K).reshape(1, 33, H, d)
        bd_shift = RelPosMultiHeadAttention._rel_shift(
            jnp.einsum("bqhd,bphd->bhqp", qv, p))
        perm = jnp.concatenate([jnp.arange(0, C, 2), jnp.arange(1, C, 2)])
        z = jnp.einsum("bthm,chm->bthc", qv, K[perm].reshape(C, H, d))
        s, c, e = fr.relpos_basis(17, C)
        a = fr.relpos_rotate(z, s[:, None], c[:, None])
        bd_rot = jnp.einsum("bqhc,kc->bhqk", a, e)
    err = float(jnp.max(jnp.abs(bd_rot - bd_shift)))
    check("rotation_identity_vs_rel_shift", err < 1e-3,
          f"max diff {err:.2e} (f32 matmul precision)")


def verify_fused_ffn():
    from daspeech_tpu.models.conformer import FeedForwardModule

    B, T, C, F = 4, 24, 64, 256
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(B, T, C)).astype(np.float32))
    m_xla = FeedForwardModule(C, F, dropout=0.0, fused=False)
    m_fus = FeedForwardModule(C, F, dropout=0.0, fused=True)
    variables = m_xla.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    o1 = m_xla.apply(variables, x, train=False)
    o2 = m_fus.apply(variables, x, train=False)
    err = float(jnp.max(jnp.abs(o1 - o2)))
    check("fused_ffn_vs_module", err < 5e-3, f"max diff {err:.2e}")


def verify_dag_pallas():
    from daspeech_tpu.ops import dag_pallas, dag_ref

    B, T, L = 3, 8, 16
    rng = np.random.default_rng(4)
    links = jnp.asarray(np.log(rng.dirichlet(
        np.ones(L), size=(B, L)) + 1e-9).astype(np.float32))
    match = jnp.asarray(rng.normal(size=(B, T, L)).astype(np.float32))
    ol = jnp.asarray([L, L - 2, L - 5], jnp.int32)
    tl = jnp.asarray([T, T - 1, T - 3], jnp.int32)
    lp_ref = dag_ref.dag_loss(match, links, ol, tl)
    lp_pal = dag_pallas.dag_loss_pallas(match, links, ol, tl)
    err = float(jnp.max(jnp.abs(lp_ref - lp_pal)))
    check("dag_pallas_vs_scan", err < 1e-3, f"max diff {err:.2e}")


def main():
    if jax.default_backend() != "tpu":
        print(json.dumps({"check": "backend", "pass": False,
                          "detail": "not on TPU"}))
        return 1
    if jax.device_count() != 1:
        # the single-device-gated kernels (fused_ffn, per-(b,h) attention)
        # would silently take their XLA fallbacks and compare XLA to XLA
        print(json.dumps({"check": "single_device", "pass": False,
                          "detail": f"{jax.device_count()} devices — "
                                    "gated kernels would not execute"}))
        return 1
    verify_packed_attention()
    verify_perhead_attention()
    verify_fused_links()
    verify_relpos()
    verify_fused_ffn()
    verify_dag_pallas()
    print(json.dumps({"all_pass": not FAILURES, "failures": FAILURES}))
    return 1 if FAILURES else 0


if __name__ == "__main__":
    raise SystemExit(main())
