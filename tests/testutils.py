"""Test utilities (the analogue of the reference's ``fairseq/tests/utils.py``
fixture factory)."""

import jax
import jax.numpy as jnp
import numpy as np


def fast_init(model, key, *args, method=None, **kwargs):
    """Materialize model variables from ``jax.eval_shape`` without compiling
    the init graph (XLA compiles of tiny convs take ~15s/module on this
    single-core host; tracing abstractly is instant).

    Heuristic initializers by variable name: *scale*/*alpha*/var -> ones,
    bias/mean -> zeros, everything else -> N(0, 0.05). Good enough for
    shape/finiteness/normalization tests; use the real ``model.init`` when
    init distributions matter.
    """
    if method is not None:
        kwargs["method"] = method
    shapes = jax.eval_shape(lambda k: model.init(k, *args, **kwargs), key)
    rng = np.random.default_rng(np.asarray(
        jax.random.key_data(key)).flatten()[-1])

    flat, treedef = jax.tree_util.tree_flatten_with_path(shapes)
    leaves = []
    for path, leaf in flat:
        name = "/".join(str(p) for p in path).lower()
        shape, dtype = leaf.shape, leaf.dtype
        if any(s in name for s in ("scale", "alpha", "'var'")):
            v = np.ones(shape, dtype)
        elif any(s in name for s in ("bias", "mean")):
            v = np.zeros(shape, dtype)
        else:
            v = rng.normal(0, 0.05, size=shape).astype(dtype)
        leaves.append(jnp.asarray(v))
    return jax.tree_util.tree_unflatten(treedef, leaves)
