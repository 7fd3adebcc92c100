from daspeech_tpu.parallel.partition import (
    jit_sharded,
    jit_sharded_infer,
    make_mesh,
    param_partition_spec,
    state_shardings,
    tree_shardings,
)

__all__ = [
    "jit_sharded",
    "jit_sharded_infer",
    "make_mesh",
    "param_partition_spec",
    "state_shardings",
    "tree_shardings",
]
