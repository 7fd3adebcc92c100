from daspeech_tpu.parallel.partition import (
    fsdp_partition_spec,
    jit_sharded,
    jit_sharded_infer,
    make_mesh,
    param_partition_spec,
    state_shardings,
    tree_shardings,
)

__all__ = [
    "fsdp_partition_spec",
    "jit_sharded",
    "jit_sharded_infer",
    "make_mesh",
    "param_partition_spec",
    "state_shardings",
    "tree_shardings",
]
