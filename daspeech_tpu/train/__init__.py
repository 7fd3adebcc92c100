from daspeech_tpu.train.step import (
    jit_data_parallel,
    make_train_step,
    optax_global_norm,
)
from daspeech_tpu.train.train_state import (
    TrainState,
    anneal_value,
    inverse_sqrt_schedule,
    make_optimizer,
    parse_anneal,
)

__all__ = [
    "jit_data_parallel",
    "make_train_step",
    "optax_global_norm",
    "TrainState",
    "anneal_value",
    "inverse_sqrt_schedule",
    "make_optimizer",
    "parse_anneal",
]
