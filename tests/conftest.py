import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding logic is
# exercised without TPU hardware (an improvement over the reference, whose
# distributed tests require real GPUs — SURVEY.md §4).
os.environ["JAX_PLATFORMS"] = "cpu"  # may be too late if a TPU plugin's
# sitecustomize already imported jax — the explicit config below wins.

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)
# NOTE: the persistent compilation cache is intentionally NOT enabled here —
# XLA:CPU AOT entries on this host record `prefer-no-gather/scatter` compile
# "machine features" that never match at load time, so the cache only adds
# recompiles plus a page of cpu_aot_loader error spam per test session.
