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
# Persist compiled executables across test sessions (single-core CPU host;
# XLA compiles of scan-heavy graphs dominate wall time otherwise).
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
