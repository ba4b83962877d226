"""Test configuration: run on a virtual 8-device CPU mesh.

Real TPU hardware in CI is a single chip; multi-chip sharding logic is
validated on virtual CPU devices per the project build rules.

Note: this environment pre-imports jax via sitecustomize (TPU plugin), so
platform selection must go through ``jax.config`` — environment variables
are already consumed by the time conftest runs.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)
# Persistent compile cache: repeated identical pipelines across tests and
# test sessions skip XLA compilation.
jax.config.update("jax_compilation_cache_dir", "/tmp/xicsrt_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
