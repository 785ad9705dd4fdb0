"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding tests use 8 virtual
CPU devices as the fake backend (SURVEY.md §4 test-strategy note). x64 is
enabled so parity tests can run in the reference's float64.

NOTE: the environment pins JAX_PLATFORMS=axon (the TPU tunnel) and the env
var cannot be overridden from outside; ``jax.config.update`` after import is
the reliable way to force the CPU backend here.
"""
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)
# single-core CPU: XLA compiles (notably random.gamma's rejection loop) are
# slow; a persistent cache makes repeated test runs cheap.
jax.config.update("jax_compilation_cache_dir", "/tmp/spmf_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
