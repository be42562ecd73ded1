import os

# Tests run on a virtual 8-device CPU mesh so sharding paths are exercised
# without TPU hardware. The environment's sitecustomize imports jax with
# JAX_PLATFORMS=axon before pytest starts, so the env var alone is too late —
# jax.config.update after import is authoritative (backend initializes lazily
# on first use, which is after conftest runs).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# Persistent compilation cache makes repeated test runs fast.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def pytest_report_header(config):
    return f"jax backend: {jax.default_backend()}, devices: {jax.device_count()}"
