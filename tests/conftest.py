"""Test environment: force an 8-device virtual CPU mesh before JAX initialises.

Multi-host / multi-chip logic is exercised on a virtual CPU mesh exactly as the
driver's ``dryrun_multichip`` does (``--xla_force_host_platform_device_count``).
"""

import os

# Force CPU even when the ambient environment points at a real TPU (JAX_PLATFORMS
# may be pre-set to a tunneled TPU platform): tests must be hermetic, exact-f32,
# and able to fake an 8-device mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The env var alone is not honoured when a TPU PJRT plugin pre-registers itself;
# the config update is authoritative.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent compilation cache: the suite's cost is dominated by XLA:CPU
# compiles of sharded train steps and model fixtures — cached, a full run
# drops from ~22 min to a few minutes. (The axon AOT service deadlocks with
# this cache, which is why it is enabled here for CPU only, not globally.)
jax.config.update("jax_compilation_cache_dir", "/tmp/motion324_test_jit_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
