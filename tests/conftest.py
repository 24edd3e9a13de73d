import os
import sys
from pathlib import Path

# Multi-chip sharding tests run on a virtual 8-device CPU mesh.  These flags
# must be set before jax is imported anywhere in the test process.
# The test suite always runs on CPU (the environment may point JAX at a
# tunneled TPU via JAX_PLATFORMS=axon -- tests must not contend for it).
# 8 virtual devices serve the sharding tests.  Env vars alone are not
# enough here: an axon sitecustomize module may have registered a TPU
# plugin at interpreter start, so the jax.config knobs are set as well
# below.  Note: do NOT add --xla_backend_optimization_level=0 -- it makes
# the permutation+feedforward (Jive) programs blow up in XLA:CPU compile
# time (>10x) instead of speeding them up.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# XLA compile times dominate the limb-kernel tests; cache compiled
# executables across test runs.
jax.config.update(
    "jax_compilation_cache_dir",
    str(Path(__file__).resolve().parent.parent / ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
