import os
import sys
from pathlib import Path

# Multi-chip sharding tests run on a virtual 8-device CPU mesh.  These flags
# must be set before jax is imported anywhere in the test process.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault(
    "XLA_FLAGS",
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8",
)

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

# XLA compile times dominate the limb-kernel tests; cache compiled
# executables across test runs.
jax.config.update(
    "jax_compilation_cache_dir",
    str(Path(__file__).resolve().parent.parent / ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
