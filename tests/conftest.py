import os
import sys
from pathlib import Path

# Tests run on a virtual 8-device CPU mesh so sharding is exercised without
# TPU hardware; single-chip TPU runs are covered by bench.py / __graft_entry__.
#
# Note: the axon TPU plugin overrides the JAX_PLATFORMS env var at interpreter
# start (sitecustomize), so we must force the CPU backend through
# jax.config.update before anything touches jax.
os.environ.setdefault(
    "XLA_FLAGS",
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8",
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
