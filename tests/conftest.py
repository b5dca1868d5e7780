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

# The native WSI reader (native/build/libwsireader.so) is a gitignored build
# artifact; a fresh checkout doesn't have it and several test files require
# it.  Build it up front (make no-ops when it is already current) so the
# suite is green without a manual `make -C native` step.
def _ensure_native_lib() -> None:
    import shutil
    import subprocess

    if shutil.which("make") is None or shutil.which("g++") is None:
        return  # no toolchain: native-dependent tests will skip/fail visibly
    native_dir = Path(__file__).resolve().parent.parent / "native"
    if not (native_dir / "Makefile").exists():
        return
    try:
        proc = subprocess.run(
            ["make"], cwd=native_dir, capture_output=True, text=True, timeout=600
        )
    except (subprocess.TimeoutExpired, OSError) as e:
        print(f"warning: native lib build errored: {e}", file=sys.stderr)
        return  # native-dependent tests will skip/fail visibly
    if proc.returncode != 0:
        print(f"warning: native lib build failed:\n{proc.stderr}", file=sys.stderr)


_ensure_native_lib()
