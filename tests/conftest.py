"""Test harness: force an 8-device virtual CPU platform so sharding tests run
without TPU hardware, and enable x64 so numerics tests can compare against
float64 references (the filter itself supports both scalars, mirroring the
reference's "templated on the floating point type" capability,
/root/reference/README.md:47-49)."""

import os

# Force CPU: tests must not depend on (or serialize onto) the tunneled TPU.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


def pytest_sessionstart(session):
    """Build the native loader so its tests run instead of silently skipping
    (round-1 gap: the .so is gitignored and nothing built it)."""
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    try:
        subprocess.run(
            ["make", "-C", os.path.join(repo, "native"), "-s"],
            check=False, timeout=300, capture_output=True,
        )
    except Exception:
        pass  # the loader tests will report the skip reason
