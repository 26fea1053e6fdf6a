"""Test configuration: force CPU with 8 virtual devices BEFORE importing jax.

This lets sharding/mesh tests run without TPU hardware, per the driver's
multi-chip dry-run contract.
"""

import os

# NOTE: a sitecustomize pre-imports jax and registers the axon TPU plugin
# BEFORE this file runs, so JAX_PLATFORMS in os.environ is read too early to
# matter.  jax.config.update("jax_platforms", ...) below is what actually
# forces CPU.  XLA_FLAGS is still read lazily at first backend init, so
# setting it here works as long as no test touched a device yet.
# ARTDECO_TEST_TPU=1 runs the suite on the real TPU backend instead (the
# verify drive for kernel changes; multi-device mesh tests will skip/fail
# there — deselect tests/test_parallel.py when using it)
_USE_TPU = os.environ.get("ARTDECO_TEST_TPU", "") == "1"

if not _USE_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not _USE_TPU:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)


def _machine_tag() -> str:
    """Fingerprint the host CPU + jaxlib for the cache-dir name.

    XLA:CPU AOT blobs are machine-specific, but the persistent-cache key
    does NOT include the host's CPU features — entries written by a
    different machine (the driver moves between hosts round to round) load
    with 'machine type ... doesn't match' and then fail at execution with
    buffer-count/SIGILL-class errors.  Keying the directory by machine
    makes stale cross-host entries unreachable instead of fatal."""
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            flags = next((ln for ln in f if ln.startswith("flags")), "")
    except OSError:
        flags = ""
    import jaxlib

    tag = hashlib.sha1(
        (flags + jax.__version__ + jaxlib.__version__).encode()
    ).hexdigest()[:10]
    return tag


# persistent compile cache: the suite's wall time is dominated by CPU jit
# compiles that are identical run to run
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.expanduser(f"~/.cache/jax_artdeco_cpu_{_machine_tag()}"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
# Keep matmuls in full f32 for numerical golden tests.
jax.config.update("jax_default_matmul_precision", "highest")
