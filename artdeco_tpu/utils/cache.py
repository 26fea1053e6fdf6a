"""Persistent XLA compilation-cache setup, keyed by machine fingerprint.

XLA AOT blobs are machine/toolchain-specific, but JAX's persistent-cache key
does not include the host's CPU features or the PJRT plugin build — entries
written on a different host (the build/driver environment moves between
machines round to round) load with 'Machine type ... doesn't match' warnings
and then fail at EXECUTION time with buffer-count mismatches or
INVALID_ARGUMENT backend errors.  Keying the cache directory by a host +
version fingerprint makes stale cross-host entries unreachable instead of
fatal (observed twice: XLA:CPU AOT 'supplied 4 buffers but expected 5', and
the tunneled-TPU backend's InvalidArgument on cached executables).
"""

from __future__ import annotations

import hashlib
import os


def machine_tag() -> str:
    try:
        with open("/proc/cpuinfo") as f:
            flags = next((ln for ln in f if ln.startswith("flags")), "")
    except OSError:
        flags = ""
    import jax
    import jaxlib

    plugin = ""
    try:
        plugin = str(os.path.getmtime("/opt/axon/libaxon_pjrt.so"))
    except OSError:
        pass
    return hashlib.sha1(
        (flags + jax.__version__ + jaxlib.__version__ + plugin).encode()
    ).hexdigest()[:10]


def setup_compilation_cache(name: str = "artdeco",
                            min_compile_secs: float = 2.0) -> str:
    """Point JAX's persistent cache at a per-machine directory."""
    import jax

    path = os.path.expanduser(f"~/.cache/jax_{name}_{machine_tag()}")
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", min_compile_secs
        )
    except Exception:
        pass
    return path
