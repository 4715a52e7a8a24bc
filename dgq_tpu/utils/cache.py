"""Persistent XLA compilation cache.

The SD UNet takes minutes to compile per (config, shape) class; a persistent
cache makes repeat CLI/bench invocations skip straight to execution (the
in-memory cache only helps within one process). Safe to call more than once.
"""
from __future__ import annotations

import hashlib
import os


def host_cpu_tag() -> str:
    """Short hash of the host's CPU feature flags.

    XLA:CPU AOT cache entries bake in the compile machine's feature set;
    loading them on a host with different features SIGILLs/segfaults (the
    loader only warns). Salting the cache path with the feature flags makes
    an entry written on one machine invisible to a different one."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha256(line.encode()).hexdigest()[:12]
    except OSError:
        pass
    import platform

    return hashlib.sha256(platform.processor().encode()).hexdigest()[:12]


_DEFAULT_DIR = os.environ.get(
    "DGQ_COMPILATION_CACHE",
    os.path.expanduser(f"~/.cache/dgq_tpu_xla_{host_cpu_tag()}"))


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    """Point JAX's persistent compilation cache at a writable directory.

    No-op if the user disabled it with DGQ_COMPILATION_CACHE="" or if the
    jax runtime predates the config knobs.
    """
    path = _DEFAULT_DIR if cache_dir is None else cache_dir
    if not path:
        return
    import jax

    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache everything, not just slow-to-compile programs
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except (AttributeError, ValueError, OSError):
        pass
