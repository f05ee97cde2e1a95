"""Persistent XLA compilation cache for the serving CLIs.

The serving environment has no ambient JAX compilation cache
(``jax_compilation_cache_dir = None``), so every process re-pays every
XLA compile: minutes for the 1080p pipeline step on the tunnel backend,
plus ~0.55 s per fetch-ladder rung — the latter MID-SERVE, at the first
batch boundary that needs a new rung (the stall analysis in
``benchmarks/sustained_tpu_tunnel`` r5 blocks). The link-cache prewarm
moves known rungs before the first frame; this module removes the
re-compile itself: measured on the axon tunnel backend, a compile that
took 375.8 s in a contended window became a 15.7 s process start on the
next run (cache hit, entries verified on disk).

The reference never compiles at runtime — its kernels are AOT-compiled
by nvcc at build time (``server/Makefile``); a persistent compile cache
is the JAX-native equivalent of shipping compiled kernels.

Enabled by default in every serving/benchmark entry point; set
``CVSTPU_XLA_CACHE=off`` to disable, or point it at a different
directory.
"""

from __future__ import annotations

import os

DEFAULT_DIR = os.path.join(os.path.expanduser("~"), ".cache", "cvstpu",
                           "xla")


def maybe_enable_compilation_cache(path: str | None = None):
    """Enable jax's persistent compilation cache; returns the directory
    or None when disabled.

    Call before the first jit dispatch (earlier compiles simply miss the
    cache — never an error). A corrupt or unwritable cache degrades to
    plain compilation; jax's cache writes are atomic renames, so
    concurrent servers can share one directory."""
    if path is None:
        path = os.environ.get("CVSTPU_XLA_CACHE", DEFAULT_DIR)
    if not path or path.lower() == "off":
        return None
    try:
        os.makedirs(path, exist_ok=True)
    except OSError:
        return None
    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    # tunnel-backend rung jits compile in ~0.5 s; CPU-test jits mostly
    # finish under 0.1 s and stay out of the cache
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    return path
