"""Persistent XLA compilation cache.

Large static-shape programs (the 1080p/500k bench step compiles for
minutes through a remote AOT helper) only need to compile once per
machine: every entry tool calls enable() so repeat runs reload the
serialized executable instead of recompiling. Opt out with
EMD_TPU_NO_COMPILE_CACHE=1 (e.g. when measuring compile time itself).
"""
from __future__ import annotations

import os


def enable(path: str | None = None) -> str | None:
    if os.environ.get("EMD_TPU_NO_COMPILE_CACHE"):
        return None
    import jax

    path = path or os.environ.get(
        "EMD_TPU_COMPILE_CACHE", os.path.expanduser("~/.cache/emd_tpu_xla"))
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        # cache everything, however small/fast to compile
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        return None  # older jax without these flags
    return path
