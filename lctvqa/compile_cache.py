"""Persistent XLA compilation cache (safe to call multiple times).

The tri-level stage3 program takes minutes to compile (XLA-CPU on this
single-core host; ~7 min via the TPU remote-compile tunnel at reference
dims); the persistent cache makes warm starts instant.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/jax_comp")


def enable(cache_dir: str = _DEFAULT_DIR) -> bool:
    import jax

    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        return True
    except Exception:
        return False
