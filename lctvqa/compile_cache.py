"""Persistent XLA compilation cache (safe to call multiple times).

The tri-level stage3 program takes minutes to compile (XLA-CPU on this
single-core host; ~7 min via the TPU remote-compile tunnel at reference
dims); the persistent cache makes warm starts instant.

CPU caveat: XLA:CPU caches AOT-compiled machine code whose recorded target
features must match the loading host exactly — entries written on a host
with different CPU tuning features SIGILL/segfault on deserialize. Pinning
`--xla_cpu_max_isa=AVX2` makes the compile target portable and stable, so
cache entries survive host changes. The flag must land in XLA_FLAGS before
the CPU client is created; `enable()` does that when called early (all our
entry points call it before the first device use).
"""

from __future__ import annotations

import os

# v2: pinned-ISA entries (v1 entries were host-feature-specific and crash
# on deserialize after a host change)
_DEFAULT_DIR = os.path.expanduser("~/.cache/jax_comp_v2")

_CPU_ISA_FLAG = "--xla_cpu_max_isa=AVX2"


def pin_cpu_isa() -> None:
    """Append the portable-CPU-target flag to XLA_FLAGS (idempotent)."""
    flags = os.environ.get("XLA_FLAGS", "")
    if "--xla_cpu_max_isa" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " " + _CPU_ISA_FLAG).strip()


def enable(cache_dir: str = _DEFAULT_DIR) -> bool:
    import jax

    try:
        pin_cpu_isa()
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        return True
    except Exception:
        return False
