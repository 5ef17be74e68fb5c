"""Persistent XLA compilation cache.

Cold compiles of the fused render graphs run minutes on TPU (the XLA
sort expands into hundreds of stages inside one module and scheduling
passes go superlinear). Runtime is unaffected — so cache compiled
executables across processes. Called by every CLI entry point; set
GOI_NO_COMPILE_CACHE=1 to disable.
"""

from __future__ import annotations

import os


def enable_compile_cache(path: str | None = None) -> None:
    if os.environ.get("GOI_NO_COMPILE_CACHE"):
        return
    import jax

    path = path or os.path.join(
        os.path.expanduser("~/.cache/goi_tpu"), "xla_cache")
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes",
                          -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
    except Exception:
        pass
