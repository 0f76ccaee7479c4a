"""Persistent XLA compilation cache, on by default for the CLIs.

TPU compiles in this environment go through a remote relay and cost
minutes; every CLI invocation is a fresh process, so identical programs
(the grid-search scan, the eval fn, the train step) were recompiled per
run. The JAX persistent cache stores compiled executables on disk keyed by
program hash — subsequent processes load instead of recompiling.

Opt out with CMX_NO_COMPILE_CACHE=1; relocate with CMX_COMPILE_CACHE_DIR.
"""

from __future__ import annotations

import os


def enable_default_cache() -> None:
    if os.environ.get("CMX_NO_COMPILE_CACHE"):
        return
    import jax

    path = os.environ.get(
        "CMX_COMPILE_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "cmx-xla"),
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
