"""Persistent XLA compilation cache, on by default for the CLIs.

TPU compiles in this environment go through a remote relay and cost
minutes; every CLI invocation is a fresh process, so identical programs
(the grid-search scan, the eval fn, the train step) were recompiled per
run. The JAX persistent cache stores compiled executables on disk keyed by
program hash — subsequent processes load instead of recompiling.

Opt out with CMX_NO_COMPILE_CACHE=1; relocate with CMX_COMPILE_CACHE_DIR.
"""

from __future__ import annotations

import hashlib
import os


def _host_fingerprint() -> str:
    """Hash of the host CPU feature set.

    XLA:CPU AOT executables embed machine features (e.g. prefer-no-scatter,
    AMX/AVX512 subsets); loading a blob cached on a different machine logs
    'could lead to execution errors such as SIGILL' and produced
    instruction-selection-dependent float diffs in the bitwise regression
    tests. Scoping the cache dir by CPU model+flags makes stale blobs
    unreachable; TPU executables recompile once per new host, which is the
    safe trade.
    """
    try:
        with open("/proc/cpuinfo") as f:
            lines = [l for l in f.read().splitlines()
                     if l.startswith(("model name", "flags"))]
        key = lines[0] + "|" + (lines[1] if len(lines) > 1 else "")
    except OSError:
        import platform

        key = platform.processor() or platform.machine()
    return hashlib.md5(key.encode()).hexdigest()[:12]


def enable_default_cache() -> None:
    if os.environ.get("CMX_NO_COMPILE_CACHE"):
        return
    import jax

    path = os.environ.get(
        "CMX_COMPILE_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "cmx-xla",
                     _host_fingerprint()),
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
