"""Host allocator tuning for fault-expensive VMs.

Scene building is vectorized numpy over ~100MB temporaries.  glibc serves
allocations over MALLOC_MMAP_THRESHOLD (128KB default) with fresh mmaps and
munmaps them on free, so every large temporary re-faults its pages; on VMs
where anonymous-page faults are slow (~13MB/s measured on the dev box) that
turns a sub-second 100k-particle layout build into minutes.

``enable_heap_reuse`` routes large allocations through the brk heap and stops
glibc from trimming it, so pages fault once per process and are reused by
every later temporary (measured: 100k layout rebuild 19s cold -> 0.5s warm).

Opt out with SOFTBODY_NO_HEAP_REUSE=1 (e.g. when peak RSS matters more than
build latency).
"""

from __future__ import annotations

import ctypes
import os
import sys

_M_TRIM_THRESHOLD = -1
_M_MMAP_THRESHOLD = -3

_done = False


def enable_heap_reuse() -> bool:
    """Idempotent; returns True when the mallopt calls took effect."""
    global _done
    if _done:
        return True
    if os.environ.get("SOFTBODY_NO_HEAP_REUSE"):
        return False
    if not sys.platform.startswith("linux"):
        return False
    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        ok = bool(libc.mallopt(_M_MMAP_THRESHOLD, 1 << 30))
        ok = bool(libc.mallopt(_M_TRIM_THRESHOLD, (1 << 31) - 1)) and ok
    except Exception:
        return False
    _done = ok
    return ok


def enable_compilation_cache(path: str | None = None) -> None:
    """Persistent XLA/Mosaic compilation cache (idempotent, best-effort).

    A 100k sparse scene compiles 16+ bucket-shaped Pallas kernels; over the
    remote-compile tunnel that is minutes of wall per cold process.  The
    on-disk cache makes every later process with identical HLO start in
    seconds.  Opt out with SOFTBODY_NO_COMPILE_CACHE=1.

    TPU-only: XLA:CPU caches AOT results keyed on exact machine features and
    warns about SIGILL risk when reloaded (compile vs host feature-set
    mismatch on this VM), and CPU compiles are fast anyway."""
    if os.environ.get("SOFTBODY_NO_COMPILE_CACHE"):
        return
    if os.environ.get("JAX_PLATFORMS", "").strip().lower().startswith("cpu"):
        return
    import jax

    try:
        cache = (path or os.environ.get("JAX_COMPILATION_CACHE_DIR")
                 or os.path.expanduser("~/.cache/softbody_tpu/xla"))
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass


def compiler_options_from_env() -> dict | None:
    """Parse ``SOFTBODY_COMPILER_OPTIONS`` ("k=v,k2=v2") into a jit
    ``compiler_options`` dict.

    XLA_FLAGS cannot carry TPU-backend flags here: the LOCAL jaxlib's flag
    parser fatals on flags only libtpu registers ("Unknown flag in
    XLA_FLAGS"), and compilation happens in the remote axon helper anyway.
    PJRT ``compiler_options`` are forwarded with the compile request and
    validated remotely (measured round 5: a bogus option errors, real
    ``xla_tpu_*`` options apply), so this is the only working channel for
    TPU compiler tuning in this environment."""
    import os

    spec = os.environ.get("SOFTBODY_COMPILER_OPTIONS", "").strip()
    if not spec:
        return None
    out = {}
    for kv in spec.split(","):
        k, _, v = kv.partition("=")
        if k.strip():
            out[k.strip()] = v.strip()
    return out or None
