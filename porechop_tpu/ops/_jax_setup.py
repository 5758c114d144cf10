"""Shared JAX configuration, applied before any engine compiles.

The only setting today is the persistent compilation cache: on tunneled
TPU backends every distinct XLA shape costs ~30-60 s through the
remote-compile helper, which made cold CLI runs ~70 s.  The on-disk cache
survives processes (measured 36 s -> 0.7 s for a recompile in a fresh
interpreter), so only the first-ever run on a machine pays.

Disable with PORECHOP_TPU_NO_COMPILE_CACHE=1; relocate with
PORECHOP_TPU_COMPILE_CACHE=<dir>.
"""

from __future__ import annotations

import os

_done = False


def configure() -> None:
    global _done
    if _done:
        return
    _done = True
    if os.environ.get('PORECHOP_TPU_NO_COMPILE_CACHE'):
        return
    # CPU-pinned runs (tests, forced-host deployments) skip the cache: XLA's
    # CPU AOT cache entries record machine-feature sets that can mismatch on
    # reload (observed "+prefer-no-scatter not supported" warnings), and CPU
    # compiles are fast anyway.  The cache exists for the 30-60 s per-shape
    # remote TPU compiles.
    if 'cpu' in os.environ.get('JAX_PLATFORMS', '').lower():
        return
    cache = os.environ.get(
        'PORECHOP_TPU_COMPILE_CACHE',
        os.path.join(os.path.expanduser('~'), '.cache', 'porechop_tpu',
                     'xla_cache'))
    try:
        os.makedirs(cache, exist_ok=True)
        import jax
        jax.config.update('jax_compilation_cache_dir', cache)
        jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
        # Skip caching sub-second compiles (CPU test runs would otherwise
        # churn thousands of tiny cache files).
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 2.0)
    except Exception:
        pass
