"""porechop_tpu: a TPU-native adapter trimming / demultiplexing framework
with the capabilities of rrwick/Porechop (reference v0.2.4).

Compute path: JAX/XLA (+ Pallas kernels) over batched integer tensors.
Host path: streaming FASTA/FASTQ IO, trim/split/bin decision logic, CLI.
"""

import os

from .version import __version__

__all__ = ['__version__']


def _setup_compilation_cache():
    """Persist XLA compilations across processes.  On tunneled/remote TPU
    backends a cold compile can take tens of seconds; the cache makes CLI
    invocations after the first fast.  Opt out with PORECHOP_TPU_NO_CACHE=1."""
    if os.environ.get('PORECHOP_TPU_NO_CACHE'):
        return
    # Only cache for TPU-like backends: CPU AOT cache entries are
    # machine-feature-sensitive and reload warnings would pollute stderr.
    platforms = os.environ.get('JAX_PLATFORMS', '')
    if platforms and 'cpu' in platforms:
        return
    try:
        import jax
        cache_dir = os.environ.get(
            'PORECHOP_TPU_CACHE_DIR',
            os.path.join(os.path.expanduser('~'), '.cache', 'porechop_tpu', 'xla'))
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_setup_compilation_cache()
