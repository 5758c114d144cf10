"""porechop_tpu: a TPU-native adapter trimming / demultiplexing framework
with the capabilities of rrwick/Porechop (reference v0.2.4).

Compute path: JAX/XLA (+ Pallas kernels) over batched integer tensors.
Host path: streaming FASTA/FASTQ IO, trim/split/bin decision logic, CLI.
"""

from .version import __version__

__all__ = ['__version__']

# One compile-cache configurator for the whole package (ops/_jax_setup.py).
# It only touches jax.config when jax is importable; env-var family:
# PORECHOP_TPU_NO_COMPILE_CACHE=1 to disable, PORECHOP_TPU_COMPILE_CACHE=<dir>
# to relocate.
from .ops import _jax_setup as _jax_setup

_jax_setup.configure()

# Allocator tuning: keep large numpy buffers resident across phases/runs —
# on overcommitted hosts a fresh page fault costs ~50x a warm write
# (utils/malloc_tune.py).  Opt out: PORECHOP_TPU_NO_MALLOC_TUNE=1.
from .utils import malloc_tune as _malloc_tune

_malloc_tune.configure()
