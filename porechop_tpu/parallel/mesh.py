"""Device-mesh scale-out.

The reference parallelizes with a host thread pool over (read, adapter) work
items (porechop/porechop.py:24,308-322).  The TPU-native equivalent is data
parallelism over the batch axis of the alignment launches: reads are sharded
across a 1-D device mesh with jax.sharding, the per-lane DP runs fully
locally, and the only cross-device communication is the detection phase's
per-adapter-set max reduction, which XLA lowers to an all-reduce over ICI.

Multi-host: initialize with jax.distributed (see init_distributed); each host
feeds its own shard of the input files and writes its own output shard.
"""

from __future__ import annotations

import os

import numpy as np

from ..ops import _jax_setup

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_jax_setup.configure()

from ..ops import engine_jax

DATA_AXIS = 'data'


def init_distributed():
    """Multi-host initialization (no-op when single-process)."""
    if os.environ.get('PORECHOP_TPU_COORDINATOR'):
        jax.distributed.initialize(
            coordinator_address=os.environ['PORECHOP_TPU_COORDINATOR'],
            num_processes=int(os.environ.get('PORECHOP_TPU_NUM_PROCS', '1')),
            process_id=int(os.environ.get('PORECHOP_TPU_PROC_ID', '0')))


def make_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), (DATA_AXIS,))


_AUTO_MESH = None
_AUTO_MESH_SET = False


def auto_mesh():
    """The mesh production launches shard over: all local devices when there
    is more than one (or when PORECHOP_TPU_MESH=1 forces it for testing);
    None for the common single-chip case.  Cached after first use."""
    global _AUTO_MESH, _AUTO_MESH_SET
    if _AUTO_MESH_SET:
        return _AUTO_MESH
    _AUTO_MESH_SET = True
    if os.environ.get('PORECHOP_TPU_DISABLE_MESH'):
        return None
    devices = jax.devices()
    if len(devices) > 1 or os.environ.get('PORECHOP_TPU_MESH'):
        _AUTO_MESH = make_mesh(devices)
    return _AUTO_MESH


def shard_batch_args(mesh, *arrays):
    """device_put each (B, ...) array with its batch axis sharded over the
    mesh.  B must be divisible by the mesh size (the dispatcher's
    power-of-two lane bucketing guarantees it for power-of-two meshes)."""
    sb = batch_sharding(mesh)
    return tuple(jax.device_put(a, sb) for a in arrays)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 (the batch of read/adapter lanes) across the mesh."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_batch_to_devices(n: int, n_devices: int) -> int:
    return ((n + n_devices - 1) // n_devices) * n_devices


def sharded_align(mesh, reads, read_lens, adapters, adapter_lens,
                  scoring=(3, -6, -5, -2)):
    """Run the alignment core with the batch sharded over the mesh.

    All inputs are host numpy; the batch is padded to a multiple of the mesh
    size (pad lanes have zero-length reads and resolve to failures).
    Returns host numpy results, unpadded.
    """
    match, mismatch, gap_open, gap_ext = (int(x) for x in scoring)
    n = reads.shape[0]
    n_dev = mesh.devices.size
    n_pad = pad_batch_to_devices(n, n_dev)
    if n_pad != n:
        def pad(a, fill):
            out = np.full((n_pad,) + a.shape[1:], fill, dtype=a.dtype)
            out[:n] = a
            return out
        reads = pad(reads, 4)
        read_lens = pad(read_lens, 1)       # length-1 pad lanes, cheap
        adapters = pad(adapters, 4)
        adapter_lens = pad(adapter_lens, 1)

    sb = batch_sharding(mesh)
    args = (jax.device_put(jnp.asarray(reads, jnp.int8), sb),
            jax.device_put(jnp.asarray(read_lens, jnp.int32), sb),
            jax.device_put(jnp.asarray(adapters, jnp.int8), sb),
            jax.device_put(jnp.asarray(adapter_lens, jnp.int32), sb))
    best_sc, best_st, cell_i, cell_j = engine_jax._align_core(
        *args, match, mismatch, gap_open, gap_ext)
    out = engine_jax.finish_batch(best_sc, best_st, cell_i, cell_j,
                                  np.asarray(read_lens), np.asarray(adapter_lens))
    return {k: v[:n] for k, v in out.items()}


def detection_step(mesh, reads, read_lens, adapters, adapter_lens,
                   set_ids, n_sets, scoring=(3, -6, -5, -2)):
    """The full detection-phase device step: sharded batched alignment plus a
    cross-shard per-adapter-set max reduction.

    set_ids: (B,) int32 mapping each lane to its adapter-set slot.  Returns
    per-set (max_key, best_matches, best_full_len) host arrays; the segment
    max over a sharded batch is the collective XLA inserts (an all-reduce
    over ICI), mirroring the psum-merge described in SURVEY.md §2.3.
    """
    match, mismatch, gap_open, gap_ext = (int(x) for x in scoring)
    n = reads.shape[0]
    n_dev = mesh.devices.size
    n_pad = pad_batch_to_devices(n, n_dev)
    if n_pad != n:
        def pad(a, fill):
            out = np.full((n_pad,) + a.shape[1:], fill, dtype=a.dtype)
            out[:n] = a
            return out
        reads = pad(reads, 4)
        read_lens = pad(read_lens, 1)
        adapters = pad(adapters, 4)
        adapter_lens = pad(adapter_lens, 1)
        set_ids = pad(np.asarray(set_ids, np.int32), n_sets)  # pad -> dummy set

    sb = batch_sharding(mesh)

    @jax.jit
    def step(reads, read_lens, adapters, adapter_lens, set_ids):
        best_sc, best_st, cell_i, cell_j = engine_jax._align_core.__wrapped__(
            reads, read_lens, adapters, adapter_lens,
            match, mismatch, gap_open, gap_ext)
        # full identity ~ matches / full_len; rank by the exact fraction via
        # cross-multiplication to stay in integers on device.
        matches, full_len = _full_stats(best_st, cell_i, cell_j,
                                        read_lens, adapter_lens)
        key = matches.astype(jnp.float32) / jnp.maximum(full_len, 1)
        seg = jnp.full((n_sets + 1,), -1.0, jnp.float32)
        seg = seg.at[set_ids].max(key)
        lane_best = key == seg[set_ids]
        best_m = jnp.zeros((n_sets + 1,), jnp.int32)
        best_l = jnp.zeros((n_sets + 1,), jnp.int32)
        best_m = best_m.at[jnp.where(lane_best, set_ids, n_sets)].max(
            matches.astype(jnp.int32))
        best_l = best_l.at[jnp.where(lane_best, set_ids, n_sets)].max(
            full_len.astype(jnp.int32))
        return seg[:n_sets], best_m[:n_sets], best_l[:n_sets]

    args = (jax.device_put(jnp.asarray(reads, jnp.int8), sb),
            jax.device_put(jnp.asarray(read_lens, jnp.int32), sb),
            jax.device_put(jnp.asarray(adapters, jnp.int8), sb),
            jax.device_put(jnp.asarray(adapter_lens, jnp.int32), sb),
            jax.device_put(jnp.asarray(set_ids, jnp.int32), sb))
    seg, best_m, best_l = step(*args)
    return (np.asarray(seg), np.asarray(best_m), np.asarray(best_l))


def _full_stats(best_st, cell_i, cell_j, read_lens, adapter_lens):
    """Device-side fragment of finish_batch: (matches, full adapter span)."""
    S_COLS, S_MATCH, S_FAC, S_LAC = (engine_jax.S_COLS, engine_jax.S_MATCH,
                                     engine_jax.S_FAC, engine_jax.S_LAC)
    cols = best_st[:, S_COLS]
    fac = best_st[:, S_FAC]
    lac = best_st[:, S_LAC]
    matches = best_st[:, S_MATCH]
    has_rtail = cell_j < read_lens
    cols = cols + jnp.where(has_rtail, read_lens - cell_j, 0)
    has_atail = cell_i < adapter_lens
    fac = jnp.where(has_atail, jnp.minimum(fac, cols), fac)
    lac = jnp.where(has_atail, cols + (adapter_lens - cell_i) - 1, lac)
    return matches, lac - fac + 1
