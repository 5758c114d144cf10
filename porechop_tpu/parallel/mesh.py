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
    """The mesh production launches shard over: all devices LOCAL to this
    process when there is more than one (or when PORECHOP_TPU_MESH=1 forces
    it for testing); None for the common single-chip case.  Cached after
    first use.

    Local, not global, devices: each jax.distributed rank dispatches its
    own block's launches independently, so a mesh spanning other processes
    would turn every launch into an unsynchronized cross-process collective
    — ranks with different block sizes then issue mismatched collectives
    and gloo aborts (observed with uneven directory-input blocks).  The
    only cross-process reduction in the pipeline is the detection stats
    merge, which goes through multihost.merge_detection_stats (a host-level
    allgather every rank calls in lockstep)."""
    global _AUTO_MESH, _AUTO_MESH_SET
    if _AUTO_MESH_SET:
        return _AUTO_MESH
    _AUTO_MESH_SET = True
    if os.environ.get('PORECHOP_TPU_DISABLE_MESH'):
        return None
    devices = jax.local_devices()
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


def _pad_lanes(n_pad, reads, read_lens, adapters, adapter_lens):
    def pad(a, fill):
        out = np.full((n_pad,) + a.shape[1:], fill, dtype=a.dtype)
        out[:len(a)] = a
        return out
    # Pad-lane read rows follow the live-row convention pack_codes checks
    # (codes < 4 exactly in the first `len` columns): fill with 4 ('N'/pad)
    # and make column 0 a single live 'A' to match the padded length of 1.
    # Their results are sliced off (or mapped to the dummy set) either way,
    # and an otherwise N-free batch stays eligible for the 2-bit format
    # (same trick as the dispatcher's dummy rows, dispatch.py).
    reads_p = pad(np.asarray(reads), 4)
    reads_p[len(reads):, 0] = 0
    return (reads_p, pad(np.asarray(read_lens), 1),
            pad(np.asarray(adapters), 4), pad(np.asarray(adapter_lens), 1))


def sharded_align(mesh, reads, read_lens, adapters, adapter_lens,
                  scoring=(3, -6, -5, -2)):
    """Run the production (v2 bitmap) alignment engine with the batch
    sharded over the mesh: shard_map'd forward + device traceback, host
    finish.  All inputs are host numpy; the batch pads to a multiple of the
    mesh size (1-bp pad lanes, cheap).  Returns host numpy, unpadded."""
    from ..ops import engine_v2
    match, mismatch, gap_open, gap_ext = (int(x) for x in scoring)
    n = reads.shape[0]
    n_dev = mesh.devices.size
    n_pad = pad_batch_to_devices(n, n_dev)
    reads, read_lens, adapters, adapter_lens = _pad_lanes(
        n_pad, reads, read_lens, adapters, adapter_lens)

    sb = batch_sharding(mesh)
    B, L = reads.shape
    A = adapters.shape[1]
    mode = engine_v2._pallas_mode(B // n_dev, L, A)
    fn = engine_v2._sharded_dense_fn(mesh, match, mismatch, gap_open,
                                     gap_ext, mode)
    walk, best_sc, cell_i, cell_j = fn(
        jax.device_put(jnp.asarray(reads, jnp.int8), sb),
        jax.device_put(jnp.asarray(read_lens, jnp.int32), sb),
        jax.device_put(jnp.asarray(adapters, jnp.int8), sb),
        jax.device_put(jnp.asarray(adapter_lens, jnp.int32), sb))
    out = engine_v2.finish_v2(walk, best_sc, cell_i, cell_j,
                              read_lens, adapter_lens)
    return {k: v[:n] for k, v in out.items()}


def detection_step(mesh, reads, read_lens, adapters, adapter_lens,
                   set_ids, n_sets, scoring=(3, -6, -5, -2)):
    """The full detection-phase device step on the production (v2) engine:
    sharded batched alignment plus the cross-shard per-adapter-set max
    reduction (lax.pmax inside shard_map — the collective plan of SURVEY.md
    §2.3, replacing the reference's shared-memory max race,
    porechop/nanopore_read.py:159,164).

    set_ids: (B,) int32 mapping each lane to its adapter-set slot.  Returns
    per-set (max_key, best_matches, best_full_len) host arrays."""
    from ..ops import engine_v2
    n = reads.shape[0]
    n_dev = mesh.devices.size
    n_pad = pad_batch_to_devices(n, n_dev)
    reads, read_lens, adapters, adapter_lens = _pad_lanes(
        n_pad, reads, read_lens, adapters, adapter_lens)
    set_pad = np.full(n_pad, n_sets, np.int32)          # pad -> dummy set
    set_pad[:n] = np.asarray(set_ids, np.int32)[:n]

    match, mismatch, gap_open, gap_ext = (int(x) for x in scoring)
    sb = batch_sharding(mesh)
    B, L = reads.shape
    A = adapters.shape[1]
    # Dense batch-sharded launch: detection lanes map 1:1 to rows, so every
    # per-lane array shards over the mesh — per-device memory is B/D lanes
    # and only the (n_sets,) reduction replicates (the gather-table variant
    # would replicate every read window to every device).
    wpk = engine_v2.pack_codes(reads, read_lens)
    mode = engine_v2._pallas_mode(B // n_dev, L, A)
    fn = engine_v2._sharded_dense_groupmax_fn(mesh, L, int(n_sets), match,
                                              mismatch, gap_open, gap_ext,
                                              mode)
    gm, gl = fn(jax.device_put(wpk, sb),
                jax.device_put(jnp.asarray(read_lens, jnp.int32), sb),
                jax.device_put(jnp.asarray(adapters, jnp.int8), sb),
                jax.device_put(jnp.asarray(adapter_lens, jnp.int32), sb),
                jax.device_put(jnp.asarray(set_pad), sb))
    gm = np.asarray(gm).astype(np.int64)
    gl = np.asarray(gl).astype(np.int64)
    seg = np.where(gl > 0, gm / np.maximum(gl, 1), -1.0).astype(np.float32)
    seg[(gm == 0) & (gl == 0)] = -1.0
    return seg, gm.astype(np.int32), gl.astype(np.int32)
