"""Device-mesh sharding for ray-parallel training.

The reference is strictly single-GPU (SURVEY §2.4); this module is the
framework's scaling layer, designed per the TPU plan:
  * a 1-D ``Mesh(('data',))`` over all local+remote devices
  * the global ray batch is sharded along the ray axis; parameters and
    optimizer state are replicated
  * gradients are all-reduced by XLA automatically (replicated params +
    sharded batch inside one jit), riding ICI within a slice and DCN across
    slices; multi-host entry via ``jax.distributed.initialize``

Everything here is thin: because every step function in this framework is
pure and fixed-shape, sharding is a matter of in/out sharding annotations,
not code restructuring.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), ('data',))


# XLA flags for multi-chip TPU runs: keep the gradient all-reduce off the
# critical path.  The latency-hiding scheduler overlaps async collective
# start/done pairs with the backward's compute, and the combiner batches
# the many per-leaf gradient all-reduces (the sharded step emits ~170 —
# one per parameter leaf plus scalar loss psums) into few large ones that
# saturate ICI.  Set these in the environment BEFORE the first jax import
# of a multi-chip process (single-chip runs ignore them):
#     os.environ['LIBTPU_INIT_ARGS'] = TPU_MULTICHIP_XLA_FLAGS
# Recorded here (not auto-applied) because this image exposes one chip
# through a tunnel — see PARITY.md 'ICI overlap' note for the evidence
# trail and the CPU-mesh HLO inspection that stands in for a trace.
TPU_MULTICHIP_XLA_FLAGS = (
    '--xla_tpu_enable_latency_hiding_scheduler=true '
    '--xla_all_reduce_combine_threshold_bytes=33554432'
)


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (ray) axis over the mesh."""
    return NamedSharding(mesh, P('data'))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_shardings(mesh: Mesh, batch: Dict[str, Any]) -> Dict[str, Any]:
    return {k: data_sharding(mesh) for k in batch}


def shard_batch(mesh: Mesh, batch: Dict[str, np.ndarray]):
    """Place a host numpy ray batch onto the mesh, ray-axis sharded."""
    ds = data_sharding(mesh)
    return {k: jax.device_put(v, ds) for k, v in batch.items()}


def replicate_tree(mesh: Mesh, tree):
    r = replicated(mesh)
    return jax.device_put(tree, r)


def pad_to_multiple(batch: Dict[str, np.ndarray], multiple: int):
    """Pad the ray axis so it divides the mesh size; returns (batch, n_real).

    Padded rays are real rays repeated from the start of the batch, so they
    compute fine and only slightly re-weight means.
    """
    n = len(next(iter(batch.values())))
    rem = (-n) % multiple
    if rem == 0:
        return batch, n
    out = {k: np.concatenate([v, v[:rem]], 0) for k, v in batch.items()}
    return out, n


def init_multihost(coordinator: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None):
    """Multi-host runtime entry (replaces nothing in the reference — it has
    no distributed path; this is the JAX-native controller bootstrap)."""
    if coordinator is not None:
        jax.distributed.initialize(coordinator, num_processes, process_id)
    return make_mesh()
