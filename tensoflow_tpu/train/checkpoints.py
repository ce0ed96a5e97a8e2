"""Checkpointing: plain pytree pickles with metadata.

Replaces torch.save state dicts (ref: trainer_inv.py:356-369,
shapeRenderer.py:343-362): one file per save containing step, params,
optimizer state, occupancy grid, voxel schedule and the model kwargs needed
to rebuild static configs on resume (grid size / n_levels override the YAML
on load, mirroring ref trainer_inv.py:105-107).
"""
from __future__ import annotations

import os
import pickle
from typing import Any, Dict

import jax
import numpy as np


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, payload: Dict[str, Any]):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    host = {k: (_to_host(v) if k in
                ('params', 'opt_state', 'occ_state', 'flow_copies') else v)
            for k, v in payload.items()}
    tmp = path + '.tmp'
    with open(tmp, 'wb') as f:
        pickle.dump(host, f, protocol=4)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> Dict[str, Any]:
    with open(path, 'rb') as f:
        return pickle.load(f)


def restore_opt_state(saved, fresh):
    """Shape-checked optimizer-state restore (ref: trainer_inv.py:108-113).

    Returns the saved state (as device arrays) when its tree structure and
    leaf shapes/dtypes match the freshly-initialized one — i.e. resume
    within a grid phase keeps the Adam moments; any mismatch (upsample
    boundary, config change) falls back to the fresh state.
    """
    if saved is None:
        return fresh, False
    ts = jax.tree_util.tree_structure(saved)
    tf = jax.tree_util.tree_structure(fresh)
    if ts != tf:
        return fresh, False
    ls = jax.tree_util.tree_leaves(saved)
    lf = jax.tree_util.tree_leaves(fresh)
    for a, b in zip(ls, lf):
        if np.shape(a) != np.shape(b):
            return fresh, False
    restored = jax.tree.map(
        lambda a, b: jax.numpy.asarray(a, dtype=b.dtype), saved, fresh)
    return restored, True


def pack_alpha_mask(mask) -> Dict[str, Any]:
    """AlphaGridMask -> packbits payload (ref: shapeRenderer.py:343-356)."""
    if mask is None:
        return None
    vol = np.asarray(mask.volume) > 0.5
    return {'aabb': np.asarray(mask.aabb, np.float32),
            'shape': list(vol.shape),
            'bits': np.packbits(vol.reshape(-1))}


def unpack_alpha_mask(payload):
    from ..ops import grid as grid_mod
    import jax.numpy as jnp
    if payload is None:
        return None
    n = int(np.prod(payload['shape']))
    vol = np.unpackbits(payload['bits'])[:n].reshape(payload['shape'])
    return grid_mod.AlphaGridMask(
        aabb=jnp.asarray(payload['aabb']),
        volume=jnp.asarray(vol, jnp.float32))
