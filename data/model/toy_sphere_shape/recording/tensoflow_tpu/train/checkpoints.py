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
