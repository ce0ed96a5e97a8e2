"""Mesh extraction CLI (ref: extract_mesh.py).

Loads a stage-1 checkpoint, runs marching tetrahedra at the requested
resolution over the SDF (sampled at the config's ``blend_ratio`` mip level,
ref: extract_mesh.py:27-47), and writes a PLY.
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def main():
    from tensoflow_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    parser = argparse.ArgumentParser()
    parser.add_argument('--cfg', type=str, required=True)
    parser.add_argument('--ckpt', type=str, default=None)
    parser.add_argument('--resolution', type=int, default=512)
    parser.add_argument('--output', type=str, default=None)
    parser.add_argument('overrides', nargs='*')
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    from tensoflow_tpu.config import load_config
    from tensoflow_tpu.fields import tenso_sdf
    from tensoflow_tpu.ops import mesh
    from tensoflow_tpu.train import checkpoints
    from tensoflow_tpu.train.trainer import build_shape_config

    cfg = load_config(args.cfg, overrides=args.overrides)
    ckpt_path = args.ckpt or os.path.join('data/model', cfg['name'],
                                          'model.pkl')
    ckpt = checkpoints.load_checkpoint(ckpt_path)
    kw = ckpt['kwargs']
    rcfg = build_shape_config(cfg, kw['grid_size'], kw['n_levels'])
    params = jax.tree.map(jnp.asarray, ckpt['params'])
    aabb = jnp.asarray(rcfg.aabb)
    blend = float(cfg.get('blend_ratio', 0))

    @jax.jit
    def sdf_fn(pts):
        lv = jnp.full((pts.shape[0], 1), blend)
        return tenso_sdf.sdf_only(params['sdf'], rcfg.sdf, pts, aabb, lv)

    def query(pts_np):
        out = []
        for i in range(0, len(pts_np), 262144):
            out.append(np.asarray(sdf_fn(jnp.asarray(pts_np[i:i + 262144]))))
        return np.concatenate(out, 0)

    verts, tris = mesh.extract_geometry(
        np.array([-1.0, -1, -1]), np.array([1.0, 1, 1]), args.resolution,
        0.0, query)
    out = args.output or os.path.join(
        'data/meshes', f"{cfg['name']}-{ckpt['step']}.ply")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    mesh.write_ply(out, verts, tris)
    print(f'wrote {out}: {len(verts)} verts, {len(tris)} tris')


if __name__ == '__main__':
    main()
