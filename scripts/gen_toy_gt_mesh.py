#!/usr/bin/env python
"""Ground-truth mesh for the procedural toy scenes (Chamfer evaluation).

Marches the ANALYTIC SDF (data/toy.py blob_sdf, or the sphere) with the
native marching-tets isosurfacer — the same geometry the training images
were rendered from, so eval_orb_shape's Chamfer against this mesh is a
true geometric-accuracy number (no real dataset ships in this image).

Usage: python scripts/gen_toy_gt_mesh.py [blobs|sphere] [res] [out.ply]
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    scene = sys.argv[1] if len(sys.argv) > 1 else 'blobs'
    res = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    out = (sys.argv[3] if len(sys.argv) > 3
           else f'data/meshes/toy_{scene}_gt.ply')
    import jax
    jax.config.update('jax_platforms', 'cpu')
    from tensoflow_tpu.data.toy import blob_sdf
    from tensoflow_tpu.ops import mesh

    xs = np.linspace(-1.0, 1.0, res)
    xx, yy, zz = np.meshgrid(xs, xs, xs, indexing='ij')
    pts = np.stack([xx, yy, zz], -1)
    if scene == 'blobs':
        vals = blob_sdf(pts).astype(np.float32)
    else:
        vals = (np.linalg.norm(pts, axis=-1) - 0.5).astype(np.float32)
    verts, faces = mesh.marching_tets(vals)
    # grid index -> world coords in [-1, 1]
    verts = verts / (res - 1.0) * 2.0 - 1.0
    os.makedirs(os.path.dirname(out), exist_ok=True)
    mesh.write_ply(out, verts.astype(np.float32), faces)
    print(f'wrote {out}: {len(verts)} verts, {len(faces)} faces')


if __name__ == '__main__':
    main()
