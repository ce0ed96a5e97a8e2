#!/usr/bin/env python
"""Schedule-scale hermetic convergence run (VERDICT r3 item 5).

Trains stage 1 on the procedural blobs scene through the REFERENCE's
phase machinery — occupancy-grid sampler, two log-spaced grid upsamples
(128^3 -> 256^3 -> 512^3 N_voxel equivalents) with optimizer resets,
radiance-field turn-on, occ-loss turn-on, alpha-mask bake — and records
the PSNR / loss / Chamfer trajectory to
data/convergence/blobs_convergence.json.  The committed JSON is asserted
by tests/test_convergence_artifact.py; re-run this script to regenerate.

Runs on CPU (hours-scale); the 512^3 TPU throughput itself is covered by
scripts/scaleproof.py + PARITY.md.  Usage:
    TENSOFLOW_TPU_PLATFORM=cpu python scripts/convergence_run.py [out.json]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    'data', 'convergence', 'blobs_convergence.json')


def chamfer_vs_gt(trainer, res=128, n_surface=20000):
    """Bidirectional Chamfer between the trained SDF's marching-tets mesh
    and the analytic blobs surface (exact GT via blob_sdf projection)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from tensoflow_tpu.data.toy import blob_sdf
    from tensoflow_tpu.fields import tenso_sdf
    from tensoflow_tpu.ops import mesh as mesh_mod

    rcfg = trainer.rcfg
    aabb = jnp.asarray(rcfg.aabb)

    @jax.jit
    def sdf_fn(pts):
        return tenso_sdf.sdf_only(trainer.params['sdf'], rcfg.sdf, pts,
                                  aabb)

    def query(pts_np):
        return np.asarray(sdf_fn(jnp.asarray(pts_np, np.float32)))

    verts, tris = mesh_mod.extract_geometry(
        np.array([-1.0] * 3), np.array([1.0] * 3), res, 0.0, query)
    if len(verts) < 100:
        return float('nan'), len(verts)
    rng = np.random.RandomState(0)
    idx = rng.choice(len(verts), min(n_surface, len(verts)), replace=False)
    pred = verts[idx]
    # pred -> GT: |blob_sdf| is the exact distance (Lipschitz<=1 smooth
    # union, slightly conservative) — no KD tree needed
    d_pred_gt = np.abs(blob_sdf(pred))
    # GT -> pred: sample GT surface by projecting sphere points, then
    # nearest-vertex distance
    gs = rng.randn(n_surface, 3)
    gs /= np.linalg.norm(gs, axis=-1, keepdims=True)
    gt_pts = gs * 0.45
    for _ in range(12):   # sphere-trace-style projection onto the surface
        gt_pts -= blob_sdf(gt_pts)[..., None] * _grad(gt_pts)
    from scipy.spatial import cKDTree
    tree = cKDTree(pred)
    d_gt_pred, _ = tree.query(gt_pts, k=1)
    return float(d_pred_gt.mean() + d_gt_pred.mean()), len(verts)


def _grad(p, eps=1e-4):
    import numpy as np
    from tensoflow_tpu.data.toy import blob_sdf
    offs = np.eye(3) * eps
    g = np.stack([blob_sdf(p + offs[i]) - blob_sdf(p - offs[i])
                  for i in range(3)], -1) / (2 * eps)
    return g / np.maximum(np.linalg.norm(g, axis=-1, keepdims=True), 1e-12)


def main():
    from tensoflow_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    from tensoflow_tpu import config as config_mod
    from tensoflow_tpu.train.trainer import ShapeTrainer

    total = 3600
    up1, up2 = 1200, 2400
    cfg = config_mod.load_config(extra={
        'name': 'convergence_blobs',
        'database_name': 'toy/blobs_96_12',
        'dataset_dir': 'unused',
        'nerfDataType': True,
        'train_ray_num': 512,
        'sdf_n_comp': 16, 'sdf_dim': 128, 'app_dim': 64,
        'use_occ_grid': True, 'occ_grid_reso': 128,
        'occ_max_samples': 96,
        # reference warmup ratio (10k of 100k) on the compressed schedule
        'occ_warmup_steps': 400,
        # reference compressor_occ schedule, compressed 100k -> 3.6k steps
        # (N_voxel 128^3 -> 512^3 log-spaced at the same 20%/40% marks,
        # configs/shape/syn/compressor_occ.yaml:61-64)
        'N_voxel_init': 128 ** 3, 'N_voxel_final': 512 ** 3,
        'upsample_list': [up1, up2],
        'update_AlphaMask_lst': [up1, up2],
        'has_radiance_field': True, 'radiance_field_step': 1800,
        'apply_occ_loss': True, 'occ_loss_step': 1500,
        'occ_loss_max_pn': 512,
        'apply_mask_loss': True,
        'anneal_end': 800,
        'lr_decay_iters': total,
        'total_step': total,
    })
    trainer = ShapeTrainer(cfg)
    trainer.init_dataset()

    traj = {'meta': {'scene': 'toy/blobs_96_12', 'total': total,
                     'upsample_list': [up1, up2],
                     'phases': {'occ_loss_on': 1500, 'radiance_on': 1800},
                     'timestamp': time.strftime('%Y-%m-%d %H:%M:%S')},
            'steps': [], 'chamfer': []}
    t0 = time.time()
    checkpoints_at = list(range(600, total + 1, 600))
    done = 0
    for mark in checkpoints_at:
        logs = trainer.train(n_steps=mark - done, log_every=100)
        done = mark
        for row in logs:
            traj['steps'].append(row)
        val = trainer.validate(max_views=2)
        cham, nverts = chamfer_vs_gt(trainer)
        traj['chamfer'].append({'step': done, 'val_psnr': val,
                                'chamfer': cham, 'n_verts': nverts,
                                'grid': list(trainer.rcfg.sdf.grid_size),
                                'wall_s': round(time.time() - t0, 1)})
        print(f'[{done}] val_psnr={val:.2f} chamfer={cham:.4f} '
              f'grid={trainer.rcfg.sdf.grid_size} '
              f'({time.time() - t0:.0f}s)', flush=True)
        os.makedirs(os.path.dirname(OUT), exist_ok=True)
        with open(OUT, 'w') as f:
            json.dump(traj, f, indent=1)
    print('wrote', OUT)


if __name__ == '__main__':
    main()
