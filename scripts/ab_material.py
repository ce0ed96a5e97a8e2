#!/usr/bin/env python
"""Stage-2 A/B artifacts (VERDICT r4 asks 5+6), hermetic on CPU.

One shared stage-1 geometry, then three material-stage arms from the
SAME config/seed/data, differing in exactly one switch:

  * ``budgeted_nis``      — production: budgeted secondary trace, flows on
  * ``budgeted_nis_off``  — flows never sample / no NIS loss
        -> the NIS A/B behind the paper's core claim (estimator variance
           + PSNR trajectories at matched steps)
  * ``dense_nis``         — dense full-fidelity secondary trace
        -> the budgeted-trace quality A/B behind the 0.988-agreement
           number (final PSNR + material-map deltas between arms)

Writes data/convergence/toy_material_ab.json; bounds asserted by
tests/test_convergence_artifact.py.

Usage: python scripts/ab_material.py [--steps N]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def mat_config(config_mod, name, steps, nis_on: bool, budgeted: bool):
    nis_start = max(steps // 5, 10)
    shader = {
        'diffuse_sample_num': 64,
        'specular_sample_num': 32,
        'nis_diffuse_sample_num': 16,
        'nis_specular_sample_num': 16,
        'nis_start_iter': nis_start,
        'nis_loss_iter': max(nis_start // 2, 5),
        'nis_update_interval': max(steps // 15, 5),
        'grid_size': (64, 64, 64),
        'light_reso': 64,
        'use_nis_diffuse': nis_on,
        'use_nis_specular': nis_on,
    }
    if not budgeted:
        shader['secondary_budget'] = 0.0     # dense full-fidelity trace
        shader['inner_light_budget'] = 0.0
    return config_mod.load_config(extra={
        'name': name,
        'isMaterial': True,
        'database_name': 'toy/sphere_64_8',
        'dataset_dir': 'unused', 'nerfDataType': True,
        'train_ray_num': 128,
        'bake_resolution': 128,
        'refine_with_neural_sdf': True,
        'shader_cfg': shader,
    })


def surface_material_maps(mt):
    """Predicted material maps on a fixed surface-point probe set."""
    import jax
    import jax.numpy as jnp
    from tensoflow_tpu.fields import mc_shading
    rng = np.random.RandomState(0)
    n = rng.randn(2048, 3).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    pts = jnp.asarray(0.5 * n)
    aabb = jnp.asarray(mt.rcfg.aabb, jnp.float32)
    met, rough, alb = jax.jit(mc_shading.predict_materials,
                              static_argnums=1)(
        mt.params, mt.rcfg.shader, pts, aabb)
    return {'metallic': np.asarray(met), 'roughness': np.asarray(rough),
            'albedo': np.asarray(alb)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--steps', type=int, default=1500)
    ap.add_argument('--shape-steps', type=int, default=500)
    ap.add_argument('--out', type=str,
                    default='data/convergence/toy_material_ab.json')
    args = ap.parse_args()

    import jax
    jax.config.update('jax_platforms', 'cpu')
    from tensoflow_tpu import config as config_mod
    from tensoflow_tpu.train.trainer import ShapeTrainer
    from tensoflow_tpu.train.trainer_mat import MaterialTrainer

    t0 = time.time()
    shape_cfg = config_mod.load_config(extra={
        'name': 'ab_mat_shape',
        'database_name': 'toy/sphere_64_8',
        'dataset_dir': 'unused', 'nerfDataType': True,
        'train_ray_num': 512,
        'n_samples': 24, 'n_importance': 24, 'up_sample_steps': 4,
        'sdf_n_comp': 12, 'sdf_dim': 128, 'app_dim': 64,
        'N_voxel_init': 64 ** 3, 'N_voxel_final': 64 ** 3,
        'apply_occ_loss': False, 'apply_mask_loss': True,
        'anneal_end': 200,
    })
    st = ShapeTrainer(shape_cfg)
    st.init_dataset()
    logs1 = st.train(n_steps=args.shape_steps, log_every=100)
    geo_path = '/tmp/ab_mat_geo.pkl'
    st.save(geo_path)
    print(f'[stage1] psnr {logs1[-1]["psnr"]:.2f} '
          f'({time.time() - t0:.0f}s)', flush=True)

    arms = {}
    maps = {}
    for name, nis_on, budgeted in (
            ('budgeted_nis', True, True),
            ('budgeted_nis_off', False, True),
            ('dense_nis', True, False)):
        ta = time.time()
        cfg = mat_config(config_mod, f'ab_{name}', args.steps, nis_on,
                         budgeted)
        mt = MaterialTrainer(cfg, geo_path)
        mt.init_dataset()
        traj = []
        mt.train(n_steps=args.steps, log_every=max(args.steps // 30, 10),
                 callback=traj.append)
        val = float(np.mean(mt.validate(max_views=2, downsample=0.5)))
        arms[name] = {
            'val_psnr': val,
            'trajectory': [
                {k: t[k] for k in ('step', 'psnr', 'variance', 'loss_nis',
                                   'loss_rgb') if k in t}
                for t in traj],
        }
        maps[name] = surface_material_maps(mt)
        print(f'[{name}] val_psnr={val:.2f} '
              f'({time.time() - ta:.0f}s)', flush=True)

    def map_delta(a, b):
        return {k: float(np.mean(np.abs(maps[a][k] - maps[b][k])))
                for k in maps[a]}

    record = {
        'generated': 'scripts/ab_material.py',
        'database': 'toy/sphere_64_8 (procedural, hermetic)',
        'mat_steps': args.steps,
        'arms': arms,
        'material_map_mean_abs_delta': {
            'budgeted_vs_dense': map_delta('budgeted_nis', 'dense_nis'),
            'nis_vs_off': map_delta('budgeted_nis', 'budgeted_nis_off'),
        },
        'wall_s': round(time.time() - t0, 1),
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, 'w') as f:
        json.dump(record, f, indent=1)
    print(f'wrote {args.out} ({time.time() - t0:.0f}s)', flush=True)


if __name__ == '__main__':
    main()
