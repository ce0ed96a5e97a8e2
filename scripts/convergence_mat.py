#!/usr/bin/env python
"""Stage-2 (material) schedule-scale convergence artifact.

Hermetic: trains stage-1 geometry on the procedural toy sphere, bakes it,
then runs the FULL material stage — MC estimator, env light, NIS flows
with the reference's phase schedule (warmup -> flow sampling on ->
flow-copy refresh cadence, trainer_mat.py) — for `--steps` steps on CPU,
recording the PSNR / MC-variance / NIS-loss trajectory to
data/convergence/toy_material_convergence.json.  The committed artifact
is asserted by tests/test_convergence_artifact.py (monotonicity bounds),
standing in for the real GlossySynthetic scenes until datasets exist
(none ship in this image).  Ref schedule: trainer_inv.py + fields.py
nis_start_iter/nis_loss_iter gates.

Usage: python scripts/convergence_mat.py [--steps N] [--out PATH]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--steps', type=int, default=1500)
    ap.add_argument('--shape-steps', type=int, default=500)
    ap.add_argument('--out', type=str,
                    default='data/convergence/toy_material_convergence.json')
    args = ap.parse_args()

    import jax
    jax.config.update('jax_platforms', 'cpu')
    from tensoflow_tpu import config as config_mod
    from tensoflow_tpu.train.trainer import ShapeTrainer
    from tensoflow_tpu.train.trainer_mat import MaterialTrainer

    t0 = time.time()
    shape_cfg = config_mod.load_config(extra={
        'name': 'conv_mat_shape',
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
    os.makedirs('data/convergence', exist_ok=True)
    geo_path = '/tmp/conv_mat_geo.pkl'
    st.save(geo_path)
    print(f'[stage1] {args.shape_steps} steps, psnr '
          f'{logs1[0]["psnr"]:.2f} -> {logs1[-1]["psnr"]:.2f} '
          f'({time.time() - t0:.0f}s)', flush=True)

    # reference nis schedule ratios compressed onto --steps: the flows
    # start sampling after ~1/5 of training and the frozen sampling
    # copies refresh on the same cadence the loss uses
    nis_start = max(args.steps // 5, 10)
    mat_cfg = config_mod.load_config(extra={
        'name': 'conv_mat',
        'isMaterial': True,
        'database_name': 'toy/sphere_64_8',
        'dataset_dir': 'unused', 'nerfDataType': True,
        'train_ray_num': 128,
        'bake_resolution': 128,
        'refine_with_neural_sdf': True,
        'shader_cfg': {
            'diffuse_sample_num': 64,
            'specular_sample_num': 32,
            'nis_diffuse_sample_num': 16,
            'nis_specular_sample_num': 16,
            'nis_start_iter': nis_start,
            'nis_loss_iter': max(nis_start // 2, 5),
            'nis_update_interval': max(args.steps // 15, 5),
            'grid_size': (64, 64, 64),
            'light_reso': 64,
        },
    })
    mt = MaterialTrainer(mat_cfg, geo_path)
    mt.init_dataset()

    traj = []

    def cb(host):
        traj.append(host)
        print(f'[stage2] step={host["step"]} psnr={host.get("psnr", 0):.2f}'
              f' var={host.get("variance", 0):.5f}', flush=True)

    mt.train(n_steps=args.steps, log_every=max(args.steps // 30, 10),
             callback=cb)

    record = {
        'generated': 'scripts/convergence_mat.py',
        'database': 'toy/sphere_64_8 (procedural, hermetic)',
        'shape_steps': args.shape_steps,
        'mat_steps': args.steps,
        'nis_start_iter': nis_start,
        'stage1_psnr': [logs1[0]['psnr'], logs1[-1]['psnr']],
        'trajectory': traj,
        'wall_s': round(time.time() - t0, 1),
    }
    with open(args.out, 'w') as f:
        json.dump(record, f, indent=1)
    print(f'wrote {args.out} ({time.time() - t0:.0f}s total)', flush=True)


if __name__ == '__main__':
    main()
