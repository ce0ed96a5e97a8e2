"""Relight a trained material model under a new environment map
(ref: relight_orb.py).

Uses the framework-native TPU relighter by default (no Blender needed);
``--blender`` emits the Blender bundle instead (ref bridge).
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
    parser.add_argument('--hdr', type=str, required=True,
                        help='equirectangular HDR/LDR environment image')
    parser.add_argument('--blender', action='store_true')
    parser.add_argument('--out', type=str, default=None)
    parser.add_argument('overrides', nargs='*')
    args = parser.parse_args()

    import cv2
    import imageio.v2 as iio
    import jax
    import jax.numpy as jnp
    from tensoflow_tpu.config import load_config
    from tensoflow_tpu.data import database as db_mod
    from tensoflow_tpu.eval import relight as relight_mod
    from tensoflow_tpu.ops import cubemap as cm
    from tensoflow_tpu.models import material_renderer as mr
    from tensoflow_tpu.train.trainer_mat import MaterialTrainer

    cfg = load_config(args.cfg, overrides=args.overrides)
    trainer = MaterialTrainer(cfg, cfg['geo_model_path'])
    ckpt = os.path.join('data/model', cfg['name'], 'model.pkl')
    trainer.load(ckpt)

    if args.blender:
        relight_mod.run_blender_relight(cfg, args.hdr)
        return

    env_img = iio.imread(args.hdr).astype(np.float32)
    if env_img.max() > 2.0:
        env_img = env_img / 255.0
    env_cube = cm.latlong_to_cubemap(jnp.asarray(env_img[..., :3]), 64)

    database = db_mod.parse_database_name(
        cfg['database_name'], cfg['dataset_dir'], isTest=True,
        isWhiteBG=cfg['isBGWhite'])
    out_dir = args.out or os.path.join('data/relight', cfg['name'])
    os.makedirs(out_dir, exist_ok=True)

    from tensoflow_tpu.data import rays as rays_mod
    aabb = jnp.asarray(trainer.rcfg.aabb)
    us = mr.unit_size(trainer.rcfg)
    for vid in database.get_img_ids()[:8]:
        gt = database.get_image(vid)
        h, w = gt.shape[:2]
        info = {'imgs': np.zeros((1, h, w, 3), np.float32),
                'Ks': database.get_K(vid)[None].astype(np.float32),
                'poses': database.get_pose(vid)[None].astype(np.float32)}
        batch, rn, _, _ = rays_mod.construct_ray_batch_nerf(info)
        img = np.ones((rn, 3), np.float32)
        chunk = 4096
        for ri in range(0, rn, chunk):
            o = jnp.asarray(batch['rays_o'][ri:ri + chunk])
            d = jnp.asarray(batch['dirs'][ri:ri + chunk])
            inters, normals, depth, hit = mr.trace_surface(
                trainer.geo_params, trainer.rcfg, trainer.grid, o, d)
            trainer.rng, k = jax.random.split(trainer.rng)
            colors = relight_mod.relight_direct(
                trainer.params, trainer.rcfg.shader, trainer.grid, us, aabb,
                inters, normals, env_cube, -d, k)
            sel = np.asarray(hit)
            img[ri:ri + chunk][sel] = np.asarray(colors)[sel]
        img = img.reshape(h, w, 3)
        cv2.imwrite(os.path.join(out_dir, f'relit_{vid}.png'),
                    (np.clip(img, 0, 1) * 255)[..., ::-1].astype(np.uint8))
        print(f'relit view {vid}', flush=True)


if __name__ == '__main__':
    main()
