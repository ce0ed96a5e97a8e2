"""Material-stage evaluation CLI (ref: eval_mat.py).

Modes:
  --run_nvs:       render test views (analytic + NIS variants), PSNR/SSIM
  --extract_mats:  bake vertex materials onto the stage-1 mesh
                   (gamma-corrected albedo, ref: eval_mat.py:114-134)
  --relight:       write the Blender relighting bundle + invoke blender if
                   available (ref: eval_mat.py:136-173)
"""
from __future__ import annotations

import argparse
import os
import subprocess

import numpy as np


def main():
    from tensoflow_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    parser = argparse.ArgumentParser()
    parser.add_argument('--cfg', type=str, required=True)
    parser.add_argument('--ckpt', type=str, default=None)
    parser.add_argument('--run_nvs', action='store_true')
    parser.add_argument('--extract_mats', action='store_true')
    parser.add_argument('--relight', action='store_true')
    parser.add_argument('--hdr', type=str, default=None)
    parser.add_argument('--max_views', type=int, default=100)
    parser.add_argument('overrides', nargs='*')
    args = parser.parse_args()

    import cv2
    from tensoflow_tpu.config import load_config
    from tensoflow_tpu.data import database as db_mod
    from tensoflow_tpu.eval import metrics
    from tensoflow_tpu.ops import mesh as mesh_mod
    from tensoflow_tpu.ops.math import linear_to_srgb
    from tensoflow_tpu.models import material_renderer as mr
    from tensoflow_tpu.train.trainer_mat import MaterialTrainer

    cfg = load_config(args.cfg, overrides=args.overrides)
    trainer = MaterialTrainer(cfg, cfg['geo_model_path'])
    ckpt_path = args.ckpt or os.path.join('data/model', cfg['name'],
                                          'model.pkl')
    trainer.load(ckpt_path)

    if args.run_nvs:
        database = db_mod.parse_database_name(
            cfg['database_name'], cfg['dataset_dir'], isTest=True,
            isWhiteBG=cfg['isBGWhite'])
        trainer.database = database
        save_dir = os.path.join('data/nvs', cfg['name'])
        os.makedirs(save_dir, exist_ok=True)
        psnrs, ssims = [], []
        for vid in database.get_img_ids()[:args.max_views]:
            gt = database.get_image(vid).astype(np.float32) / 255.0
            h, w = gt.shape[:2]
            out = trainer.render_image(database.get_pose(vid),
                                       database.get_K(vid), h, w)
            key = 'rgb_pr_nis' if 'rgb_pr_nis' in out else 'rgb_pr'
            pred = out[key]
            if key == 'rgb_pr_nis':
                pred = pred + (1.0 - out['hit_mask'])
            psnrs.append(metrics.psnr(gt, pred))
            ssims.append(metrics.ssim(gt, pred))
            cv2.imwrite(os.path.join(save_dir, f'{vid}_mat.png'),
                        (np.clip(pred, 0, 1) * 255)[..., ::-1]
                        .astype(np.uint8))
            print(f'view {vid}: psnr={psnrs[-1]:.3f}', flush=True)
        msg = (f"{cfg['name']} mat: PSNR {np.mean(psnrs):.4f} "
               f"SSIM {np.mean(ssims):.4f}")
        print(msg)
        with open('data/metrics_record.txt', 'a') as f:
            f.write(msg + '\n')

    if args.extract_mats or args.relight:
        verts, tris = mesh_mod.read_ply(cfg['mesh'])
        mats = mr.predict_vertex_materials(trainer.params, trainer.rcfg,
                                           verts.astype(np.float32))
        out_dir = os.path.join('data/materials', cfg['name'])
        os.makedirs(out_dir, exist_ok=True)
        # gamma-corrected albedo export (ref: eval_mat.py:129-134)
        albedo_srgb = np.asarray(linear_to_srgb(mats['albedo']))
        np.save(os.path.join(out_dir, 'albedo.npy'), albedo_srgb)
        np.save(os.path.join(out_dir, 'metallic.npy'), mats['metallic'])
        np.save(os.path.join(out_dir, 'roughness.npy'), mats['roughness'])
        print(f'materials saved to {out_dir}')

    if args.relight:
        from tensoflow_tpu.eval import relight
        relight.run_blender_relight(cfg, args.hdr)


if __name__ == '__main__':
    main()
