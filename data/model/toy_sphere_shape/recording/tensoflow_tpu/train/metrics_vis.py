"""Validation metrics + tiled diagnostic image dumps.

Equivalent of the reference metric classes (ref: network/metrics.py:41-153
ShapeRenderMetrics / MaterialRenderMetrics): compute PSNR/SSIM on held-out
renders and write tiled debug images (gt | pred | normal | materials |
lights) to data/train_vis/<name>-val/.
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

from ..eval import metrics as m


def _to_u8(img):
    return (np.clip(img, 0, 1) * 255).astype(np.uint8)


def _tile(images: List[np.ndarray], cols: int = 4) -> np.ndarray:
    """Grid-tile same-height images; grayscale promoted to rgb."""
    imgs = []
    for im in images:
        if im is None:
            continue
        if im.ndim == 2:
            im = im[..., None]
        if im.shape[-1] == 1:
            im = np.repeat(im, 3, -1)
        imgs.append(_to_u8(im[..., :3]))
    if not imgs:
        return np.zeros((1, 1, 3), np.uint8)
    h, w = imgs[0].shape[:2]
    rows = []
    for i in range(0, len(imgs), cols):
        row = imgs[i:i + cols]
        row += [np.zeros((h, w, 3), np.uint8)] * (cols - len(row))
        rows.append(np.concatenate(row, 1))
    return np.concatenate(rows, 0)


SHAPE_KEYS = ['ray_rgb', 'normal_vis', 'albedo', 'roughness', 'metallic',
              'occ_prob', 'occ_prob_gt', 'diffuse_color', 'specular_color',
              'diffuse_light', 'specular_light', 'indirect_light']
MAT_KEYS = ['rgb_pr', 'normal', 'albedo', 'roughness', 'metallic',
            'diffuse_color', 'specular_color', 'diffuse_light',
            'specular_light', 'visibility', 'indirect_light']


def eval_and_dump(gt: np.ndarray, outputs: Dict[str, np.ndarray],
                  model_name: str, step: int, index: int,
                  keys: Optional[List[str]] = None,
                  pred_key: str = 'ray_rgb',
                  vis_dir: str = 'data/train_vis') -> Dict[str, float]:
    """PSNR/SSIM vs gt + tiled diagnostic dump
    (ref: metrics.py:41-136)."""
    keys = keys or SHAPE_KEYS
    pred = outputs[pred_key]
    results = {'psnr': m.psnr(gt, pred), 'ssim': m.ssim(gt, pred)}

    out_dir = os.path.join(vis_dir, f'{model_name}-val')
    os.makedirs(out_dir, exist_ok=True)
    tiles = [gt] + [outputs.get(k) for k in keys if k in outputs]
    tiled = _tile(tiles)
    try:
        import cv2
        cv2.imwrite(os.path.join(out_dir, f'step{step}-{index}.jpg'),
                    tiled[..., ::-1])
    except Exception:
        pass
    return results


class ValidationEvaluator:
    """Accumulate metric dicts over a val split, pick the key metric
    (ref: train/train_valid.py:18-51)."""

    def __init__(self, key_metric_name: str = 'psnr'):
        self.key_metric_name = key_metric_name

    def __call__(self, render_fn, val_ids, database, model_name: str,
                 step: int, downsample: float = 1.0):
        import cv2
        agg: Dict[str, List[float]] = {}
        for i, vid in enumerate(val_ids):
            gt = database.get_image(vid).astype(np.float32) / 255.0
            K = database.get_K(vid).copy()
            pose = database.get_pose(vid)
            h, w = gt.shape[:2]
            if downsample != 1.0:
                h, w = int(h * downsample), int(w * downsample)
                gt = cv2.resize(gt, (w, h), interpolation=cv2.INTER_LINEAR)
                K = np.diag([downsample, downsample, 1.0]).astype(
                    np.float32) @ K
            outputs = render_fn(pose, K, h, w)
            pred_key = 'ray_rgb' if 'ray_rgb' in outputs else 'rgb_pr'
            res = eval_and_dump(gt, outputs, model_name, step, i,
                                pred_key=pred_key)
            for k, v in res.items():
                agg.setdefault(k, []).append(v)
        means = {k: float(np.mean(v)) for k, v in agg.items()}
        return means, means.get(self.key_metric_name, 0.0)
