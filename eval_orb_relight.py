"""ORB relighting evaluation (ref: eval_orb_relight.py).

Compares relit renders against ground-truth relit captures with the ORB
protocol: per-channel scale-invariant HDR PSNR with eroded masks, plus
SSIM and the LPIPS proxy.
"""
from __future__ import annotations

import argparse
import glob
import os

import numpy as np


def erode_mask(mask: np.ndarray, iters: int = 1) -> np.ndarray:
    """Binary erosion (ref: eval_orb_relight eroded-mask protocol)."""
    import cv2
    kernel = np.ones((3, 3), np.uint8)
    return cv2.erode(mask.astype(np.uint8), kernel,
                     iterations=iters).astype(bool)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--pred_dir', type=str, required=True)
    parser.add_argument('--gt_dir', type=str, required=True)
    parser.add_argument('--mask_dir', type=str, default=None)
    args = parser.parse_args()

    import cv2
    from tensoflow_tpu.eval import metrics

    preds = sorted(glob.glob(os.path.join(args.pred_dir, '*.png')))
    psnrs, ssims, lpipss = [], [], []
    for p in preds:
        name = os.path.basename(p)
        g = os.path.join(args.gt_dir, name)
        if not os.path.exists(g):
            continue
        pred = cv2.imread(p)[..., ::-1].astype(np.float32) / 255.0
        gt = cv2.imread(g)[..., ::-1].astype(np.float32) / 255.0
        mask = None
        if args.mask_dir:
            m = cv2.imread(os.path.join(args.mask_dir, name), 0)
            if m is not None:
                mask = erode_mask(m > 127)
        psnrs.append(metrics.scale_invariant_psnr_hdr(gt, pred, mask))
        ssims.append(metrics.ssim(gt, pred))
        lp = metrics.lpips(gt, pred)
        if lp is not None:
            lpipss.append(lp)
        print(f'{name}: si-psnr={psnrs[-1]:.3f}', flush=True)

    msg = (f'relight: SI-PSNR {np.mean(psnrs):.4f} SSIM {np.mean(ssims):.4f}'
           + (f' LPIPS {np.mean(lpipss):.4f}' if lpipss else ''))
    print(msg)
    with open('data/metrics_record.txt', 'a') as f:
        f.write(msg + '\n')


if __name__ == '__main__':
    main()
