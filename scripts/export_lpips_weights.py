#!/usr/bin/env python
"""Export the lpips-0.1 VGG16 weight bundle -> assets/lpips_vgg16.npz.

eval/metrics.lpips_exact implements the exact lpips-0.1 architecture but
this image has no network egress, so the pretrained tensors cannot be
downloaded here.  Run THIS script once on any machine with internet
access (``pip install lpips torch``), then copy the resulting npz into
``tensoflow_tpu/assets/`` — lpips_exact picks it up automatically and
the relight metrics switch from the VGG-proxy to exact LPIPS
(ref: utils/base_utils.py:52-66 uses the lpips package directly).

Bundle schema (consumed by eval/metrics.lpips_exact):
  features.{i}.weight  [O,I,3,3] f32   torchvision vgg16().features convs
  features.{i}.bias    [O]       f32
  lin{k}.weight        [1,C,1,1] f32   the 5 learned LPIPS heads, k=0..4

Usage:
  python scripts/export_lpips_weights.py [out.npz]
"""
import sys

import numpy as np


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else 'lpips_vgg16.npz'
    try:
        import lpips  # pip install lpips  (pulls torch + weights)
    except ImportError:
        sys.exit('the `lpips` package is required: pip install lpips\n'
                 '(this image has no egress — run on a connected machine '
                 'and copy the npz into tensoflow_tpu/assets/)')
    model = lpips.LPIPS(net='vgg')
    bundle = {}
    # VGG16 backbone: lpips stores torchvision's features as net.slice1-5
    for name, p in model.net.named_parameters():
        # e.g. slice1.0.weight -> torchvision features index is the
        # second token because lpips re-registers the SAME modules with
        # their original indices inside sequential slices
        idx = name.split('.')[1]
        kind = name.split('.')[-1]
        bundle[f'features.{idx}.{kind}'] = p.detach().numpy().astype(
            np.float32)
    for k in range(5):
        lin = getattr(model, f'lin{k}')
        w = lin.model[-1].weight.detach().numpy().astype(np.float32)
        bundle[f'lin{k}.weight'] = w
    # sanity: 13 convs x2 tensors + 5 heads
    n_conv = sum(1 for k in bundle if k.startswith('features')
                 and k.endswith('weight'))
    assert n_conv == 13, sorted(bundle)
    assert all(f'lin{k}.weight' in bundle for k in range(5))
    np.savez(out, **bundle)
    print(f'wrote {out} ({len(bundle)} tensors); copy into '
          'tensoflow_tpu/assets/lpips_vgg16.npz')


if __name__ == '__main__':
    main()
