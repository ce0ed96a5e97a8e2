#!/usr/bin/env python
"""Generate reference-oracle parity fixtures (run ONCE; commit the npz).

Executes the reference's pure-python/torch implementations on CPU —
renderutils BSDF set (ref: network/renderutils/bsdf.py), the NIS spline
transforms (ref: network/flow.py:175-525), and NeuS sample_pdf /
get_weights (ref: utils/network_utils.py:117-170) — on seeded random
inputs, and stores inputs + outputs + input-gradients in
tests/fixtures/ref_oracles.npz.  tests/test_ref_parity.py then pins this
framework against the fixtures without needing torch or the reference
tree at test time.
"""
import importlib.util
import os
import sys
import types

import numpy as np
import torch

REF = '/root/reference'
OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'tests', 'fixtures', 'ref_oracles.npz')

torch.manual_seed(0)


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _stub(name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


# stub out the GPU/optional deps the reference modules import at top level
_stub('nvdiffrast')
_stub('nvdiffrast.torch')
_stub('mcubes')
_stub('plyfile')
_stub('open3d')
_stub('trimesh')
_stub('skimage')
_stub('skimage.measure')
sys.modules['skimage'].measure = sys.modules['skimage.measure']
_stub('cv2')
_stub('tqdm', tqdm=lambda x, **k: x)
_stub('utils')
_stub('utils.base_utils', Timing=object)
nu = _load('ref_network_utils', f'{REF}/utils/network_utils.py')
sys.modules['utils.network_utils'] = nu
flow = _load('ref_flow', f'{REF}/network/flow.py')
bsdf = _load('ref_bsdf', f'{REF}/network/renderutils/bsdf.py')

out = {}
rng = np.random.RandomState(0)


def t(x, grad=False):
    v = torch.tensor(np.asarray(x, np.float64))
    if grad:
        v.requires_grad_(True)
    return v


def normed(shape):
    v = rng.randn(*shape)
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


# ---------------------------------------------------------------------------
# 1. BSDF set (ref: network/renderutils/bsdf.py:46-160)
# ---------------------------------------------------------------------------
N = 64
kd = rng.rand(N, 3)
arm = np.stack([rng.rand(N), 0.08 + 0.9 * rng.rand(N), rng.rand(N)], -1)
pos = rng.randn(N, 3) * 0.3
nrm = normed((N, 3))
# keep view/light on the normal's hemisphere so the specular path is live
view_pos = pos + normed((N, 3)) * 0.5 + nrm * 1.0
light_pos = pos + normed((N, 3)) * 0.5 + nrm * 1.2

for bsdf_id, name in ((0, 'lambert'), (1, 'frostbite')):
    args = [t(kd, True), t(arm, True), t(pos), t(nrm, True),
            t(view_pos), t(light_pos)]
    res = bsdf.bsdf_pbr(args[0], args[1], args[2], args[3], args[4],
                        args[5], 0.08, bsdf_id)
    res.sum().backward()
    out[f'pbr_{name}_out'] = res.detach().numpy()
    out[f'pbr_{name}_g_kd'] = args[0].grad.numpy()
    out[f'pbr_{name}_g_arm'] = args[1].grad.numpy()
    out[f'pbr_{name}_g_nrm'] = args[3].grad.numpy()
out['pbr_kd'] = kd
out['pbr_arm'] = arm
out['pbr_pos'] = pos
out['pbr_nrm'] = nrm
out['pbr_view_pos'] = view_pos
out['pbr_light_pos'] = light_pos

# prepare_shading_normal (ref: bsdf.py:37-52)
perturbed = normed((N, 3)) * np.array([0.2, 0.2, 1.0])
smooth_nrm = normed((N, 3))
smooth_tng = normed((N, 3))
geom_nrm = normed((N, 3))
res = bsdf.bsdf_prepare_shading_normal(
    t(pos), t(view_pos), t(perturbed), t(smooth_nrm), t(smooth_tng),
    t(geom_nrm), True, False)
out['psn_out'] = res.numpy()
out['psn_perturbed'] = perturbed
out['psn_smooth_nrm'] = smooth_nrm
out['psn_smooth_tng'] = smooth_tng
out['psn_geom_nrm'] = geom_nrm

# ---------------------------------------------------------------------------
# 2. NIS spline transforms (ref: network/flow.py:175-525)
# ---------------------------------------------------------------------------
Nf, k, b = 32, 2, 10
x = np.clip(rng.rand(Nf, k), 1e-3, 1 - 1e-3)
wv = rng.randn(Nf, k, 2 * b + 1) * 1.5
q = rng.randn(Nf, k, b) * 1.5

pwq = flow.ElementWisePWQuadraticTransform()
xi = t(x, True)
wvi = t(wv, True)
y, logj = pwq.flow_inv(xi, wvi, return_jacobian=True)
(y.sum() + logj.sum()).backward()
out['pwq_x'] = x
out['pwq_wv'] = wv
out['pwq_inv_y'] = y.detach().numpy()
out['pwq_inv_logj'] = logj.detach().numpy()
out['pwq_inv_gx'] = xi.grad.numpy()
out['pwq_inv_gwv'] = wvi.grad.numpy()

yi = t(x, True)          # treat the same points as spline-domain inputs
wvi2 = t(wv, True)
xx, logj2 = pwq.flow(yi, wvi2, return_jacobian=True)
(xx.sum() + logj2.sum()).backward()
out['pwq_fwd_x'] = xx.detach().numpy()
out['pwq_fwd_logj'] = logj2.detach().numpy()
out['pwq_fwd_gy'] = yi.grad.numpy()
out['pwq_fwd_gwv'] = wvi2.grad.numpy()

pwl = flow.ElementWisePWLinearTransform()
xi = t(x, True)
qi = t(q, True)
y, logj = pwl.flow_inv(xi, qi, return_jacobian=True)
(y.sum() + logj.sum()).backward()
out['pwl_q'] = q
out['pwl_inv_y'] = y.detach().numpy()
out['pwl_inv_logj'] = logj.detach().numpy()
out['pwl_inv_gx'] = xi.grad.numpy()
out['pwl_inv_gq'] = qi.grad.numpy()

yi = t(x, True)
qi2 = t(q, True)
xx, logj2 = pwl.flow(yi, qi2, return_jacobian=True)
(xx.sum() + logj2.sum()).backward()
out['pwl_fwd_x'] = xx.detach().numpy()
out['pwl_fwd_logj'] = logj2.detach().numpy()

# ---------------------------------------------------------------------------
# 3. sample_pdf (ref: utils/network_utils.py:117-147), deterministic
# ---------------------------------------------------------------------------
Np, Sn, Ns = 16, 32, 9
bins = np.sort(rng.rand(Np, Sn) * 4.0, axis=-1)
weights = rng.rand(Np, Sn - 1) ** 2
samples = nu.sample_pdf(t(bins), t(weights), Ns, det=True)
out['spdf_bins'] = bins
out['spdf_weights'] = weights
out['spdf_samples'] = samples.numpy()

# ---------------------------------------------------------------------------
# 4. get_weights: NeuS section weights on an analytic sphere SDF
#    (ref: utils/network_utils.py:149-170)
# ---------------------------------------------------------------------------
Pn, Sn2 = 24, 48
origins = normed((Pn, 3)) * 0.9
dirs = normed((Pn, 3))
z_vals = np.sort(rng.rand(Pn, Sn2) * 2.0, axis=-1)


def sdf_fun(p):
    return (torch.norm(p, dim=-1, keepdim=True) - 0.5)


def inv_fun(p):
    return torch.full(p.shape[:-1] + (1,), 64.0, dtype=p.dtype)


w, mid_sdf = nu.get_weights(sdf_fun, inv_fun, t(z_vals), t(origins),
                            t(dirs))
out['gw_origins'] = origins
out['gw_dirs'] = dirs
out['gw_z_vals'] = z_vals
out['gw_weights'] = w.numpy()
out['gw_mid_sdf'] = mid_sdf.numpy()

os.makedirs(os.path.dirname(OUT), exist_ok=True)
np.savez_compressed(OUT, **{k: v.astype(np.float32) for k, v in out.items()})
print(f'wrote {OUT} with {len(out)} arrays')
