#!/usr/bin/env python
"""Generate RENDERER-level reference parity fixtures (run ONCE; commit npz).

Executes the reference MCShadingNetwork.forward (network/fields.py:1453)
— the full material-stage shade: tensorial material field -> predictors ->
mixed MC estimator with deterministic Fibonacci directions, an exact
analytic occluder trace, inner/outer light MLPs — on CPU torch with
pinned weights, and stores inputs, weights, outputs AND input-gradients in
tests/fixtures/ref_renderer.npz.  tests/test_ref_renderer_parity.py then
pins tensoflow_tpu's mc_forward against it end to end (the BASELINE
"allclose images & pixel gradients" row at the renderer level; op-level
oracles live in ref_oracles.npz).

Determinism: is_train=False (no random azimuth), NIS disabled (flows off),
outer_light_version='direction' (no cubemap), exact sphere-occluder trace
shared with the JAX side.
"""
import importlib.util
import os
import sys
import types

import numpy as np
import torch
import torch.nn as nn

REF = '/root/reference'
OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'tests', 'fixtures', 'ref_renderer.npz')

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


# ---------------------------------------------------------------------------
# CPU dr.texture clone: clamped bilinear + linear-mipmap-linear (box-filter
# pyramid, per-sample fractional mip_level_bias — the adjacent-level lerp
# equals triangle weights over levels, which is also what
# tensoflow_tpu.ops.tensor_field.sample_mip_2d implements)
# ---------------------------------------------------------------------------

def _bilinear_hw(tex, uv):
    h, w, c = tex.shape
    u = uv[..., 0].reshape(-1) * w - 0.5     # u indexes WIDTH
    v = uv[..., 1].reshape(-1) * h - 0.5     # v indexes HEIGHT
    u0 = torch.floor(u)
    v0 = torch.floor(v)
    fu = (u - u0).unsqueeze(-1)
    fv = (v - v0).unsqueeze(-1)
    u0i = u0.long().clamp(0, w - 1)
    u1i = (u0.long() + 1).clamp(0, w - 1)
    v0i = v0.long().clamp(0, h - 1)
    v1i = (v0.long() + 1).clamp(0, h - 1)
    flat = tex.reshape(h * w, c)
    t00 = flat[v0i * w + u0i]
    t01 = flat[v0i * w + u1i]
    t10 = flat[v1i * w + u0i]
    t11 = flat[v1i * w + u1i]
    return ((1 - fv) * ((1 - fu) * t00 + fu * t01)
            + fv * ((1 - fu) * t10 + fu * t11))


def dr_texture(tex, uv, mip_level_bias=None, boundary_mode='clamp',
               max_mip_level=None, filter_mode='auto'):
    assert boundary_mode == 'clamp'
    n, h, w, c = tex.shape
    if mip_level_bias is None or not max_mip_level:
        out = _bilinear_hw(tex[0], uv)
        return out.reshape(*uv.shape[:-1], c)
    pyr = [tex[0]]
    while len(pyr) <= max_mip_level:
        t = pyr[-1]
        hh, ww = t.shape[0], t.shape[1]
        t = t.reshape(max(hh // 2, 1), min(2, hh),
                      max(ww // 2, 1), min(2, ww), c).mean(dim=(1, 3))
        pyr.append(t)
    lv = mip_level_bias.reshape(-1).clamp(0.0, float(max_mip_level))
    out = 0.0
    for li, ltex in enumerate(pyr):
        wgt = (1.0 - (lv - li).abs()).clamp(min=0.0).unsqueeze(-1)
        out = out + wgt * _bilinear_hw(ltex, uv)
    return out.reshape(*uv.shape[:-1], c)


def segment_coo(src, index, out=None, reduce='sum'):
    assert reduce == 'sum'
    if out is None:
        raise NotImplementedError
    return out.index_add(0, index, src)


# neutralize .cuda()/.to('cuda') — fixture runs on CPU
torch.Tensor.cuda = lambda self, *a, **k: self
nn.Module.cuda = lambda self, *a, **k: self
_orig_to = nn.Module.to


def _to(self, *a, **k):
    a = tuple(x for x in a if x != 'cuda')
    k.pop('device', None)
    return _orig_to(self, *a, **k) if (a or k) else self


nn.Module.to = _to
_orig_tto = torch.Tensor.to


def _tto(self, *a, **k):
    a = tuple('cpu' if isinstance(x, (str, torch.device))
              and 'cuda' in str(x) else x for x in a)
    if 'cuda' in str(k.get('device', '')):
        k['device'] = 'cpu'
    return _orig_tto(self, *a, **k)


torch.Tensor.to = _tto


def _cpu_factory(fn):
    def g(*a, **k):
        if 'cuda' in str(k.get('device', '')):
            k['device'] = 'cpu'
        return fn(*a, **k)
    return g


for _name in ('arange', 'zeros', 'ones', 'empty', 'full', 'rand', 'randn',
              'randperm', 'tensor', 'linspace'):
    setattr(torch, _name, _cpu_factory(getattr(torch, _name)))

_stub('nvdiffrast')
_stub('nvdiffrast.torch', texture=dr_texture)
_stub('torch_scatter', segment_coo=segment_coo)
_stub('torchvision')
_stub('torchvision.utils', save_image=lambda *a, **k: None,
      make_grid=lambda *a, **k: None)
_stub('mcubes')
_stub('open3d')
_stub('trimesh')
_cv2 = _stub('cv2')
_cv2.__getattr__ = lambda name: 0   # constants consumed at def-time only
_stub('skimage')
_stub('skimage.measure')
_stub('skimage.io', imread=None, imsave=None)
sys.modules['skimage'].measure = sys.modules['skimage.measure']
sys.modules['skimage'].io = sys.modules['skimage.io']
_stub('tqdm', tqdm=lambda x, **k: x)
_stub('tensorboardX', SummaryWriter=object)
_stub('ghalton', Halton=object)
_stub('h5py')
_stub('lpips', LPIPS=object)
_stub('transforms3d')
_stub('transforms3d.axangles', mat2axangle=None)
_stub('transforms3d.euler', euler2mat=None)
sys.modules['transforms3d'].axangles = sys.modules['transforms3d.axangles']
sys.modules['transforms3d'].euler = sys.modules['transforms3d.euler']
_stub('plyfile', PlyData=object, PlyElement=object)
_stub('nerfacc')

import math as _math
np.math = _math          # numpy-2 removed np.math (reference targets 1.x)

_stub('utils')
_stub('network')
ru = _load('utils.raw_utils', f'{REF}/utils/raw_utils.py')
refu = _load('utils.ref_utils', f'{REF}/utils/ref_utils.py')
nu = _load('utils.network_utils', f'{REF}/utils/network_utils.py')
bu = _load('utils.base_utils', f'{REF}/utils/base_utils.py')
sys.modules['utils'].raw_utils = ru
sys.modules['utils'].ref_utils = refu
sys.modules['utils'].network_utils = nu
sys.modules['utils'].base_utils = bu
of = _load('network.other_field', f'{REF}/network/other_field.py')
_stub('network.light', EnvLight=object)
flow_mod = _load('network.flow', f'{REF}/network/flow.py')
sys.modules['network'].other_field = of
sys.modules['network'].flow = flow_mod
fields = _load('network.fields', f'{REF}/network/fields.py')


# ---------------------------------------------------------------------------
# exact occluder trace (sphere B), shared analytically with the JAX side
# ---------------------------------------------------------------------------
OCC_CENTER = np.array([0.85, 0.0, 0.0])
OCC_RADIUS = 0.35
MISS_DEPTH = 10.0


def sphere_trace_torch(o, d):
    oc = o - torch.tensor(OCC_CENTER, dtype=o.dtype)
    b = torch.sum(oc * d, -1)
    c = torch.sum(oc * oc, -1) - OCC_RADIUS ** 2
    disc = b * b - c
    hit = (disc > 0)
    t = -b - torch.sqrt(torch.clamp(disc, min=0.0))
    hit = hit & (t > 0)
    t = torch.where(hit, t, torch.full_like(t, MISS_DEPTH))
    inters = o + d * t.unsqueeze(-1) * hit.unsqueeze(-1).float()
    n = inters - torch.tensor(OCC_CENTER, dtype=o.dtype)
    n = n / torch.clamp(torch.norm(n, dim=-1, keepdim=True), min=1e-8)
    flip = torch.sum(n * d, -1, keepdim=True) >= 0
    n = torch.where(flip, -n, n)
    # the reference's CUDA BVH defines no backward — detach to match
    # (raytracing ext; our get_lights stop_gradients identically)
    return inters.detach(), n.detach(), t.unsqueeze(-1).detach(), hit


def main():
    out = {}
    rng = np.random.RandomState(3)

    cfg = {
        'diffuse_sample_num': 16,
        'specular_sample_num': 8,
        'outer_light_version': 'direction',
        'human_lights': False,
        'use_nis_all': False, 'use_nis_diffuse': False,
        'use_nis_specular': False,
        'random_azimuth': False,
    }
    aabb = torch.tensor([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]])
    net = fields.MCShadingNetwork(cfg, sphere_trace_torch, aabb)
    # shrink the (hardcoded-512^3, fields.py:683) material grid so the
    # committed fixture stays small — semantics are resolution-independent
    net.gridSize = torch.tensor([32, 32, 32])
    net.init_svd_volume('cpu')

    # make the tiny material field non-trivial (init is 1e-4 noise)
    with torch.no_grad():
        for p in net.mat_plane:
            p.mul_(0.0).add_(torch.randn_like(p) * 0.3)
        for l in net.mat_line:
            l.mul_(0.0).add_(torch.rand_like(l) * 0.2 + 0.05)

    # inputs: shading points on sphere A (origin, r=0.4), views off-normal
    pn = 16
    nrm = rng.randn(pn, 3)
    nrm[:10, 0] = np.abs(nrm[:10, 0]) + 1.0   # bias toward the occluder
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    pts = 0.4 * nrm
    view = nrm + 0.4 * rng.randn(pn, 3)     # view OUT dirs (away)
    view /= np.linalg.norm(view, axis=-1, keepdims=True)
    flip = np.sum(view * nrm, -1, keepdims=True) < 0.1
    view = np.where(flip, nrm, view)        # keep safely off-tangent
    view /= np.linalg.norm(view, axis=-1, keepdims=True)

    t_pts = torch.tensor(pts, dtype=torch.float32, requires_grad=True)
    t_view = torch.tensor(view, dtype=torch.float32)
    t_nrm = torch.tensor(nrm, dtype=torch.float32)

    colors, outputs = net.forward(t_pts, t_view, t_nrm, human_poses=None,
                                  step=None, is_train=False)
    loss = colors.sum() + outputs['diffuse_color'].sum()
    loss.backward()

    out['pts'] = pts
    out['view'] = view
    out['nrm'] = nrm
    out['rgb_pr'] = colors.detach().numpy()
    for k in ('albedo', 'metallic', 'roughness', 'diffuse_color',
              'specular_color', 'diffuse_light', 'specular_light',
              'visibility', 'indirect_light', 'approximate_light'):
        out[f'out_{k}'] = outputs[k].detach().numpy()
    out['g_pts'] = (t_pts.grad.numpy() if t_pts.grad is not None
                    else np.zeros_like(pts))

    # intermediate oracle: the tensorial material feature (localizes
    # plane-orientation mapping errors separately from shading math)
    with torch.no_grad():
        out['mat_feats'] = net.tenso_feature(torch.tensor(pts, dtype=torch.float32)).numpy()

    # parameter gradients for a couple of representative leaves
    out['g_mat_plane0'] = net.mat_plane[0].grad.detach().numpy()
    alb_w = dict(net.albedo_predictor.named_parameters())
    for k, v in alb_w.items():
        if v.grad is not None:
            out[f'g_albedo__{k.replace(".", "_")}'] = v.grad.numpy()

    # weights: everything the JAX side needs to rebuild the network
    for name, mod in (('metallic', net.metallic_predictor),
                      ('roughness', net.roughness_predictor),
                      ('albedo', net.albedo_predictor),
                      ('outer', net.outer_light),
                      ('inner', net.inner_light)):
        for k, v in dict(mod.named_parameters()).items():
            out[f'w_{name}__{k.replace(".", "_")}'] = v.detach().numpy()
    for i in range(3):
        out[f'w_plane{i}'] = net.mat_plane[i].detach().numpy()
        out[f'w_line{i}'] = net.mat_line[i].detach().numpy()

    out['occ_center'] = OCC_CENTER
    out['occ_radius'] = np.array(OCC_RADIUS)
    np.savez_compressed(OUT, **out)
    print(f'wrote {OUT}: {len(out)} arrays; '
          f'hit_rate check: rgb mean {out["rgb_pr"].mean():.4f}')


if __name__ == '__main__':
    main()
