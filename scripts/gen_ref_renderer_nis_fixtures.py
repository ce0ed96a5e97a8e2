#!/usr/bin/env python
"""NIS-path renderer parity fixture (run ONCE; commit npz).

Extends gen_ref_renderer_fixtures to the paper's NOVEL path: the mixed
MC estimator with BOTH flows live (use_nis_diffuse/specular=True, frozen
sampling copies on), deterministic flow samples (SphereSampler Fibonacci
lattice; net.eval() so neither the prior azimuth nor the analytic
samplers randomize), the half-vector Jacobian pdf conversion
(ref fields.py:1260-1269) and the NIS losses + their gradients through
the LIVE flows (ref fields.py:1271-1333).  Saved to
tests/fixtures/ref_renderer_nis.npz; pinned by
tests/test_ref_renderer_parity.py::TestNIS*.
"""
import os
import sys

import numpy as np
import torch

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import gen_ref_renderer_fixtures as base   # installs stubs on import

fields = base.fields
OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'tests', 'fixtures',
    'ref_renderer_nis.npz')


def dump_flow(out, name, flow):
    for k, v in dict(flow.named_parameters()).items():
        out[f'{name}__{k.replace(".", "_")}'] = v.detach().numpy()


def main():
    torch.manual_seed(0)
    out = {}
    rng = np.random.RandomState(7)

    cfg = {
        'diffuse_sample_num': 16,
        'specular_sample_num': 8,
        'nis_diffuse_sample_num': 8,
        'nis_specular_sample_num': 4,
        'outer_light_version': 'direction',
        'human_lights': False,
        'use_nis_all': False,
        'use_nis_diffuse': True, 'use_nis_specular': True,
        'random_azimuth': False,
        'gridSize': [32, 32, 32],      # flow VM fields (keep npz small)
    }
    aabb = torch.tensor([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]])
    net = fields.MCShadingNetwork(cfg, base.sphere_trace_torch, aabb)
    net.gridSize = torch.tensor([32, 32, 32])
    net.init_svd_volume('cpu')
    net.eval()          # deterministic priors + no random azimuth

    with torch.no_grad():
        for p in net.mat_plane:
            p.mul_(0.0).add_(torch.randn_like(p) * 0.3)
        for l in net.mat_line:
            l.mul_(0.0).add_(torch.rand_like(l) * 0.2 + 0.05)
        for fl in (net.flow_diffuse, net.flow_specular):
            for p in fl.nis_plane:
                p.mul_(0.0).add_(torch.randn_like(p) * 0.3)
            for l in fl.nis_line:
                l.mul_(0.0).add_(torch.rand_like(l) * 0.2 + 0.05)

    # freeze sampling copies from the live flows — the update_step body
    # at fields.py:1055-1065, inlined to avoid its light-upsample branch
    # (the MLP outer light used here has no .upsample)
    net.use_flow_diffuse_copy = True
    net.flow_diffuse_copy.load_state_dict(net.flow_diffuse.state_dict())
    net.use_flow_specular_copy = True
    net.flow_specular_copy.load_state_dict(
        net.flow_specular.state_dict())
    for fl in (net.flow_diffuse_copy, net.flow_specular_copy):
        for p in fl.parameters():
            p.requires_grad = False

    pn = 12
    nrm = rng.randn(pn, 3)
    nrm[:8, 0] = np.abs(nrm[:8, 0]) + 1.0
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    pts = 0.4 * nrm
    view = nrm + 0.4 * rng.randn(pn, 3)
    view /= np.linalg.norm(view, axis=-1, keepdims=True)
    flip = np.sum(view * nrm, -1, keepdims=True) < 0.1
    view = np.where(flip, nrm, view)
    view /= np.linalg.norm(view, axis=-1, keepdims=True)

    # record the frozen-copy flow samples (angles01 + logq) for both
    # flows — intermediate oracles that localize prior/spline drift
    rec = {}
    for nm in ('diffuse', 'specular'):
        copy = getattr(net, f'flow_{nm}_copy')
        orig = copy.sample

        def wrapped(*a, _orig=orig, _nm=nm, **k):
            r = _orig(*a, **k)
            rec[f'{_nm}_angles01'] = r[0].detach().numpy()
            rec[f'{_nm}_logq'] = r[1].detach().numpy()
            return r
        copy.sample = wrapped

    t_pts = torch.tensor(pts, dtype=torch.float32, requires_grad=True)
    t_view = torch.tensor(view, dtype=torch.float32)
    t_nrm = torch.tensor(nrm, dtype=torch.float32)

    colors, outputs = net.forward(t_pts, t_view, t_nrm, human_poses=None,
                                  step=2000, is_train=False)
    loss = (colors.sum() + outputs['loss_nis_diffuse']
            + outputs['loss_nis_specular'])
    loss.backward()

    out.update(rec)
    out['pts'] = pts
    out['view'] = view
    out['nrm'] = nrm
    out['rgb_pr'] = colors.detach().numpy()
    for k in ('albedo', 'metallic', 'roughness', 'diffuse_color',
              'specular_color', 'visibility'):
        out[f'out_{k}'] = outputs[k].detach().numpy()
    out['loss_nis_diffuse'] = outputs['loss_nis_diffuse'].detach().numpy()
    out['loss_nis_specular'] = \
        outputs['loss_nis_specular'].detach().numpy()
    out['g_pts'] = t_pts.grad.numpy()

    # live-flow gradients (the NIS losses are the only path to them)
    for nm, fl in (('fd', net.flow_diffuse), ('fs', net.flow_specular)):
        out[f'g_{nm}_plane0'] = fl.nis_plane[0].grad.detach().numpy()
        blk = dict(fl.named_parameters())
        out[f'g_{nm}_block0_w1'] = blk['flows.0.nn.1.weight'].grad.numpy()
        out[f'g_{nm}_nismat_w0'] = blk['nis_mat.0.weight'].grad.numpy()

    # weights
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
    dump_flow(out, 'w_fd', net.flow_diffuse)
    dump_flow(out, 'w_fs', net.flow_specular)

    out['occ_center'] = base.OCC_CENTER
    out['occ_radius'] = np.array(base.OCC_RADIUS)
    np.savez_compressed(OUT, **out)
    print(f'wrote {OUT}: {len(out)} arrays; rgb mean '
          f'{out["rgb_pr"].mean():.4f}; loss_nis_d '
          f'{float(out["loss_nis_diffuse"]):.5f} loss_nis_s '
          f'{float(out["loss_nis_specular"]):.5f}')


if __name__ == '__main__':
    main()
