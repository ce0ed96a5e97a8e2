#!/usr/bin/env python
"""Generate SHAPE-renderer geometry-core parity fixtures (run ONCE; commit).

Drives the reference ShapeRenderer's geometry pipeline (torch CPU, via the
stub environment of gen_ref_renderer_fixtures):
    sample_ray (NeuS 4-step hierarchical upsampling, perturb=0)
      -> compute_sdf_alpha (TensoSDF mip field + FD gradient/hessian,
         SingleVariance NeuS alpha)
      -> per-ray compositing weights (nerfacc render_weight_from_alpha
         semantics: alpha * cumprod(1-alpha))
with pinned weights, and stores inputs/weights/outputs/gradients in
tests/fixtures/ref_shape.npz.  tests/test_ref_shape_parity.py pins the
tensoflow_tpu sampler + stencil SDF path + compositing against it.

The ONE documented deviation is neutralized at generation time: the
reference's FD step is aabbSize/(gridSize-1) (fields.py:60) while ours is
aabbSize/gridSize (tenso_sdf.units docstring); the oracle's sdf_network
.units is overridden to ours so the fixture isolates everything else.
"""
import os
import sys

import numpy as np
import torch
import torch.nn as nn

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import gen_ref_renderer_fixtures as G    # noqa: E402  (stub env + modules)

REF = '/root/reference'
OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'tests', 'fixtures', 'ref_shape.npz')

fields = G.fields
of = G.of
G._stub('dataset')
G._stub('dataset.database', parse_database_name=None,
        get_database_split=None, BaseDatabase=object)
sys.modules['dataset'].database = sys.modules['dataset.database']
sr_mod = G._load('network.shapeRenderer',
                 f'{REF}/network/shapeRenderer.py')

torch.manual_seed(1)


def render_weight_from_alpha(alpha, ray_indices, n_rays):
    """nerfacc semantics on a flat sorted sample list: per-ray
    transmittance-weighted alpha (torch CPU clone for the oracle)."""
    weights = torch.zeros_like(alpha)
    trans = torch.zeros_like(alpha)
    for r in range(n_rays):
        m = ray_indices == r
        a = alpha[m]
        t = torch.cumprod(torch.cat([torch.ones(1), 1.0 - a + 1e-7]),
                          0)[:-1]
        weights[m] = a * t
        trans[m] = t
    return weights, trans


def main():
    out = {}
    rng = np.random.RandomState(7)

    gs = torch.tensor([32, 32, 32])
    aabb = torch.tensor([[-1.0] * 3, [1.0] * 3])
    sdf_net = fields.TensoSDF(gs, aabb, device='cpu', sdf_n_comp=8,
                              sdf_dim=64, app_dim=16, init_n_levels=3,
                              sdf_multires=3)
    # neutralize the documented FD-step deviation (see module docstring)
    sdf_net.units = (aabb[1] - aabb[0]) / gs.float()
    # the untrained geometric init has no zero crossing along test rays
    # (feature weights start zero); perturb into a non-trivial field with
    # a surface — parity compares computations, not reconstruction quality
    with torch.no_grad():
        for p in sdf_net.sdf_plane:
            p.add_(torch.randn_like(p) * 0.3)
        sdf_net.sdf_mat[0].weight.add_(
            torch.randn_like(sdf_net.sdf_mat[0].weight) * 0.05)
        # center the field so rays cross the level set: shift the sdf
        # output bias by the field's value at the origin region
        probe = torch.rand(512, 3) * 0.6 - 0.3
        med = sdf_net(probe, None)[:, 0].median()
        sdf_net.sdf_mat[-1].bias[0] -= med
    dev_net = of.SingleVarianceNetwork(init_val=0.3, activation='exp')

    obj = sr_mod.ShapeRenderer.__new__(sr_mod.ShapeRenderer)
    nn.Module.__init__(obj)
    obj.cfg = {**sr_mod.ShapeRenderer.default_cfg,
               'n_samples': 24, 'n_importance': 16, 'up_sample_steps': 4,
               'perturb': 0.0, 'clip_sample_variance': True}
    obj.aabb = aabb
    obj.sdf_network = sdf_net
    obj.deviation_network = dev_net
    obj.occ_grid = None
    obj.alphaMask = None
    obj.base_radii = float((aabb[1] - aabb[0])[0] / 2.0 / gs[0])

    rn = 12
    d = rng.randn(rn, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = (-d * 2.0 + 0.1 * rng.randn(rn, 3)).astype(np.float32)
    radiis = np.full((rn, 1), 1.5e-3, np.float32)
    rays_cos = np.full((rn, 1), 0.98, np.float32)
    near = (np.linalg.norm(o, axis=-1, keepdims=True) - 1.0).astype(
        np.float32)
    far = (np.linalg.norm(o, axis=-1, keepdims=True) + 1.0).astype(
        np.float32)

    t_o = torch.tensor(o, requires_grad=True)
    t_d = torch.tensor(d)
    with torch.no_grad():
        t_starts, t_ends, ray_indices = obj.sample_ray(
            torch.tensor(o), t_d, torch.tensor(near), torch.tensor(far),
            0.0, radiis=torch.tensor(radiis),
            rays_cos=torch.tensor(rays_cos))

    # render_core prologue (shapeRenderer.py:1112-1136)
    mid_t = (t_starts + t_ends) * 0.5
    dists = t_ends - t_starts
    ray_o = t_o[ray_indices]
    viewdir = t_d[ray_indices]
    points = ray_o + viewdir * mid_t[:, None]
    sbr = obj.compute_ball_radii(mid_t[:, None],
                                 torch.tensor(radiis)[ray_indices],
                                 torch.tensor(rays_cos)[ray_indices])
    levels = torch.log2(sbr / obj.base_radii)

    obj.cfg['freeze_inv_s_step'] = None
    alpha, gradients, feat, inv_s, sdf, hessian = obj.compute_sdf_alpha(
        points, levels, dists, viewdir, cos_anneal_ratio=0.37, step=500,
        is_train=True)
    weights, trans = render_weight_from_alpha(alpha, ray_indices, rn)
    acc = torch.zeros(rn).index_add(0, ray_indices, weights)
    depth = torch.zeros(rn).index_add(0, ray_indices, weights * mid_t)

    eik = ((torch.linalg.norm(gradients, dim=-1) - 1.0) ** 2).mean()
    hess_l = hessian.abs().mean()
    loss = weights.sum() + depth.sum() + eik + hess_l
    loss.backward()

    out['o'] = o
    out['d'] = d
    out['radiis'] = radiis
    out['rays_cos'] = rays_cos
    out['near'] = near
    out['far'] = far
    out['t_starts'] = t_starts.numpy()
    out['t_ends'] = t_ends.numpy()
    out['ray_indices'] = ray_indices.numpy()
    out['levels'] = levels.detach().numpy()
    out['sdf'] = sdf.detach().numpy()
    out['alpha'] = alpha.detach().numpy()
    out['gradients'] = gradients.detach().numpy()
    out['hessian'] = hessian.detach().numpy()
    out['inv_s'] = inv_s.detach().numpy()
    out['weights'] = weights.detach().numpy()
    out['acc'] = acc.detach().numpy()
    out['depth'] = depth.detach().numpy()
    out['eik'] = eik.detach().numpy()
    out['hess_l'] = hess_l.detach().numpy()
    out['g_rays_o'] = t_o.grad.numpy()
    out['g_sdf_plane0'] = sdf_net.sdf_plane[0].grad.numpy()
    out['g_sdf_mlp_w0'] = sdf_net.sdf_mat[0].weight.grad.numpy()
    out['g_variance'] = dev_net.variance.grad.numpy()

    # weights for the JAX side
    for i in range(3):
        out[f'w_sdf_plane{i}'] = sdf_net.sdf_plane[i].detach().numpy()
        out[f'w_sdf_line{i}'] = sdf_net.sdf_line[i].detach().numpy()
    out['w_mlp0_w'] = sdf_net.sdf_mat[0].weight.detach().numpy()
    out['w_mlp0_b'] = sdf_net.sdf_mat[0].bias.detach().numpy()
    out['w_mlp1_w'] = sdf_net.sdf_mat[2].weight.detach().numpy()
    out['w_mlp1_b'] = sdf_net.sdf_mat[2].bias.detach().numpy()
    out['w_variance'] = dev_net.variance.detach().numpy()

    np.savez_compressed(OUT, **out)
    print(f'wrote {OUT}: {len(out)} arrays; N={len(ray_indices)} samples, '
          f'acc mean {out["acc"].mean():.3f}')


if __name__ == '__main__':
    main()
