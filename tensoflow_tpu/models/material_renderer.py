"""Stage-2 material renderer: surface shading with the MC estimator.

Functional re-design of the reference MaterialRenderer
(ref: network/materialRenderer.py:98-887).  Stage-1 geometry arrives as a
frozen checkpoint; its SDF is baked to a dense grid (the analogue of the
extracted mesh) and sphere-traced for primary/secondary visibility
(ops/sdf_trace.py replaces the CUDA BVH).

Surface-hit preprocessing (ref: materialRenderer.py:265-343): primary rays
are traced against the baked SDF; hit depths are optionally refined by a
two-pass hierarchical march of the *neural* SDF around the traced depth,
and normals come from the neural SDF's finite-difference gradient, flipped
to face the ray.
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import mc_shading, mlp, tenso_sdf
from ..ops import sdf_trace
from ..ops.math import charbonnier, sample_pdf
from .secondary import march_weights


class MaterialRendererConfig(NamedTuple):
    """(ref: materialRenderer.py:99-133)"""
    shader: mc_shading.MCShadingConfig = mc_shading.MCShadingConfig()
    sdf: tenso_sdf.SDFConfig = tenso_sdf.SDFConfig()
    aabb: Tuple[Tuple[float, ...], Tuple[float, ...]] = (
        (-1.0, -1.0, -1.0), (1.0, 1.0, 1.0))
    train_ray_num: int = 2048
    test_ray_num: int = 8192
    rgb_loss: str = 'charbonier'
    reg_mat: bool = True
    reg_diffuse_light: bool = True
    reg_diffuse_light_lambda: float = 0.1
    std_act: str = 'exp'
    inv_s_init: float = 0.3
    direct_sn0: int = 128
    direct_sn1: int = 9
    trace_sn0: int = 32
    trace_sn1: int = 9
    bake_resolution: int = 256
    trace_packed: bool = True
    refine_with_neural_sdf: bool = True


def unit_size(cfg: MaterialRendererConfig) -> float:
    """(ref: materialRenderer.py:159)"""
    a = np.asarray(cfg.aabb, np.float64)
    gs = np.asarray(cfg.sdf.grid_size)
    return float(((a[1] - a[0]) / (gs - 1)).mean())


def radius_of(cfg: MaterialRendererConfig) -> float:
    a = np.asarray(cfg.aabb, np.float64)
    center = a.mean(0)
    return float((a[1] - center).mean())


def sdf_fun_of(geo_params, cfg: MaterialRendererConfig):
    aabb = jnp.asarray(cfg.aabb, jnp.float32)

    def sdf_fun(x):
        return tenso_sdf.sdf_only(geo_params['sdf'], cfg.sdf, x, aabb)
    return sdf_fun


def bake_geometry(geo_params, cfg: MaterialRendererConfig):
    """Bake the frozen stage-1 SDF (the 'mesh extraction' analogue).

    Returns the packed trace representation (one gathered row per
    trilinear tap — see ops/sdf_trace.pack_sdf_grid); set
    ``trace_packed=False`` for the dense reference path."""
    dense = sdf_trace.bake_sdf_grid(
        sdf_fun_of(geo_params, cfg), cfg.aabb, cfg.bake_resolution)
    if not cfg.trace_packed:
        return dense
    pg = sdf_trace.pack_sdf_grid(dense)
    if 0.0 < cfg.shader.a1_budget < 1.0:
        # direction-binned visibility cache: one-time cone-march bake
        # (geometry is frozen in stage 2); certified rays skip the
        # coarse march in sphere_trace_budget.  The apex pad reserves
        # the 2*unit_size launch offset so get_lights can key ONE cache
        # row per surface point.
        pg = sdf_trace.bake_vis_cache(pg, apex_pad=2.0 * unit_size(cfg))
    return pg


def near_far_from_sphere(rays_o, rays_d, radius: float):
    """(ref: materialRenderer.py:345-355)"""
    a = jnp.sum(rays_d ** 2, -1, keepdims=True)
    b = 2.0 * jnp.sum(rays_o * rays_d, -1, keepdims=True)
    mid = 0.5 * (-b) / a
    return jnp.maximum(mid - radius, 1e-3), mid + radius


def trace_surface(geo_params, cfg: MaterialRendererConfig,
                  grid: sdf_trace.SDFGrid, rays_o, rays_d):
    """Primary-ray surface intersection with optional neural refinement
    (ref: materialRenderer.py:281-343 trace_sdf_with_mesh).

    Returns (inters [pn,3], normals [pn,3], depth [pn,1], hit [pn]).
    """
    aabb = jnp.asarray(cfg.aabb, jnp.float32)
    inters, g_normals, depth, hit = sdf_trace.sphere_trace(
        grid, rays_o, rays_d, n_steps=64)

    if cfg.refine_with_neural_sdf:
        sdf_fun = sdf_fun_of(geo_params, cfg)
        inv_s = jnp.clip(mlp.apply_variance(
            geo_params['deviation'], cfg.std_act), 1e-6, 1e6)
        us = unit_size(cfg)
        near, far = near_far_from_sphere(rays_o, rays_d, radius_of(cfg))
        m_depth = jnp.where(hit[:, None], depth, 0.5 * (near + far))
        t_min = jnp.clip(m_depth - us * 4, near, far)
        t_max = jnp.clip(m_depth + us * 4, near, far)
        z = jnp.linspace(0.0, 1.0, cfg.trace_sn0, dtype=rays_o.dtype)
        z_vals = t_min + (t_max - t_min) * z[None, :]
        w, _ = march_weights(sdf_fun, inv_s, z_vals, rays_o, rays_d)
        z_new = jnp.sort(sample_pdf(z_vals, w, cfg.trace_sn1), -1)
        w2, _ = march_weights(sdf_fun, inv_s, z_new, rays_o, rays_d)
        z_mid = 0.5 * (z_new[:, 1:] + z_new[:, :-1])
        wsum = jnp.sum(w2, -1, keepdims=True)
        wn = jnp.where(wsum > 1e-6, w2 / jnp.maximum(wsum, 1e-6),
                       jnp.full_like(w2, 1.0 / (cfg.trace_sn1 - 1)))
        ref_depth = jnp.sum(wn * z_mid, -1, keepdims=True)
        depth = jnp.where(hit[:, None], ref_depth, depth)
        inters = jnp.where(hit[:, None], rays_o + depth * rays_d, inters)

        grad = tenso_sdf.gradient_only(geo_params['sdf'], cfg.sdf, inters,
                                       aabb)
        n = grad / jnp.maximum(
            jnp.linalg.norm(grad, axis=-1, keepdims=True), 1e-8)
        flip = jnp.sum(n * rays_d, -1, keepdims=True) >= 0
        n = jnp.where(flip, -n, n)
        normals = jnp.where(hit[:, None], n, g_normals)
    else:
        normals = g_normals
    return inters, normals, depth, hit


def compute_rgb_loss(cfg: MaterialRendererConfig, rgb_pr, rgb_gt):
    """(ref: materialRenderer.py:523-531)"""
    if cfg.rgb_loss == 'l1':
        return jnp.sum(jnp.abs(rgb_pr - rgb_gt), -1)
    if cfg.rgb_loss == 'charbonier':
        return charbonnier(rgb_pr, rgb_gt)
    raise NotImplementedError(cfg.rgb_loss)


def diffuse_light_regularization(diffuse_lights, lam: float):
    """White-light prior (ref: materialRenderer.py:533-535)."""
    return jnp.sum(jnp.abs(
        diffuse_lights - jnp.mean(diffuse_lights, -1, keepdims=True)),
        -1) * lam


def train_step_outputs(params, cfg: MaterialRendererConfig, grid, batch,
                       phase: mc_shading.ShadePhase, rng, step,
                       flow_diffuse_copy=None, flow_specular_copy=None):
    """Training forward on precomputed surface hits
    (ref: materialRenderer.py:537-564)."""
    aabb = jnp.asarray(cfg.aabb, jnp.float32)
    pts = batch['inters']
    view_dirs = -batch['rays_d']
    normals = batch['normals']
    rgb_gt = batch['rgb']

    outputs = mc_shading.mc_forward(
        params, cfg.shader, grid, unit_size(cfg), aabb, pts, view_dirs,
        normals, phase, rng, True, flow_diffuse_copy, flow_specular_copy,
        human_poses=batch.get('human_poses'))
    outputs['rgb_gt'] = rgb_gt
    outputs['loss_rgb'] = compute_rgb_loss(cfg, outputs['rgb_pr'], rgb_gt)
    mse = jnp.mean((outputs['rgb_pr'] - rgb_gt) ** 2)
    outputs['psnr'] = 20.0 * jnp.log10(
        1.0 / jnp.sqrt(jnp.maximum(mse, 1e-10)))
    if cfg.reg_mat:
        reg_on = (step < 2000).astype(jnp.float32)
        outputs['loss_mat_reg'] = mc_shading.material_regularization(
            params, cfg.shader, pts, normals, outputs['metallic'],
            outputs['roughness'], outputs['albedo'], reg_on)
    if cfg.reg_diffuse_light:
        outputs['loss_diffuse_light'] = diffuse_light_regularization(
            outputs['diffuse_light'], cfg.reg_diffuse_light_lambda)
    return outputs


def eval_outputs(params, cfg: MaterialRendererConfig, grid, batch,
                 rng, flow_diffuse_copy=None, flow_specular_copy=None,
                 with_nis: bool = True):
    """Eval forward: analytic + _nis variants on traced hits
    (ref: materialRenderer.py:566-639; fields.py:1465-1473)."""
    aabb = jnp.asarray(cfg.aabb, jnp.float32)
    pts, view_dirs, normals = (batch['inters'], -batch['rays_d'],
                               batch['normals'])
    base_phase = mc_shading.ShadePhase()
    out = mc_shading.mc_forward(params, cfg.shader, grid, unit_size(cfg),
                                aabb, pts, view_dirs, normals, base_phase,
                                rng, False)
    if with_nis and flow_diffuse_copy is not None:
        nis_phase = mc_shading.ShadePhase(nis_sample_diffuse=True,
                                          nis_sample_specular=True)
        out_nis = mc_shading.mc_forward(
            params, cfg.shader, grid, unit_size(cfg), aabb, pts, view_dirs,
            normals, nis_phase, rng, False, flow_diffuse_copy,
            flow_specular_copy)
        out.update({k + '_nis': v for k, v in out_nis.items()})
    return out


def predict_vertex_materials(params, cfg: MaterialRendererConfig, verts,
                             batch_size: int = 8192):
    """Bake materials at mesh vertices (ref: materialRenderer.py:770-782).
    Host-chunked; returns dict of numpy arrays; roughness un-squared."""
    aabb = jnp.asarray(cfg.aabb, jnp.float32)
    outs = {'metallic': [], 'roughness': [], 'albedo': []}

    @jax.jit
    def pred(v):
        return mc_shading.predict_materials(params, cfg.shader, v, aabb)

    n = verts.shape[0]
    pad = (-n) % batch_size
    verts_p = np.concatenate([verts, np.zeros((pad, 3), verts.dtype)], 0)
    for i in range(0, len(verts_p), batch_size):
        m, r, a = pred(jnp.asarray(verts_p[i:i + batch_size]))
        outs['metallic'].append(np.asarray(m))
        outs['roughness'].append(np.sqrt(np.maximum(np.asarray(r), 1e-7)))
        outs['albedo'].append(np.asarray(a))
    return {k: np.concatenate(v, 0)[:n] for k, v in outs.items()}
