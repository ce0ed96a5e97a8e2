"""Stage-1 shape renderer: NeuS volume rendering over the TensoSDF field.

Functional re-design of the reference ShapeRenderer
(ref: network/shapeRenderer.py:100-1326).  Differences that make it
TPU-native:
  * fixed-shape everywhere: dense ``[rays, samples]`` buffers + masks
    replace nerfacc's flat ``ray_indices`` lists; the occupancy-grid path
    compacts to a static per-ray budget (ops/grid.py)
  * the whole step (sampling -> field -> shading -> compositing -> losses)
    is one pure function, jit/pjit-compiled once per phase
  * SDF gradient/hessian by one batched 7-point stencil (fields/tenso_sdf)
  * secondary-ray occlusion supervision via the SDF march
    (models/secondary.py) instead of a CUDA BVH
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import light as light_mod
from ..fields import mlp, shading as shading_mod, tenso_sdf
from ..ops import composite, grid as grid_mod
from ..ops.math import charbonnier, sample_pdf, safe_normalize
from . import secondary


class ShapeRendererConfig(NamedTuple):
    sdf: tenso_sdf.SDFConfig = tenso_sdf.SDFConfig()
    shading: shading_mod.ShadingConfig = shading_mod.ShadingConfig()
    aabb: Tuple[Tuple[float, ...], Tuple[float, ...]] = (
        (-1.0, -1.0, -1.0), (1.0, 1.0, 1.0))

    std_act: str = 'exp'
    inv_s_init: float = 0.3
    freeze_inv_s_step: Optional[int] = None

    # sampling (ref: shapeRenderer.py:121-130)
    n_samples: int = 64
    n_importance: int = 64
    up_sample_steps: int = 4
    perturb: float = 1.0
    anneal_end: int = 50000
    train_ray_num: int = 1024
    test_ray_num: int = 2048
    clip_sample_variance: bool = True

    # occupancy grid
    use_occ_grid: bool = False
    occ_grid_reso: int = 128
    step_ratio: float = 0.5
    occ_max_samples: int = 192        # per-ray sampler budget
    # candidate-step stride: >1 during the occ warmup window, where the
    # binary grid is fully occupied and the per-ray budget must cover the
    # WHOLE ray (uniform coarse steps) instead of a thin surface band —
    # set by the trainer to ceil(n_candidates / occ_max_samples)
    march_stride: int = 1
    # global sample compaction: field+shading run only on valid samples,
    # packed to rn * compact_samples_per_ray slots (0 = dense). The
    # occupancy sampler emits valid-prefix rows, so this is a pure
    # reordering; it converts the reference's variable-length sample lists
    # into a fixed global budget instead of per-ray dense padding.
    compact_samples_per_ray: int = 64

    # losses
    rgb_loss: str = 'charbonier'
    apply_occ_loss: bool = True
    apply_tv_loss: bool = True
    apply_sparse_loss: bool = True
    apply_hessian_loss: bool = True
    apply_gaussian_loss: bool = False
    gaussian_loss_step: int = 20000
    occ_loss_step: int = 20000
    occ_loss_max_pn: int = 2048
    occ_sdf_thresh: float = 0.01
    apply_mask_loss: bool = False

    has_radiance_field: bool = False
    radiance_field_step: int = 0
    isBGWhite: bool = True
    blend_ratio: float = 0.0

    # NeRF++ inverted-sphere background (real-capture scenes). The
    # reference defines the net + config flag but leaves rendering
    # unimplemented (ref: shapeRenderer.py:223-225 net, 1109/1180 raise);
    # this is the functional completion.
    predict_BG: bool = False
    n_bg_samples: int = 32


def aabb_array(cfg: ShapeRendererConfig):
    return jnp.asarray(cfg.aabb, jnp.float32)


def base_radii(cfg: ShapeRendererConfig) -> float:
    """(ref: shapeRenderer.py:251)"""
    a = np.asarray(cfg.aabb)
    return float((a[1][0] - a[0][0]) / 2.0 / cfg.sdf.grid_size[0])


def step_size(cfg: ShapeRendererConfig) -> float:
    """(ref: shapeRenderer.py:250)"""
    a = np.asarray(cfg.aabb, np.float64)
    units = (a[1] - a[0]) / (np.asarray(cfg.sdf.grid_size) - 1)
    return float(units.mean() * cfg.step_ratio)


def n_march_candidates(cfg: ShapeRendererConfig) -> int:
    a = np.asarray(cfg.aabb, np.float64)
    return int(np.ceil((a[1] - a[0]).max() * 1.7321 / step_size(cfg)))


def init_shape_renderer(rng, cfg: ShapeRendererConfig) -> Dict[str, Any]:
    k1, k2, k3 = jax.random.split(rng, 3)
    params = {
        'sdf': tenso_sdf.init_tenso_sdf(k1, cfg.sdf),
        'deviation': mlp.init_variance(cfg.inv_s_init),
        'shading': shading_mod.init_shading(k2, cfg.shading),
    }
    if cfg.predict_BG:
        params['bg'] = mlp.init_nerf_bg(k3)
    return params


# ---------------------------------------------------------------------------
# ray helpers
# ---------------------------------------------------------------------------

def near_far_from_sphere(rays_o, dirs, radius: float = 1.0):
    """(ref: shapeRenderer.py:676-684)"""
    a = jnp.sum(dirs ** 2, -1, keepdims=True)
    b = 2.0 * jnp.sum(rays_o * dirs, -1, keepdims=True)
    mid = 0.5 * (-b) / a
    near = jnp.maximum(mid - radius, 1e-3)
    far = mid + radius
    return near, far


def compute_ball_radii(distance, radii, cos):
    """Cone-footprint radius at distance (tri-miprf; ref: 965-970)."""
    inv_cos = 1.0 / cos
    tmp = jnp.sqrt(inv_cos * inv_cos - 1.0) - radii
    return distance * radii * cos / jnp.sqrt(tmp * tmp + 1.0)


def get_anneal_val(step, anneal_end):
    if anneal_end < 0:
        return 1.0
    return np.minimum(1.0, step / anneal_end)


# ---------------------------------------------------------------------------
# hierarchical sampling (non-occ-grid path, ref: 819-932)
# ---------------------------------------------------------------------------

def _upsample_zvals(rays_o, dirs, z_vals, sdf, n_importance, inv_s):
    """One NeuS importance-upsampling round (ref: shapeRenderer.py:819-849)."""
    batch_size, n_samples = z_vals.shape
    pts = rays_o[:, None, :] + dirs[:, None, :] * z_vals[..., None]
    radius = jnp.linalg.norm(pts, axis=-1)
    inside_sphere = (radius[:, :-1] < 1.0) | (radius[:, 1:] < 1.0)
    prev_sdf, next_sdf = sdf[:, :-1], sdf[:, 1:]
    prev_z, next_z = z_vals[:, :-1], z_vals[:, 1:]
    mid_sdf = 0.5 * (prev_sdf + next_sdf)
    cos_val = (next_sdf - prev_sdf) / (next_z - prev_z + 1e-5)

    prev_cos = jnp.concatenate(
        [jnp.zeros_like(cos_val[:, :1]), cos_val[:, :-1]], -1)
    cos_val = jnp.minimum(prev_cos, cos_val)
    cos_val = jnp.clip(cos_val, -1e3, 0.0) * inside_sphere

    dist = next_z - prev_z
    prev_esti = mid_sdf - cos_val * dist * 0.5
    next_esti = mid_sdf + cos_val * dist * 0.5
    prev_cdf = jax.nn.sigmoid(prev_esti * inv_s)
    next_cdf = jax.nn.sigmoid(next_esti * inv_s)
    alpha = (prev_cdf - next_cdf + 1e-5) / (prev_cdf + 1e-5)
    weights, _ = composite.weights_from_alpha(alpha)
    return sample_pdf(z_vals, weights, n_importance)


def sample_ray_hierarchical(params, cfg: ShapeRendererConfig, rays_o, dirs,
                            near, far, radii, rays_cos, rng, is_train: bool,
                            packed=None):
    """Fixed-count stratified + importance sampling (ref: 871-932).

    Returns (t_starts, t_ends, mask) each [rn, n_samples + n_importance].
    """
    aabb = aabb_array(cfg)
    n_s, n_imp, ups = cfg.n_samples, cfg.n_importance, cfg.up_sample_steps
    rn = rays_o.shape[0]
    br = base_radii(cfg)

    t = jnp.linspace(0.0, 1.0, n_s, dtype=rays_o.dtype)
    vec = jnp.where(dirs == 0, 1e-6, dirs)
    rate_a = (aabb[1] - rays_o) / vec
    rate_b = (aabb[0] - rays_o) / vec
    t_min = jnp.clip(jnp.max(jnp.minimum(rate_a, rate_b), -1),
                     near[:, 0], far[:, 0])[:, None]
    t_max = jnp.clip(jnp.min(jnp.maximum(rate_a, rate_b), -1),
                     near[:, 0], far[:, 0])[:, None]
    t_vals = t_min + (t_max - t_min) * t[None, :]

    if is_train and cfg.perturb > 0:
        t_rand = jax.random.uniform(rng, (rn, 1)) - 0.5
        t_vals = t_vals + t_rand * 2.0 / n_s

    def level_of(tv):
        sbr = compute_ball_radii(tv[..., None], radii[:, None, :],
                                 rays_cos[:, None, :])
        return jnp.log2(sbr[..., 0] / br)

    if n_imp > 0:
        def sdf_at(tv):
            pts = rays_o[:, None, :] + dirs[:, None, :] * tv[..., None]
            lv = level_of(tv)
            return tenso_sdf.sdf_only(
                params['sdf'], cfg.sdf, pts.reshape(-1, 3), aabb,
                lv.reshape(-1, 1), packed=packed).reshape(tv.shape)

        sdf = jax.lax.stop_gradient(sdf_at(t_vals))
        inv_s0 = mlp.apply_variance(params['deviation'], cfg.std_act)
        for i in range(ups):
            if cfg.clip_sample_variance:
                inv_s = jnp.minimum(inv_s0, 64.0 * 2 ** i)
            else:
                inv_s = 64.0 * 2 ** i
            new_t = _upsample_zvals(rays_o, dirs, t_vals, sdf,
                                    n_imp // ups, inv_s)
            # merge + sort (ref cat_z_vals, 851-869)
            t_vals = jnp.concatenate([t_vals, new_t], -1)
            order = jnp.argsort(t_vals, -1)
            t_vals = jnp.take_along_axis(t_vals, order, -1)
            if i + 1 < ups:
                new_sdf = jax.lax.stop_gradient(sdf_at(new_t))
                sdf = jnp.take_along_axis(
                    jnp.concatenate([sdf, new_sdf], -1), order, -1)

    dists = t_vals[:, 1:] - t_vals[:, :-1]
    dists = jnp.concatenate([dists, dists[:, -1:]], -1)
    mid = t_vals + dists * 0.5
    t_starts, t_ends = t_vals, t_vals + dists

    pts = rays_o[:, None, :] + dirs[:, None, :] * mid[..., None]
    outer = jnp.any((aabb[0] > pts) | (pts > aabb[1]), -1)
    return t_starts, t_ends, ~outer


# ---------------------------------------------------------------------------
# render core (ref: 1105-1277)
# ---------------------------------------------------------------------------

def render_background(params_bg, cfg: ShapeRendererConfig, rays_o, dirs,
                      rng, is_train: bool):
    """NeRF++ inverted-sphere background color per ray.

    Samples inverse radius 1/r uniformly in (0, 1] (r from the unit
    sphere outward), evaluates the background MLP on (x/r, 1/r) + view
    dir, and composites front-to-back with
    alpha = 1 - exp(-softplus(sigma) * dist) (the reference's
    density_activation, shapeRenderer.py:810-811; its BG rendering
    itself is unimplemented — raise at shapeRenderer.py:1109/1180).
    Returns [rn, 3] linear color."""
    n = cfg.n_bg_samples
    rn = rays_o.shape[0]
    s = jnp.linspace(1.0, 1.0 / n, n)                      # descending 1/r
    if is_train and rng is not None:
        jitter = (jax.random.uniform(rng, (rn, n)) - 0.5) * (1.0 / n)
        s = jnp.clip(s[None] + jitter, 1e-4, 1.0)
        s = -jnp.sort(-s, axis=-1)                         # keep descending
    else:
        s = jnp.broadcast_to(s[None], (rn, n))
    r = 1.0 / s                                            # ascending radii
    od = jnp.sum(rays_o * dirs, -1, keepdims=True)
    oo = jnp.sum(rays_o * rays_o, -1, keepdims=True)
    # far intersection of the ray with the radius-r sphere
    t = -od + jnp.sqrt(jnp.maximum(od ** 2 - oo + r ** 2, 1e-6))
    pts = rays_o[:, None, :] + dirs[:, None, :] * t[..., None]
    pr = jnp.maximum(
        jnp.linalg.norm(pts, axis=-1, keepdims=True), 1e-3)
    pts4 = jnp.concatenate([pts / pr, 1.0 / pr], -1)
    view = jnp.broadcast_to(dirs[:, None, :], pts.shape)
    sigma, rgb = mlp.apply_nerf_bg(params_bg, pts4.reshape(-1, 4),
                                   view.reshape(-1, 3))
    sigma = sigma.reshape(rn, n)
    rgb = jnp.exp(rgb.reshape(rn, n, 3))       # log-space init at 0.5
    dists = jnp.concatenate(
        [t[:, 1:] - t[:, :-1], jnp.full((rn, 1), 1e4, t.dtype)], -1)
    alpha = 1.0 - jnp.exp(-jax.nn.softplus(sigma) * dists)
    weights, _ = composite.weights_from_alpha(alpha)
    return composite.accumulate(weights, rgb)


def render_rays(params, cfg: ShapeRendererConfig, mips, occ_state, ray_batch,
                step, cos_anneal_ratio, rng, is_train: bool,
                radiance_on: bool = False, occ_loss_on: bool = False,
                eval_extras: bool = False, alpha_mask=None):
    """Render a batch of rays end-to-end; returns the outputs dict.

    ray_batch keys: rays_o, rays_d, dirs, radiis, rays_cos, human_poses
    (optional), rgbs (optional). All leading dim rn.
    """
    aabb = aabb_array(cfg)
    rays_o, dirs = ray_batch['rays_o'], ray_batch['dirs']
    radii, rays_cos = ray_batch['radiis'], ray_batch['rays_cos']
    human_poses = ray_batch.get('human_poses')
    rn = rays_o.shape[0]
    br = base_radii(cfg)
    near, far = near_far_from_sphere(rays_o, dirs)
    # pack the VM field atlas ONCE per render (pyramids + bf16 cast hoisted
    # out of every field call — round-1 trace lever W6)
    packed = tenso_sdf.pack_field(params['sdf'], cfg.sdf)

    k_sample, k_occ = jax.random.split(rng)
    if cfg.use_occ_grid:
        stride = max(int(cfg.march_stride), 1)
        ss = step_size(cfg) * stride
        n_cand = -(-n_march_candidates(cfg) // stride)
        t_starts, t_ends, valid = grid_mod.occ_grid_sampling(
            occ_state, grid_mod.OccGridConfig(resolution=cfg.occ_grid_reso),
            rays_o, dirs, near, far, ss, n_cand,
            cfg.occ_max_samples, k_sample if is_train else None)
    else:
        t_starts, t_ends, valid = sample_ray_hierarchical(
            params, cfg, rays_o, dirs, near, far, radii, rays_cos,
            k_sample, is_train, packed=packed)

    sn = t_starts.shape[1]
    mid = 0.5 * (t_starts + t_ends)
    dists = t_ends - t_starts
    pts = rays_o[:, None, :] + dirs[:, None, :] * mid[..., None]
    inner = valid & ~jnp.any((aabb[0] > pts) | (pts > aabb[1]), -1)
    if alpha_mask is not None and not cfg.use_occ_grid:
        # alpha-mask sample culling (ref: shapeRenderer.py:1119-1128)
        am = alpha_mask.sample_alpha(pts.reshape(-1, 3)).reshape(rn, sn)
        inner = inner & (am > 0)

    sbr = compute_ball_radii(mid[..., None], radii[:, None, :],
                             rays_cos[:, None, :])
    levels = jnp.log2(sbr[..., 0] / br)

    flat_pts = pts.reshape(-1, 3)
    flat_lv = levels.reshape(-1, 1)
    flat_dirs = jnp.broadcast_to(dirs[:, None, :], pts.shape).reshape(-1, 3)
    if human_poses is not None:
        hp_full = jnp.broadcast_to(human_poses[:, None],
                                   (rn, sn) + human_poses.shape[1:])
        hp_full = hp_full.reshape(-1, *human_poses.shape[1:])
    else:
        hp_full = None

    # ---- global sample compaction -------------------------------------
    compact = (cfg.compact_samples_per_ray
               if (cfg.use_occ_grid and cfg.compact_samples_per_ray > 0)
               else 0)
    if compact:
        m = rn * compact
        src, slot_mask, dest = grid_mod.compact_indices(
            inner.reshape(-1), m)
        # one WIDE gather for all per-sample columns (narrow per-column
        # gathers pay the per-row cost 4x — round-2 trace finding)
        cols = jnp.concatenate(
            [flat_pts, flat_lv, flat_dirs, dists.reshape(-1, 1)], -1)
        s_cols = jnp.take(cols, src, axis=0, mode='clip')
        s_pts, s_lv = s_cols[:, 0:3], s_cols[:, 3:4]
        s_dirs, s_dists = s_cols[:, 4:7], s_cols[:, 7]
        s_hp = (jnp.take(hp_full, src, axis=0, mode='clip')
                if hp_full is not None else None)
    else:
        s_pts, s_lv, s_dirs = flat_pts, flat_lv, flat_dirs
        s_dists = dists.reshape(-1)
        s_hp = hp_full
        slot_mask = inner.reshape(-1)
        dest = None

    sdf, app_feat, grads, hessian = tenso_sdf.sdf_with_grad_hessian(
        params['sdf'], cfg.sdf, s_pts, aabb, s_lv,
        with_hessian=is_train, packed=packed)
    inv_s = mlp.apply_variance(params['deviation'], cfg.std_act)
    inv_s = jnp.clip(inv_s, 1e-6, 1e6)
    if cfg.freeze_inv_s_step is not None and is_train:
        inv_s = jnp.where(step < cfg.freeze_inv_s_step,
                          jax.lax.stop_gradient(inv_s), inv_s)

    true_cos = jnp.sum(s_dirs * grads, -1)
    iter_cos = composite.anneal_cos(true_cos, cos_anneal_ratio)
    alpha_s = composite.neus_alpha(sdf, inv_s, iter_cos, s_dists)

    normals = safe_normalize(grads)
    color_out = shading_mod.apply_shading(
        params['shading'], cfg.shading, mips, s_pts, normals, -s_dirs,
        app_feat, s_hp, step=(step if radiance_on else None))
    sampled_color, sampled_radiance, occ_info = color_out[:3]

    mask_f = inner.astype(alpha_s.dtype)
    slot_f = slot_mask.astype(alpha_s.dtype)
    if compact:
        # composite entirely in COMPACT space: segmented transmittance +
        # ONE scatter-free segment reduction for every per-ray accumulation
        # (weights, color, normal, radiance, depth).  No [rays, samples]-
        # shaped tensor is materialized anywhere in the compacted train
        # path, and no per-accumulation scatter: 5 separate segment_sums
        # cost ~5ms/step in the round-2 trace; the packed cumsum+boundary
        # form is ~0.5ms with a cheap (reverse-cumsum) VJP.
        # Invalid slots get ray_id = rn so the id stream is globally sorted.
        ray_id = jnp.where(slot_mask, (src // sn).astype(jnp.int32), rn)
        w_c = composite.compact_weights(alpha_s, slot_mask, ray_id, rn)
        w_col = w_c[:, None]
        cols = [w_col, w_col * sampled_color, w_col * grads]
        n_cols = 7
        if radiance_on and sampled_radiance is not None:
            rough_c = occ_info['roughness']
            rough_c = rough_c if rough_c.ndim > 1 else rough_c[:, None]
            cols += [w_col * sampled_radiance, w_col * rough_c]
            n_cols = 11
        if eval_extras:
            cols.append(w_col * jnp.take(mid.reshape(-1), src,
                                         mode='clip')[:, None])
        sums = composite.segment_sums_sorted(
            jnp.concatenate(cols, -1), ray_id, rn)
        acc = sums[:, 0:1]
        color = sums[:, 1:4]
        acc_normal_c = sums[:, 4:7]
        radiance_c = sums[:, 7:10] if n_cols == 11 else None
        rw_c = sums[:, 10:11] if n_cols == 11 else None
        t_depth_c = sums[:, n_cols:n_cols + 1] if eval_extras else None
    else:
        weights, _ = composite.weights_from_alpha(
            alpha_s.reshape(rn, sn), inner)
        acc = composite.accumulate(weights)
        color = composite.accumulate(weights,
                                     sampled_color.reshape(rn, sn, 3))
    # background behind the foreground (ref: shapeRenderer.py:1178-1182)
    if cfg.predict_BG:
        bg_rng = jax.random.fold_in(rng, 7) if rng is not None else None
        bg_color = render_background(params['bg'], cfg, rays_o, dirs,
                                     bg_rng, is_train)
        color = color + bg_color * (1.0 - acc)
    elif cfg.isBGWhite:
        color = color + (1.0 - acc)

    outputs: Dict[str, Any] = {
        'ray_rgb': color,
        'acc': acc,
        'sample_num': jnp.sum(mask_f) / rn,
    }

    if compact:
        acc_normal = acc_normal_c
    else:
        acc_normal = composite.accumulate(weights, grads.reshape(rn, sn, 3))
    outputs['normal'] = safe_normalize(
        acc_normal * acc + (1.0 - acc)
        * jnp.asarray([0.0, 0.0, 1.0], acc.dtype))

    # masked means over the (compacted or dense) evaluated sample set —
    # identical math either way: both sum over exactly the valid samples
    nvalid = jnp.maximum(jnp.sum(slot_f), 1.0)
    grad_err = (jnp.linalg.norm(grads, axis=-1) - 1.0) ** 2
    outputs['gradient_error'] = jnp.sum(grad_err * slot_f) / nvalid

    if cfg.apply_sparse_loss:
        reg = jnp.exp(-20.0 * jnp.abs(sdf))
        outputs['loss_sparse'] = jnp.sum(reg * slot_f) / nvalid
    if cfg.apply_hessian_loss and hessian is not None:
        outputs['loss_hessian'] = jnp.sum(
            jnp.abs(hessian) * slot_f) / nvalid
    if cfg.apply_tv_loss:
        from ..ops.tensor_field import tv_loss_vm
        outputs['loss_tv_sdf'] = tv_loss_vm(params['sdf']['field'])
    if cfg.apply_gaussian_loss and is_train:
        from ..ops.tensor_field import gaussian_smooth_loss_vm
        outputs['loss_gaussian'] = jnp.where(
            step > cfg.gaussian_loss_step,
            gaussian_smooth_loss_vm(params['sdf']['field']), 0.0)

    outputs['std'] = jnp.mean(1.0 / inv_s)

    if radiance_on and sampled_radiance is not None:
        if compact:
            radiance = radiance_c
            rw = rw_c
        else:
            radiance = composite.accumulate(
                weights, sampled_radiance.reshape(rn, sn, 3))
            rw = composite.accumulate(
                weights, occ_info['roughness'].reshape(rn, sn, 1))
        if not cfg.predict_BG and cfg.isBGWhite:
            radiance = radiance + (1.0 - acc)
        outputs['radiance'] = radiance
        outputs['roughness_weights'] = jax.lax.stop_gradient(rw[:, 0])

    # init-sdf regularization inputs (ref: loss.py:170-202, gated step<1000)
    outputs['sdf_vals'] = sdf
    outputs['sdf_pts_norm'] = jnp.linalg.norm(s_pts, axis=-1)
    outputs['sdf_mask'] = slot_f

    if cfg.apply_occ_loss and is_train:
        if occ_loss_on:
            outputs['loss_occ'] = _occ_loss(
                params, cfg, aabb, s_pts, sdf, normals, s_dirs,
                occ_info, slot_mask, k_occ, inv_s, packed=packed,
                occ_state=(occ_state if cfg.use_occ_grid else None))
        else:
            outputs['loss_occ'] = jnp.zeros(())

    if eval_extras:
        if compact:
            t_depth = t_depth_c
        else:
            t_depth = composite.accumulate(weights, mid[..., None])
        outputs['depth'] = t_depth * rays_cos
        surf_pts = t_depth * dirs + rays_o
        sbr_d = compute_ball_radii(t_depth, radii, rays_cos)
        lv_d = jnp.log2(sbr_d / br)
        g = tenso_sdf.gradient_only(params['sdf'], cfg.sdf, surf_pts, aabb,
                                    lv_d, packed=packed)
        nrm = safe_normalize(g)
        inner_d = ~jnp.any((aabb[0] > surf_pts) | (surf_pts > aabb[1]), -1,
                           keepdims=True)
        outputs['normal_vis'] = ((nrm + 1.0) * 0.5) * inner_d
        feat = tenso_sdf.apply_tenso_sdf(params['sdf'], cfg.sdf, surf_pts,
                                         aabb, lv_d, packed=packed)[..., 1:]
        _, _, occ_info_s, inter = shading_mod.apply_shading(
            params['shading'], cfg.shading, mips, surf_pts, nrm, -dirs, feat,
            human_poses, step=step, inter_results=True)

        def sdf_fun(x):
            return tenso_sdf.sdf_only(params['sdf'], cfg.sdf, x, aabb,
                                      packed=packed)
        _, occ_w, _ = secondary.secondary_intersection(
            sdf_fun, inv_s, surf_pts, occ_info_s['reflective'], 128, 9)
        outputs['occ_prob_gt'] = jnp.sum(occ_w, -1, keepdims=True)
        for k, v in inter.items():
            outputs[k] = v * inner_d
        outputs['occ_prob'] = occ_info_s['occ_prob'] * inner_d

    return outputs


def _occ_loss(params, cfg: ShapeRendererConfig, aabb, flat_pts, sdf, normals,
              flat_dirs, occ_info, flat_inner, rng, inv_s, packed=None,
              occ_state=None):
    """Occlusion-probability supervision (ref: shapeRenderer.py:1027-1103).

    Fixed-shape: select up to ``occ_loss_max_pn`` qualifying surface samples
    with top_k over randomized scores, march their reflection rays through
    the SDF, L1 between predicted and marched occlusion probability.

    Two march sources, mirroring the reference's two branches:
      * occ_state provided (occ-grid sampler active): march the BAKED SDF
        lattice refreshed at every occupancy update — one gathered row per
        tap instead of a full VM-field evaluation (the march target is
        stop_gradient'ed either way, so only the forward cost changes; the
        bake lags the field by at most occ_update_interval steps, like the
        reference's EMA'd occupancy in its grid branch,
        ref shapeRenderer.py:1056-1100).
      * otherwise: march the live field (ref get_intersection branch,
        shapeRenderer.py:1052-1054).
    """
    k = cfg.occ_loss_max_pn
    n = flat_pts.shape[0]
    sdf_mask = jnp.abs(sdf) < cfg.occ_sdf_thresh
    normal_mask = jnp.sum(normals * flat_dirs, -1) < 0
    mask = flat_inner & sdf_mask & normal_mask

    score = jnp.where(mask, jax.random.uniform(rng, (n,)), -1.0)
    kk = min(k, n)
    _, idx = jax.lax.top_k(score, kk)
    sel_mask = jnp.take(mask, idx, mode='clip')
    sel_pts = jnp.take(flat_pts, idx, axis=0, mode='clip')
    sel_ref = jnp.take(occ_info['reflective'], idx, axis=0, mode='clip')
    sel_occ = jnp.take(occ_info['occ_prob'], idx, axis=0, mode='clip')

    if occ_state is not None and 'sdf_rows' in occ_state:
        occ_cfg = grid_mod.OccGridConfig(resolution=cfg.occ_grid_reso)

        def sdf_fun(x):
            return grid_mod.sample_occ_sdf(occ_state, occ_cfg, x)[:, None]
    else:
        def sdf_fun(x):
            return tenso_sdf.sdf_only(params['sdf'], cfg.sdf, x, aabb,
                                      packed=packed)

    _, w, _ = secondary.secondary_intersection(sdf_fun, inv_s, sel_pts,
                                               sel_ref, 64, 16)
    occ_gt = jnp.sum(w, -1, keepdims=True)
    l1 = jnp.abs(sel_occ - occ_gt)[:, 0] * sel_mask.astype(sel_occ.dtype)
    return jnp.sum(l1) / jnp.maximum(jnp.sum(sel_mask), 1.0)


def compute_rgb_loss(cfg: ShapeRendererConfig, rgb_pr, rgb_gt):
    """(ref: shapeRenderer.py:796-808)"""
    if cfg.rgb_loss == 'l2':
        return jnp.sum((rgb_pr - rgb_gt) ** 2, -1)
    if cfg.rgb_loss == 'l1':
        return jnp.sum(jnp.abs(rgb_pr - rgb_gt), -1)
    if cfg.rgb_loss == 'charbonier':
        return charbonnier(rgb_pr, rgb_gt)
    raise NotImplementedError(cfg.rgb_loss)


def compute_occ_alpha(params, cfg: ShapeRendererConfig, pts, packed=None):
    """Alpha at grid cell centers for occupancy updates (ref: 972-993)."""
    aabb = aabb_array(cfg)
    sdf = tenso_sdf.sdf_only(params['sdf'], cfg.sdf, pts, aabb,
                             packed=packed)[:, 0]
    inv_s = jnp.clip(mlp.apply_variance(params['deviation'], cfg.std_act),
                     1e-6, 1e6)
    return composite.neus_alpha_isotropic(sdf, inv_s, step_size(cfg))


def compute_occ_alpha_chunked(params, cfg: ShapeRendererConfig, pts,
                              chunk: int = 131072):
    """compute_occ_alpha over a large point set (all occ-grid cell centers,
    128^3 = 2M) via lax.map chunks: the packed-atlas gather materializes
    [N, rows, C] per evaluation, so a single-shot 2M-point call would
    allocate tens of GB. The field atlas is packed once and reused."""
    n = pts.shape[0]
    if n <= chunk:
        return compute_occ_alpha(params, cfg, pts)
    packed = tenso_sdf.pack_field(params['sdf'], cfg.sdf)
    pad = (-n) % chunk
    pts_p = jnp.concatenate([pts, jnp.zeros((pad, 3), pts.dtype)], 0)
    out = jax.lax.map(
        lambda p: compute_occ_alpha(params, cfg, p, packed=packed),
        pts_p.reshape(-1, chunk, 3))
    return out.reshape(-1)[:n]


def compute_sdf_chunked(params, cfg: ShapeRendererConfig, pts,
                        chunk: int = 131072, packed=None):
    """Raw SDF over a large point set (the occ-loss bake lattice)."""
    aabb = aabb_array(cfg)
    if packed is None:
        packed = tenso_sdf.pack_field(params['sdf'], cfg.sdf)
    n = pts.shape[0]

    def eval_chunk(p):
        return tenso_sdf.sdf_only(params['sdf'], cfg.sdf, p, aabb,
                                  packed=packed)[:, 0]

    if n <= chunk:
        return eval_chunk(pts)
    pad = (-n) % chunk
    pts_p = jnp.concatenate([pts, jnp.zeros((pad, 3), pts.dtype)], 0)
    out = jax.lax.map(eval_chunk, pts_p.reshape(-1, chunk, 3))
    return out.reshape(-1)[:n]


def compute_grid_alpha(params, cfg: ShapeRendererConfig, pts,
                       step_length: float, mul_length: float = 10.0):
    """Alpha for the alpha-mask update (ref: shapeRenderer.py:299-325):
    isotropic NeuS alpha with near-surface cells forced opaque."""
    aabb = aabb_array(cfg)
    sdf = tenso_sdf.sdf_only(params['sdf'], cfg.sdf, pts, aabb)[:, 0]
    inv_s = jnp.clip(mlp.apply_variance(params['deviation'], cfg.std_act),
                     1e-6, 1e6)
    alpha = composite.neus_alpha_isotropic(sdf, inv_s, step_length)
    near_surf = jnp.abs(sdf) < mul_length * step_length
    return jnp.where(near_surf, 1.0, alpha)


def build_alpha_mask(params, cfg: ShapeRendererConfig,
                     grid_size: int = 128, mul_length: float = 10.0,
                     alpha_thresh: float = 1e-4,
                     chunk: int = 262144) -> grid_mod.AlphaGridMask:
    """updateAlphaMask equivalent (ref: shapeRenderer.py:256-282):
    dense alpha eval -> 3^3 max pool -> binarize. Host-chunked."""
    aabb_np = np.asarray(cfg.aabb, np.float32)
    xs = [np.linspace(aabb_np[0][d], aabb_np[1][d], grid_size,
                      dtype=np.float32) for d in range(3)]
    pts = np.stack(np.meshgrid(*xs, indexing='ij'), -1).reshape(-1, 3)
    step_length = float(((aabb_np[1] - aabb_np[0])
                         / (grid_size - 1)).mean())

    fn = jax.jit(lambda p: compute_grid_alpha(
        params, cfg, p, step_length, mul_length))
    alphas = []
    for i in range(0, len(pts), chunk):
        alphas.append(np.asarray(fn(jnp.asarray(pts[i:i + chunk]))))
    vol = jnp.asarray(np.concatenate(alphas, 0)
                      .reshape(grid_size, grid_size, grid_size))
    vol = jnp.clip(vol, 0.0, 1.0)
    vol = grid_mod.max_pool_3d_3x3(vol)
    vol = (vol >= alpha_thresh).astype(jnp.float32)
    return grid_mod.AlphaGridMask(aabb=aabb_array(cfg), volume=vol)


def train_step_outputs(params, cfg: ShapeRendererConfig, mips, occ_state,
                       ray_batch, step, rng, radiance_on: bool,
                       occ_loss_on: bool, alpha_mask=None):
    """Training forward: render + rgb/psnr/mask losses
    (ref: shapeRenderer.py:777-794)."""
    anneal = jnp.minimum(1.0, step / cfg.anneal_end) if cfg.anneal_end >= 0 \
        else jnp.asarray(1.0)
    outputs = render_rays(params, cfg, mips, occ_state, ray_batch, step,
                          anneal, rng, True, radiance_on, occ_loss_on,
                          alpha_mask=alpha_mask)
    rgb_gt = ray_batch['rgbs']
    outputs['loss_rgb'] = compute_rgb_loss(cfg, outputs['ray_rgb'], rgb_gt)
    mse = jnp.mean((outputs['ray_rgb'] - rgb_gt) ** 2)
    outputs['psnr'] = 20.0 * jnp.log10(1.0 / jnp.sqrt(jnp.maximum(mse, 1e-10)))
    if radiance_on:
        outputs['loss_radiance'] = (
            compute_rgb_loss(cfg, outputs['radiance'], rgb_gt)
            * outputs['roughness_weights'])
        outputs['loss_rgb'] = outputs['loss_rgb'] * (
            1.0 - outputs['roughness_weights'])
    if cfg.apply_mask_loss and 'masks' in ray_batch:
        acc = jnp.clip(outputs['acc'], 1e-3, 1.0 - 1e-3)
        m = (ray_batch['masks'] > 0.5).astype(acc.dtype)
        outputs['loss_mask'] = jnp.mean(
            -(m * jnp.log(acc) + (1 - m) * jnp.log(1 - acc)))
    return outputs
