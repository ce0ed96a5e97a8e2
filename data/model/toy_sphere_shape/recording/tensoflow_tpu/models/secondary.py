"""Secondary-ray visibility via hierarchical SDF marching — the TPU-native
replacement for the CUDA BVH ray tracer.

Semantics follow the reference's SDF-march occlusion oracle
(ref: utils/network_utils.py:149-202 ``get_weights``/``get_intersection``,
used for the stage-1 occ loss and as the design target named in SURVEY §2.4
for replacing the BVH): two-pass fixed-count sampling (uniform sn0, then
inverse-CDF resample to sn1) with NeuS-style section alphas, accumulated
into an occlusion probability; the expected hit point/depth come from the
same weights.  Everything is fixed-shape and mask-based.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.composite import weights_from_alpha
from ..ops.math import get_sphere_intersection, sample_pdf


def march_weights(sdf_fun, inv_s, z_vals, origins, dirs):
    """Section weights + mid sdf along rays (ref: network_utils.py:149-170).

    sdf_fun: [M,3]->[M,1]; inv_s: scalar; z_vals [pn,sn]; origins/dirs [pn,3].
    Returns (weights [pn,sn-1], mid_sdf [pn,sn-1]).
    """
    pn, sn = z_vals.shape
    points = origins[:, None, :] + dirs[:, None, :] * z_vals[..., None]
    sdf = sdf_fun(points.reshape(-1, 3)).reshape(pn, sn)

    prev_sdf, next_sdf = sdf[:, :-1], sdf[:, 1:]
    prev_z, next_z = z_vals[:, :-1], z_vals[:, 1:]
    mid_sdf = 0.5 * (prev_sdf + next_sdf)
    cos_val = (next_sdf - prev_sdf) / (next_z - prev_z + 1e-5)
    surface_mask = cos_val < 0
    cos_val = jnp.minimum(cos_val, 0.0)

    dist = next_z - prev_z
    prev_esti = mid_sdf - cos_val * dist * 0.5
    next_esti = mid_sdf + cos_val * dist * 0.5
    prev_cdf = jax.nn.sigmoid(prev_esti * inv_s)
    next_cdf = jax.nn.sigmoid(next_esti * inv_s)
    alpha = (prev_cdf - next_cdf + 1e-5) / (prev_cdf + 1e-5)
    alpha = alpha * surface_mask.astype(alpha.dtype)
    weights, _ = weights_from_alpha(alpha)
    mid_sdf = jnp.where(surface_mask, mid_sdf, -1.0)
    return weights, mid_sdf


def secondary_intersection(sdf_fun, inv_s, pts, dirs, sn0: int = 128,
                           sn1: int = 9):
    """Occlusion march from surface points (ref: network_utils.py:172-202).

    Returns (hit_z_vals [pn,sn1-1], hit_weights [pn,sn1-1],
             hit_sdf [pn,sn1-1]); rays starting outside |x|<0.999 get zeros.
    Wrapped in stop_gradient (the reference marches under no_grad).
    """
    def run(pts, dirs):
        inside = jnp.linalg.norm(pts, axis=-1) < 0.999
        max_dist = get_sphere_intersection(pts, dirs)      # [pn,1]
        z = jnp.linspace(0.0, 1.0, sn0, dtype=pts.dtype)
        z_vals = max_dist * z[None, :]
        w, _ = march_weights(sdf_fun, inv_s, z_vals, pts, dirs)
        z_new = sample_pdf(z_vals, w, sn1)                 # det midpoints
        z_new = jnp.sort(z_new, axis=-1)
        w2, mid_sdf = march_weights(sdf_fun, inv_s, z_new, pts, dirs)
        z_mid = 0.5 * (z_new[:, 1:] + z_new[:, :-1])
        m = inside[:, None].astype(pts.dtype)
        return z_mid * m, w2 * m, jnp.where(inside[:, None], mid_sdf, -1.0)

    return jax.lax.stop_gradient(run(pts, dirs))


def trace_sdf(sdf_fun, grad_fun, inv_s, rays_o, rays_d, sn0: int = 128,
              sn1: int = 9, hit_weight_thresh: float = 0.5):
    """Primary/secondary surface tracing: BVH.trace replacement.

    Replaces raytracing.RayTracer.trace + SDF refinement
    (ref: materialRenderer.py:265-343 trace_sdf_with_mesh): march, take the
    weight-expected depth as the hit depth, SDF gradient as the normal
    (flipped to face the ray), accumulated weight as hit confidence.

    Returns (inters [pn,3], normals [pn,3], depth [pn,1], hit_mask [pn]).
    """
    z_mid, w, _ = secondary_intersection(sdf_fun, inv_s, rays_o, rays_d,
                                         sn0, sn1)
    acc = jnp.sum(w, -1, keepdims=True)                    # [pn,1]
    wn = w / jnp.maximum(acc, 1e-8)
    depth = jnp.sum(wn * z_mid, -1, keepdims=True)
    hit_mask = acc[:, 0] > hit_weight_thresh
    inters = rays_o + depth * rays_d
    grad = grad_fun(inters)
    normals = grad / jnp.maximum(
        jnp.linalg.norm(grad, axis=-1, keepdims=True), 1e-8)
    flip = jnp.sum(normals * rays_d, -1, keepdims=True) >= 0
    normals = jnp.where(flip, -normals, normals)
    return inters, normals, depth, hit_mask
