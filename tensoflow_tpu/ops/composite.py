"""Volume-rendering compositing with dense fixed-shape sample layouts.

Replaces the reference's nerfacc CUDA path (variable-length flat sample
lists + ``render_weight_from_alpha`` / ``accumulate_along_rays``,
ref: shapeRenderer.py:1166-1206) with exclusive-cumprod transmittance over a
dense ``[rays, samples]`` grid plus a validity mask.  On TPU a padded dense
layout + masking compiles to one fused program; masked samples contribute
exactly zero, so the math matches the compacted CUDA version.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def weights_from_alpha(alpha, mask=None):
    """Per-sample compositing weights from per-sample opacity.

    alpha: [rn, sn]; mask: optional [rn, sn] bool (invalid samples -> alpha 0).
    Returns (weights [rn, sn], transmittance-before-sample [rn, sn]).

    weight_i = alpha_i * prod_{j<i} (1 - alpha_j)  — NeuS/nerfacc semantics
    (ref: network_utils.py:168, nerfacc.render_weight_from_alpha).
    """
    if mask is not None:
        alpha = jnp.where(mask, alpha, 0.0)
    one_minus = jnp.clip(1.0 - alpha, 0.0, 1.0) + 1e-7
    # exclusive cumprod as exp(exclusive-cumsum(log)): cumsum's VJP is a
    # reversed cumsum, far cheaper on TPU than cumprod's (round-2 trace:
    # the cumprod fusion cost ~13ms/step). one_minus >= 1e-7 so log is safe.
    log_om = jnp.log(one_minus)
    trans = jnp.exp(jnp.cumsum(
        jnp.concatenate([jnp.zeros_like(alpha[:, :1]), log_om[:, :-1]],
                        axis=1), axis=1))
    return alpha * trans, trans


def _carry_last_valid(seed, flag):
    """Associative scan propagating the value at the most recent flagged
    slot (exact — no arithmetic on the carried values)."""
    def op(a, b):
        return (jnp.where(b[1], b[0], a[0]), a[1] | b[1])

    out, _ = jax.lax.associative_scan(op, (seed, flag))
    return out


def compact_weights(alpha_c, slot_mask, ray_id, n_rays: int):
    """Compositing weights directly on ray-major COMPACTED samples.

    alpha_c [M] per-slot opacity; slot_mask [M] bool (invalid slots are
    no-ops); ray_id [M] int32 (nondecreasing over valid slots — the stable
    prefix compaction of a [rays, samples] grid guarantees this); n_rays
    static.  Returns w_c [M] = alpha_i * prod_{j<i, same ray} (1-alpha_j),
    zero at invalid slots.

    Equivalent to scatter_back + weights_from_alpha on the padded grid
    (up to the 1e-7 cumprod guard applied only at valid slots), without
    materializing any [rays, samples] tensor: one flat cumsum of
    log(1-alpha) plus a per-ray segment-start correction.  The start
    correction is broadcast with a carry-last-valid scan — scatter- and
    gather-free (a segment_sum of counts + 131k-row gather cost ~2ms/step
    in the round-2 trace; segment-id gathers pay per row on TPU).
    """
    valid = slot_mask.astype(alpha_c.dtype)
    a = alpha_c * valid
    log_om = jnp.log(jnp.clip(1.0 - a, 0.0, 1.0) + 1e-7) * valid
    cs = jnp.cumsum(log_om)
    excl = cs - log_om                       # inclusive -> exclusive
    first = jnp.concatenate([jnp.ones((1,), jnp.bool_),
                             ray_id[1:] != ray_id[:-1]])
    start = _carry_last_valid(jnp.where(first, excl, 0.0), first)
    trans = jnp.exp(excl - start)
    return a * trans * valid


def segment_sums_sorted(cols, ray_id, n_rays: int):
    """Per-ray sums of compact sample columns, scatter-free.

    cols [M, K]; ray_id [M] int32 GLOBALLY nondecreasing (invalid slots
    must carry ray_id >= n_rays so they sort after all real rays and drop
    out); returns [n_rays, K].

    sum_r = P[right_r] - P[left_r] with P the 0-prefixed inclusive cumsum
    and (left, right) each ray's slot range from one searchsorted pair.
    One [M, K] cumsum + two [n_rays]-row gathers replace K scatter-adds of
    M rows each (~1.15ms per segment_sum at M=131k in the round-2 trace);
    the VJP is a reversed cumsum + tiny boundary scatter instead of an
    M-row gather.  fp note: f32 cumsum across rays costs ~1e-4 relative
    on O(1) per-ray sums (measured) — inside the compositing noise floor.
    """
    k = cols.shape[1]
    cs = jnp.cumsum(cols, axis=0)
    p = jnp.concatenate([jnp.zeros((1, k), cols.dtype), cs])
    qs = jnp.arange(n_rays, dtype=ray_id.dtype)
    left = jnp.searchsorted(ray_id, qs, side='left')
    right = jnp.searchsorted(ray_id, qs, side='right')
    return (jnp.take(p, right, axis=0, mode='clip')
            - jnp.take(p, left, axis=0, mode='clip'))


def accumulate(weights, values=None):
    """sum_i w_i * v_i along the sample axis.

    weights: [rn, sn]; values: [rn, sn, C] or None (-> accumulated opacity).
    Returns [rn, C] or [rn, 1].
    """
    if values is None:
        return jnp.sum(weights, axis=1, keepdims=True)
    return jnp.sum(weights[..., None] * values, axis=1)


def neus_alpha(sdf, inv_s, iter_cos, dists):
    """NeuS section alpha from SDF + directional cosine
    (ref: shapeRenderer.py:1014-1024).

    sdf, iter_cos, dists: [...]; inv_s: [...] (clipped by caller).
    iter_cos is the (annealed, non-positive) cos between ray dir and normal.
    """
    est_next = sdf + iter_cos * dists * 0.5
    est_prev = sdf - iter_cos * dists * 0.5
    prev_cdf = jax.nn.sigmoid(est_prev * inv_s)
    next_cdf = jax.nn.sigmoid(est_next * inv_s)
    return jnp.clip((prev_cdf - next_cdf + 1e-5) / (prev_cdf + 1e-5), 0.0, 1.0)


def neus_alpha_isotropic(sdf, inv_s, step_size):
    """Direction-less alpha used for occupancy evaluation
    (ref: shapeRenderer.py:972-993)."""
    est_next = sdf - step_size * 0.5
    est_prev = sdf + step_size * 0.5
    prev_cdf = jax.nn.sigmoid(est_prev * inv_s)
    next_cdf = jax.nn.sigmoid(est_next * inv_s)
    return jnp.clip((prev_cdf - next_cdf + 1e-5) / (prev_cdf + 1e-5), 0.0, 1.0)


def anneal_cos(true_cos, cos_anneal_ratio):
    """NeuS cosine annealing (ref: shapeRenderer.py:1011-1012). Non-positive."""
    r = cos_anneal_ratio
    return -(jax.nn.relu(-true_cos * 0.5 + 0.5) * (1.0 - r)
             + jax.nn.relu(-true_cos) * r)


def segment_weights(sdf_mid, cos_val, dists, inv_s, surface_mask):
    """Section weights for a secondary-ray SDF march
    (ref: utils/network_utils.py:149-170 ``get_weights`` inner math).

    sdf_mid/cos_val/dists/inv_s: [rn, sn]; surface_mask: [rn, sn] bool.
    Returns weights [rn, sn].
    """
    cos_val = jnp.minimum(cos_val, 0.0)
    prev_esti = sdf_mid - cos_val * dists * 0.5
    next_esti = sdf_mid + cos_val * dists * 0.5
    prev_cdf = jax.nn.sigmoid(prev_esti * inv_s)
    next_cdf = jax.nn.sigmoid(next_esti * inv_s)
    alpha = (prev_cdf - next_cdf + 1e-5) / (prev_cdf + 1e-5)
    alpha = alpha * surface_mask.astype(alpha.dtype)
    w, _ = weights_from_alpha(alpha)
    return w
