"""Pure-JAX math primitives shared by every layer of the framework.

Functional equivalents of the reference's scattered helpers:
  * positional encoding           (ref: utils/network_utils.py:6-50)
  * integrated positional enc.    (ref: utils/network_utils.py:52-61)
  * integrated directional enc.   (ref: utils/ref_utils.py:53-117)
  * spherical harmonics           (ref: utils/ref_utils.py:130-193)
  * contraction / coords          (ref: utils/network_utils.py:90-94)
  * sphere / camera-plane hits    (ref: utils/network_utils.py:69-114)
  * linear<->sRGB                 (ref: utils/raw_utils.py:4-33)
  * inverse-CDF sampling          (ref: utils/network_utils.py:117-147)

All functions are shape-polymorphic over leading batch dims, traceable under
jit, and free of data-dependent control flow.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

EPS = 1e-6


# ---------------------------------------------------------------------------
# basic vector helpers
# ---------------------------------------------------------------------------

def dot(a, b, keepdims: bool = True):
    return jnp.sum(a * b, axis=-1, keepdims=keepdims)


def saturate_dot(a, b):
    """clamp(<a,b>, 0, 1) (ref: utils/network_utils.py:63-64)."""
    return jnp.clip(dot(a, b), 0.0, 1.0)


def safe_normalize(x, eps: float = 1e-20):
    """Normalize along the last axis with NaN-free gradients at 0."""
    n2 = jnp.sum(x * x, axis=-1, keepdims=True)
    return x * jax.lax.rsqrt(jnp.maximum(n2, eps))


def reflect(v, n):
    """Reflect direction ``v`` about normal ``n`` (both [...,3])."""
    return 2.0 * dot(v, n) * n - v


def safe_sqrt(x, eps: float = 1e-12):
    return jnp.sqrt(jnp.maximum(x, eps))


def safe_acos(x, eps: float = EPS):
    return jnp.arccos(jnp.clip(x, -1.0 + eps, 1.0 - eps))


def safe_log(x, eps: float = EPS):
    return jnp.log(jnp.maximum(x, eps))


def charbonnier(pred, gt, eps: float = 1e-3):
    """Charbonnier RGB loss summed over channels (ref: shapeRenderer.py:803-805)."""
    return jnp.sqrt(jnp.sum((gt - pred) ** 2, axis=-1) + eps)


# ---------------------------------------------------------------------------
# color spaces
# ---------------------------------------------------------------------------

def linear_to_srgb(linear):
    """(ref: utils/raw_utils.py:4-13)"""
    eps = jnp.finfo(jnp.float32).eps
    srgb0 = 323.0 / 25.0 * linear
    srgb1 = (211.0 * jnp.maximum(linear, eps) ** (5.0 / 12.0) - 11.0) / 200.0
    return jnp.where(linear <= 0.0031308, srgb0, srgb1)


def srgb_to_linear(srgb):
    """(ref: utils/raw_utils.py:19-28)"""
    eps = jnp.finfo(jnp.float32).eps
    lin0 = 25.0 / 323.0 * srgb
    lin1 = jnp.maximum((200.0 * srgb + 11.0) / 211.0, eps) ** (12.0 / 5.0)
    return jnp.where(srgb <= 0.04045, lin0, lin1)


# ---------------------------------------------------------------------------
# coordinates
# ---------------------------------------------------------------------------

def contraction(xyz, aabb):
    """Map world coords into the unit cube [0,1]^3 (ref: network_utils.py:90-91)."""
    lo, hi = aabb[0], aabb[1]
    return (xyz - lo) / (hi - lo)


def normalize_coord(xyz, aabb):
    """Map world coords into [-1,1]^3 (ref: network_utils.py:93-94)."""
    lo, hi = aabb[0], aabb[1]
    return 2.0 * (xyz - lo) / (hi - lo) - 1.0


def to_sphere_angles(d):
    """Cartesian direction -> (phi, theta), phi in [0,2pi), theta in [0,pi]."""
    theta = safe_acos(d[..., 2:3])
    phi = jnp.arctan2(d[..., 1:2], d[..., 0:1]) % (2.0 * np.pi)
    return jnp.concatenate([phi, theta], axis=-1)


def from_sphere_angles(angles):
    """(phi, theta) -> unit direction (ref: network_utils.py:101-106)."""
    phi, theta = angles[..., 0:1], angles[..., 1:2]
    st, ct = jnp.sin(theta), jnp.cos(theta)
    return jnp.concatenate([st * jnp.cos(phi), st * jnp.sin(phi), ct], axis=-1)


def get_sphere_intersection(pts, dirs, radius: float = 1.0):
    """Distance along ``dirs`` from ``pts`` (inside) to the radius-1 sphere.

    (ref: utils/network_utils.py:108-114)
    """
    dtx = dot(pts, dirs)
    xtx = dot(pts, pts)
    disc = dtx * dtx - xtx + radius * radius
    return -dtx + jnp.sqrt(jnp.maximum(disc, 0.0) + 1e-6)


def get_camera_plane_intersection(pts, dirs, poses):
    """Ray / camera-XoY-plane intersection in "human" coordinates.

    pts [...,3], dirs [...,3], poses [...,3,4].
    Returns (inter [...,3], dist [...], hits [...]).
    (ref: utils/network_utils.py:69-88)
    """
    R, t = poses[..., :3], poses[..., 3:]
    pts_ = jnp.squeeze(R @ pts[..., None] + t, -1)
    dirs_ = jnp.squeeze(R @ dirs[..., None], -1)
    hits = jnp.abs(dirs_[..., 2]) > 1e-4
    dz = jnp.where(hits, dirs_[..., 2], 1e-4)
    dist = -pts_[..., 2] / dz
    inter = pts_ + dist[..., None] * dirs_
    return inter, dist, hits


# ---------------------------------------------------------------------------
# positional encodings
# ---------------------------------------------------------------------------

def positional_encoding(x, n_freqs: int, include_input: bool = True):
    """NeRF-style PE with log-spaced frequencies (ref: network_utils.py:6-50).

    Output channel layout matches the reference: [x, sin(2^0 x), cos(2^0 x),
    sin(2^1 x), cos(2^1 x), ...] — frequency-major, fn-minor.
    """
    outs = [x] if include_input else []
    for i in range(n_freqs):
        f = 2.0 ** i
        outs.append(jnp.sin(x * f))
        outs.append(jnp.cos(x * f))
    return jnp.concatenate(outs, axis=-1) if outs else x


def pe_dim(input_dims: int, n_freqs: int, include_input: bool = True) -> int:
    return input_dims * ((1 if include_input else 0) + 2 * n_freqs)


def expected_sin(mean, var):
    """E[sin(x)], x ~ N(mean, var) (ref: network_utils.py:52-54)."""
    return jnp.exp(-0.5 * var) * jnp.sin(mean)


def integrated_positional_encoding(mean, var, min_deg: int, max_deg: int):
    """mip-NeRF IPE (ref: network_utils.py:56-61).

    mean, var: [..., d]. Returns [..., 2 * d * (max_deg - min_deg)].
    """
    scales = 2.0 ** jnp.arange(min_deg, max_deg, dtype=mean.dtype)
    shape = mean.shape[:-1] + (-1,)
    sm = jnp.reshape(mean[..., None, :] * scales[:, None], shape)
    sv = jnp.reshape(var[..., None, :] * (scales[:, None] ** 2), shape)
    return expected_sin(
        jnp.concatenate([sm, sm + 0.5 * np.pi], axis=-1),
        jnp.concatenate([sv, sv], axis=-1),
    )


# ---------------------------------------------------------------------------
# integrated directional encoding (Ref-NeRF IDE)
# ---------------------------------------------------------------------------

def _generalized_binomial_coeff(a, k):
    return np.prod(a - np.arange(k)) / math.factorial(k)


def _assoc_legendre_coeff(l, m, k):
    return ((-1) ** m * 2 ** l * math.factorial(l) / math.factorial(k)
            / math.factorial(l - k - m)
            * _generalized_binomial_coeff(0.5 * (l + k + m - 1.0), l))


def _sph_harm_coeff(l, m, k):
    return (np.sqrt((2.0 * l + 1.0) * math.factorial(l - m)
                    / (4.0 * np.pi * math.factorial(l + m)))
            * _assoc_legendre_coeff(l, m, k))


@functools.lru_cache(maxsize=8)
def _ide_tables(deg_view: int):
    """(ref: utils/ref_utils.py:40-83) precomputed host-side tables."""
    ml_list = []
    for i in range(deg_view):
        l = 2 ** i
        for m in range(l + 1):
            ml_list.append((m, l))
    ml_array = np.array(ml_list).T  # [2, C]
    l_max = 2 ** (deg_view - 1)
    mat = np.zeros((l_max + 1, ml_array.shape[1]))
    for i, (m, l) in enumerate(ml_array.T):
        for k in range(l - m + 1):
            mat[k, i] = _sph_harm_coeff(l, m, k)
    sigma = 0.5 * ml_array[1, :] * (ml_array[1, :] + 1)
    return (mat.astype(np.float32), ml_array.astype(np.int32),
            sigma.astype(np.float32))


def ide_dim(deg_view: int) -> int:
    _, ml_array, _ = _ide_tables(deg_view)
    return 2 * ml_array.shape[1]


def integrated_dir_encoding(xyz, kappa_inv, deg_view: int = 5):
    """Ref-NeRF integrated directional encoding (ref: ref_utils.py:85-115).

    xyz: [...,3] directions; kappa_inv: [...,1] or scalar vMF concentration^-1.
    Implemented with real arithmetic (complex powers of (x+iy) expanded via
    angle-multiple trig identities) so it vectorizes cleanly on the VPU.
    """
    mat, ml_array, sigma = _ide_tables(deg_view)
    mat = jnp.asarray(mat)
    m_arr = ml_array[0, :]  # [C]
    x, y, z = xyz[..., 0:1], xyz[..., 1:2], xyz[..., 2:3]

    l_max_p1 = mat.shape[0]
    vmz = jnp.concatenate([z ** i for i in range(l_max_p1)], axis=-1)
    zpart = vmz @ mat  # [..., C]

    # (x + i y)^m = r^m (cos(m phi) + i sin(m phi))
    r = jnp.sqrt(jnp.maximum(x * x + y * y, 0.0))
    phi = jnp.arctan2(y, x)
    m_f = jnp.asarray(m_arr, dtype=xyz.dtype)
    r_pow = jnp.where(
        (r == 0.0) & (m_f > 0), 0.0, jnp.maximum(r, 1e-30) ** m_f)
    re_xy = r_pow * jnp.cos(m_f * phi)
    im_xy = r_pow * jnp.sin(m_f * phi)

    atten = jnp.exp(-jnp.asarray(sigma) * jnp.asarray(kappa_inv))
    re = re_xy * zpart * atten
    im = im_xy * zpart * atten
    return jnp.concatenate([re, im], axis=-1)


def spherical_harmonics(levels: int, directions):
    """Real SH components up to ``levels`` (ref: ref_utils.py:130-193)."""
    x, y, z = directions[..., 0], directions[..., 1], directions[..., 2]
    xx, yy, zz = x * x, y * y, z * z
    comps = [jnp.full(x.shape, 0.28209479177387814, directions.dtype)]
    if levels > 1:
        comps += [0.4886025119029199 * y,
                  0.4886025119029199 * z,
                  0.4886025119029199 * x]
    if levels > 2:
        comps += [1.0925484305920792 * x * y,
                  1.0925484305920792 * y * z,
                  0.9461746957575601 * zz - 0.31539156525251999,
                  1.0925484305920792 * x * z,
                  0.5462742152960396 * (xx - yy)]
    if levels > 3:
        comps += [0.5900435899266435 * y * (3 * xx - yy),
                  2.890611442640554 * x * y * z,
                  0.4570457994644658 * y * (5 * zz - 1),
                  0.3731763325901154 * z * (5 * zz - 3),
                  0.4570457994644658 * x * (5 * zz - 1),
                  1.445305721320277 * z * (xx - yy),
                  0.5900435899266435 * x * (xx - 3 * yy)]
    if levels > 4:
        comps += [2.5033429417967046 * x * y * (xx - yy),
                  1.7701307697799304 * y * z * (3 * xx - yy),
                  0.9461746957575601 * x * y * (7 * zz - 1),
                  0.6690465435572892 * y * z * (7 * zz - 3),
                  0.10578554691520431 * (35 * zz * zz - 30 * zz + 3),
                  0.6690465435572892 * x * z * (7 * zz - 3),
                  0.47308734787878004 * (xx - yy) * (7 * zz - 1),
                  1.7701307697799304 * x * z * (xx - 3 * yy),
                  0.6258357354491761 * (xx * (xx - 3 * yy) - yy * (3 * xx - yy))]
    return jnp.stack(comps, axis=-1)


# ---------------------------------------------------------------------------
# inverse-CDF sampling
# ---------------------------------------------------------------------------

def sample_pdf(bins, weights, n_samples: int, u=None):
    """Inverse-transform sampling of piecewise-constant pdfs.

    bins:    [..., B+1] bin edges (monotone along last axis)
    weights: [..., B]  unnormalized bin masses
    u:       [..., n_samples] uniforms in [0,1); if None -> deterministic
             midpoints (matches ref det=True path, network_utils.py:117-147)

    Returns samples [..., n_samples]. Fixed-shape, jit-safe searchsorted.
    """
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)

    if u is None:
        u = jnp.linspace(0.5 / n_samples, 1.0 - 0.5 / n_samples, n_samples,
                         dtype=cdf.dtype)
        u = jnp.broadcast_to(u, cdf.shape[:-1] + (n_samples,))

    # branchless bin search: count of cdf entries <= u. For the small bin
    # counts used here this compiles to one broadcast-compare-reduce, far
    # friendlier to the TPU compiler than vmapped searchsorted.
    inds = jnp.sum(cdf[..., None, :] <= u[..., :, None], axis=-1)
    below = jnp.maximum(inds - 1, 0)
    above = jnp.minimum(inds, cdf.shape[-1] - 1)

    cdf_g0 = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_g1 = jnp.take_along_axis(cdf, above, axis=-1)
    bins_g0 = jnp.take_along_axis(bins, below, axis=-1)
    bins_g1 = jnp.take_along_axis(bins, above, axis=-1)

    denom = cdf_g1 - cdf_g0
    denom = jnp.where(denom < 1e-5, 1.0, denom)
    t = (u - cdf_g0) / denom
    return bins_g0 + t * (bins_g1 - bins_g0)
