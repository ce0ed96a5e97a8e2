"""Cubemap sampling and pre-integration, pure JAX.

Replaces nvdiffrast cube-mode texturing and the renderutils CUDA
pre-integration kernels:
  * cube face select + bilinear lookup   (dr.texture boundary_mode='cube',
    ref: network/light.py:107-118,135)
  * latlong <-> cubemap converters       (ref: network/light_utils.py:34-63)
  * avg-pool mip chain                   (ref: light_utils.py:66-81)
  * diffuse (cosine) pre-integration     (ref: renderutils c_src/cubemap.cu,
    used at light.py:58)
  * GGX specular pre-integration         (ref: c_src/cubemap.cu specular path,
    used at light.py:60-64)

TPU design: pre-integrations are dense [T_out, T_in] matmuls over cubemap
texel lattices (MXU-friendly). Exact convolution is used at the low-res
levels where the kernel is wide (diffuse at the mip tail, GGX for the last,
roughness-1 level); the narrow-kernel high-res levels use the box-filtered
mip chain, the standard realtime approximation. The light is trainable, so
it adapts within this parameterization.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .math import safe_normalize


# ---------------------------------------------------------------------------
# face geometry (ref: light_utils.py:24-31)
# ---------------------------------------------------------------------------

def _cube_to_dir_np(s, x, y):
    one = np.ones_like(x)
    if s == 0:
        rx, ry, rz = one, -y, -x
    elif s == 1:
        rx, ry, rz = -one, -y, x
    elif s == 2:
        rx, ry, rz = x, one, y
    elif s == 3:
        rx, ry, rz = x, -one, -y
    elif s == 4:
        rx, ry, rz = x, -y, one
    else:
        rx, ry, rz = -x, -y, -one
    return np.stack([rx, ry, rz], -1)


@functools.lru_cache(maxsize=16)
def cubemap_dirs(res: int) -> np.ndarray:
    """[6, res, res, 3] unit direction of each texel center."""
    g = np.linspace(-1.0 + 1.0 / res, 1.0 - 1.0 / res, res)
    gy, gx = np.meshgrid(g, g, indexing='ij')
    faces = []
    for s in range(6):
        v = _cube_to_dir_np(s, gx, gy)
        v = v / np.linalg.norm(v, axis=-1, keepdims=True)
        faces.append(v)
    return np.stack(faces, 0).astype(np.float32)


@functools.lru_cache(maxsize=16)
def cubemap_solid_angles(res: int) -> np.ndarray:
    """[6, res, res] solid angle of each texel (exact per-texel integral)."""
    edges = np.linspace(-1.0, 1.0, res + 1)

    def area(x, y):
        return np.arctan2(x * y, np.sqrt(x * x + y * y + 1.0))

    a = area(edges[:, None], edges[None, :])
    sa = (a[1:, 1:] - a[:-1, 1:] - a[1:, :-1] + a[:-1, :-1])
    return np.broadcast_to(sa[None], (6, res, res)).astype(np.float32)


def dir_to_cube_uv(d):
    """Directions [N,3] -> (face [N], u [N], v [N]) with u,v in [0,1].

    Inverse of `_cube_to_dir_np`; u indexes x-within-face, v indexes
    y-within-face (row).
    """
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    ax, ay, az = jnp.abs(x), jnp.abs(y), jnp.abs(z)

    is_x = (ax >= ay) & (ax >= az)
    is_y = (~is_x) & (ay >= az)
    is_z = ~(is_x | is_y)

    face = jnp.where(
        is_x, jnp.where(x > 0, 0, 1),
        jnp.where(is_y, jnp.where(y > 0, 2, 3), jnp.where(z > 0, 4, 5)))

    ma = jnp.where(is_x, ax, jnp.where(is_y, ay, az))
    ma = jnp.maximum(ma, 1e-12)

    # per-face (sc, tc) such that dir = cube_to_dir(face, sc/ma, tc/ma)
    sc = jnp.select(
        [face == 0, face == 1, face == 2, face == 3, face == 4, face == 5],
        [-z, z, x, x, x, -x])
    tc = jnp.select(
        [face == 0, face == 1, face == 2, face == 3, face == 4, face == 5],
        [-y, -y, z, -z, -y, -y])
    u = 0.5 * (sc / ma + 1.0)
    v = 0.5 * (tc / ma + 1.0)
    return face, u, v


def sample_cubemap(cubemap, dirs):
    """Bilinear cubemap lookup. cubemap [6,R,R,C]; dirs [N,3] -> [N,C].

    Per-face clamped bilinear (cross-face seam filtering approximated by
    clamp — max one-texel-wide deviation from dr.texture's cube mode).
    """
    _, r, _, c = cubemap.shape
    face, u, v = dir_to_cube_uv(dirs)
    uf = u * r - 0.5
    vf = v * r - 0.5
    u0 = jnp.floor(uf)
    v0 = jnp.floor(vf)
    fu = (uf - u0)[:, None]
    fv = (vf - v0)[:, None]
    u0i = jnp.clip(u0.astype(jnp.int32), 0, r - 1)
    u1i = jnp.clip(u0.astype(jnp.int32) + 1, 0, r - 1)
    v0i = jnp.clip(v0.astype(jnp.int32), 0, r - 1)
    v1i = jnp.clip(v0.astype(jnp.int32) + 1, 0, r - 1)

    flat = cubemap.reshape(-1, c)
    base = face * r * r

    def g(vi, ui):
        return jnp.take(flat, base + vi * r + ui, axis=0, mode='clip')

    return ((1 - fv) * ((1 - fu) * g(v0i, u0i) + fu * g(v0i, u1i))
            + fv * ((1 - fu) * g(v1i, u0i) + fu * g(v1i, u1i)))


def pack_cubemap_patches(cubemap):
    """[6,R,R,C] -> [6*(R+1)^2, 4C] per-face 2x2 patch rows (face-clamped).

    Same row-packing trick as tensor_field.patch_pack_2d: the full bilinear
    footprint in ONE gathered row (4 taps + 4 scatter-add VJPs -> 1 + 1)."""
    f, r, _, c = cubemap.shape
    pad = jnp.pad(cubemap, ((0, 0), (1, 1), (1, 1), (0, 0)), mode='edge')
    slots = [pad[:, d0:d0 + r + 1, d1:d1 + r + 1]
             for d0 in (0, 1) for d1 in (0, 1)]
    return jnp.concatenate(slots, -1).reshape(f * (r + 1) * (r + 1), 4 * c)


def sample_cubemap_packed(pbuf, r, dirs, base=0):
    """One-gather bilinear cubemap lookup on pack_cubemap_patches rows.

    pbuf [6*(r+1)^2(+...), 4C]; r: int or [N] int32; dirs [N,3] -> [N,C].
    Matches sample_cubemap exactly (rows indexed v-major like the flat
    [6,R,R,C] layout)."""
    from .tensor_field import sample_bilinear_packed
    face, u, v = dir_to_cube_uv(dirs)
    rf = r.astype(u.dtype) if not isinstance(r, int) else float(r)
    fb = base + face * (r + 1) * (r + 1)
    return sample_bilinear_packed(pbuf, r, r, v * rf - 0.5, u * rf - 0.5, fb)


def pack_cubemap_pyramid_patches(pyramid):
    """Pack every pyramid level's patch rows into one buffer.

    Returns (pbuf, offsets tuple, res tuple) — offsets/res are python ints
    (trace-time constants when built inside jit)."""
    parts, offs, ress = [], [], []
    off = 0
    for tex in pyramid:
        f, r, _, _ = tex.shape
        parts.append(pack_cubemap_patches(tex))
        offs.append(off)
        ress.append(r)
        off += f * (r + 1) * (r + 1)
    return jnp.concatenate(parts, axis=0), tuple(offs), tuple(ress)


def sample_cubemap_mip_packed(pbuf, offsets, ress, dirs, level):
    """Trilinear cubemap lookup on a packed pyramid: ONE fused gather
    (both adjacent levels' indices concatenated — each gather's index
    vector costs an async relayout copy on TPU, so pay it once)."""
    n_levels = len(ress)
    if n_levels == 1:
        return sample_cubemap_packed(pbuf, ress[0], dirs, offsets[0])
    offs_t = jnp.asarray(offsets, jnp.int32)
    ress_t = jnp.asarray(ress, jnp.int32)
    lv = jnp.clip(level, 0.0, n_levels - 1.0)
    l0 = jnp.clip(jnp.floor(lv).astype(jnp.int32), 0, n_levels - 2)
    frac = (lv - l0.astype(lv.dtype))[:, None]
    face, u, v = dir_to_cube_uv(dirs)
    n = dirs.shape[0]

    def idx_weights(li):
        off = jnp.take(offs_t, li, mode='clip')
        r = jnp.take(ress_t, li, mode='clip')
        rf = r.astype(u.dtype)
        t0 = v * rf - 0.5
        t1 = u * rf - 0.5
        f0 = jnp.floor(t0)
        f1 = jnp.floor(t1)
        a0 = jnp.clip(f0.astype(jnp.int32) + 1, 0, r)
        a1 = jnp.clip(f1.astype(jnp.int32) + 1, 0, r)
        idx = off + face * (r + 1) * (r + 1) + a0 * (r + 1) + a1
        return idx, (t0 - f0)[:, None], (t1 - f1)[:, None]

    i0, wa0, wa1 = idx_weights(l0)
    i1, wb0, wb1 = idx_weights(l0 + 1)
    rows = jnp.take(pbuf, jnp.concatenate([i0, i1]), axis=0, mode='clip')
    c = rows.shape[-1] // 4

    def lerp(r, w0, w1):
        return (((1 - w0) * (1 - w1)) * r[:, :c]
                + ((1 - w0) * w1) * r[:, c:2 * c]
                + (w0 * (1 - w1)) * r[:, 2 * c:3 * c]
                + (w0 * w1) * r[:, 3 * c:])

    return ((1 - frac) * lerp(rows[:n], wa0, wa1)
            + frac * lerp(rows[n:], wb0, wb1))


def sample_cubemap_mip(pyramid, dirs, level):
    """Trilinear (bilinear + mip lerp) cubemap lookup.

    pyramid: list of [6,R/2^l,R/2^l,C]; level [N] fractional.

    TPU note (round-2 trace finding): the naive form gathers EVERY pyramid
    level (4 taps + a scatter-add VJP each) and weights all but two by
    zero — 42ms/step at 131k samples.  Instead the levels are packed into
    one flat row atlas (static offsets) and only the two adjacent levels
    are gathered: 8 taps total regardless of pyramid depth, one scatter-add
    buffer in the VJP.  Matches the triangle-weight blend exactly (only
    floor/ceil levels have nonzero weight).
    """
    n_levels = len(pyramid)
    if n_levels == 1:
        return sample_cubemap(pyramid[0], dirs)

    c = pyramid[0].shape[-1]
    parts, offs, ress = [], [], []
    offset = 0
    for tex in pyramid:
        f, r, _, _ = tex.shape
        parts.append(tex.reshape(f * r * r, c))
        offs.append(offset)
        ress.append(r)
        offset += f * r * r
    buf = jnp.concatenate(parts, axis=0)
    offs_t = jnp.asarray(offs, jnp.int32)
    ress_t = jnp.asarray(ress, jnp.int32)

    face, u, v = dir_to_cube_uv(dirs)
    lv = jnp.clip(level, 0.0, n_levels - 1.0)
    l0 = jnp.clip(jnp.floor(lv).astype(jnp.int32), 0, n_levels - 2)
    frac = (lv - l0.astype(lv.dtype))[:, None]

    def level_lookup(li):
        off = jnp.take(offs_t, li, mode='clip')
        r = jnp.take(ress_t, li, mode='clip')
        rf = r.astype(u.dtype)
        uf = u * rf - 0.5
        vf = v * rf - 0.5
        u0 = jnp.floor(uf)
        v0 = jnp.floor(vf)
        fu = (uf - u0)[:, None]
        fv = (vf - v0)[:, None]
        u0i = jnp.clip(u0.astype(jnp.int32), 0, r - 1)
        u1i = jnp.clip(u0.astype(jnp.int32) + 1, 0, r - 1)
        v0i = jnp.clip(v0.astype(jnp.int32), 0, r - 1)
        v1i = jnp.clip(v0.astype(jnp.int32) + 1, 0, r - 1)
        base = off + face * r * r

        def g(vi, ui):
            return jnp.take(buf, base + vi * r + ui, axis=0, mode='clip')

        return ((1 - fv) * ((1 - fu) * g(v0i, u0i) + fu * g(v0i, u1i))
                + fv * ((1 - fu) * g(v1i, u0i) + fu * g(v1i, u1i)))

    return (1 - frac) * level_lookup(l0) + frac * level_lookup(l0 + 1)


# ---------------------------------------------------------------------------
# mips & converters
# ---------------------------------------------------------------------------

def cubemap_mip(cubemap):
    """2x avg-pool of [6,R,R,C] (ref: light_utils.py:66-69)."""
    f, r, _, c = cubemap.shape
    return cubemap.reshape(f, r // 2, 2, r // 2, 2, c).mean(axis=(2, 4))


def build_cubemap_pyramid(base, min_res: int = 16):
    pyr = [base]
    while pyr[-1].shape[1] > min_res:
        pyr.append(cubemap_mip(pyr[-1]))
    return pyr


def latlong_to_cubemap(latlong, res: int):
    """[H,W,C] equirectangular -> [6,res,res,C] (ref: light_utils.py:34-47)."""
    dirs = jnp.asarray(cubemap_dirs(res)).reshape(-1, 3)
    tu = jnp.arctan2(dirs[:, 0:1], -dirs[:, 2:3]) / (2 * np.pi) + 0.5
    tv = jnp.arccos(jnp.clip(dirs[:, 1:2], -1, 1)) / np.pi
    h, w, c = latlong.shape
    from .tensor_field import sample_bilinear_2d
    uv = jnp.concatenate([tv, tu], axis=-1)  # (row, col) = (v, u)
    vals = sample_bilinear_2d(latlong, uv)
    return vals.reshape(6, res, res, c)


def cubemap_to_latlong(cubemap, res_hw):
    """[6,R,R,C] -> [H,W,C] equirectangular (ref: light_utils.py:50-63)."""
    h, w = res_hw
    gy = jnp.linspace(0.0 + 1.0 / h, 1.0 - 1.0 / h, h)
    gx = jnp.linspace(-1.0 + 1.0 / w, 1.0 - 1.0 / w, w)
    gy, gx = jnp.meshgrid(gy, gx, indexing='ij')
    st, ct = jnp.sin(gy * np.pi), jnp.cos(gy * np.pi)
    sp, cp = jnp.sin(gx * np.pi), jnp.cos(gx * np.pi)
    refl = jnp.stack([st * sp, ct, -st * cp], -1).reshape(-1, 3)
    c = cubemap.shape[-1]
    return sample_cubemap(cubemap, refl).reshape(h, w, c)


# ---------------------------------------------------------------------------
# pre-integration (dense matmuls over texel lattices)
# ---------------------------------------------------------------------------

def diffuse_cubemap(cubemap):
    """Cosine-hemisphere pre-integration (ref: c_src/cubemap.cu diffuse;
    called at light.py:58). Exact dense convolution; the [T,T] weight
    matrix is built ON DEVICE from tiny direction/solid-angle tables —
    embedding it as a host constant bloats the HLO by ~10MB and stalls
    remote compilation. Input should be the low-res mip tail (16^2)."""
    f, r, _, c = cubemap.shape
    dirs = jnp.asarray(cubemap_dirs(r).reshape(-1, 3))
    sa = jnp.asarray(cubemap_solid_angles(r).reshape(-1))
    cos = jnp.maximum(dirs @ dirs.T, 0.0)
    w = cos * sa[None, :]
    w = w / jnp.maximum(w.sum(-1, keepdims=True), 1e-8)
    out = w @ cubemap.reshape(-1, c)
    return out.reshape(f, r, r, c)


def specular_cubemap(cubemap, roughness: float, cutoff: float = 0.99):
    """GGX pre-integration via dense convolution (ref: c_src/cubemap.cu
    specular path, light.py:60-64). Weight matrix built on device (see
    diffuse_cubemap). Use at res <= 32."""
    f, r, _, c = cubemap.shape
    dirs = jnp.asarray(cubemap_dirs(r).reshape(-1, 3))
    sa = jnp.asarray(cubemap_solid_angles(r).reshape(-1))
    cos = jnp.maximum(dirs @ dirs.T, 0.0)
    a = max(float(roughness), 1e-3)
    a2 = a * a
    # prefilter convention: NoH ~ cos(theta/2) = sqrt((1+cos)/2)
    noh2 = (1.0 + cos) / 2.0
    d = a2 / jnp.maximum(np.pi * (noh2 * (a2 - 1.0) + 1.0) ** 2, 1e-9)
    w = d * cos * sa[None, :]
    w = w / jnp.maximum(w.sum(-1, keepdims=True), 1e-8)
    out = w @ cubemap.reshape(-1, c)
    return out.reshape(f, r, r, c)
