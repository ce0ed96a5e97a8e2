"""VM-decomposed tensor fields: the framework's central data structure.

A field is 3 planes ``[R, R, C]`` + 3 lines ``[R, C]`` (TensoRF VM
decomposition, matMode [[0,1],[0,2],[1,2]], vecMode [2,1,0] — ref:
network/fields.py:28-29).  Features at a 3D point are the elementwise
product of mip-aware bilinearly-interpolated plane and line coefficients,
concatenated over the three plane/line pairs.

This module replaces the CUDA ``dr.texture`` path of the reference
(ref: fields.py:262-299, 776-810; flow.py:709-744) with:
  * a differentiable avg-pool mip pyramid rebuilt per step (cheap; the base
    is at most 512^2 x 36 floats per plane)
  * per-sample fractional mip level -> blend of per-level bilinear gathers
    (exactly dr.texture 'linear-mipmap-linear' with boundary clamp)
  * coordinates are stop-gradient'ed, matching the reference's
    ``.detach()`` on sample coords (fields.py:268-270): field gradients
    w.r.t. position come from finite differences, not the interpolant.

Texel convention matches nvdiffrast: uv in [0,1], texel centers at
(i + 0.5)/size, bilinear with clamped indices.
"""
from __future__ import annotations

from typing import Any, Dict, List, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

MAT_MODE = ((0, 1), (0, 2), (1, 2))
VEC_MODE = (2, 1, 0)

FieldParams = Dict[str, Any]  # {'planes': [3 x (H,W,C)], 'lines': [3 x (L,C)]}


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def circle_init_plane(grid_hw: Sequence[int], radius: float) -> np.ndarray:
    """2D circle SDF used to initialise the SDF planes (ref: fields.py:125-131).

    Returns [H, W, 1]."""
    x = np.linspace(-1, 1, grid_hw[0])
    y = np.linspace(-1, 1, grid_hw[1])
    xx, yy = np.meshgrid(x, y, indexing='ij')
    return (np.sqrt(xx ** 2 + yy ** 2) - radius)[..., None].astype(np.float32)


def init_vm_circle(grid_size: Sequence[int], n_comp: int,
                   radius: float = 0.2) -> FieldParams:
    """Circle-SDF init of a VM field (ref: fields.py:101-111)."""
    planes, lines = [], []
    for i in range(3):
        hw = [grid_size[MAT_MODE[i][0]], grid_size[MAT_MODE[i][1]]]
        ln = grid_size[VEC_MODE[i]]
        plane = np.broadcast_to(circle_init_plane(hw, radius),
                                (hw[0], hw[1], n_comp)).copy()
        line = np.full((ln, n_comp), 1.0 / (n_comp * 3), np.float32)
        planes.append(jnp.asarray(plane))
        lines.append(jnp.asarray(line))
    return {'planes': planes, 'lines': lines}


def init_vm_random(rng, grid_size: Sequence[int], n_comp: int,
                   scale: float = 1e-4) -> FieldParams:
    """Small-random init used by material/flow fields (ref: fields.py:765-774)."""
    planes, lines = [], []
    for i in range(3):
        rng, k = jax.random.split(rng)
        hw = (grid_size[MAT_MODE[i][0]], grid_size[MAT_MODE[i][1]])
        ln = grid_size[VEC_MODE[i]]
        planes.append(scale * (2.0 * jax.random.uniform(k, hw + (n_comp,)) - 1.0))
        lines.append(jnp.full((ln, n_comp), 1.0 / (n_comp * 3), jnp.float32))
    return {'planes': planes, 'lines': lines}


# ---------------------------------------------------------------------------
# mip pyramids
# ---------------------------------------------------------------------------

def _avg_pool_2x2(tex):
    """[H, W, C] -> [H//2, W//2, C] box filter."""
    h, w, c = tex.shape
    return tex.reshape(h // 2, 2, w // 2, 2, c).mean(axis=(1, 3))


def _avg_pool_2x1d(tex):
    """[L, C] -> [L//2, C] box filter."""
    l, c = tex.shape
    return tex.reshape(l // 2, 2, c).mean(axis=1)


def build_pyramid_2d(tex, n_levels: int) -> List[jnp.ndarray]:
    pyr = [tex]
    for _ in range(n_levels - 1):
        pyr.append(_avg_pool_2x2(pyr[-1]))
    return pyr


def build_pyramid_1d(tex, n_levels: int) -> List[jnp.ndarray]:
    pyr = [tex]
    for _ in range(n_levels - 1):
        pyr.append(_avg_pool_2x1d(pyr[-1]))
    return pyr


# ---------------------------------------------------------------------------
# bilinear / mip sampling
# ---------------------------------------------------------------------------

def patch_pack_2d(tex):
    """[H,W,C] -> [(H+1)*(W+1), 4C] rows of 2x2 edge-clamped texel blocks.

    Row a0*(W+1)+a1 (anchor a = floor(coord)+1) holds texels
    (clip(a0-1+d0), clip(a1-1+d1)), d in {0,1}, slot-major d0*2+d1.
    TPU gathers cost per gathered ROW; packing the bilinear footprint into
    one row turns 4 narrow gathers into 1 wide gather (and 4 scatter-adds
    into 1 in the VJP)."""
    h, w, c = tex.shape
    pad = jnp.pad(tex, ((1, 1), (1, 1), (0, 0)), mode='edge')
    slots = [pad[d0:d0 + h + 1, d1:d1 + w + 1]
             for d0 in (0, 1) for d1 in (0, 1)]
    return jnp.concatenate(slots, -1).reshape((h + 1) * (w + 1), 4 * c)


def sample_bilinear_packed(buf, h, w, t0, t1, base=0):
    """One-gather clamped bilinear on a patch_pack_2d buffer.

    t0/t1: continuous texel coords along dim0/dim1 (= uv*size - 0.5);
    h/w/base: python ints or [N] int32 arrays (dynamic mip levels).
    Exactly matches the 4-tap clip-indexed bilinear for ALL inputs."""
    f0 = jnp.floor(t0)
    f1 = jnp.floor(t1)
    w0 = (t0 - f0)[:, None]
    w1 = (t1 - f1)[:, None]
    a0 = jnp.clip(f0.astype(jnp.int32) + 1, 0, h)
    a1 = jnp.clip(f1.astype(jnp.int32) + 1, 0, w)
    rows = jnp.take(buf, base + a0 * (w + 1) + a1, axis=0, mode='clip')
    c = rows.shape[-1] // 4
    t00, t01 = rows[:, :c], rows[:, c:2 * c]
    t10, t11 = rows[:, 2 * c:3 * c], rows[:, 3 * c:]
    return (((1 - w0) * (1 - w1)) * t00 + ((1 - w0) * w1) * t01
            + (w0 * (1 - w1)) * t10 + (w0 * w1) * t11).astype(jnp.float32)


def sample_bilinear_2d(tex, uv):
    """Clamped bilinear lookup. tex [H,W,C]; uv [N,2] in [0,1] (u indexes H).

    nvdiffrast texel convention: continuous coord = uv*size - 0.5.
    """
    h, w, _ = tex.shape
    u = uv[:, 0] * h - 0.5
    v = uv[:, 1] * w - 0.5
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    fu = (u - u0)[:, None]
    fv = (v - v0)[:, None]
    u0i = jnp.clip(u0.astype(jnp.int32), 0, h - 1)
    u1i = jnp.clip(u0.astype(jnp.int32) + 1, 0, h - 1)
    v0i = jnp.clip(v0.astype(jnp.int32), 0, w - 1)
    v1i = jnp.clip(v0.astype(jnp.int32) + 1, 0, w - 1)

    flat = tex.reshape(h * w, -1)
    t00 = jnp.take(flat, u0i * w + v0i, axis=0, mode='clip')
    t01 = jnp.take(flat, u0i * w + v1i, axis=0, mode='clip')
    t10 = jnp.take(flat, u1i * w + v0i, axis=0, mode='clip')
    t11 = jnp.take(flat, u1i * w + v1i, axis=0, mode='clip')
    out = ((1 - fu) * ((1 - fv) * t00 + fv * t01)
           + fu * ((1 - fv) * t10 + fv * t11))
    return out.astype(jnp.float32)


def sample_linear_1d(tex, u):
    """Clamped linear lookup. tex [L,C]; u [N] in [0,1]."""
    l, _ = tex.shape
    x = u * l - 0.5
    x0 = jnp.floor(x)
    f = (x - x0)[:, None]
    x0i = jnp.clip(x0.astype(jnp.int32), 0, l - 1)
    x1i = jnp.clip(x0.astype(jnp.int32) + 1, 0, l - 1)
    out = ((1 - f) * jnp.take(tex, x0i, axis=0, mode='clip')
           + f * jnp.take(tex, x1i, axis=0, mode='clip'))
    return out.astype(jnp.float32)


def _mip_weights(level, n_levels: int):
    """Per-level trilinear blending weights for a fractional mip level.

    level [N] (clamped to [0, n_levels-1]); returns [n_levels, N]."""
    lv = jnp.clip(level, 0.0, n_levels - 1)
    ls = jnp.arange(n_levels, dtype=lv.dtype)[:, None]
    return jnp.maximum(0.0, 1.0 - jnp.abs(lv[None, :] - ls))


def sample_mip_2d(pyramid: Sequence[jnp.ndarray], uv, level):
    """dr.texture(..., mip_level_bias=level, boundary='clamp') equivalent.

    pyramid: list of [H/2^l, W/2^l, C]; uv [N,2]; level [N]. -> [N, C]
    """
    ws = _mip_weights(level, len(pyramid))
    out = 0.0
    for l, tex in enumerate(pyramid):
        out = out + ws[l][:, None] * sample_bilinear_2d(tex, uv)
    return out


def sample_mip_1d(pyramid: Sequence[jnp.ndarray], u, level):
    ws = _mip_weights(level, len(pyramid))
    out = 0.0
    for l, tex in enumerate(pyramid):
        out = out + ws[l][:, None] * sample_linear_1d(tex, u)
    return out


# ---------------------------------------------------------------------------
# the VM field feature op
# ---------------------------------------------------------------------------

def vm_features(field: FieldParams, xyz01, level=None, n_levels: int = 1,
                gather_dtype=None):
    """Features of a VM field at contracted coords.

    field:  {'planes': [3x (H,W,C)], 'lines': [3x (L,C)]}
    xyz01:  [N, 3] in [0,1] (already contracted into the aabb)
    level:  [N] fractional mip level or None (level 0)
    gather_dtype: optional storage dtype (e.g. jnp.bfloat16) — the texture
    is cast once per call and gathered at half bandwidth; interpolation
    weights and outputs stay float32.
    Returns [N, 3*C] (plane_i ⊙ line_i concatenated over i), matching the
    reference's feature ordering (ref: fields.py:272-298: concat over planes
    of per-component products).
    """
    xyz01 = jnp.clip(jax.lax.stop_gradient(xyz01), 0.0, 1.0)  # dr.texture 'clamp'
    n = xyz01.shape[0]
    if level is None:
        level = jnp.zeros((n,), xyz01.dtype)
    else:
        level = jax.lax.stop_gradient(jnp.reshape(level, (n,)))

    if gather_dtype is not None:
        field = {'planes': [p.astype(gather_dtype)
                            for p in field['planes']],
                 'lines': [l.astype(gather_dtype)
                           for l in field['lines']]}

    # column slices (NOT advanced indexing — that lowers to a gather with
    # relayout copies on TPU)
    cols = [xyz01[:, 0], xyz01[:, 1], xyz01[:, 2]]
    feats = []
    for i in range(3):
        uv = jnp.stack([cols[MAT_MODE[i][0]], cols[MAT_MODE[i][1]]], axis=1)
        w = cols[VEC_MODE[i]]
        if n_levels > 1:
            p_pyr = build_pyramid_2d(field['planes'][i], n_levels)
            l_pyr = build_pyramid_1d(field['lines'][i], n_levels)
            pf = sample_mip_2d(p_pyr, uv, level)
            lf = sample_mip_1d(l_pyr, w, level)
        else:
            pf = sample_bilinear_2d(field['planes'][i], uv)
            lf = sample_linear_1d(field['lines'][i], w)
        feats.append(pf * lf)
    return jnp.concatenate(feats, axis=-1)


# ---------------------------------------------------------------------------
# packed atlas: the gather-friendly hot-path representation
# ---------------------------------------------------------------------------
#
# TPU perf note (round-1 trace finding, CLAUDE.md): sampling the VM field as
# separate [H,W,C] textures produced ~51ms/step of pure layout-relayout async
# copies.  The packed representation flattens every plane/line (and every mip
# level) into ONE [T, C] row-major buffer, so each field evaluation is a
# single well-shaped row gather + elementwise math, with no relayouts and a
# single f32->bf16 cast at pack time.  Pack once per step (differentiable —
# the pyramid/concat transpose back to slices + pool-transpose in the VJP)
# and reuse across every field call of that step.


class PackedMeta(NamedTuple):
    """Static atlas layout (python ints only — hashable jit constant)."""
    plane_offsets: Tuple[Tuple[int, ...], ...]   # [3][L] row offset
    plane_shapes: Tuple[Tuple[Tuple[int, int], ...], ...]  # [3][L] (H, W)
    line_offsets: Tuple[Tuple[int, ...], ...]    # [3][L]
    line_lens: Tuple[Tuple[int, ...], ...]       # [3][L]
    n_levels: int
    n_comp: int


@jax.tree_util.register_pytree_node_class
class PackedVMField:
    """A VM field flattened into a single gather atlas [T, C]."""

    def __init__(self, buffer, meta: PackedMeta):
        self.buffer = buffer
        self.meta = meta

    def tree_flatten(self):
        return (self.buffer,), self.meta

    @classmethod
    def tree_unflatten(cls, meta, children):
        return cls(children[0], meta)


def pack_vm_field(field: FieldParams, n_levels: int = 1,
                  gather_dtype=None) -> PackedVMField:
    """Build the atlas: all planes, lines, and mip levels, one buffer.

    Rows are 2x2 PATCH rows ([4C] per plane texel anchor, [2C texels +
    2C zero pad] per line anchor — see patch_pack_2d), so every bilinear
    is ONE gathered row and every line lerp is one row: 6 gathers per
    point eval instead of 18 (TPU gathers pay per ROW; round-2 trace).
    Differentiable w.r.t. the field params; call once per train step."""
    parts = []
    offset = 0
    p_offs, p_shapes, l_offs, l_lens = [], [], [], []
    for i in range(3):
        pyr = build_pyramid_2d(field['planes'][i], n_levels)
        offs, shps = [], []
        for tex in pyr:
            h, w, _ = tex.shape
            parts.append(patch_pack_2d(tex))
            offs.append(offset)
            shps.append((h, w))
            offset += (h + 1) * (w + 1)
        p_offs.append(tuple(offs))
        p_shapes.append(tuple(shps))
    for i in range(3):
        pyr = build_pyramid_1d(field['lines'][i], n_levels)
        offs, lens = [], []
        for tex in pyr:
            l, c = tex.shape
            pad = jnp.pad(tex, ((1, 1), (0, 0)), mode='edge')
            row = jnp.concatenate([pad[0:l + 1], pad[1:l + 2]], -1)
            parts.append(jnp.pad(row, ((0, 0), (0, 2 * c))))
            offs.append(offset)
            lens.append(l)
            offset += l + 1
        l_offs.append(tuple(offs))
        l_lens.append(tuple(lens))
    buf = jnp.concatenate(parts, axis=0)
    if gather_dtype is not None:
        buf = buf.astype(gather_dtype)
    meta = PackedMeta(tuple(p_offs), tuple(p_shapes), tuple(l_offs),
                      tuple(l_lens), n_levels,
                      int(field['planes'][0].shape[-1]))
    return PackedVMField(buf, meta)


def _bilinear_take(buffer, base, h, w, ut, vt):
    """Clamped bilinear lookup on the patch atlas at continuous texel
    coords.  base/h/w: python ints or [N] arrays (dynamic mip).
    One gathered [4C] row -> [N, C] f32."""
    return sample_bilinear_packed(buffer, h, w, ut, vt, base)


def _linear_take(buffer, base, l, xt):
    """Clamped linear lookup on the patch atlas. One row -> [N, C] f32."""
    x0 = jnp.floor(xt)
    f = (xt - x0)[:, None]
    a = jnp.clip(x0.astype(jnp.int32) + 1, 0, l)
    rows = jnp.take(buffer, base + a, axis=0, mode='clip')
    c = rows.shape[-1] // 4
    return ((1 - f) * rows[:, :c] + f * rows[:, c:2 * c]).astype(jnp.float32)


def _level_branches(meta: PackedMeta, level, n):
    """Adjacent-mip branch selection for per-sample fractional levels.

    Returns [(l0 [N] int32 or int, weight [N] f32), ...] with at most two
    branches; equivalent to the triangle-weight blend over all levels
    (only floor/ceil have nonzero weight)."""
    if meta.n_levels == 1 or level is None:
        return [(0, None)]
    lv = jnp.clip(jnp.reshape(level, (n,)), 0.0, meta.n_levels - 1.0)
    l0 = jnp.clip(jnp.floor(lv).astype(jnp.int32), 0, meta.n_levels - 2)
    f = lv - l0.astype(lv.dtype)
    return [(l0, 1.0 - f), (l0 + 1, f)]


def _tables(vals_per_level):
    return jnp.asarray(vals_per_level, jnp.int32)


def _plane_params(meta: PackedMeta, i: int, l0):
    """(base, h, w, hf, wf) for plane i at mip l0 (int or [N] array)."""
    if isinstance(l0, int):
        h, w = meta.plane_shapes[i][l0]
        return meta.plane_offsets[i][l0], h, w, float(h), float(w)
    h = jnp.take(_tables([s[0] for s in meta.plane_shapes[i]]), l0)
    w = jnp.take(_tables([s[1] for s in meta.plane_shapes[i]]), l0)
    base = jnp.take(_tables(meta.plane_offsets[i]), l0)
    return base, h, w, h.astype(jnp.float32), w.astype(jnp.float32)


def _line_params(meta: PackedMeta, i: int, l0):
    """(base, l, lf) for line i at mip l0 (int or [N] array)."""
    if isinstance(l0, int):
        ln = meta.line_lens[i][l0]
        return meta.line_offsets[i][l0], ln, float(ln)
    ln = jnp.take(_tables(meta.line_lens[i]), l0)
    base = jnp.take(_tables(meta.line_offsets[i]), l0)
    return base, ln, ln.astype(jnp.float32)


def vm_features_split(packed: PackedVMField, xyz01, level=None):
    """vm_features on the packed atlas, kept SPLIT per plane/line pair.

    Returns a list of 3 arrays [N, C] (plane_i(u,v) * line_i(w), mip
    blended per texture first). Keeping the three products separate lets
    the SDF MLP consume them as split-K matmuls — concatenating [N, C]
    tensors in the lane dimension costs relayout copies on TPU.
    """
    meta = packed.meta
    xyz01 = jnp.clip(jax.lax.stop_gradient(xyz01), 0.0, 1.0)  # dr.texture 'clamp'
    n = xyz01.shape[0]
    if level is not None:
        level = jax.lax.stop_gradient(level)
    cols = [xyz01[:, 0], xyz01[:, 1], xyz01[:, 2]]
    P = [None, None, None]
    L = [None, None, None]
    for l0, mw in _level_branches(meta, level, n):
        mwc = None if mw is None else mw[:, None]
        # ONE fused gather for all 6 textures of this branch: every
        # gather's s32 index vector costs an async T(1,128) relayout
        # copy (~6ms at 131k rows — round-2 trace); concatenated indices
        # pay it once and the row-slices back out are layout-preserving.
        idxs, pw, lw = [], [], []
        for i in range(3):
            base, h, w, hf, wf = _plane_params(meta, i, l0)
            t0 = cols[MAT_MODE[i][0]] * hf - 0.5
            t1 = cols[MAT_MODE[i][1]] * wf - 0.5
            f0 = jnp.floor(t0)
            f1 = jnp.floor(t1)
            a0 = jnp.clip(f0.astype(jnp.int32) + 1, 0, h)
            a1 = jnp.clip(f1.astype(jnp.int32) + 1, 0, w)
            idxs.append(base + a0 * (w + 1) + a1)
            pw.append(((t0 - f0)[:, None], (t1 - f1)[:, None]))
        for i in range(3):
            base, ln, lf = _line_params(meta, i, l0)
            xt = cols[VEC_MODE[i]] * lf - 0.5
            x0 = jnp.floor(xt)
            idxs.append(base + jnp.clip(x0.astype(jnp.int32) + 1, 0, ln))
            lw.append((xt - x0)[:, None])
        rows = jnp.take(packed.buffer, jnp.concatenate(idxs), axis=0,
                        mode='clip')
        c = rows.shape[-1] // 4
        for i in range(3):
            r = rows[i * n:(i + 1) * n]
            w0, w1 = pw[i]
            p = (((1 - w0) * (1 - w1)) * r[:, :c]
                 + ((1 - w0) * w1) * r[:, c:2 * c]
                 + (w0 * (1 - w1)) * r[:, 2 * c:3 * c]
                 + (w0 * w1) * r[:, 3 * c:]).astype(jnp.float32)
            r = rows[(3 + i) * n:(4 + i) * n]
            f = lw[i]
            ll = ((1 - f) * r[:, :c]
                  + f * r[:, c:2 * c]).astype(jnp.float32)
            if mwc is not None:
                p = p * mwc
                ll = ll * mwc
            P[i] = p if P[i] is None else P[i] + p
            L[i] = ll if L[i] is None else L[i] + ll
    return [P[i] * L[i] for i in range(3)]


def vm_features_packed(packed: PackedVMField, xyz01, level=None):
    """vm_features on the packed atlas: [N,3] -> [N, 3C] (concat form;
    prefer vm_features_split in hot paths — the concat relayouts)."""
    return jnp.concatenate(vm_features_split(packed, xyz01, level), -1)


# stencil-point -> (plane-variant, line-variant) table.  Plane lookup
# variants: [center, u+, u-, v+, v-]; line variants: [center, x+, x-].
# Stencil order [center, +x, -x, +y, -y, +z, -z] matches
# fields/tenso_sdf offsets.
_PLANE_SHIFTS = ((0.0, 0.0), (1.0, 0.0), (-1.0, 0.0), (0.0, 1.0),
                 (0.0, -1.0))
_LINE_SHIFTS = (0.0, 1.0, -1.0)
_STENCIL = ((None, 0), (0, 1), (0, -1), (1, 1), (1, -1), (2, 1), (2, -1))


def vm_stencil_variants(packed: PackedVMField, xyz01, delta01, level=None):
    """Deduplicated texture lookups for the 7-point FD stencil.

    xyz01 [N,3] contracted coords; delta01 [3] static per-axis offsets in
    contracted units (= 1/(grid_size-1)).

    The 7 stencil points share texture neighborhoods: per plane only 5
    distinct bilinear lookups exist (center, +-u, +-v) and per line only 3
    (center, +-x) — 60+18 gathered rows/sample instead of the naive
    7x18=126.  Returns (P, L): P[i][vi] [N, C] for plane i and variant vi
    in _PLANE_SHIFTS order; L[i][vi] likewise over _LINE_SHIFTS.  Each is
    mip-blended (product-of-blends happens downstream).
    """
    meta = packed.meta
    xyz01 = jnp.clip(jax.lax.stop_gradient(xyz01), 0.0, 1.0)  # dr.texture 'clamp'
    n = xyz01.shape[0]
    if level is not None:
        level = jax.lax.stop_gradient(level)
    cols = [xyz01[:, 0], xyz01[:, 1], xyz01[:, 2]]
    d01 = [float(delta01[0]), float(delta01[1]), float(delta01[2])]

    P = [[None] * 5 for _ in range(3)]   # per plane: 5 lookup variants
    L = [[None] * 3 for _ in range(3)]   # per line: 3 lookup variants
    for l0, mw in _level_branches(meta, level, n):
        mwc = None if mw is None else mw[:, None]
        for i in range(3):
            a, b = MAT_MODE[i]
            base, h, w, hf, wf = _plane_params(meta, i, l0)
            ut0 = cols[a] * hf - 0.5
            vt0 = cols[b] * wf - 0.5
            dut = d01[a] * hf
            dvt = d01[b] * wf
            for vi, (su, sv) in enumerate(_PLANE_SHIFTS):
                p = _bilinear_take(packed.buffer, base, h, w,
                                   ut0 + su * dut, vt0 + sv * dvt)
                if mwc is not None:
                    p = p * mwc
                P[i][vi] = p if P[i][vi] is None else P[i][vi] + p
            c = VEC_MODE[i]
            base, ln, lf = _line_params(meta, i, l0)
            xt0 = cols[c] * lf - 0.5
            dxt = d01[c] * lf
            for vi, sx in enumerate(_LINE_SHIFTS):
                ll = _linear_take(packed.buffer, base, ln, xt0 + sx * dxt)
                if mwc is not None:
                    ll = ll * mwc
                L[i][vi] = ll if L[i][vi] is None else L[i][vi] + ll
    return P, L


# ---------------------------------------------------------------------------
# patch atlas: one-gather-per-texture stencil representation
# ---------------------------------------------------------------------------
#
# TPU gathers cost ~2.5 ns per gathered ROW regardless of width (round-2
# measurement), so the variant representation above (60+18 rows/sample)
# spends ~23 ms at 131k samples on gathers alone.  The patch atlas makes
# each gathered row the ENTIRE 4x4-texel neighborhood of a sample
# (16C channels, edge-clamped), so a full 7-point stencil evaluation
# needs just 3 plane + 3 line gathers per mip branch; the bilinear /
# stencil-shift math moves into the Pallas head kernel
# (ops/pallas_stencil.py) as static-slot hat-function weights.
#
# Anchor convention: row a = floor(ut) + 1 (a in [0, H] since
# ut in [-0.5, H-0.5)), slot (du, dv), du/dv in [-1, 2], holds texel
# row clip(a - 1 + du, 0, H - 1) — so per-corner clamped bilinear at any
# in-range coordinate, including the stencil's +-sigma texel shifts,
# reads only in-patch slots with the shared fraction frac(ut).


class PatchMeta(NamedTuple):
    """Static patch-atlas layout (python ints — hashable jit constant)."""
    plane_offsets: Tuple[Tuple[int, ...], ...]   # [3][L] row offset
    plane_shapes: Tuple[Tuple[Tuple[int, int], ...], ...]  # [3][L] (H, W)
    line_offsets: Tuple[Tuple[int, ...], ...]    # [3][L]
    line_lens: Tuple[Tuple[int, ...], ...]       # [3][L]
    n_levels: int
    n_comp: int
    # 'p16': rows are full 4x4 patches [16C], one gather per sample.
    # 'p4':  rows are 1x4 dv-spans [4C], FOUR gathers per sample
    #        (consecutive padded rows au..au+3) reshaped to the same
    #        [N, 16C] slot-major block.  p4 packs 4x the plane bytes
    #        instead of 16x — at the 512^3 phase the p16 pack + VJP
    #        dominated the step (round-4 trace), while the extra gather
    #        rows cost ~2.5ns each.  Uniform per atlas so dynamic
    #        fractional-mip branches keep a single buffer/indexing.
    plane_fmt: str = 'p16'


@jax.tree_util.register_pytree_node_class
class PatchAtlas:
    """VM field as patch-row gather tables: planes [Tp, 16C], lines
    [Tl, 4C]."""

    def __init__(self, plane_buf, line_buf, meta: PatchMeta):
        self.plane_buf = plane_buf
        self.line_buf = line_buf
        self.meta = meta

    def tree_flatten(self):
        return (self.plane_buf, self.line_buf), self.meta

    @classmethod
    def tree_unflatten(cls, meta, children):
        return cls(children[0], children[1], meta)


# Plane-size threshold (texels) above which pack_vm_patches uses the
# conv_general_dilated_patches path.  Small planes keep the 16
# shifted-slice concats: the grouped conv + channel->slot transpose has a
# fixed per-plane cost that dominated the 128^3 step (bench regression
# 57 -> 89 ms, round 4), while at 512^2 the slice-concat chain's 16x
# re-materialization was the 107ms-of-221ms offender.
# (TENSOFLOW_PACK_CONV_MIN overrides for A/B runs.)
import os as _os
PACK_CONV_MIN_TEXELS = int(_os.environ.get('TENSOFLOW_PACK_CONV_MIN',
                                           256 * 256))
# Top-plane size at/above which the whole atlas switches to p4 rows
# (1x4 dv-spans, 4 gathers per sample — see PatchMeta.plane_fmt).
# (TENSOFLOW_PACK_P4_MIN overrides for A/B runs.)
PACK_P4_MIN_TEXELS = int(_os.environ.get('TENSOFLOW_PACK_P4_MIN',
                                         256 * 256))


def _pack_vm_patches_p4(field: FieldParams, n_levels: int,
                        gather_dtype=None) -> PatchAtlas:
    """p4 atlas: rows are padded-texture 1x4 dv-spans [4C].

    Pack traffic is 4x the plane bytes (vs p16's 16x through
    layout-hostile [513,513,16C] intermediates — the 512^3 pack+VJP
    dominated the step, round-4 trace); the gather side pays 4 row
    fetches per sample instead of 1."""
    pparts, lparts = [], []
    p_offs, p_shapes, l_offs, l_lens = [], [], [], []
    poff = loff = 0
    for i in range(3):
        offs, shps = [], []
        for tex in build_pyramid_2d(field['planes'][i], n_levels):
            h, w, c = tex.shape
            pad = jnp.pad(tex, ((2, 2), (2, 2), (0, 0)), mode='edge')
            # rows u_p in [0, H+3] x a_v in [0, W]: pad[u_p, a_v..a_v+3]
            slots = [pad[:, dv + 1:dv + 2 + w] for dv in (-1, 0, 1, 2)]
            patch = jnp.concatenate(slots, axis=-1)        # [H+4, W+1, 4C]
            pparts.append(patch.reshape((h + 4) * (w + 1), 4 * c))
            offs.append(poff)
            shps.append((h, w))
            poff += (h + 4) * (w + 1)
        p_offs.append(tuple(offs))
        p_shapes.append(tuple(shps))
    for i in range(3):
        offs, lens = [], []
        for tex in build_pyramid_1d(field['lines'][i], n_levels):
            l, c = tex.shape
            pad = jnp.pad(tex, ((2, 2), (0, 0)), mode='edge')
            slots = [pad[dx + 1:dx + 2 + l] for dx in (-1, 0, 1, 2)]
            lparts.append(jnp.concatenate(slots, axis=-1))
            offs.append(loff)
            lens.append(l)
            loff += l + 1
        l_offs.append(tuple(offs))
        l_lens.append(tuple(lens))
    pbuf = jnp.concatenate(pparts, axis=0)
    lbuf = jnp.concatenate(lparts, axis=0)
    if gather_dtype is not None:
        pbuf = pbuf.astype(gather_dtype)
        lbuf = lbuf.astype(gather_dtype)
    meta = PatchMeta(tuple(p_offs), tuple(p_shapes), tuple(l_offs),
                     tuple(l_lens), n_levels, field['planes'][0].shape[-1],
                     plane_fmt='p4')
    return PatchAtlas(pbuf, lbuf, meta)


def pack_vm_patches(field: FieldParams, n_levels: int = 1,
                    gather_dtype=None, pack_impl: str = 'auto') -> PatchAtlas:
    """Build the patch atlas (differentiable; once per train step).

    p16 rows (a_u * (W+1) + a_v) store the 16 edge-clamped texels
    (clip(a_u-1+du), clip(a_v-1+dv)), du,dv in [-1,2], slot-major
    (du*4+dv); each line row stores the 4 texels clip(a-1+dx).
    p4 rows (u_p * (W+1) + a_v) store the 4 texels pad[u_p, a_v..a_v+3]
    of ONE padded texture row — the gather side fetches rows
    a_u..a_u+3 and reassembles the identical [N, 16C] block (see
    PatchMeta.plane_fmt).  The atlas-wide format is p4 when the top
    plane reaches PACK_P4_MIN_TEXELS.

    pack_impl: 'auto' (size-gated), 'conv', 'slices', 'p4', or 'p16' —
    all paths pinned equal by tests/test_packed_field.py."""
    top = field['planes'][0].shape
    if pack_impl == 'p4' or (pack_impl == 'auto'
                             and top[0] * top[1] >= PACK_P4_MIN_TEXELS):
        return _pack_vm_patches_p4(field, n_levels, gather_dtype)
    if pack_impl == 'p16':
        pack_impl = 'auto'
    pparts, lparts = [], []
    p_offs, p_shapes, l_offs, l_lens = [], [], [], []
    poff = loff = 0
    for i in range(3):
        offs, shps = [], []
        for tex in build_pyramid_2d(field['planes'][i], n_levels):
            h, w, c = tex.shape
            pad = jnp.pad(tex, ((2, 2), (2, 2), (0, 0)), mode='edge')
            # 'conv' is explicit-only: conv_general_dilated_patches'
            # conv-transpose VJP runs at ~0.1% efficiency on TPU
            # (130ms per 512^2 plane, round-4 trace) — big planes go
            # through the p4 atlas instead (gate above)
            use_conv = (pack_impl == 'conv')
            if use_conv:
                # ONE extract-patches op instead of 16 shifted-slice
                # concats: the concat chain re-materialized ~16x the
                # plane bytes through layout-hostile [513,513,576]
                # intermediates (round-4 512^3 trace: the pack pipeline
                # plus its VJP was 107ms of a 221ms step);
                # conv_general_dilated_patches lowers to one fused op
                # with a conv-transpose VJP.  Features come out
                # channel-major (c, slot) — transpose to the kernel's
                # slot-major (slot, c) lane order.
                patch = jax.lax.conv_general_dilated_patches(
                    pad[None], (4, 4), (1, 1), 'VALID',
                    dimension_numbers=('NHWC', 'HWIO', 'NHWC'))[0]
                patch = patch.reshape((h + 1) * (w + 1), c, 16)
                patch = jnp.swapaxes(patch, 1, 2).reshape(-1, 16 * c)
            else:
                slots = [pad[du + 1:du + 2 + h, dv + 1:dv + 2 + w]
                         for du in (-1, 0, 1, 2) for dv in (-1, 0, 1, 2)]
                patch = jnp.concatenate(slots, axis=-1)
                patch = patch.reshape((h + 1) * (w + 1), 16 * c)
            pparts.append(patch)
            offs.append(poff)
            shps.append((h, w))
            poff += (h + 1) * (w + 1)
        p_offs.append(tuple(offs))
        p_shapes.append(tuple(shps))
    for i in range(3):
        offs, lens = [], []
        for tex in build_pyramid_1d(field['lines'][i], n_levels):
            l, c = tex.shape
            pad = jnp.pad(tex, ((2, 2), (0, 0)), mode='edge')
            slots = [pad[dx + 1:dx + 2 + l] for dx in (-1, 0, 1, 2)]
            lparts.append(jnp.concatenate(slots, axis=-1))
            offs.append(loff)
            lens.append(l)
            loff += l + 1
        l_offs.append(tuple(offs))
        l_lens.append(tuple(lens))
    pbuf = jnp.concatenate(pparts, axis=0)
    lbuf = jnp.concatenate(lparts, axis=0)
    if gather_dtype is not None:
        pbuf = pbuf.astype(gather_dtype)
        lbuf = lbuf.astype(gather_dtype)
    meta = PatchMeta(tuple(p_offs), tuple(p_shapes), tuple(l_offs),
                     tuple(l_lens), n_levels, field['planes'][0].shape[-1])
    return PatchAtlas(pbuf, lbuf, meta)


import functools as _functools


@_functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _take_rows_small(static, buf, idx):
    return jnp.take(buf, idx, axis=0, mode='clip')


def _take_rows_small_fwd(static, buf, idx):
    return _take_rows_small(static, buf, idx), idx


def _take_rows_small_bwd(static, idx, g):
    rows, dtype_name = static
    onehot = (idx[:, None] == jnp.arange(rows, dtype=idx.dtype)[None, :])
    dbuf = jax.lax.dot_general(
        onehot.astype(jnp.bfloat16), g.astype(jnp.bfloat16),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    return dbuf.astype(jnp.dtype(dtype_name)), None


_take_rows_small.defvjp(_take_rows_small_fwd, _take_rows_small_bwd)


def take_rows_small(buf, idx):
    """Row gather whose VJP is a one-hot MXU matmul, for SMALL tables.

    Scatter-add of N updates into an R-row table degenerates on TPU when
    R << N (nearly every update collides: the 131k-update -> 387-row line
    atlas scatter cost ~4ms/step in the round-2 trace).  For small R the
    transpose is a dense reduction: dbuf = onehot(idx)^T @ dout — one
    [N, R] bf16 one-hot (fused compare) and one MXU matmul (~0.5ms).
    Forward is a plain row gather (already cheap).  Exact for in-range
    indices (one-hot weights are 0/1; accumulation in f32)."""
    return _take_rows_small((buf.shape[0], jnp.dtype(buf.dtype).name),
                            buf, idx)

# tables at or below this row count use the one-hot-matmul VJP gather
SMALL_TABLE_ROWS = 4096


FRAC_STRIDE = 32   # frac-pack lanes per mip branch


def vm_patch_gather(atlas: PatchAtlas, xyz01, delta01, level=None):
    """Gather stencil patches + pack fractions for the Pallas head.

    Returns (pp, lp, fr, sigmas): pp[b][i] [N, 16C] plane patches and
    lp[b][i] [N, 4C] line patches per mip branch b; fr [N, 64] f32 with
    branch b at lanes 32b+: 0..5 = (fu_i, fv_i), 6..8 = fx_i,
    9 = branch blend weight, 10..15 = (sigma_u_i, sigma_v_i),
    16..18 = sigma_x_i (per-texel stencil shifts).  sigmas[b][i] =
    (su, sv, sx) python floats when the branch's mip is static
    (n_levels == 1), else None (the kernel reads the sigma lanes).

    Coordinates are stop-gradient'ed (FD stencil, matching the
    reference's .detach() — ref fields.py:268-270); patches carry the
    field gradient (scatter-add VJP of the row gather)."""
    meta = atlas.meta
    xyz01 = jnp.clip(jax.lax.stop_gradient(xyz01), 0.0, 1.0)  # dr.texture 'clamp'
    n = xyz01.shape[0]
    if level is not None:
        level = jax.lax.stop_gradient(level)
    cols = [xyz01[:, 0], xyz01[:, 1], xyz01[:, 2]]
    d01 = [float(delta01[0]), float(delta01[1]), float(delta01[2])]

    pp, lp, sigmas = [], [], []
    fr_cols = []
    for l0, mw in _level_branches(meta, level, n):
        static = isinstance(l0, int)
        sgs = []
        fracs, sig_lanes = [], []
        p_idx, l_idx, p_strides = [], [], []
        for i in range(3):
            a, b = MAT_MODE[i]
            if static:
                h, w = meta.plane_shapes[i][l0]
                base = meta.plane_offsets[i][l0]
                hf, wf = float(h), float(w)
                hi, wi = h, w
            else:
                hs = _tables([s[0] for s in meta.plane_shapes[i]])
                ws = _tables([s[1] for s in meta.plane_shapes[i]])
                hi = jnp.take(hs, l0)
                wi = jnp.take(ws, l0)
                base = jnp.take(_tables(meta.plane_offsets[i]), l0)
                hf, wf = hi.astype(jnp.float32), wi.astype(jnp.float32)
            ut = cols[a] * hf - 0.5
            vt = cols[b] * wf - 0.5
            u0 = jnp.floor(ut)
            v0 = jnp.floor(vt)
            fracs += [ut - u0, vt - v0]
            sig_lanes += [d01[a] * hf * jnp.ones((n,), jnp.float32),
                          d01[b] * wf * jnp.ones((n,), jnp.float32)]
            au = jnp.clip(u0.astype(jnp.int32) + 1, 0, hi)
            av = jnp.clip(v0.astype(jnp.int32) + 1, 0, wi)
            p_idx.append(base + au * (wi + 1) + av)
            p_strides.append(wi + 1)
            sgs.append((d01[a] * hf, d01[b] * wf) if static else None)
        sig_x = []
        for i in range(3):
            c = VEC_MODE[i]
            if static:
                ln = meta.line_lens[i][l0]
                base = meta.line_offsets[i][l0]
                lf, li = float(ln), ln
            else:
                li = jnp.take(_tables(meta.line_lens[i]), l0)
                base = jnp.take(_tables(meta.line_offsets[i]), l0)
                lf = li.astype(jnp.float32)
            xt = cols[c] * lf - 0.5
            x0 = jnp.floor(xt)
            fracs.append(xt - x0)
            sig_x.append(d01[c] * lf * jnp.ones((n,), jnp.float32))
            ax = jnp.clip(x0.astype(jnp.int32) + 1, 0, li)
            l_idx.append(ax + base)
            if static:
                sgs[i] = sgs[i] + (d01[c] * lf,)
        # separate gathers per texture: fusing them looks tempting but the
        # row-slices back out must MATERIALIZE to feed the Pallas kernel
        # (+450MB/step, measured slower)
        if meta.plane_fmt == 'p4':
            # 4 consecutive padded rows per sample reassemble the same
            # [N, 16C] slot-major block the kernel expects (p_idx holds
            # the k=0 row; stride is one padded row = W+1)
            pps = []
            for i, ix in enumerate(p_idx):
                stride = p_strides[i]
                ix4 = (ix[:, None]
                       + jnp.arange(4, dtype=jnp.int32)[None, :]
                       * (stride[:, None] if not isinstance(stride, int)
                          else stride))
                rows = jnp.take(atlas.plane_buf, ix4.reshape(-1), axis=0,
                                mode='clip')
                pps.append(rows.reshape(n, -1))
        else:
            pps = [jnp.take(atlas.plane_buf, ix, axis=0, mode='clip')
                   for ix in p_idx]
        small_lines = atlas.line_buf.shape[0] <= SMALL_TABLE_ROWS
        lps = [(take_rows_small(atlas.line_buf, ix) if small_lines
                else jnp.take(atlas.line_buf, ix, axis=0, mode='clip'))
               for ix in l_idx]
        wcol = (jnp.full((n,), 1.0, jnp.float32) if mw is None
                else mw.astype(jnp.float32))
        fr_b = fracs + [wcol] + sig_lanes + sig_x
        assert len(fr_b) == 19
        # stack along axis 0 (contiguous [N] rows -> cheap concat) and
        # transpose ONCE: stacking 64 columns on axis -1 lowered to 64
        # tile-padded [N,1] copies (6.6ms/step in the round-4 512^3
        # trace); the zero lanes are a pad, not materialized columns
        blk = jnp.swapaxes(jnp.stack(fr_b, axis=0), 0, 1)     # [N, 19]
        fr_cols.append(jnp.pad(blk, [(0, 0), (0, FRAC_STRIDE - 19)]))
        pp.append(pps)
        lp.append(lps)
        sigmas.append(tuple(sgs) if static else None)
    fr = jnp.concatenate(fr_cols, axis=-1) if len(fr_cols) > 1 \
        else fr_cols[0]
    if fr.shape[-1] < 2 * FRAC_STRIDE:
        fr = jnp.pad(fr, [(0, 0), (0, 2 * FRAC_STRIDE - fr.shape[-1])])
    return pp, lp, fr, tuple(sigmas)


def vm_stencil_features_split(packed: PackedVMField, xyz01, delta01,
                              level=None):
    """Per-plane features for the 7-point FD stencil, deduplicated.

    Returns a list of 3 arrays [7, N, C] (stencil-major; reshape to
    [7N, C] is free row-major) for split-K MLP consumption.
    """
    P, L = vm_stencil_variants(packed, xyz01, delta01, level)
    out = []
    for i in range(3):
        a, b = MAT_MODE[i]
        c = VEC_MODE[i]
        feats = []
        for d, sign in _STENCIL:
            pi, li = 0, 0
            if d == a:
                pi = 1 if sign > 0 else 2
            elif d == b:
                pi = 3 if sign > 0 else 4
            elif d == c:
                li = 1 if sign > 0 else 2
            feats.append(P[i][pi] * L[i][li])
        out.append(jnp.stack(feats, axis=0))            # [7, N, C]
    return out


def vm_stencil_features(packed: PackedVMField, xyz01, delta01, level=None):
    """Concat form of vm_stencil_features_split: [7, N, 3C]."""
    return jnp.concatenate(
        vm_stencil_features_split(packed, xyz01, delta01, level), axis=-1)


# ---------------------------------------------------------------------------
# grid maintenance: upsample / shrink / regularizers
# ---------------------------------------------------------------------------

def _interp_bilinear_resize(tex, out_hw):
    """align_corners=True bilinear resize of [H,W,C] (ref: fields.py:154-166)."""
    h, w, c = tex.shape
    oh, ow = out_hw
    ui = jnp.linspace(0.0, h - 1.0, oh)
    vi = jnp.linspace(0.0, w - 1.0, ow)
    u0 = jnp.floor(ui).astype(jnp.int32)
    v0 = jnp.floor(vi).astype(jnp.int32)
    u1 = jnp.minimum(u0 + 1, h - 1)
    v1 = jnp.minimum(v0 + 1, w - 1)
    fu = (ui - u0)[:, None, None]
    fv = (vi - v0)[None, :, None]
    t00 = tex[u0][:, v0]
    t01 = tex[u0][:, v1]
    t10 = tex[u1][:, v0]
    t11 = tex[u1][:, v1]
    return ((1 - fu) * ((1 - fv) * t00 + fv * t01)
            + fu * ((1 - fv) * t10 + fv * t11))


def _interp_linear_resize(line, out_l):
    l, c = line.shape
    xi = jnp.linspace(0.0, l - 1.0, out_l)
    x0 = jnp.floor(xi).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, l - 1)
    f = (xi - x0)[:, None]
    return (1 - f) * line[x0] + f * line[x1]


def upsample_vm(field: FieldParams, res_target: Sequence[int]) -> FieldParams:
    """Coarse-to-fine grid upsampling (ref: fields.py:154-178)."""
    planes, lines = [], []
    for i in range(3):
        hw = (int(res_target[MAT_MODE[i][0]]), int(res_target[MAT_MODE[i][1]]))
        planes.append(_interp_bilinear_resize(field['planes'][i], hw))
        lines.append(_interp_linear_resize(field['lines'][i],
                                           int(res_target[VEC_MODE[i]])))
    return {'planes': planes, 'lines': lines}


def shrink_vm(field: FieldParams, grid_size, aabb, new_aabb) -> FieldParams:
    """Crop the VM grids to a tightened aabb (ref: fields.py:180-203).

    Host-side (concrete shapes change). Returns (field, new_grid_size)."""
    aabb = np.asarray(aabb, np.float64)
    new_aabb = np.asarray(new_aabb, np.float64)
    gs = np.asarray(grid_size)
    units = (aabb[1] - aabb[0]) / (gs - 1)
    t_l = np.round((new_aabb[0] - aabb[0]) / units).astype(int)
    b_r = np.minimum(np.round((new_aabb[1] - aabb[0]) / units).astype(int)
                     + 1, gs)
    planes, lines = [], []
    for i in range(3):
        m0, m1 = MAT_MODE[i]
        v = VEC_MODE[i]
        planes.append(field['planes'][i][t_l[m0]:b_r[m0],
                                         t_l[m1]:b_r[m1]])
        lines.append(field['lines'][i][t_l[v]:b_r[v]])
    new_size = tuple(int(x) for x in (b_r - t_l))
    return {'planes': planes, 'lines': lines}, new_size


def tv_loss_vm(field: FieldParams) -> jnp.ndarray:
    """Total-variation regularizer over planes+lines
    (ref: other_field.py:170-191 applied at fields.py:133-138)."""
    total = 0.0
    for p in field['planes']:
        h, w, c = p.shape
        dh = jnp.sum((p[1:, :, :] - p[:-1, :, :]) ** 2) / ((h - 1) * w * c)
        dw = jnp.sum((p[:, 1:, :] - p[:, :-1, :]) ** 2) / (h * (w - 1) * c)
        total = total + 2.0 * (dh + dw)
    for l in field['lines']:
        ln, c = l.shape
        total = total + 2.0 * jnp.sum((l[1:] - l[:-1]) ** 2) / ((ln - 1) * c)
    return total


def _gaussian_kernel_1d(kernel_size: int, sigma: float) -> np.ndarray:
    x = np.arange(-(kernel_size // 2), kernel_size // 2 + 1, dtype=np.float64)
    k = np.exp(-x ** 2 / (2 * sigma ** 2))
    return (k / k.sum()).astype(np.float32)


def gaussian_smooth_loss_vm(field: FieldParams, kernel_size: int = 5,
                            sigma: float = 0.5) -> jnp.ndarray:
    """Sum of squared differences between the grids and their Gaussian blur,
    borders excluded (ref: fields.py:301-309)."""
    k1 = jnp.asarray(_gaussian_kernel_1d(kernel_size, sigma))
    k2 = k1[:, None] * k1[None, :]
    kk = kernel_size // 2
    total = 0.0
    for p in field['planes']:
        x = p.transpose(2, 0, 1)[:, None]  # [C,1,H,W]
        blur = jax.lax.conv_general_dilated(
            x, k2[None, None], (1, 1), [(kk, kk), (kk, kk)])
        blur = blur[:, 0].transpose(1, 2, 0)
        total = total + jnp.sum((p[kk:-kk, kk:-kk] - blur[kk:-kk, kk:-kk]) ** 2)
    for l in field['lines']:
        x = l.T[:, None, :]  # [C,1,L]
        blur = jax.lax.conv_general_dilated(
            x, k1[None, None], (1,), [(kk, kk)])
        blur = blur[:, 0].T
        total = total + jnp.sum((l[kk:-kk] - blur[kk:-kk]) ** 2)
    return total
