"""Occupancy grid + alpha mask with fixed-shape TPU-friendly marching.

Replaces two CUDA dependencies of the reference:
  * nerfacc.OccGridEstimator (EMA-updated binary occupancy + empty-space
    skipping sampler, ref: shapeRenderer.py:211-217, 950-959, 1285-1290)
  * AlphaGridMask 3D grid_sample (ref: shapeRenderer.py:79-97)

TPU design: instead of emitting variable-length ``(ray_indices, t_starts,
t_ends)`` lists, we march a *dense* candidate step lattice through the binary
grid (a cheap bitfield gather), then compact each ray's occupied steps into a
fixed per-ray sample budget with ``top_k`` — one compiled program, static
shapes, no host sync.  Downstream field evaluation only touches the compacted
``[rays, max_samples]`` buffer.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class OccGridConfig(NamedTuple):
    resolution: int = 128
    aabb_min: float = -1.0
    aabb_max: float = 1.0
    ema_decay: float = 0.95
    occ_threshold: float = 1e-2
    warmup_steps: int = 10000


def init_occ_grid(cfg: OccGridConfig):
    r = cfg.resolution
    return {
        'occs': jnp.zeros((r, r, r), jnp.float32),
        'binary': jnp.ones((r, r, r), jnp.bool_),
        # 4^3-block bitmask rows of `binary` (all-occupied at init);
        # the march gathers ONE row per G steps — see pack_occ_blocks
        'blocks': jnp.full((r * r * r, 2), 0xFFFFFFFF, jnp.uint32),
        # baked SDF lattice (cell-center nodes, packed cell-corner rows for
        # one-gather trilinear taps); +1 everywhere = 'all empty' until the
        # first update — occ-loss march targets are 0 until then, matching
        # the reference's occ grid starting fully occupied but the SDF
        # march starting from an untrained sphere
        'sdf_rows': jnp.ones((r, r, r, 8), jnp.bfloat16),
    }


def occ_grid_cell_centers(cfg: OccGridConfig):
    """[R^3, 3] world-space cell centers."""
    r = cfg.resolution
    xs = (jnp.arange(r) + 0.5) / r
    grid = jnp.stack(jnp.meshgrid(xs, xs, xs, indexing='ij'), -1)
    return (cfg.aabb_min
            + grid.reshape(-1, 3) * (cfg.aabb_max - cfg.aabb_min))


def update_occ_grid(state, cfg: OccGridConfig, alphas, step: int | jnp.ndarray,
                    rng=None, sdf=None, prune: bool = True):
    """EMA update from freshly evaluated cell alphas.

    alphas: [R^3] alpha at (jittered) cell centers. Mirrors
    nerfacc.update_every_n_steps semantics: occs <- max(occs*decay, alpha),
    binary <- occs > min(mean(occs), thresh).

    prune=False (the trainer's warmup window, mirroring the reference's
    warmup_steps=10000 at shapeRenderer.py:1287): accumulate the occs EMA
    but keep the binary grid fully occupied.  Pruning against the
    UNTRAINED field deadlocks training — the geometric init's zero set
    sits near the aabb corners, so the first prune locks sampling away
    from the object and the field can never learn where it is (round-4
    A/B: occ-path psnr flat at ~8.7 vs NeuS 24 without this).

    sdf: optional [R^3] signed distances at UNJITTERED cell centers —
    re-baked into the packed trilinear lattice the occ-loss march reads
    (see occ_sdf_aabb / sample_occ_sdf).  When None the previous bake is
    kept.
    """
    r = cfg.resolution
    occs = jnp.maximum(state['occs'] * cfg.ema_decay,
                       alphas.reshape(r, r, r))
    if prune:
        thresh = jnp.minimum(jnp.mean(occs), cfg.occ_threshold)
        binary = occs > thresh
    else:
        binary = jnp.ones((r, r, r), jnp.bool_)
    new = {'occs': occs, 'binary': binary,
           'blocks': pack_occ_blocks(binary)}
    if sdf is not None:
        new['sdf_rows'] = pack_cell_rows(sdf.reshape(r, r, r), jnp.bfloat16)
    elif 'sdf_rows' in state:
        new['sdf_rows'] = state['sdf_rows']
    return new


def occ_sdf_aabb(cfg: OccGridConfig):
    """aabb of the baked-SDF node lattice: the R^3 cell CENTERS are the
    nodes, so the lattice spans [aabb_min + h/2, aabb_max - h/2]."""
    h = (cfg.aabb_max - cfg.aabb_min) / cfg.resolution
    return jnp.asarray(
        [[cfg.aabb_min + 0.5 * h] * 3, [cfg.aabb_max - 0.5 * h] * 3],
        jnp.float32)


def sample_occ_sdf(state, cfg: OccGridConfig, pts):
    """Trilinear baked-SDF lookup at world points [N,3] -> [N] f32
    (+1 outside the node lattice — treated as empty space)."""
    return packed_trilinear_tap(state['sdf_rows'], occ_sdf_aabb(cfg), pts)


def pack_cell_rows(values, dtype):
    """[R,R,R] node values -> [R,R,R,8] rows of cell corners
    (clip(i+di), clip(j+dj), clip(k+dk)), corner index (di*2+dj)*2+dk.

    One gathered row then covers a full trilinear footprint (TPU gathers
    pay per ROW; 8 scalar corner gathers -> 1)."""
    r = values.shape[0]
    nxt = np.minimum(np.arange(r) + 1, r - 1)
    corners = []
    for di in (0, 1):
        vi = values if di == 0 else values[nxt]
        for dj in (0, 1):
            vj = vi if dj == 0 else vi[:, nxt]
            for dk in (0, 1):
                corners.append(vj if dk == 0 else vj[:, :, nxt])
    return jnp.stack(corners, axis=-1).astype(dtype)


def packed_trilinear_tap(rows4, aabb, pts, want_grad: bool = False):
    """One trilinear tap per point from pack_cell_rows rows.

    Returns value [N] (1.0 outside the aabb) and, if want_grad, the
    world-space gradient [N,3] of the interpolant.

    Interpolates by lane-aligned multiply+reduce with weights built from
    a lane iota: the earlier axis-lerp chain sliced the gather output at
    lane stride 2 (``row[:, 0::2]``), and XLA lowered every such slice as
    ~48 chunked f32[4,32768]-transposed fusions plus relayout copies —
    2376 sub-ms fusions + ~3600 copies ~= 58 ms/step at stage-2 bench
    scale (round-5 trace).  The iota-mask weight form is pure
    lane-aligned elementwise + an 8-lane reduce, which fuses into the
    gather's consumer."""
    r = rows4.shape[0]
    lo, hi = aabb[0], aabb[1]
    u = (pts - lo) / (hi - lo)
    inside = jnp.all((u >= 0.0) & (u <= 1.0), axis=-1)
    x = jnp.clip(u, 0.0, 1.0) * (r - 1.0)
    b = jnp.clip(x.astype(jnp.int32), 0, r - 2)
    f = x - b.astype(x.dtype)
    idx = (b[:, 0] * r + b[:, 1]) * r + b[:, 2]
    row = jnp.take(rows4.reshape(-1, 8), idx, axis=0,
                   mode='clip').astype(jnp.float32)
    fx, fy, fz = f[:, 0:1], f[:, 1:2], f[:, 2:3]
    # lane order (dx*2+dy)*2+dz
    lane = np.arange(8)
    sx = jnp.asarray((lane >> 2) & 1, row.dtype)
    sy = jnp.asarray((lane >> 1) & 1, row.dtype)
    sz = jnp.asarray(lane & 1, row.dtype)
    wx = (1.0 - fx) + sx * (2.0 * fx - 1.0)             # [N,8]
    wy = (1.0 - fy) + sy * (2.0 * fy - 1.0)
    wz = (1.0 - fz) + sz * (2.0 * fz - 1.0)
    ryz = row * wy * wz
    val = jnp.sum(ryz * wx, -1)
    val = jnp.where(inside, val, 1.0)
    if not want_grad:
        return val
    gx = jnp.sum(ryz * (2.0 * sx - 1.0), -1)            # d/dfx
    rx = row * wx
    gy = jnp.sum(rx * wz * (2.0 * sy - 1.0), -1)        # d/dfy
    gz = jnp.sum(rx * wy * (2.0 * sz - 1.0), -1)        # d/dfz
    scale = (r - 1.0) / (hi - lo)                       # [3]
    grad = jnp.stack([gx, gy, gz], -1) * scale
    return val, grad


def pack_occ_blocks(binary):
    """[R,R,R] bool -> [R^3, 2] uint32 rows: the row at anchor cell a
    holds the edge-clamped 4^3 block binary[clip(a+d)], d in [0,3]^3, as
    a 64-bit mask with bit (dx*4+dy)*4+dz (bit>>5 selects the word).

    TPU gathers pay per gathered ROW (~8ns), so the dense binary march
    ([rays, steps] scalar lookups = 901k rows/step, 7.2ms in the round-2
    trace) instead gathers ONE block row per G consecutive steps and
    extracts each step's cell with shifts — see occ_grid_sampling."""
    r = binary.shape[0]
    idx = [jnp.minimum(jnp.arange(r) + d, r - 1) for d in range(4)]
    words = []
    for wi in range(2):
        acc = jnp.zeros((r, r, r), jnp.uint32)
        for dxl in (0, 1):
            vx = jnp.take(binary, idx[2 * wi + dxl], axis=0)
            for dy in range(4):
                vxy = jnp.take(vx, idx[dy], axis=1)
                for dz in range(4):
                    b = (dxl * 4 + dy) * 4 + dz
                    acc = acc | (jnp.take(vxy, idx[dz], axis=2)
                                 .astype(jnp.uint32) << b)
        words.append(acc.reshape(-1))
    return jnp.stack(words, axis=-1)


def _query_blocks(blocks, cfg: OccGridConfig, pts, anchors, G: int):
    """Occupancy of per-step cells from per-group block rows.

    pts [rn, S, 3] world midpoints (S = n_groups*G); anchors [rn, n_groups, 3]
    int32 block anchors (each step's cell is guaranteed within the 4^3
    block of its group's anchor — see occ_grid_sampling's G choice).
    Returns bool [rn, S]."""
    r = cfg.resolution
    rn, s0, _ = pts.shape
    rows = jnp.take(
        blocks,
        (anchors[..., 0] * r + anchors[..., 1]) * r + anchors[..., 2],
        axis=0, mode='clip')                                 # [rn, ng, 2]
    rows = jnp.broadcast_to(rows[:, :, None, :],
                            (rn, s0 // G, G, 2)).reshape(rn, s0, 2)
    u = (pts - cfg.aabb_min) / (cfg.aabb_max - cfg.aabb_min)
    inside = jnp.all((u >= 0.0) & (u < 1.0), axis=-1)
    v = jnp.clip((u * r).astype(jnp.int32), 0, r - 1)
    loc = jnp.clip(
        v - jnp.broadcast_to(anchors[:, :, None, :],
                             (rn, s0 // G, G, 3)).reshape(rn, s0, 3),
        0, 3)
    b = ((loc[..., 0] * 4 + loc[..., 1]) * 4 + loc[..., 2]).astype(
        jnp.uint32)
    word = jnp.where(b < 32, rows[..., 0], rows[..., 1])
    return (((word >> (b & 31)) & 1) > 0) & inside


def query_binary(state, cfg: OccGridConfig, pts):
    """Nearest-cell binary occupancy at world points [N,3] -> bool [N].

    Points outside the aabb are unoccupied."""
    r = cfg.resolution
    u = (pts - cfg.aabb_min) / (cfg.aabb_max - cfg.aabb_min)
    inside = jnp.all((u >= 0.0) & (u < 1.0), axis=-1)
    idx = jnp.clip((u * r).astype(jnp.int32), 0, r - 1)
    flat = idx[:, 0] * r * r + idx[:, 1] * r + idx[:, 2]
    occ = jnp.take(state['binary'].reshape(-1), flat, axis=0, mode='clip')
    return occ & inside


def occ_grid_sampling(state, cfg: OccGridConfig, rays_o, dirs, near, far,
                      step_size: float, n_candidates: int,
                      max_samples: int, rng=None):
    """Empty-space-skipping ray sampling with a fixed sample budget.

    rays_o/dirs: [rn,3]; near/far: [rn,1]; returns
      t_starts [rn,S], t_ends [rn,S], mask [rn,S]  (S = max_samples).

    Semantics follow nerfacc's fixed render_step_size sampler
    (ref: shapeRenderer.py:950-959): uniform steps of ``step_size`` from
    near, keep steps whose midpoint lands in an occupied cell, truncated to
    the per-ray budget.
    """
    rn = rays_o.shape[0]
    # group G consecutive steps per block gather: every member's cell is
    # within ceil((G-1)/2 * step / voxel) <= 1 of the group-center cell,
    # so anchor = center_cell - 1 keeps all members in the 4^3 block
    voxel = (cfg.aabb_max - cfg.aabb_min) / cfg.resolution
    G = 1
    if 'blocks' in state and isinstance(step_size, (int, float)):
        for g in (4, 2):
            if (g - 1) * 0.5 * float(step_size) <= voxel:
                G = g
                break
    s0 = -(-n_candidates // G) * G
    i = jnp.arange(s0, dtype=rays_o.dtype)
    if rng is not None:  # stratified: jitter the whole lattice per ray
        jitter = jax.random.uniform(rng, (rn, 1))
    else:
        jitter = jnp.full((rn, 1), 0.0, rays_o.dtype)
    tm = near + (i[None, :] + jitter + 0.5) * step_size    # [rn, s0]

    pts = rays_o[:, None, :] + dirs[:, None, :] * tm[..., None]
    if G == 1:
        occ = query_binary(state, cfg, pts.reshape(-1, 3)).reshape(rn, s0)
    else:
        gg = jnp.arange(s0 // G, dtype=rays_o.dtype)
        tc = near + (gg[None, :] * G + jitter + 0.5 * G) * step_size
        pc = rays_o[:, None, :] + dirs[:, None, :] * tc[..., None]
        uc = (pc - cfg.aabb_min) / (cfg.aabb_max - cfg.aabb_min)
        vc = jnp.clip((uc * cfg.resolution).astype(jnp.int32),
                      0, cfg.resolution - 1)
        anchors = jnp.clip(vc - 1, 0, cfg.resolution - 4)
        occ = _query_blocks(state['blocks'], cfg, pts, anchors, G)
    occ = occ[:, :n_candidates] & (tm[:, :n_candidates] < far)

    # stable compaction of the first `max_samples` occupied steps via a
    # per-row SORT of candidate keys (occupied keep their index, empty get
    # index + n_candidates -> occupied bubble to the front in order).  A
    # cumsum+scatter formulation of the same selection lowered to a
    # serialized generic scatter on TPU (~25 ms of the 28 ms sampler cost
    # at 2048x444); the sort is a vectorized O(S log^2 S) network.  The
    # kept t values derive arithmetically from the sorted index — no
    # gather needed.
    ii = jnp.arange(n_candidates, dtype=jnp.int32)
    key = jnp.where(occ, ii[None, :], n_candidates + ii[None, :])
    key = jax.lax.sort(key, dimension=1)[:, :max_samples]
    valid = key < n_candidates
    idx = jnp.minimum(key, n_candidates - 1).astype(rays_o.dtype)
    t_starts = near + (idx + jitter) * step_size
    t_ends = t_starts + step_size
    return t_starts, t_ends, valid


# ---------------------------------------------------------------------------
# alpha grid mask (trilinear)
# ---------------------------------------------------------------------------

def trilinear_sample_3d(volume, xyz01):
    """align_corners=True trilinear sampling of [X,Y,Z] at coords in [0,1]^3.

    Equivalent of F.grid_sample on the reference's alpha volume
    (ref: shapeRenderer.py:90-94). xyz01: [N,3] -> [N].
    """
    dims = volume.shape
    coords = [xyz01[:, d] * (dims[d] - 1) for d in range(3)]
    i0 = [jnp.clip(jnp.floor(c).astype(jnp.int32), 0, dims[d] - 1)
          for d, c in enumerate(coords)]
    i1 = [jnp.clip(i + 1, 0, dims[d] - 1) for d, i in enumerate(i0)]
    f = [c - jnp.floor(c) for c in coords]

    flat = volume.reshape(-1)
    sy, sz = dims[1] * dims[2], dims[2]

    def gather(ix, iy, iz):
        return jnp.take(flat, ix * sy + iy * sz + iz, axis=0, mode='clip')

    out = 0.0
    for bx, wx in ((i0[0], 1 - f[0]), (i1[0], f[0])):
        for by, wy in ((i0[1], 1 - f[1]), (i1[1], f[1])):
            for bz, wz in ((i0[2], 1 - f[2]), (i1[2], f[2])):
                out = out + wx * wy * wz * gather(bx, by, bz)
    return out


class AlphaGridMask(NamedTuple):
    """Binary alpha-mask volume over an aabb (ref: shapeRenderer.py:79-97)."""
    aabb: jnp.ndarray       # [2,3]
    volume: jnp.ndarray     # [X,Y,Z] float 0/1

    def sample_alpha(self, pts):
        u = (pts - self.aabb[0]) / (self.aabb[1] - self.aabb[0])
        u = jnp.clip(u, 0.0, 1.0)
        return trilinear_sample_3d(self.volume, u)


def compact_indices(valid_flat, m: int):
    """Stable compaction of valid sample slots into a fixed budget.

    valid_flat: [N] bool. Returns (src [M] int32 — flat source index per
    compacted slot, slot_mask [M] bool, dest [N] int32 — compacted slot per
    source or M for dropped/invalid).

    TPU-native replacement for dynamic-length compaction: one cumsum + one
    scatter, all static shapes. Samples beyond the budget are dropped
    (callers size ``m`` so this is rare).
    """
    n = valid_flat.shape[0]
    pos = jnp.cumsum(valid_flat.astype(jnp.int32)) - 1
    keep = valid_flat & (pos < m)
    dest = jnp.where(keep, pos, m)
    # src via sort (keys unique on kept rows, so stability is moot): the
    # .at[dest].set(iota) scatter build this replaces measured 13.6ms vs
    # 8.0ms isolated at 1.57M rows on TPU (scripts/microbench_compact_r5)
    keys = jnp.where(keep, dest, jnp.int32(n + 1))
    _, src_full = jax.lax.sort_key_val(keys,
                                       jnp.arange(n, dtype=jnp.int32))
    if n >= m:
        src = src_full[:m]
    else:                 # budget exceeds rows: pad (padded slots are
        src = jnp.pad(src_full, (0, m - n))   # masked by slot_mask)
    n_valid = jnp.minimum(jnp.sum(valid_flat.astype(jnp.int32)), m)
    slot_mask = jnp.arange(m) < n_valid
    return src, slot_mask, dest


def scatter_back(values_m, dest, fill=0.0, src=None, slot_mask=None):
    """Expand compacted per-slot values [M, ...] back to flat [N, ...]:
    out[i] = values_m[dest[i]] for mapped sources, ``fill`` elsewhere.

    When ``src``/``slot_mask`` from the same compact_indices call are
    passed, the VJP uses the INVERSE gather instead of XLA's generic
    scatter-add: dest is injective on mapped sources by construction
    (each kept source owns a unique slot), so
    d values_m[j] = g[src[j]] * slot_mask[j] exactly.  The scatter-add
    form cost 41.5 ms/step at stage-2 scale (round-3 trace, 1.05M
    updates into [524k,3]); the gather form is ~20x cheaper."""
    if src is None:
        return _scatter_back_dense(values_m, dest, fill)
    return _scatter_back_inv(values_m, dest, src, slot_mask, fill)


def _scatter_back_dense(values_m, dest, fill=0.0):
    m = values_m.shape[0]
    mapped = dest < m
    gathered = jnp.take(values_m, jnp.clip(dest, 0, m - 1), axis=0,
                        mode='clip')
    shape = mapped.shape + (1,) * (gathered.ndim - 1)
    return jnp.where(mapped.reshape(shape), gathered, fill)


def _int_zero_cots(*arrs):
    import jax.dtypes
    return tuple(np.zeros(a.shape, jax.dtypes.float0) for a in arrs)


@jax.custom_vjp
def _scatter_back_inv(values_m, dest, src, slot_mask, fill):
    return _scatter_back_dense(values_m, dest, fill)


def _sbi_fwd(values_m, dest, src, slot_mask, fill):
    return _scatter_back_inv(values_m, dest, src, slot_mask, fill), \
        (dest, src, slot_mask)


def _sbi_bwd(res, g):
    dest, src, slot_mask = res
    dv = jnp.take(g, src, axis=0, mode='clip')
    mshape = slot_mask.shape + (1,) * (dv.ndim - 1)
    dv = jnp.where(slot_mask.reshape(mshape), dv, 0.0)
    zi = _int_zero_cots(dest, src, slot_mask)
    # fill cotangent: the unmapped sources' g
    m = src.shape[0]
    unmapped = dest >= m
    dfill = jnp.sum(g * unmapped.reshape(
        unmapped.shape + (1,) * (g.ndim - 1)).astype(g.dtype))
    return (dv, *zi, dfill)


_scatter_back_inv.defvjp(_sbi_fwd, _sbi_bwd)


def compact_take(values, src, dest, slot_mask):
    """[N, C] -> [M, C] gather by ``src`` whose VJP is the inverse
    gather by ``dest`` (no scatter — see scatter_back): d values[i] =
    g[dest[i]] for mapped i, 0 elsewhere."""
    return _compact_take(values, src, dest, slot_mask)


@jax.custom_vjp
def _compact_take(values, src, dest, slot_mask):
    return jnp.take(values, src, axis=0, mode='clip')


def _ct_fwd(values, src, dest, slot_mask):
    return _compact_take(values, src, dest, slot_mask), \
        (src, dest, slot_mask)


def _ct_bwd(res, g):
    src, dest, slot_mask = res
    m = src.shape[0]
    mapped = dest < m
    dv = jnp.take(g, jnp.clip(dest, 0, m - 1), axis=0, mode='clip')
    mshape = mapped.shape + (1,) * (dv.ndim - 1)
    dv = jnp.where(mapped.reshape(mshape), dv, 0.0)
    return (dv, *_int_zero_cots(src, dest, slot_mask))


_compact_take.defvjp(_ct_fwd, _ct_bwd)


def max_pool_3d_3x3(vol):
    """3x3x3 stride-1 max pool with same padding (ref: shapeRenderer.py:265)."""
    return jax.lax.reduce_window(
        vol, -jnp.inf, jax.lax.max, (3, 3, 3), (1, 1, 1),
        [(1, 1), (1, 1), (1, 1)])
