"""Baked-SDF sphere tracing: the TPU-native secondary-ray visibility oracle.

The reference answers "does this secondary ray hit the object, and where?"
with a CUDA BVH over the extracted mesh (ref: raytracing/raytracer.py:21-55,
used by MCShadingNetwork.get_lights at fields.py:951-975).  The TPU-native
replacement (per SURVEY §2.4/BASELINE north star) bakes the frozen stage-1
SDF into a dense voxel grid once at stage-2 init — the analogue of the
extracted mesh — and sphere-traces it:

  * fixed-iteration sphere trace (lax.fori_loop), each step one trilinear
    gather into the grid: no MLP evals on the hot path, no dynamic shapes
  * hit normals from central differences of the same grid
  * conservative step scaling + sign-change bisection refinement

The trace matches the reference's hit semantics: rays are offset by
``2 * unit_size`` from the surface before tracing (ref:
materialRenderer.py:223), misses report depth >= 10 (ref:
materialRenderer.py:261).
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .grid import (trilinear_sample_3d, pack_cell_rows,
                   corner_weights, packed_trilinear_tap)

MISS_DEPTH = 10.0


class SDFGrid(NamedTuple):
    values: jnp.ndarray     # [R,R,R] signed distances
    aabb: jnp.ndarray       # [2,3]

    @property
    def resolution(self) -> int:
        return self.values.shape[0]


def bake_sdf_grid(sdf_fun, aabb, resolution: int = 256,
                  chunk: int = 262144) -> SDFGrid:
    """Evaluate the (frozen) neural SDF on a dense lattice.

    Host-driven chunked loop — done once at stage-2 init, like the
    reference's mesh extraction (ref: extract_mesh.py:41)."""
    a = np.asarray(aabb, np.float32)
    xs = [np.linspace(a[0][d], a[1][d], resolution, dtype=np.float32)
          for d in range(3)]
    grid = np.stack(np.meshgrid(*xs, indexing='ij'), -1).reshape(-1, 3)
    vals = []
    for i in range(0, grid.shape[0], chunk):
        vals.append(np.asarray(sdf_fun(jnp.asarray(grid[i:i + chunk]))))
    values = np.concatenate(vals, 0).reshape(resolution, resolution,
                                             resolution)
    return SDFGrid(values=jnp.asarray(values), aabb=jnp.asarray(a))


def sample_sdf_grid(grid: SDFGrid, pts):
    """Trilinear SDF lookup; points outside the aabb get a large positive
    distance (never 'hit')."""
    lo, hi = grid.aabb[0], grid.aabb[1]
    u = (pts - lo) / (hi - lo)
    inside = jnp.all((u >= 0.0) & (u <= 1.0), axis=-1)
    val = trilinear_sample_3d(grid.values, jnp.clip(u, 0.0, 1.0))
    return jnp.where(inside, val, 1.0)


def sdf_grid_normal(grid: SDFGrid, pts, eps_scale: float = 1.0):
    """Central-difference normal from the baked grid."""
    cell = (grid.aabb[1] - grid.aabb[0]) / grid.resolution * eps_scale
    offs = jnp.stack([
        jnp.array([1.0, 0, 0]) * cell[0], jnp.array([0, 1.0, 0]) * cell[1],
        jnp.array([0, 0, 1.0]) * cell[2]])
    n = pts.shape[0]
    plus = sample_sdf_grid(grid, (pts[:, None, :] + offs[None]).reshape(-1, 3)
                           ).reshape(n, 3)
    minus = sample_sdf_grid(grid,
                            (pts[:, None, :] - offs[None]).reshape(-1, 3)
                            ).reshape(n, 3)
    g = (plus - minus) / (2.0 * cell[None, :])
    return g / jnp.maximum(jnp.linalg.norm(g, axis=-1, keepdims=True), 1e-8)


def sphere_trace(grid, rays_o, rays_d, n_steps: int = 48,
                 n_bisect: int = 8, hit_eps: float = None,
                 step_scale: float = 0.9, max_dist: float = 4.0):
    """Fixed-iteration sphere trace of the baked SDF.

    rays_o/rays_d: [N,3] (dirs unit). Returns
    (inters [N,3], normals [N,3], depth [N,1], hit_mask [N]).
    Misses get depth = MISS_DEPTH (ref: materialRenderer.py:261 semantics).

    Accepts either a dense ``SDFGrid`` (reference path: 8 corner gathers
    per trilinear tap) or a ``PackedSDFGrid`` (hot path: one row gather
    per tap + coarse empty-space leaping — see sphere_trace_packed).
    """
    if isinstance(grid, PackedSDFGrid):
        return sphere_trace_packed(grid, rays_o, rays_d,
                                   n_bisect=n_bisect, hit_eps=hit_eps,
                                   step_scale=step_scale,
                                   max_dist=max_dist)
    n = rays_o.shape[0]
    # aabb may be a traced jit argument — derive step caps as traced
    # scalars (jnp arithmetic works for concrete closures too)
    ext = grid.aabb[1] - grid.aabb[0]
    cell = jnp.mean(ext) / grid.resolution
    diag = jnp.linalg.norm(ext)
    if hit_eps is None:
        hit_eps = 0.75 * cell
    # cap the step so a (possibly non-metric) baked field cannot tunnel
    # through thin geometry, while n_steps * cap still spans the aabb
    step_cap = jnp.maximum(2.0 * diag / n_steps, 4.0 * cell)

    # start at the ray/aabb entry (slab method) — outside the grid the
    # field carries no distance information
    vec = jnp.where(rays_d == 0, 1e-6, rays_d)
    ra = (grid.aabb[1] - rays_o) / vec
    rb = (grid.aabb[0] - rays_o) / vec
    t_enter = jnp.maximum(jnp.max(jnp.minimum(ra, rb), -1, keepdims=True),
                          0.0)

    def body(_, carry):
        t, done, prev_step = carry
        pts = rays_o + rays_d * t
        d = sample_sdf_grid(grid, pts)
        hit_now = d < hit_eps
        done_new = done | hit_now | (t[:, 0] > max_dist)
        step = jnp.minimum(jnp.maximum(d, hit_eps * 0.5)[:, None]
                           * step_scale, step_cap)
        t_new = jnp.where(done_new[:, None], t, t + step)
        prev_new = jnp.where(done_new[:, None], prev_step, step)
        return t_new, done_new, prev_new

    t0 = t_enter
    done0 = jnp.zeros((n,), bool)
    prev0 = jnp.full((n, 1), 2.0 * cell, rays_o.dtype)
    t, done, prev_step = jax.lax.fori_loop(0, n_steps, body,
                                           (t0, done0, prev0))

    pts = rays_o + rays_d * t
    d_end = sample_sdf_grid(grid, pts)
    hit = done & (d_end < 2.0 * hit_eps) & (t[:, 0] <= max_dist)

    # bisection refinement over the last step taken (sign-change bracket)
    lo = jnp.maximum(t - jnp.maximum(prev_step, 2.0 * cell), 0.0)
    hi = t

    def bis(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        d_mid = sample_sdf_grid(grid, rays_o + rays_d * mid)[:, None]
        go_low = d_mid > 0.0
        return jnp.where(go_low, mid, lo), jnp.where(go_low, hi, mid)

    lo, hi = jax.lax.fori_loop(0, n_bisect, bis, (lo, hi))
    t_ref = 0.5 * (lo + hi)
    t_final = jnp.where(hit[:, None], t_ref, jnp.full_like(t, MISS_DEPTH))
    inters = rays_o + rays_d * jnp.where(hit[:, None], t_ref, 0.0)
    normals = sdf_grid_normal(grid, inters)
    # flip normals to face the incoming ray (ref: raytracer normals are
    # flipped, materialRenderer.py:256-257)
    flip = jnp.sum(normals * rays_d, -1, keepdims=True) >= 0
    normals = jnp.where(flip, -normals, normals)
    return inters, normals, t_final, hit


# ---------------------------------------------------------------------------
# packed trace: one row gather per trilinear tap + coarse empty-space leaps
# ---------------------------------------------------------------------------
#
# TPU gathers cost ~2.5 ns per gathered ROW regardless of row width (same
# measurement that drove ops/tensor_field.pack_vm_patches), so the dense
# trace above — 8 scalar corner gathers per tap, 48+ taps per ray — is
# gather-row bound at stage-2 scale (1.8M secondary rays/step).  The packed
# representation stores each cell's 8 corners contiguously ([R,R,R,8]
# rows), making a trilinear tap ONE gathered row; a strided-subsampled
# coarse grid (exact SDF at coarse nodes) provides Lipschitz-safe long
# steps through empty space, cutting worst-case tap counts ~3x on top.
# Hit normals come from the analytic in-cell trilinear gradient of the
# final row — one gather instead of six.


@jax.tree_util.register_pytree_node_class
class PackedSDFGrid:
    """Multi-resolution packed trace representation.

    * ``coarse_rows`` [Rc,Rc,Rc,8]: strided-subsample cell-corner rows —
      Lipschitz-safe empty-space leaps.
    * ``mid_rows`` [Rm,Rm,Rm,8]: mid-resolution cell-corner rows — the
      marching + bisection level.  The round-3 TPU measurement: a
      trilinear tap costs ~11.6ns/row against the full 256^3 table
      (268MB, cache-hostile) but ~4ns/row against <=35MB tables, and
      tap count x row cost is ~half the stage-2 step; marching at R/2
      cuts the dominant term ~2.5x for a <=half-fine-cell surface shift.
    * ``blocks`` [NB^3, 64]: full-resolution stride-3 4^3 corner blocks
      (node span [3b, 3b+3] edge-clamped) — the final hit polish and the
      analytic normal read ONE such row per ray and evaluate trilinear
      value/gradient in-register via separable hat weights, so full-res
      precision costs 2-3 gathers per ray instead of 20.

    ``reso`` (static aux) is the full node resolution R.
    """

    def __init__(self, mid_rows, blocks, coarse_rows, aabb, reso: int):
        self.mid_rows = mid_rows
        self.blocks = blocks
        self.coarse_rows = coarse_rows
        self.aabb = aabb
        self.reso = int(reso)

    def tree_flatten(self):
        return ((self.mid_rows, self.blocks, self.coarse_rows, self.aabb),
                self.reso)

    @classmethod
    def tree_unflatten(cls, reso, children):
        return cls(*children, reso)

    @property
    def resolution(self) -> int:
        return self.reso


_pack_cells = pack_cell_rows          # shared with ops.grid (occ-loss bake)


def pack_corner_blocks(values, dtype):
    """[R,R,R] node values -> [NB^3, 64] stride-3 4^3 corner blocks.

    Block b covers nodes clip(3b + [0,3]) per axis (cells [3b, 3b+2]);
    NB = (R+2)//3.  Lane order (i*4+j)*4+k for node offset (i,j,k)."""
    r = values.shape[0]
    nb = (r + 2) // 3
    ar = np.minimum(3 * np.arange(nb)[:, None] + np.arange(4), r - 1)
    ar = jnp.asarray(ar.reshape(-1), jnp.int32)              # [nb*4]
    x = jnp.take(values, ar, axis=0)                          # [nb*4,R,R]
    y = jnp.take(x, ar, axis=1)                               # [nb*4,nb*4,R]
    z = jnp.take(y, ar, axis=2).reshape(nb, 4, nb, 4, nb, 4)
    return z.transpose(0, 2, 4, 1, 3, 5).reshape(nb ** 3, 64).astype(dtype)


def pack_sdf_grid(grid: SDFGrid, coarse_factor: int = 4,
                  dtype=jnp.bfloat16, mid_factor: int = 2) -> PackedSDFGrid:
    """Build the packed trace representation (once, at stage-2 init).

    Coarse/mid nodes are strided subsamples (exact baked SDF values) —
    Lipschitz continuity of the SDF bounds the coarse interpolant's
    overestimate by the coarse cell diagonal, which the tracer subtracts
    from every coarse step (no tunneling through features thinner than a
    coarse cell).  bf16 storage halves trace bandwidth; the ~0.4%
    relative rounding error is absolute-small exactly where it matters
    (near the zero crossing)."""
    v = grid.values.astype(dtype)   # cast first: packing copies 8x
    r = v.shape[0]
    mid = v[::mid_factor, ::mid_factor, ::mid_factor]
    mid_rows = _pack_cells(mid, dtype)
    blocks = pack_corner_blocks(v, dtype)
    vc = v[::coarse_factor, ::coarse_factor, ::coarse_factor]
    coarse_rows = _pack_cells(vc, dtype)
    return PackedSDFGrid(mid_rows=mid_rows, blocks=blocks,
                         coarse_rows=coarse_rows,
                         aabb=jnp.asarray(grid.aabb, jnp.float32), reso=r)


def _hat_axis(loc, want_grad: bool = False):
    """loc [N,1] in [0,3] -> hat weights [N,4] over node offsets 0..3
    (and d/dloc if asked): linear B-spline interpolation weights."""
    ks = jnp.arange(4.0, dtype=loc.dtype)
    t = loc - ks
    w = jnp.maximum(0.0, 1.0 - jnp.abs(t))
    if not want_grad:
        return w, None
    g = jnp.where((jnp.abs(t) < 1.0), -jnp.sign(t), 0.0)
    return w, g


def block_tap(pg: PackedSDFGrid, pts, want_grad: bool = False):
    """Full-resolution trilinear value (and world gradient) at [N,3]
    points from ONE gathered 4^3 corner-block row per point."""
    r = pg.reso
    nb = (r + 2) // 3
    lo, hi = pg.aabb[0], pg.aabb[1]
    u01 = (pts - lo) / (hi - lo)
    inside = jnp.all((u01 >= 0.0) & (u01 <= 1.0), axis=-1)
    x = jnp.clip(u01, 0.0, 1.0) * (r - 1.0)                  # node coords
    c = jnp.clip(x.astype(jnp.int32), 0, r - 2)              # cell
    b = jnp.minimum(c // 3, nb - 1)
    idx = (b[:, 0] * nb + b[:, 1]) * nb + b[:, 2]
    rw = jnp.take(pg.blocks, idx, axis=0,
                  mode='clip').astype(jnp.float32)           # [N,64]
    locf = x - 3.0 * b.astype(x.dtype)                       # [N,3] in [0,3]
    wx, gx = _hat_axis(locf[:, 0:1], want_grad)
    wy, gy = _hat_axis(locf[:, 1:2], want_grad)
    wz, gz = _hat_axis(locf[:, 2:3], want_grad)
    w = (wx[:, :, None, None] * wy[:, None, :, None]
         * wz[:, None, None, :]).reshape(-1, 64)
    val = jnp.where(inside, jnp.sum(rw * w, -1), 1.0)
    if not want_grad:
        return val, None
    scale = (r - 1.0) / (hi - lo)                            # [3]
    gxw = (gx[:, :, None, None] * wy[:, None, :, None]
           * wz[:, None, None, :]).reshape(-1, 64)
    gyw = (wx[:, :, None, None] * gy[:, None, :, None]
           * wz[:, None, None, :]).reshape(-1, 64)
    gzw = (wx[:, :, None, None] * wy[:, None, :, None]
           * gz[:, None, None, :]).reshape(-1, 64)
    grad = jnp.stack([jnp.sum(rw * gxw, -1), jnp.sum(rw * gyw, -1),
                      jnp.sum(rw * gzw, -1)], -1) * scale
    return val, grad


_corner_weights = corner_weights
_packed_tap = packed_trilinear_tap


def sphere_trace_packed(pg: PackedSDFGrid, rays_o, rays_d,
                        n_coarse: int = 12, n_fine: int = 10,
                        n_bisect: int = 4, n_polish: int = 2,
                        hit_eps: float = None,
                        step_scale: float = 0.9, max_dist: float = 4.0):
    """Coarse-to-fine sphere trace on the packed multi-resolution grid.

    Same contract as sphere_trace (hit semantics, MISS_DEPTH, flipped
    normals — ref: materialRenderer.py:223-261).  Phase 1 leaps through
    empty space on the coarse grid with steps of
    ``min(scale*d_c, cap) - coarse_diag`` (Lipschitz-safe); phase 2
    marches the MID grid (the tap-count x tap-cost sweet spot — see
    PackedSDFGrid); phase 3 bisects on the mid grid; phase 4 polishes
    the crossing with full-resolution single-point block taps (bisection
    on the full-res interpolant) and takes the analytic trilinear
    gradient there as the normal."""
    n = rays_o.shape[0]
    # aabb may be a traced jit argument — keep caps as traced scalars
    r = pg.reso
    rm = pg.mid_rows.shape[0]
    rc = pg.coarse_rows.shape[0]
    ext_mean = jnp.mean(pg.aabb[1] - pg.aabb[0])
    cell = ext_mean / (r - 1)
    m_cell = ext_mean / (rm - 1)
    c_cell = ext_mean / (rc - 1)
    c_diag = float(np.sqrt(3.0)) * c_cell
    if hit_eps is None:
        hit_eps = 0.75 * cell
    hit_eps_m = 0.75 * m_cell
    step_cap = 4.0 * m_cell        # distrust the baked field (non-metric)
    # longer capped leaps: leap safety comes from the 0.9*d - c_diag
    # margin, the cap only guards a badly non-metric far field
    c_cap = 8.0 * c_cell
    switch = c_diag + 2.0 * m_cell  # coarse can't resolve closer

    # ray/aabb entry (slab) — outside the grid the field carries no info.
    # All loop carries are FLAT [N]: [N,1] columns pick up a T(1,128)
    # layout inside while bodies (1 useful lane of 128) — round-3 trace.
    vec = jnp.where(rays_d == 0, 1e-6, rays_d)
    ra = (pg.aabb[1] - rays_o) / vec
    rb = (pg.aabb[0] - rays_o) / vec
    t_enter = jnp.maximum(jnp.max(jnp.minimum(ra, rb), -1), 0.0)

    def coarse_body(_, carry):
        t, done = carry
        d = _packed_tap(pg.coarse_rows, pg.aabb,
                        rays_o + rays_d * t[:, None])
        done_new = done | (d < switch) | (t > max_dist)
        step = jnp.minimum(step_scale * d, c_cap) - c_diag
        t_new = jnp.where(done_new, t, t + jnp.maximum(step, 0.0))
        return t_new, done_new

    t, _ = jax.lax.fori_loop(0, n_coarse, coarse_body,
                             (t_enter, jnp.zeros((n,), bool)))

    def fine_body(_, carry):
        t, done, prev_step = carry
        d = _packed_tap(pg.mid_rows, pg.aabb, rays_o + rays_d * t[:, None])
        hit_now = d < hit_eps_m
        done_new = done | hit_now | (t > max_dist)
        step = jnp.minimum(jnp.maximum(d, hit_eps_m * 0.5) * step_scale,
                           step_cap)
        t_new = jnp.where(done_new, t, t + step)
        prev_new = jnp.where(done_new, prev_step, step)
        return t_new, done_new, prev_new

    prev0 = jnp.full((n,), 2.0 * m_cell, rays_o.dtype)
    t, done, prev_step = jax.lax.fori_loop(
        0, n_fine, fine_body, (t, jnp.zeros((n,), bool), prev0))

    d_end = _packed_tap(pg.mid_rows, pg.aabb, rays_o + rays_d * t[:, None])
    hit = done & (d_end < 2.0 * hit_eps_m) & (t <= max_dist)

    lo = jnp.maximum(t - jnp.maximum(prev_step, 2.0 * m_cell), 0.0)
    hi = t

    def bis(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        d_mid = _packed_tap(pg.mid_rows, pg.aabb,
                            rays_o + rays_d * mid[:, None])
        go_low = d_mid > 0.0
        return jnp.where(go_low, mid, lo), jnp.where(go_low, hi, mid)

    lo, hi = jax.lax.fori_loop(0, n_bisect, bis, (lo, hi))

    # full-resolution polish: the mid-grid crossing can sit up to
    # ~m_cell from the full-res crossing (outside [lo, hi]), so bisection
    # can't finish the job — run clamped Newton steps on the block
    # interpolant instead (one 4^3-block row per iteration; a single
    # point always lies in exactly one block)
    t_mid = 0.5 * (lo + hi)

    def _newton(t, dv, g):
        slope = jnp.sum(g * rays_d, -1)
        slope = jnp.where(jnp.abs(slope) < 0.1, jnp.sign(slope) * 0.1
                          + jnp.where(slope == 0, 0.1, 0.0), slope)
        return jnp.clip(t - dv / slope,
                        t_mid - 2.0 * m_cell, t_mid + 2.0 * m_cell)

    def polish(_, t):
        dv, g = block_tap(pg, rays_o + rays_d * t[:, None],
                          want_grad=True)
        return _newton(t, dv, g)

    # the LAST polish iteration's block row also supplies the normal
    # (the trilinear gradient is cell-piecewise-constant, so evaluating
    # it one sub-cell Newton update early changes nothing) — one fewer
    # full-res tap per ray
    t = jax.lax.fori_loop(0, max(n_polish - 1, 0), polish, t_mid)
    dv, g = block_tap(pg, rays_o + rays_d * t[:, None], want_grad=True)
    t_ref = _newton(t, dv, g)[:, None]
    hit2 = hit[:, None]
    t_final = jnp.where(hit2, t_ref, jnp.full_like(t_ref, MISS_DEPTH))
    inters = rays_o + rays_d * jnp.where(hit2, t_ref, 0.0)
    normals = g / jnp.maximum(jnp.linalg.norm(g, axis=-1, keepdims=True),
                              1e-8)
    flip = jnp.sum(normals * rays_d, -1, keepdims=True) >= 0
    normals = jnp.where(flip, -normals, normals)
    return inters, normals, t_final, hit
