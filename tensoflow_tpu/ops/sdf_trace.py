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


class PackedSDFGrid(NamedTuple):
    rows: jnp.ndarray         # [R,R,R,8] fine cell-corner rows (z-minor)
    coarse_rows: jnp.ndarray  # [Rc,Rc,Rc,8] coarse cell-corner rows
    aabb: jnp.ndarray         # [2,3]

    @property
    def resolution(self) -> int:
        return self.rows.shape[0]


_pack_cells = pack_cell_rows          # shared with ops.grid (occ-loss bake)


def pack_sdf_grid(grid: SDFGrid, coarse_factor: int = 4,
                  dtype=jnp.bfloat16) -> PackedSDFGrid:
    """Build the packed trace representation (once, at stage-2 init).

    Coarse nodes are a strided subsample (exact baked SDF values, node
    i_c = i_fine * coarse_factor) — Lipschitz continuity of the SDF then
    bounds the interpolant's overestimate by the coarse cell diagonal,
    which the tracer subtracts from every coarse step (no tunneling
    through features thinner than a coarse cell).  bf16 storage halves
    trace bandwidth; the ~0.4% relative rounding error is absolute-small
    exactly where it matters (near the zero crossing)."""
    v = grid.values.astype(dtype)   # cast first: packing copies 8x
    rows = _pack_cells(v, dtype)
    vc = v[::coarse_factor, ::coarse_factor, ::coarse_factor]
    coarse_rows = _pack_cells(vc, dtype)
    return PackedSDFGrid(rows=rows, coarse_rows=coarse_rows,
                         aabb=jnp.asarray(grid.aabb, jnp.float32))


_corner_weights = corner_weights
_packed_tap = packed_trilinear_tap


def sphere_trace_packed(pg: PackedSDFGrid, rays_o, rays_d,
                        n_coarse: int = 24, n_fine: int = 12,
                        n_bisect: int = 8, hit_eps: float = None,
                        step_scale: float = 0.9, max_dist: float = 4.0):
    """Coarse-to-fine sphere trace on the packed grid.

    Same contract as sphere_trace (hit semantics, MISS_DEPTH, flipped
    normals — ref: materialRenderer.py:223-261).  Phase 1 leaps through
    empty space on the coarse grid with steps of
    ``min(scale*d_c, cap) - coarse_diag`` (Lipschitz-safe); phase 2 is
    the standard fine trace; bisection then brackets the crossing; the
    normal is the analytic trilinear gradient at the hit."""
    n = rays_o.shape[0]
    # aabb may be a traced jit argument — keep caps as traced scalars
    r = pg.rows.shape[0]
    rc = pg.coarse_rows.shape[0]
    ext_mean = jnp.mean(pg.aabb[1] - pg.aabb[0])
    cell = ext_mean / (r - 1)
    c_cell = ext_mean / (rc - 1)
    c_diag = float(np.sqrt(3.0)) * c_cell
    if hit_eps is None:
        hit_eps = 0.75 * cell
    step_cap = 4.0 * cell          # distrust the baked field (non-metric)
    c_cap = 6.0 * c_cell
    switch = c_diag + 2.0 * cell   # coarse can't resolve closer than this

    # ray/aabb entry (slab) — outside the grid the field carries no info
    vec = jnp.where(rays_d == 0, 1e-6, rays_d)
    ra = (pg.aabb[1] - rays_o) / vec
    rb = (pg.aabb[0] - rays_o) / vec
    t_enter = jnp.maximum(jnp.max(jnp.minimum(ra, rb), -1, keepdims=True),
                          0.0)

    def coarse_body(_, carry):
        t, done = carry
        d = _packed_tap(pg.coarse_rows, pg.aabb, rays_o + rays_d * t)
        done_new = done | (d < switch) | (t[:, 0] > max_dist)
        step = jnp.minimum(step_scale * d, c_cap)[:, None] - c_diag
        t_new = jnp.where(done_new[:, None], t, t + jnp.maximum(step, 0.0))
        return t_new, done_new

    t, _ = jax.lax.fori_loop(0, n_coarse, coarse_body,
                             (t_enter, jnp.zeros((n,), bool)))

    def fine_body(_, carry):
        t, done, prev_step = carry
        d = _packed_tap(pg.rows, pg.aabb, rays_o + rays_d * t)
        hit_now = d < hit_eps
        done_new = done | hit_now | (t[:, 0] > max_dist)
        step = jnp.minimum(jnp.maximum(d, hit_eps * 0.5)[:, None]
                           * step_scale, step_cap)
        t_new = jnp.where(done_new[:, None], t, t + step)
        prev_new = jnp.where(done_new[:, None], prev_step, step)
        return t_new, done_new, prev_new

    prev0 = jnp.full((n, 1), 2.0 * cell, rays_o.dtype)
    t, done, prev_step = jax.lax.fori_loop(
        0, n_fine, fine_body, (t, jnp.zeros((n,), bool), prev0))

    d_end = _packed_tap(pg.rows, pg.aabb, rays_o + rays_d * t)
    hit = done & (d_end < 2.0 * hit_eps) & (t[:, 0] <= max_dist)

    lo = jnp.maximum(t - jnp.maximum(prev_step, 2.0 * cell), 0.0)
    hi = t

    def bis(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        d_mid = _packed_tap(pg.rows, pg.aabb,
                            rays_o + rays_d * mid)[:, None]
        go_low = d_mid > 0.0
        return jnp.where(go_low, mid, lo), jnp.where(go_low, hi, mid)

    lo, hi = jax.lax.fori_loop(0, n_bisect, bis, (lo, hi))
    t_ref = 0.5 * (lo + hi)
    t_final = jnp.where(hit[:, None], t_ref, jnp.full_like(t, MISS_DEPTH))
    inters = rays_o + rays_d * jnp.where(hit[:, None], t_ref, 0.0)
    _, g = _packed_tap(pg.rows, pg.aabb, inters, want_grad=True)
    normals = g / jnp.maximum(jnp.linalg.norm(g, axis=-1, keepdims=True),
                              1e-8)
    flip = jnp.sum(normals * rays_d, -1, keepdims=True) >= 0
    normals = jnp.where(flip, -normals, normals)
    return inters, normals, t_final, hit
