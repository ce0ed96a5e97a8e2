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
                   packed_trilinear_tap)

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

    def __init__(self, mid_rows, blocks, coarse_rows, aabb, reso: int,
                 vis_rows=None, vis_pad: float = 0.0):
        self.mid_rows = mid_rows
        self.blocks = blocks
        self.coarse_rows = coarse_rows
        self.aabb = aabb
        self.reso = int(reso)
        # optional [Rc^3, 8] u32 direction-binned visibility cache
        # (bake_vis_cache): bit (cell, bin) == 1 certifies that every ray
        # launching from the cell along the bin's cone is clear of the
        # surface over [T0, exit] — see sphere_trace_budget.  vis_pad is
        # the extra apex margin (world units) the bake reserved for
        # keying the cache row on the PRE-OFFSET surface point
        # (get_lights' per-point row path needs 2*unit_size <= vis_pad).
        self.vis_rows = vis_rows
        self.vis_pad = float(vis_pad)

    def tree_flatten(self):
        return ((self.mid_rows, self.blocks, self.coarse_rows, self.aabb,
                 self.vis_rows), (self.reso, self.vis_pad))

    @classmethod
    def tree_unflatten(cls, aux, children):
        reso, vis_pad = aux if isinstance(aux, tuple) else (aux, 0.0)
        return cls(children[0], children[1], children[2], children[3],
                   reso, vis_rows=children[4], vis_pad=vis_pad)

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
    # pin the blocks atlas to the row-major layout its gathers want: the
    # transpose+reshape build leaves it {0,1} on device and the step
    # relayouts all 81MB every call (348 chunked copies, 4.9ms/step in
    # the round-5 512^3-bake trace).  Best-effort: a warm compile cache
    # can still carry the old {0,1} entry layout (measured neutral
    # there); cold compiles pick the pinned layout up.
    if jax.default_backend() == 'tpu':
        try:
            from jax.experimental.layout import Format, Layout
            blocks = jax.device_put(
                blocks, Format(Layout(major_to_minor=(1, 0))))
        except Exception:
            pass
    vc = v[::coarse_factor, ::coarse_factor, ::coarse_factor]
    coarse_rows = _pack_cells(vc, dtype)
    return PackedSDFGrid(mid_rows=mid_rows, blocks=blocks,
                         coarse_rows=coarse_rows,
                         aabb=jnp.asarray(grid.aabb, jnp.float32), reso=r)


def _trace_scales(pg: "PackedSDFGrid"):
    """Static (python-float) trace geometry scales shared by
    sphere_trace_budget and bake_vis_cache — the bake's certified
    interval [T0, exit] must match the trace's corridor split exactly."""
    aabb = np.asarray(jax.device_get(pg.aabb), np.float64) \
        if not isinstance(pg.aabb, np.ndarray) else pg.aabb
    ext_mean = float(np.mean(aabb[1] - aabb[0]))
    rm = pg.mid_rows.shape[0]
    rc = pg.coarse_rows.shape[0]
    m_cell = ext_mean / (rm - 1)
    c_cell = ext_mean / (rc - 1)
    c_diag = float(np.sqrt(3.0)) * c_cell
    switch = c_diag + 2.0 * m_cell
    arm = 1.25 * switch
    delta = 1.5 * m_cell
    t0_max = 2.0 * (arm - delta)      # T0: max launch-corridor length
    return dict(ext_mean=ext_mean, m_cell=m_cell, c_cell=c_cell,
                c_diag=c_diag, switch=switch, arm=arm, delta=delta,
                t0_max=t0_max)


# ---------------------------------------------------------------------------
# direction-binned visibility cache (bake once at stage-2 init)
# ---------------------------------------------------------------------------

VIS_NB = 16                     # octahedral bins per axis (16x16 = 256)


def octa_bin(d, nb: int = VIS_NB):
    """[...,3] directions -> octahedral bin id in [0, nb*nb)."""
    s = jnp.sum(jnp.abs(d), -1, keepdims=True)
    p = d / jnp.maximum(s, 1e-12)
    px, py, pz = p[..., 0], p[..., 1], p[..., 2]
    fx = (1.0 - jnp.abs(py)) * jnp.sign(px)
    fy = (1.0 - jnp.abs(px)) * jnp.sign(py)
    u = jnp.where(pz < 0, fx, px)
    v = jnp.where(pz < 0, fy, py)
    iu = jnp.clip(((u * 0.5 + 0.5) * nb).astype(jnp.int32), 0, nb - 1)
    iv = jnp.clip(((v * 0.5 + 0.5) * nb).astype(jnp.int32), 0, nb - 1)
    return iv * nb + iu


def _octa_decode_np(u, v):
    """Octahedral uv in [-1,1]^2 -> unit directions (numpy)."""
    z = 1.0 - np.abs(u) - np.abs(v)
    x = np.where(z < 0, (1.0 - np.abs(v)) * np.sign(u), u)
    y = np.where(z < 0, (1.0 - np.abs(u)) * np.sign(v), v)
    d = np.stack([x, y, z], -1)
    return d / np.maximum(np.linalg.norm(d, axis=-1, keepdims=True), 1e-12)


def _octa_bin_table(nb: int = VIS_NB):
    """Per-bin (center direction [nb*nb,3], conservative chord [nb*nb])
    where chord >= |d - center| for every unit d binned into the bin.
    Estimated from a dense 16x-oversampled direction grid."""
    cu = (np.arange(nb) + 0.5) / nb * 2.0 - 1.0
    uu, vv = np.meshgrid(cu, cu, indexing='xy')
    centers = _octa_decode_np(uu.reshape(-1), vv.reshape(-1))  # iv*nb+iu

    f = 16 * nb
    su = (np.arange(f) + 0.5) / f * 2.0 - 1.0
    gu, gv = np.meshgrid(su, su, indexing='xy')
    dirs = _octa_decode_np(gu.reshape(-1), gv.reshape(-1))
    iu = np.clip(((gu.reshape(-1) * 0.5 + 0.5) * nb).astype(np.int32),
                 0, nb - 1)
    iv = np.clip(((gv.reshape(-1) * 0.5 + 0.5) * nb).astype(np.int32),
                 0, nb - 1)
    bins = iv * nb + iu
    chord = np.linalg.norm(dirs - centers[bins], axis=-1)
    cmax = np.zeros(nb * nb, np.float64)
    np.maximum.at(cmax, bins, chord)
    return centers.astype(np.float32), (cmax * 1.05 + 1e-3).astype(
        np.float32)


def bake_vis_cache(pg: "PackedSDFGrid", nb: int = VIS_NB,
                   n_steps: int = 16,
                   apex_pad: float = 0.0) -> "PackedSDFGrid":
    """Bake the per-cell direction-binned visibility cache.

    For every coarse NODE c and octa bin b, cone-march the coarse grid
    from t = T0 to past the aabb exit along the bin's center direction
    with margin(t) = 0.5*c_diag (apex offset: any launch origin binned to
    the node is within half a coarse cell) + t*chord_b (bin angular
    width) + 0.25*c_diag (interpolant error, same convention as the A0
    probe).  Bit == 1 certifies every ray in the (node, bin) cone misses
    the surface over [T0, its aabb exit]; 0 means uncertain (the trace
    falls back to the coarse march).  Runs once at stage-2 init (~2s at
    64^3 x 256 bins on one TPU chip); geometry is frozen in stage 2.
    """
    sc = _trace_scales(pg)
    rc = pg.coarse_rows.shape[0]
    lo = pg.aabb[0]
    hi = pg.aabb[1]
    ax = jnp.linspace(0.0, 1.0, rc, dtype=jnp.float32)
    gx, gy, gz = jnp.meshgrid(ax, ax, ax, indexing='ij')
    nodes01 = jnp.stack([gx, gy, gz], -1).reshape(-1, 3)
    nodes = lo + nodes01 * (hi - lo)                       # [rc^3,3]

    centers, chords = _octa_bin_table(nb)
    # 0.5*c_diag apex offset (origin within half a cell of its node)
    # + apex_pad (callers reserve 2*unit_size so get_lights may key the
    # cache row on the PRE-OFFSET surface point, one row per point)
    # + 0.25*c_diag interpolant error (A0-probe convention)
    base_margin = 0.75 * sc['c_diag'] + apex_pad
    c_cap = 12.0 * sc['c_cell']
    t0 = sc['t0_max']
    # max t any cone ray can stay inside: node ray exit + one coarse diag
    coarse = pg.coarse_rows

    def one_bin(carry, xs):
        del carry
        dvec, chord = xs
        t = jnp.full((nodes.shape[0],), t0, jnp.float32)
        blocked = jnp.zeros((nodes.shape[0],), bool)
        cleared = jnp.zeros((nodes.shape[0],), bool)
        for _ in range(n_steps):
            pos = nodes + dvec * t[:, None]
            pos_c = jnp.clip(pos, lo, hi)
            # clamped tap + `out` in the margin keeps the test sound past
            # the aabb boundary (an un-clamped tap reads 1.0 outside and
            # would falsely certify rays that re-graze interior geometry)
            out = jnp.linalg.norm(pos - pos_c, axis=-1)
            d = packed_trilinear_tap(coarse, pg.aabb, pos_c)
            margin = base_margin + t * chord + out
            eff = d - margin
            # every cone ray is surely outside the aabb: certified exit
            done_clear = out > (base_margin + t * chord)
            cleared = cleared | (~blocked & done_clear)
            blocked = blocked | (~cleared & (eff <= 0.0))
            step = jnp.clip(eff * 0.9, 0.1 * sc['c_cell'], c_cap)
            t = jnp.where(blocked | cleared, t, t + step)
        clear = cleared & ~blocked
        return 0, clear

    _, bits = jax.lax.scan(one_bin, 0,
                           (jnp.asarray(centers), jnp.asarray(chords)))
    # bits [nb*nb, rc^3] -> u32 words [rc^3, 8] (bin = word*32 + bitpos)
    bits = bits.astype(jnp.uint32).reshape(nb * nb // 32, 32, -1)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))
    words = jnp.sum(bits * weights[None, :, None], 1,
                    dtype=jnp.uint32)                       # [8, rc^3]
    vis_rows = words.T.reshape(rc, rc, rc, 8)
    return PackedSDFGrid(mid_rows=pg.mid_rows, blocks=pg.blocks,
                         coarse_rows=pg.coarse_rows, aabb=pg.aabb,
                         reso=pg.reso, vis_rows=vis_rows,
                         vis_pad=apex_pad)


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
    # factored per-axis contraction [N,64]->[N,16]->[N,4]->[N] instead of
    # materializing four [N,64] weight outer products: cuts the dominant
    # 64-wide vector-op count ~3x (the two block-tap fusions were 12.8
    # ns/row vs the 1.86 ns/row gather floor in the round-4 trace) and
    # drops the standalone f32[N,64] reshapes that escaped the fusion
    rwb = rw.reshape(-1, 4, 16)
    a = jnp.sum(rwb * wx[:, :, None], 1)                     # [N,16] (y,z)
    ab = a.reshape(-1, 4, 4)
    bv = jnp.sum(ab * wy[:, :, None], 1)                     # [N,4]  (z)
    val = jnp.where(inside, jnp.sum(bv * wz, -1), 1.0)
    if not want_grad:
        return val, None
    scale = (r - 1.0) / (hi - lo)                            # [3]
    ax = jnp.sum(rwb * gx[:, :, None], 1).reshape(-1, 4, 4)  # d/dx chain
    gxv = jnp.sum(jnp.sum(ax * wy[:, :, None], 1) * wz, -1)
    gyv = jnp.sum(jnp.sum(ab * gy[:, :, None], 1) * wz, -1)
    gzv = jnp.sum(bv * gz, -1)
    grad = jnp.stack([gxv, gyv, gzv], -1) * scale
    return val, grad


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

    # ray/aabb entry AND exit (slab) — outside the grid the field carries
    # no info, and nothing can be hit past the exit: terminating at t_exit
    # instead of a fixed max_dist saves the ~10 wasted leaps rays used to
    # spend covering [exit, max_dist] through empty space (round-4 trace).
    # All loop carries are FLAT [N]: [N,1] columns pick up a T(1,128)
    # layout inside while bodies (1 useful lane of 128) — round-3 trace.
    vec = jnp.where(rays_d == 0, 1e-6, rays_d)
    ra = (pg.aabb[1] - rays_o) / vec
    rb = (pg.aabb[0] - rays_o) / vec
    t_enter = jnp.maximum(jnp.max(jnp.minimum(ra, rb), -1), 0.0)
    t_exit = jnp.minimum(jnp.min(jnp.maximum(ra, rb), -1), max_dist)

    def coarse_body(_, carry):
        t, done = carry
        d = _packed_tap(pg.coarse_rows, pg.aabb,
                        rays_o + rays_d * t[:, None])
        done_new = done | (d < switch) | (t > t_exit)
        step = jnp.minimum(step_scale * d, c_cap) - c_diag
        t_new = jnp.where(done_new, t, t + jnp.maximum(step, 0.0))
        return t_new, done_new

    t, _ = jax.lax.fori_loop(0, n_coarse, coarse_body,
                             (t_enter, jnp.zeros((n,), bool)))

    def fine_body(_, carry):
        t, done, prev_step = carry
        d = _packed_tap(pg.mid_rows, pg.aabb, rays_o + rays_d * t[:, None])
        hit_now = d < hit_eps_m
        done_new = done | hit_now | (t > t_exit)
        step = jnp.minimum(jnp.maximum(d, hit_eps_m * 0.5) * step_scale,
                           step_cap)
        t_new = jnp.where(done_new, t, t + step)
        prev_new = jnp.where(done_new, prev_step, step)
        return t_new, done_new, prev_new

    prev0 = jnp.full((n,), 2.0 * m_cell, rays_o.dtype)
    t, done, prev_step = jax.lax.fori_loop(
        0, n_fine, fine_body, (t, jnp.zeros((n,), bool), prev0))

    d_end = _packed_tap(pg.mid_rows, pg.aabb, rays_o + rays_d * t[:, None])
    hit = done & (d_end < 2.0 * hit_eps_m) & (t <= t_exit)

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


# ---------------------------------------------------------------------------
# budgeted secondary trace: dense coarse classification + compacted refine
# ---------------------------------------------------------------------------
#
# The stage-2 MC shader fires ~1.8M secondary rays per step, and at that
# scale the full-fidelity march is the step's dominant cost (round-4 trace:
# coarse 55ms + fine 69ms + bisect 54ms + polish 57ms of a 424ms step).
# Most of those rays only need the BINARY answer (miss -> environment
# lookup); hit position/normal matter only for the rays that feed the
# inner-light MLP — which the shader already compacts to a budget.  So:
#
#   phase A (all N rays): coarse sphere-trace leaps, terminated at the
#     ray's aabb EXIT (nothing can be hit outside the baked grid).  Rays
#     that never got near the surface are certified misses — the leap
#     margin (0.9*d - coarse_diag per step) makes the classification
#     conservative under the SDF's Lipschitz bound, i.e. no true hit is
#     classified away; only coarse-cell-thin features can false-positive,
#     and those go to refinement anyway.
#   phase B (compacted M rays = candidates): mid-grid march + Newton on
#     the mid interpolant (replacing 4 bisection taps with ~2 — same
#     bracket, quadratic convergence) + full-res block polish + analytic
#     normal.  Every per-tap gather now costs M/N of the dense version.
#
# Same hit semantics as sphere_trace_packed (ref: materialRenderer.py:
# 223-261); results return compacted, with the (src, dest, slot_mask)
# mapping so the caller can run the inner-light MLP directly on the
# compacted rows (one shared compaction instead of two).


class CompactSecondary(NamedTuple):
    """ALL refined quantities stay compacted ([M] slots): expanding a
    scalar column densely costs a [N]-row 1-element-per-row gather that
    runs ~10x above the multi-channel gather rate (58ms for f32[1.57M]
    from [590k] in the round-4 trace) — callers must ride hit/depth on
    ONE wide scatter_back together with whatever per-slot payload they
    compute (see mc_shading.get_lights)."""
    src: jnp.ndarray        # [M] flat source ray per slot
    slot_mask: jnp.ndarray  # [M] slot holds a real candidate
    dest: jnp.ndarray       # [N] slot per ray (M = dropped/miss)
    inters: jnp.ndarray     # [M,3] refined hit points
    normals: jnp.ndarray    # [M,3] refined hit normals (flipped)
    view_out: jnp.ndarray   # [M,3] -d of the compacted rays
    hit_m: jnp.ndarray      # [M] refined hit verdict per slot
    depth_m: jnp.ndarray    # [M] refined depth (miss = MISS_DEPTH)
    cand: jnp.ndarray       # [N] refinement-candidate mask (diagnostics /
    #                         adaptive budget sizing)
    a1_need: jnp.ndarray    # [N] rays that needed the coarse march (all
    #                         `clear` rays without a cache; cache-
    #                         uncertain rays with one) — drives the
    #                         adaptive a1_budget


def sphere_trace_budget(pg: PackedSDFGrid, rays_o, rays_d, m: int,
                        h0=None,
                        n_coarse: int = 8, n_fine: int = 7,
                        n_newton: int = 2, n_polish: int = 2,
                        hit_eps: float = None, step_scale: float = 0.9,
                        max_dist: float = 4.0,
                        c_cap_cells: float = 12.0,
                        cert_factor: float = 0.6,
                        h_min: float = 0.12,
                        a1_budget: float = 0.0,
                        vis_rows_flat=None) -> CompactSecondary:
    """Budgeted two-phase secondary trace (see module comment above).

    m: static refinement budget (slots).  (n_polish=1 was measured and
    rejected: hit verdicts stay identical and d97 is still 20x under the
    mid cell, but ~8%% of hit normals drift past 8 degrees vs the dense
    trace, with occasional sign flips near tangency.)  h0: optional [N] cosine between
    the ray and the launch-surface normal (rays originate ON the traced
    surface).  With h0 the launch shell is crossed ANALYTICALLY — the
    surface is locally its tangent plane, so the ray clears the
    coarse-march resolvability band (``switch``) at
    t0 = (arm - height(0)) / h0 — and ONE mid-grid probe at t0 validates
    the plane assumption: if other geometry intruded into the corridor
    (probe ≪ predicted height) the ray is a refinement candidate from
    t=0.  Tangent rays (h0 < h_min) can't be certified and go straight
    to refinement; h0 <= 0 rays (into the surface — the reference never
    traces these, it compacts NoL>0 first, fields.py:1209) are misses.
    Callers should offset rays_o by ~1.5 mid-cells along the surface
    normal so tangent rays don't immediately re-hit their own launch
    surface (the BVH-vs-SDF-grid robustness gap; see get_lights).
    """
    n = rays_o.shape[0]
    r = pg.reso
    rm = pg.mid_rows.shape[0]
    rc = pg.coarse_rows.shape[0]
    coarse_rows = pg.coarse_rows
    if jax.default_backend() == 'tpu':
        # pin the coarse table to the mid table's column-major layout:
        # XLA assigns {1,0} to coarse_rows, and every coarse-march tap's
        # gather output then pays a [N,8] {1,0}->{0,1} relayout copy
        # (8 x ~0.55ms/step at bench scale, round-4 trace)
        try:
            from jax.experimental.layout import (Format, Layout,
                                                 with_layout_constraint)
            coarse_rows = with_layout_constraint(
                coarse_rows, Format(Layout(major_to_minor=(1, 0))))
        except Exception:
            pass
    ext_mean = jnp.mean(pg.aabb[1] - pg.aabb[0])
    cell = ext_mean / (r - 1)
    m_cell = ext_mean / (rm - 1)
    c_cell = ext_mean / (rc - 1)
    c_diag = float(np.sqrt(3.0)) * c_cell
    if hit_eps is None:
        hit_eps = 0.75 * cell
    hit_eps_m = 0.75 * m_cell
    step_cap = 4.0 * m_cell
    c_cap = c_cap_cells * c_cell
    switch = c_diag + 2.0 * m_cell

    vec = jnp.where(rays_d == 0, 1e-6, rays_d)
    ra = (pg.aabb[1] - rays_o) / vec
    rb = (pg.aabb[0] - rays_o) / vec
    t_enter = jnp.maximum(jnp.max(jnp.minimum(ra, rb), -1), 0.0)
    t_exit = jnp.minimum(jnp.min(jnp.maximum(ra, rb), -1), max_dist)

    # ---- phase A0: analytic launch-shell crossing + one-probe check ----
    arm = 1.25 * switch
    delta = 1.5 * m_cell          # callers' normal-offset height
    if h0 is not None:
        into = h0 <= 0.0
        hs = jnp.maximum(h0, h_min)
        t0 = jnp.minimum((arm - delta) / hs, t_exit)
        # probe the COARSE grid (1.86 vs 4 ns/row for the mid table,
        # -3.4ms/step at bench scale) with a 0.25*c_diag conservative
        # margin: the margined coarse test never certifies a ray the mid
        # probe wouldn't (measured 0 unsafe clears, ~1% extra candidates
        # on the two-lobe stand-in)
        d_probe = _packed_tap(coarse_rows, pg.aabb,
                              rays_o + rays_d * t0[:, None]) \
            - 0.25 * c_diag
        pred = delta + t0 * jnp.maximum(h0, 0.0)
        clear = (h0 >= h_min) & (d_probe > cert_factor * jnp.minimum(pred, arm))
        cand0 = ~clear & ~into
    else:
        into = jnp.zeros((n,), bool)
        t0 = t_enter
        clear = jnp.ones((n,), bool)
        cand0 = jnp.zeros((n,), bool)

    # ---- phase A-cache: direction-binned visibility certification ----
    # a baked (cell, octa-bin) bit certifies the cone over [T0, exit];
    # the A0 probe covers [0, t0] analytically and, when t0 < T0, one
    # extra margined probe at T0 ball-covers the [t0, T0] gap.  Certified
    # rays are misses without marching; the rest (cache-uncertain or
    # tangent) coarse-march COMPACTED into the a1_budget.
    use_cache = ((pg.vis_rows is not None or vis_rows_flat is not None)
                 and h0 is not None and 0.0 < a1_budget < 1.0)
    if use_cache:
        rc_t0max = 2.0 * (arm - delta)
        if vis_rows_flat is not None:
            # caller-supplied rows (get_lights gathers ONE row per
            # surface point and broadcasts: a per-ray u32 gather from
            # HBM measured 16.6ms/step vs ~2ms for this select fusion)
            vrow = vis_rows_flat
        else:
            rv = pg.vis_rows.shape[0]
            lo_, hi_ = pg.aabb[0], pg.aabb[1]
            u01 = jnp.clip((rays_o - lo_) / (hi_ - lo_), 0.0, 1.0)
            ci = jnp.clip(jnp.round(u01 * (rv - 1)).astype(jnp.int32),
                          0, rv - 1)
            flat = (ci[:, 0] * rv + ci[:, 1]) * rv + ci[:, 2]
            vrow = jnp.take(pg.vis_rows.reshape(-1, 8), flat, axis=0,
                            mode='clip')                      # [N,8] u32
        bins = octa_bin(rays_d)
        wsel = (bins >> 5).astype(jnp.int32)
        lane8 = jnp.arange(8, dtype=jnp.int32)
        word = jnp.sum(jnp.where(lane8[None, :] == wsel[:, None], vrow,
                                 jnp.uint32(0)), -1, dtype=jnp.uint32)
        cache_clear = ((word >> (bins & 31).astype(jnp.uint32))
                       & jnp.uint32(1)) > 0
        gap = jnp.maximum(rc_t0max - t0, 0.0)
        d2 = _packed_tap(coarse_rows, pg.aabb,
                         rays_o + rays_d * rc_t0max) - 0.25 * c_diag
        corridor = (gap <= 0.0) | (d_probe + jnp.maximum(d2, 0.0) > gap)
        certified = clear & cache_clear & corridor
    else:
        certified = jnp.zeros((n,), bool)
    need = clear & ~certified

    from .grid import compact_indices, scatter_back as _scatter_back

    # ---- phase A1: coarse classification of the un-certified rays ----
    if use_cache:
        ma = max((int(n * a1_budget) // 128) * 128, 128)
        srcA, maskA, destA = compact_indices(need, ma)
        tc0 = jnp.maximum(t0, t_enter)
        payA = jnp.concatenate([rays_o, rays_d, tc0[:, None],
                                t_exit[:, None]], -1)         # [N,8]
        pA = jnp.take(payA, srcA, axis=0, mode='clip')        # [MA,8]
        oA, dA = pA[:, 0:3], pA[:, 3:6]
        tA, txA = pA[:, 6], pA[:, 7]
        nearA = jnp.zeros((ma,), bool)
        for _ in range(n_coarse):        # static count: unroll (see below)
            dd = _packed_tap(coarse_rows, pg.aabb,
                             oA + dA * tA[:, None])
            nearA = nearA | (dd < switch)
            doneA = nearA | (tA > txA)
            step = jnp.maximum(jnp.minimum(step_scale * dd, c_cap)
                               - c_diag, 0.0)
            tA = jnp.where(doneA, tA, tA + step)
        candA = nearA | (tA <= txA)
        back = _scatter_back(
            jnp.stack([tA, candA.astype(tA.dtype)], -1), destA,
            src=srcA, slot_mask=maskA)                        # [N,2]
        # budget overflow: un-marched rays become candidates from tc0
        # (the fine march takes over from the launch corridor —
        # conservative; rare when the adaptive bucket has margin)
        overflow = need & (destA >= ma)
        cand = cand0 | (need & ((back[:, 1] > 0.5) | overflow))
        t = jnp.where(cand0, 0.0,
                      jnp.where(overflow, tc0, back[:, 0]))
    else:
        def coarse_body(_, carry):
            t, near = carry
            d = _packed_tap(coarse_rows, pg.aabb,
                            rays_o + rays_d * t[:, None])
            near_new = near | (d < switch)
            done = near_new | (t > t_exit)
            step = jnp.maximum(jnp.minimum(step_scale * d, c_cap)
                               - c_diag, 0.0)
            t_new = jnp.where(done, t, t + step)
            return t_new, near_new

        tc0 = jnp.where(need, jnp.maximum(t0, t_enter), t_exit + 1.0)
        carry_c = (tc0, jnp.zeros((n,), bool))
        for _ in range(n_coarse):        # static count: unroll (see below)
            carry_c = coarse_body(0, carry_c)
        t, near = carry_c
        # candidates: launch-uncertified rays (refine from t=0), plus
        # clear rays whose coarse march got near the surface or ran out
        # of budget while still inside the grid (conservative)
        cand = cand0 | (need & (near | (t <= t_exit)))
        t = jnp.where(cand0, 0.0, t)

    # ---- compact candidates into the refinement budget ----
    src, slot_mask, dest = compact_indices(cand, m)
    payload = jnp.concatenate(
        [rays_o, rays_d, t[:, None], t_exit[:, None]], axis=-1)   # [N,8]
    pm = jnp.take(payload, src, axis=0, mode='clip')              # [M,8]
    om, dm = pm[:, 0:3], pm[:, 3:6]
    tm, txm = pm[:, 6], pm[:, 7]

    # ---- phase B: compacted mid march + Newton + full-res polish ----
    def fine_body(_, carry):
        t, done, prev_step = carry
        d = _packed_tap(pg.mid_rows, pg.aabb, om + dm * t[:, None])
        hit_now = d < hit_eps_m
        done_new = done | hit_now | (t > txm)
        step = jnp.minimum(jnp.maximum(d, hit_eps_m * 0.5) * step_scale,
                           step_cap)
        t_new = jnp.where(done_new, t, t + step)
        prev_new = jnp.where(done_new, prev_step, step)
        return t_new, done_new, prev_new

    prev0 = jnp.full((m,), 2.0 * m_cell, rays_o.dtype)
    carry_f = (tm, jnp.zeros((m,), bool), prev0)
    for _ in range(n_fine):              # static count: unroll (see below)
        carry_f = fine_body(0, carry_f)
    tm, done, prev_step = carry_f

    # Newton on the mid interpolant inside the last-step bracket: the
    # crossing sits in [t - prev_step, t]; the interpolant's analytic
    # in-cell gradient makes each tap a full Newton update (the bisection
    # this replaces gained one bit per tap)
    lo = jnp.maximum(tm - jnp.maximum(prev_step, 2.0 * m_cell), 0.0)
    hi = tm + 0.5 * m_cell

    def newton_mid(_, carry):
        t, d_prev = carry
        dv, g = packed_trilinear_tap(pg.mid_rows, pg.aabb,
                                     om + dm * t[:, None], want_grad=True)
        slope = jnp.sum(g * dm, -1)
        slope = jnp.where(jnp.abs(slope) < 0.1,
                          jnp.where(slope < 0, -0.1, 0.1), slope)
        t_new = jnp.clip(t - dv / slope, lo, hi)
        return t_new, dv

    # static trip counts: unroll in python — a lax.fori_loop here lowers
    # to an XLA while whose shell alone cost ~6ms/step at bench scale
    # (round-4 trace, %while.26) and blocks cross-iteration fusion
    carry = (tm, jnp.zeros((m,), rays_o.dtype))
    for _ in range(n_newton):
        carry = newton_mid(0, carry)
    tm, d_end = carry
    hit_m = done & (d_end < 2.0 * hit_eps_m) & (tm <= txm)

    # full-res polish: identical scheme to sphere_trace_packed
    def _newton_full(t, dv, g):
        slope = jnp.sum(g * dm, -1)
        slope = jnp.where(jnp.abs(slope) < 0.1, jnp.sign(slope) * 0.1
                          + jnp.where(slope == 0, 0.1, 0.0), slope)
        return jnp.clip(t - dv / slope, tm - 2.0 * m_cell,
                        tm + 2.0 * m_cell)

    def polish(_, t):
        dv, g = block_tap(pg, om + dm * t[:, None], want_grad=True)
        return _newton_full(t, dv, g)

    t_p = tm
    for _ in range(max(n_polish - 1, 0)):
        t_p = polish(0, t_p)
    dv, g = block_tap(pg, om + dm * t_p[:, None], want_grad=True)
    t_ref = _newton_full(t_p, dv, g)

    inters_m = om + dm * jnp.where(hit_m, t_ref, 0.0)[:, None]
    normals_m = g / jnp.maximum(
        jnp.linalg.norm(g, axis=-1, keepdims=True), 1e-8)
    flip = jnp.sum(normals_m * dm, -1, keepdims=True) >= 0
    normals_m = jnp.where(flip, -normals_m, normals_m)

    depth_m = jnp.where(hit_m, t_ref, MISS_DEPTH)
    return CompactSecondary(src=src, slot_mask=slot_mask, dest=dest,
                            inters=inters_m, normals=normals_m,
                            view_out=-dm, hit_m=hit_m, depth_m=depth_m,
                            cand=cand, a1_need=need)
