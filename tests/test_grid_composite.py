"""Unit tests: compositing, occupancy grid, secondary march, sphere trace."""
import jax
import jax.numpy as jnp
import numpy as np

from tensoflow_tpu.ops import composite, grid as grid_mod, sdf_trace
from tensoflow_tpu.models import secondary


def test_weights_from_alpha_matches_cumprod_oracle():
    rng = np.random.RandomState(0)
    alpha = rng.rand(4, 16).astype(np.float32)
    w, trans = composite.weights_from_alpha(jnp.asarray(alpha))
    w = np.asarray(w)
    # oracle
    om = np.concatenate([np.ones((4, 1)), 1 - alpha[:, :-1] + 1e-7], 1)
    t = np.cumprod(om, 1)
    np.testing.assert_allclose(w, alpha * t, rtol=1e-5)
    # weights sum <= 1
    assert (w.sum(1) <= 1.0 + 1e-4).all()


def test_weights_mask_zeroes_invalid():
    alpha = jnp.ones((2, 4)) * 0.5
    mask = jnp.asarray([[True, False, True, True], [False] * 4])
    w, _ = composite.weights_from_alpha(alpha, mask)
    w = np.asarray(w)
    assert w[0, 1] == 0
    assert (w[1] == 0).all()


def test_compact_weights_matches_dense():
    """Segmented compact-space weights == scatter_back + dense cumprod."""
    rng = np.random.RandomState(1)
    rn, sn, m = 6, 12, 40
    alpha = rng.rand(rn, sn).astype(np.float32)
    inner = rng.rand(rn, sn) < 0.6
    inner[3] = False  # one fully-empty ray
    src, slot_mask, dest = grid_mod.compact_indices(
        jnp.asarray(inner.reshape(-1)), m)
    alpha_c = jnp.take(jnp.asarray(alpha.reshape(-1)), src, mode='clip')
    ray_id = src // sn
    w_c = np.asarray(composite.compact_weights(alpha_c, slot_mask,
                                               ray_id, rn))
    # dense oracle
    w_dense, _ = composite.weights_from_alpha(jnp.asarray(alpha),
                                              jnp.asarray(inner))
    w_dense = np.asarray(w_dense).reshape(-1)
    src_np, mask_np = np.asarray(src), np.asarray(slot_mask)
    np.testing.assert_allclose(w_c[mask_np], w_dense[src_np[mask_np]],
                               rtol=1e-4, atol=1e-6)
    assert (w_c[~mask_np] == 0).all()
    # per-ray accumulation matches too
    import jax
    acc_c = np.asarray(jax.ops.segment_sum(jnp.asarray(w_c), ray_id,
                                           num_segments=rn))
    np.testing.assert_allclose(acc_c, w_dense.reshape(rn, sn).sum(1),
                               rtol=1e-4, atol=1e-6)


def test_neus_alpha_opaque_surface():
    """A sharp SDF crossing should give alpha ~1 at the crossing."""
    sdf = jnp.asarray([0.5, 0.1, -0.1, -0.5])
    alpha = composite.neus_alpha(sdf, 500.0, jnp.full((4,), -1.0),
                                 jnp.full((4,), 0.2))
    a = np.asarray(alpha)
    # total accumulated opacity across the crossing ~ 1 (opaque surface)
    w, _ = composite.weights_from_alpha(alpha[None])
    assert float(np.asarray(w).sum()) > 0.95
    assert a[0] < 0.01          # well outside: transparent


def test_occ_grid_sampling_skips_empty_space():
    cfg = grid_mod.OccGridConfig(resolution=32)
    state = grid_mod.init_occ_grid(cfg)
    # occupy only a central ball of radius 0.3
    centers = grid_mod.occ_grid_cell_centers(cfg)
    occ = (jnp.linalg.norm(centers, axis=-1) < 0.3).astype(jnp.float32)
    state = grid_mod.update_occ_grid(state, cfg, occ, 0)

    o = jnp.asarray([[0.0, 0.0, -2.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    near = jnp.asarray([[0.5]])
    far = jnp.asarray([[3.5]])
    ts, te, mask = grid_mod.occ_grid_sampling(
        state, cfg, o, d, near, far, 0.05, 64, 32)
    mids = np.asarray(0.5 * (ts + te))[0]
    m = np.asarray(mask)[0]
    assert m.sum() > 3
    # all valid samples inside the ball along z
    z = -2.0 + mids[m]
    assert (np.abs(z) < 0.4).all()


def test_secondary_march_occlusion_probability():
    """March from inside toward a wall: occ ~1; away from geometry: ~0."""
    def sdf_fun(x):
        # a sphere of radius 0.5
        return (jnp.linalg.norm(x, axis=-1, keepdims=True) - 0.5)

    # start outside the sphere surface, looking at it vs away from it
    pts = jnp.asarray([[0.0, 0.0, 0.7], [0.0, 0.0, 0.7]])
    dirs = jnp.asarray([[0.0, 0.0, -1.0], [0.0, 0.0, 1.0]])
    _, w, _ = secondary.secondary_intersection(sdf_fun, 200.0, pts, dirs,
                                               64, 16)
    occ = np.asarray(jnp.sum(w, -1))
    assert occ[0] > 0.9, occ
    assert occ[1] < 0.1, occ


def test_sphere_trace_hits_analytic_sphere():
    xs = np.linspace(-1, 1, 128, dtype=np.float32)
    xx, yy, zz = np.meshgrid(xs, xs, xs, indexing='ij')
    vals = np.sqrt(xx ** 2 + yy ** 2 + zz ** 2) - 0.5
    grid = sdf_trace.SDFGrid(values=jnp.asarray(vals),
                             aabb=jnp.asarray([[-1.0] * 3, [1.0] * 3]))
    rng = np.random.RandomState(0)
    d = rng.randn(64, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = -d * 2.0  # rays through the origin -> all hit at depth 1.5
    inters, normals, depth, hit = sdf_trace.sphere_trace(
        grid, jnp.asarray(o), jnp.asarray(d))
    assert np.asarray(hit).all()
    np.testing.assert_allclose(np.asarray(depth)[:, 0], 1.5, atol=0.02)
    r = np.linalg.norm(np.asarray(inters), axis=-1)
    np.testing.assert_allclose(r, 0.5, atol=0.02)
    # normals point outward (flipped against incoming dir)
    cos = np.sum(np.asarray(normals) * np.asarray(inters), -1) / r
    assert (cos > 0.95).all()


def test_sphere_trace_misses():
    xs = np.linspace(-1, 1, 64, dtype=np.float32)
    xx, yy, zz = np.meshgrid(xs, xs, xs, indexing='ij')
    vals = np.sqrt(xx ** 2 + yy ** 2 + zz ** 2) - 0.3
    grid = sdf_trace.SDFGrid(values=jnp.asarray(vals),
                             aabb=jnp.asarray([[-1.0] * 3, [1.0] * 3]))
    o = jnp.asarray([[0.0, 0.9, -2.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])  # passes 0.9 above center: miss
    _, _, depth, hit = sdf_trace.sphere_trace(grid, o, d)
    assert not np.asarray(hit)[0]
    assert np.asarray(depth)[0, 0] == sdf_trace.MISS_DEPTH


def test_trilinear_sample_matches_corners():
    vol = jnp.asarray(np.arange(8, dtype=np.float32).reshape(2, 2, 2))
    pts = jnp.asarray([[0.0, 0.0, 0.0], [1.0, 1.0, 1.0],
                       [0.5, 0.5, 0.5]])
    vals = np.asarray(grid_mod.trilinear_sample_3d(vol, pts))
    assert vals[0] == 0.0 and vals[1] == 7.0
    np.testing.assert_allclose(vals[2], 3.5, atol=1e-6)


def _sphere_grid(res=128, radius=0.5):
    xs = np.linspace(-1, 1, res, dtype=np.float32)
    xx, yy, zz = np.meshgrid(xs, xs, xs, indexing='ij')
    vals = np.sqrt(xx ** 2 + yy ** 2 + zz ** 2) - radius
    return sdf_trace.SDFGrid(values=jnp.asarray(vals),
                             aabb=jnp.asarray([[-1.0] * 3, [1.0] * 3]))


def test_packed_tap_matches_dense_sample():
    grid = _sphere_grid(64)
    pg = sdf_trace.pack_sdf_grid(grid, dtype=jnp.float32)
    rng = np.random.RandomState(1)
    pts = jnp.asarray(rng.uniform(-1.1, 1.1, (500, 3)).astype(np.float32))
    dense = np.asarray(sdf_trace.sample_sdf_grid(grid, pts))
    # block_tap is the full-resolution eval path of the v2 packed grid
    packed, g = sdf_trace.block_tap(pg, pts, want_grad=True)
    np.testing.assert_allclose(np.asarray(packed), dense, atol=1e-5)
    # analytic gradient ~ radial direction inside the aabb, away from
    # cell-boundary kinks
    inside = np.all(np.abs(np.asarray(pts)) < 0.9, -1)
    r = np.linalg.norm(np.asarray(pts), axis=-1)
    ok = inside & (r > 0.2)
    gn = np.asarray(g)[ok]
    gn /= np.linalg.norm(gn, axis=-1, keepdims=True)
    radial = np.asarray(pts)[ok] / r[ok][:, None]
    assert (np.sum(gn * radial, -1) > 0.98).all()


def test_packed_trace_matches_dense():
    grid = _sphere_grid(128)
    pg = sdf_trace.pack_sdf_grid(grid)
    rng = np.random.RandomState(2)
    # mix of hitting rays (through origin), grazing, and missing
    d = rng.randn(256, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = -d * 2.0
    o[64:128] += 0.45 * rng.randn(64, 3).astype(np.float32)  # grazing-ish
    o[128:192] += 2.0 * rng.randn(64, 3).astype(np.float32)  # mostly miss
    i_d, n_d, t_d, h_d = sdf_trace.sphere_trace(grid, jnp.asarray(o),
                                                jnp.asarray(d))
    i_p, n_p, t_p, h_p = sdf_trace.sphere_trace(pg, jnp.asarray(o),
                                                jnp.asarray(d))
    h_d, h_p = np.asarray(h_d), np.asarray(h_p)
    # hit decisions agree except possibly at tangency (allow 3%)
    assert (h_d != h_p).mean() < 0.03, (h_d != h_p).mean()
    both = h_d & h_p
    assert both.sum() > 50
    # v2 packed trace marches at R/2 (PackedSDFGrid docstring): grazing
    # rays may land a mid-cell off, so like the hit-decision line above
    # we bound the TAIL (97%) instead of the max, plus a tight median
    dt = np.abs(np.asarray(t_p)[both, 0] - np.asarray(t_d)[both, 0])
    assert np.quantile(dt, 0.97) < 0.02, np.quantile(dt, 0.97)
    # truth-anchored accuracy: the full-res Newton polish lands ON the
    # zero crossing (the dense path, like the reference tracer, stops
    # hit_eps short), so check the hit radius against the true sphere
    rad = np.linalg.norm(np.asarray(i_p)[both], axis=-1)
    assert abs(np.median(rad) - 0.5) < 0.002, np.median(rad)
    cos = np.sum(np.asarray(n_p)[both] * np.asarray(n_d)[both], -1)
    assert (cos > 0.99).mean() > 0.97, cos.min()


def test_packed_trace_hits_offset_sphere():
    # off-center small sphere: exercises coarse-phase stop + fine handoff
    xs = np.linspace(-1, 1, 128, dtype=np.float32)
    xx, yy, zz = np.meshgrid(xs, xs, xs, indexing='ij')
    vals = (np.sqrt((xx - 0.3) ** 2 + (yy + 0.2) ** 2 + zz ** 2)
            - 0.15).astype(np.float32)
    grid = sdf_trace.SDFGrid(values=jnp.asarray(vals),
                             aabb=jnp.asarray([[-1.0] * 3, [1.0] * 3]))
    pg = sdf_trace.pack_sdf_grid(grid)
    center = np.array([0.3, -0.2, 0.0], np.float32)
    rng = np.random.RandomState(3)
    d = rng.randn(64, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = center - d * 1.2
    inters, normals, depth, hit = sdf_trace.sphere_trace(
        pg, jnp.asarray(o), jnp.asarray(d))
    assert np.asarray(hit).all()
    np.testing.assert_allclose(np.asarray(depth)[:, 0], 1.05, atol=0.02)
    r = np.linalg.norm(np.asarray(inters) - center, axis=-1)
    np.testing.assert_allclose(r, 0.15, atol=0.012)  # ~hit_eps at 128^3


def test_budgeted_trace_matches_packed_on_concave_scene():
    """sphere_trace_budget (dense coarse certification + compacted
    refine) == sphere_trace_packed on a self-occluding two-sphere scene,
    queried exactly like stage-2 secondary rays: origins on one surface,
    outward-hemisphere directions, some re-hitting the other lobe."""
    xs = np.linspace(-1, 1, 128, dtype=np.float32)
    xx, yy, zz = np.meshgrid(xs, xs, xs, indexing='ij')
    d1 = np.sqrt((xx + 0.35) ** 2 + yy ** 2 + zz ** 2) - 0.3
    d2 = np.sqrt((xx - 0.35) ** 2 + yy ** 2 + zz ** 2) - 0.3
    grid = sdf_trace.SDFGrid(values=jnp.asarray(np.minimum(d1, d2)),
                             aabb=jnp.asarray([[-1.0] * 3, [1.0] * 3]))
    pg = sdf_trace.pack_sdf_grid(grid)

    rng = np.random.RandomState(11)
    c1 = np.array([-0.35, 0.0, 0.0], np.float32)
    n = rng.randn(4096, 3).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)       # surface normals
    o = c1 + 0.3 * n                                     # on sphere 1
    d = rng.randn(4096, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    out = np.sum(d * n, -1) < 0
    d[out] -= 2 * np.sum(d[out] * n[out], -1, keepdims=True) * n[out]
    # launch offsets as get_lights applies them: along the ray (reference
    # semantics) + 1.5 mid-cells along the normal (SDF-grid robustness)
    m_cell = 2.0 / (64 - 1)
    o = (o + d * 2.0 * (2.0 / 127.0) + 1.5 * m_cell * n).astype(np.float32)
    h0 = np.sum(d * n, -1).astype(np.float32)

    i_p, n_p, t_p, h_p = sdf_trace.sphere_trace(pg, jnp.asarray(o),
                                                jnp.asarray(d))
    res = sdf_trace.sphere_trace_budget(pg, jnp.asarray(o),
                                        jnp.asarray(d), m=2048,
                                        h0=jnp.asarray(h0))
    h_p = np.asarray(h_p)
    # densify the compacted verdicts (production rides them on the wide
    # scatter_back in get_lights; CompactSecondary stays compacted)
    dall = np.asarray(res.dest)
    mapped = dall < 2048
    h_b = mapped & np.asarray(res.hit_m)[np.minimum(dall, 2047)]
    depth_b = np.where(
        h_b, np.asarray(res.depth_m)[np.minimum(dall, 2047)], 10.0)
    assert 0.02 < h_p.mean() < 0.5, h_p.mean()  # scene self-occludes
    # budget not overflowed and hit decisions agree except at tangency
    assert np.asarray(res.slot_mask).sum() < 2048
    assert (h_b != h_p).mean() < 0.02, (h_b != h_p).mean()
    both = h_b & h_p
    assert both.sum() > 100
    # depths agree; compacted hit geometry matches the dense-path hits
    dt = np.abs(depth_b[both] - np.asarray(t_p)[both, 0])
    assert np.quantile(dt, 0.97) < 0.02, np.quantile(dt, 0.97)
    dest = dall[both]
    ib = np.asarray(res.inters)[dest]
    nb = np.asarray(res.normals)[dest]
    err = np.linalg.norm(ib - np.asarray(i_p)[both], axis=-1)
    assert np.quantile(err, 0.97) < 0.02, np.quantile(err, 0.97)
    cos = np.sum(nb * np.asarray(n_p)[both], -1)
    assert (cos > 0.99).mean() > 0.97, cos.min()
    # certified misses really are misses: rays the packed trace hits but
    # the coarse phase classified away stay rare.  The bound is 0.8% of
    # rays (not 0): at h_min=0.12 the launch certification clears more
    # tangent rays, and the round-4 analytic-oracle sweep shows the rays
    # it loses vs THIS dense trace are largely the dense path's own
    # false hits (two-lobe oracle: agree 0.9878 at both h_min=0.15 and
    # 0.12, false-hit rate drops 0.146 -> 0.141) while the candidate
    # rate falls 0.218 -> 0.191 (one full budget bucket).
    assert (h_p & ~np.asarray(res.dest < 2048)).mean() < 0.008


def test_budgeted_trace_get_lights_consistency():
    """get_lights on the budgeted path == the dense full-fidelity path
    (same params): lights agree on agreeing-visibility rays."""
    import jax
    from tensoflow_tpu.fields import mc_shading

    xs = np.linspace(-1, 1, 96, dtype=np.float32)
    xx, yy, zz = np.meshgrid(xs, xs, xs, indexing='ij')
    d1 = np.sqrt((xx + 0.35) ** 2 + yy ** 2 + zz ** 2) - 0.3
    d2 = np.sqrt((xx - 0.35) ** 2 + yy ** 2 + zz ** 2) - 0.3
    grid = sdf_trace.SDFGrid(values=jnp.asarray(np.minimum(d1, d2)),
                             aabb=jnp.asarray([[-1.0] * 3, [1.0] * 3]))
    pg = sdf_trace.pack_sdf_grid(grid)

    cfg_b = mc_shading.MCShadingConfig(
        light_reso=16, grid_size=(16, 16, 16), secondary_budget=0.5)
    cfg_d = cfg_b._replace(secondary_budget=0.0, inner_light_budget=0.0)
    params = mc_shading.init_mc_shading(jax.random.PRNGKey(0), cfg_b)

    rng = np.random.RandomState(5)
    c1 = np.array([-0.35, 0.0, 0.0], np.float32)
    nrm = rng.randn(64, 3).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    pts0 = c1 + 0.3 * nrm                                # [64,3] on S1
    pts = jnp.asarray(np.broadcast_to(pts0[:, None, :], (64, 16, 3)))
    dirs = rng.randn(64, 16, 3).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    outward = np.sum(dirs * nrm[:, None, :], -1, keepdims=True)
    dirs = np.where(outward < 0, dirs - 2 * outward * nrm[:, None, :],
                    dirs)
    dirs = jnp.asarray(dirs)
    nrm = jnp.asarray(nrm)

    unit = 2.0 / 95.0
    lb, hb = mc_shading.get_lights(params, cfg_b, pg, unit, pts, dirs,
                                   normals=nrm)
    ld, hd = mc_shading.get_lights(params, cfg_d, pg, unit, pts, dirs,
                                   normals=nrm)
    hb, hd = np.asarray(hb), np.asarray(hd)
    assert (hb != hd).mean() < 0.03
    agree = hb == hd
    # tiny residual: both paths Newton-polish hit positions, landing a
    # sub-cell apart on grazing hits -> slightly different MLP inputs
    np.testing.assert_allclose(np.asarray(lb)[agree], np.asarray(ld)[agree],
                               rtol=5e-2, atol=5e-3)


def test_block_march_matches_plain_query():
    """The 4^3-block bitmask march == per-step query_binary for every
    step-size regime (G=4 / G=2 / G=1 fallback)."""
    rng = np.random.RandomState(7)
    cfg = grid_mod.OccGridConfig(resolution=32)
    state = grid_mod.init_occ_grid(cfg)
    occ = jnp.asarray(rng.rand(32 ** 3) > 0.7, jnp.float32)
    state = grid_mod.update_occ_grid(state, cfg, occ, 0)

    rn = 64
    o = jnp.asarray(rng.randn(rn, 3).astype(np.float32) * 0.2
                    - np.array([0, 0, 2.0], np.float32))
    d = rng.randn(rn, 3).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    near = jnp.full((rn, 1), 0.8, jnp.float32)
    far = jnp.full((rn, 1), 4.0, jnp.float32)
    voxel = 2.0 / 32
    for ss in (0.3 * voxel, 0.6 * voxel, 1.5 * voxel, 3.0 * voxel):
        nc = int(np.ceil(3.5 / ss))
        res_blk = grid_mod.occ_grid_sampling(
            state, cfg, o, d, near, far, float(ss), nc, 48)
        state_noblk = {k: v for k, v in state.items() if k != 'blocks'}
        res_ref = grid_mod.occ_grid_sampling(
            state_noblk, cfg, o, d, near, far, float(ss), nc, 48)
        for a, b in zip(res_blk, res_ref):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_compact_inverse_vjps_match_dense_autodiff():
    """compact_take / scatter_back(src=...) replace the take-VJP
    scatter-adds with the injective inverse gathers (round-3 stage-2
    trace: 41.5ms/step). Gradients must equal the plain autodiff path
    for every mapped source; invalid-slot cotangents are exactly zero
    (the plain path spuriously accumulates them at index 0)."""
    rng = np.random.RandomState(0)
    n, m, c = 64, 24, 3
    valid = rng.rand(n) > 0.6
    values = jnp.asarray(rng.randn(n, c).astype(np.float32))
    vm = jnp.asarray(rng.randn(m, c).astype(np.float32))
    g_out = jnp.asarray(rng.randn(n, c).astype(np.float32))
    g_mid = jnp.asarray(rng.randn(m, c).astype(np.float32))
    src, slot_mask, dest = grid_mod.compact_indices(
        jnp.asarray(valid), m)

    # compact_take vs plain take
    f_new = lambda v: jnp.sum(
        grid_mod.compact_take(v, src, dest, slot_mask) * g_mid)
    f_old = lambda v: jnp.sum(
        jnp.take(v, src, axis=0, mode='clip') * g_mid)
    gn = np.asarray(jax.grad(f_new)(values))
    go = np.asarray(jax.grad(f_old)(values))
    kept = np.asarray(dest) < m
    np.testing.assert_allclose(gn[kept], go[kept], rtol=1e-6)
    assert (gn[~kept] == 0).all()

    # scatter_back inverse VJP vs dense
    s_new = lambda v: jnp.sum(grid_mod.scatter_back(
        v, dest, src=src, slot_mask=slot_mask) * g_out)
    s_old = lambda v: jnp.sum(grid_mod.scatter_back(v, dest) * g_out)
    np.testing.assert_allclose(np.asarray(jax.grad(s_new)(vm)),
                               np.asarray(jax.grad(s_old)(vm)), rtol=1e-6)
    # primals identical
    np.testing.assert_array_equal(
        np.asarray(grid_mod.scatter_back(vm, dest, src=src,
                                         slot_mask=slot_mask)),
        np.asarray(grid_mod.scatter_back(vm, dest)))


def test_vis_cache_conservative_and_equivalent():
    """bake_vis_cache + cache-gated sphere_trace_budget: certification
    must be CONSERVATIVE (a cache-certified ray is never a hit under the
    uncached budgeted trace) and hit/depth verdicts must match the
    uncached path exactly when the a1 budget has headroom."""
    xs = np.linspace(-1, 1, 128, dtype=np.float32)
    xx, yy, zz = np.meshgrid(xs, xs, xs, indexing='ij')
    d1 = np.sqrt((xx + 0.35) ** 2 + yy ** 2 + zz ** 2) - 0.3
    d2 = np.sqrt((xx - 0.35) ** 2 + yy ** 2 + zz ** 2) - 0.3
    grid = sdf_trace.SDFGrid(values=jnp.asarray(np.minimum(d1, d2)),
                             aabb=jnp.asarray([[-1.0] * 3, [1.0] * 3]))
    pg = sdf_trace.pack_sdf_grid(grid)
    pgv = sdf_trace.bake_vis_cache(pg)
    assert pgv.vis_rows.shape == (32, 32, 32, 8)
    assert pgv.vis_rows.dtype == jnp.uint32

    rng = np.random.RandomState(3)
    c1 = np.array([-0.35, 0.0, 0.0], np.float32)
    n = rng.randn(4096, 3).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    o = c1 + 0.3 * n
    d = rng.randn(4096, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    out = np.sum(d * n, -1) < 0
    d[out] -= 2 * np.sum(d[out] * n[out], -1, keepdims=True) * n[out]
    m_cell = 2.0 / (64 - 1)
    o = (o + d * 2.0 * (2.0 / 127.0) + 1.5 * m_cell * n).astype(np.float32)
    h0 = np.sum(d * n, -1).astype(np.float32)

    r0 = sdf_trace.sphere_trace_budget(pg, jnp.asarray(o), jnp.asarray(d),
                                       m=2048, h0=jnp.asarray(h0))
    r1 = sdf_trace.sphere_trace_budget(pgv, jnp.asarray(o),
                                       jnp.asarray(d), m=2048,
                                       h0=jnp.asarray(h0),
                                       a1_budget=0.875)

    def densify(r):
        dall = np.asarray(r.dest)
        mapped = dall < 2048
        hit = mapped & np.asarray(r.hit_m)[np.minimum(dall, 2047)]
        dep = np.where(hit,
                       np.asarray(r.depth_m)[np.minimum(dall, 2047)], 10.0)
        return hit, dep

    h0_, d0_ = densify(r0)
    h1_, d1_ = densify(r1)
    # cache certification must be meaningful on this scene
    need = np.asarray(r1.a1_need)
    clear = np.asarray(r0.a1_need)
    assert need.mean() < clear.mean()
    # identical verdicts (budget sized with headroom, so no overflow)
    np.testing.assert_array_equal(h0_, h1_)
    np.testing.assert_allclose(d0_, d1_, atol=1e-5)


def test_vis_cache_certified_rays_truly_miss():
    """Every cache-certified ray must MISS under the dense full-res
    reference trace (soundness of the cone-march bake, incl. the aabb
    boundary handling)."""
    xs = np.linspace(-1, 1, 96, dtype=np.float32)
    xx, yy, zz = np.meshgrid(xs, xs, xs, indexing='ij')
    # off-center sphere close to the +x aabb face exercises the clamped
    # tap path
    dv = np.sqrt((xx - 0.55) ** 2 + yy ** 2 + zz ** 2) - 0.38
    grid = sdf_trace.SDFGrid(values=jnp.asarray(dv),
                             aabb=jnp.asarray([[-1.0] * 3, [1.0] * 3]))
    pg = sdf_trace.pack_sdf_grid(grid)
    pgv = sdf_trace.bake_vis_cache(pg)

    rng = np.random.RandomState(5)
    c = np.array([0.55, 0.0, 0.0], np.float32)
    n = rng.randn(4096, 3).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    o = c + 0.38 * n
    keep = np.abs(o).max(-1) < 0.999
    o, n = o[keep], n[keep]
    d = rng.randn(o.shape[0], 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    out = np.sum(d * n, -1) < 0
    d[out] -= 2 * np.sum(d[out] * n[out], -1, keepdims=True) * n[out]
    m_cell = 2.0 / (48 - 1)
    o = (o + d * 2.0 * (2.0 / 95.0) + 1.5 * m_cell * n).astype(np.float32)
    h0 = np.sum(d * n, -1).astype(np.float32)

    m = 1024
    r = sdf_trace.sphere_trace_budget(pgv, jnp.asarray(o), jnp.asarray(d),
                                      m=m, h0=jnp.asarray(h0),
                                      a1_budget=0.875)
    certified = (~np.asarray(r.a1_need) & ~np.asarray(r.cand)
                 & (h0 > 0.12))
    assert certified.sum() > 50          # the cache certifies something
    _, _, _, hit_dense = sdf_trace.sphere_trace(
        pg, jnp.asarray(o), jnp.asarray(d))
    # no certified ray may be a dense-trace hit
    assert (certified & np.asarray(hit_dense)).sum() == 0
