"""Smoke + correctness tests for field modules."""
import jax
import jax.numpy as jnp
import numpy as np

from tensoflow_tpu.fields import mlp, tenso_sdf, light, shading
from tensoflow_tpu.ops import cubemap as cm


def test_weight_norm_linear_matches_plain_at_init():
    rng = jax.random.PRNGKey(0)
    p = mlp.init_linear(rng, 8, 4, weight_norm=True)
    x = jnp.ones((2, 8))
    y = mlp.apply_linear(p, x)
    y2 = x @ p['v'] + p['b']
    np.testing.assert_allclose(np.asarray(y), np.asarray(y2), atol=1e-5)


def test_predictor_shapes_and_activations():
    rng = jax.random.PRNGKey(1)
    p = mlp.init_predictor(rng, 16, 3, n_layers=3, final_bias=np.log(0.5))
    x = jax.random.normal(jax.random.PRNGKey(2), (5, 16))
    y = mlp.apply_predictor(p, x, 'exp', exp_max=5.0)
    assert y.shape == (5, 3)
    assert (np.asarray(y) > 0).all()
    assert (np.asarray(y) <= np.exp(5.0) + 1e-5).all()


def test_tenso_sdf_init_is_sphere_like():
    """With circle init + geometric MLP init the zero level set should be
    roughly a sphere of radius ~init_radius (ref: fields.py:101-131)."""
    cfg = tenso_sdf.SDFConfig(grid_size=(64, 64, 64), n_comp=8, sdf_dim=64,
                              app_dim=16, sdf_multires=3)
    params = tenso_sdf.init_tenso_sdf(jax.random.PRNGKey(0), cfg)
    aabb = jnp.asarray([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]])
    # points at radius r: sdf should be monotone in r and cross 0 near 0.2-0.5
    dirs = np.random.RandomState(0).randn(32, 3)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    rs = np.array([0.05, 0.3, 0.6, 0.9], np.float32)
    vals = []
    for r in rs:
        pts = jnp.asarray((dirs * r).astype(np.float32))
        sdf = np.asarray(tenso_sdf.sdf_only(params, cfg, pts, aabb))
        vals.append(sdf.mean())
    # geometric init (feature weights zeroed, SAL-style xyz head) gives a
    # radially increasing field; the sphere shape is then enforced by the
    # init_sdf_reg loss in early training (ref: loss.py:170-202)
    assert vals[0] < vals[1] < vals[2] < vals[3]


def test_tenso_sdf_fd_gradient_matches_direction():
    cfg = tenso_sdf.SDFConfig(grid_size=(64, 64, 64), n_comp=8, sdf_dim=64,
                              app_dim=16, sdf_multires=3)
    params = tenso_sdf.init_tenso_sdf(jax.random.PRNGKey(0), cfg)
    aabb = jnp.asarray([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]])
    pts = jnp.asarray(np.random.RandomState(1).uniform(-0.6, 0.6, (16, 3))
                      .astype(np.float32))
    sdf, app, grad, hess = tenso_sdf.sdf_with_grad_hessian(
        params, cfg, pts, aabb)
    assert sdf.shape == (16,) and app.shape == (16, 16)
    assert grad.shape == (16, 3) and hess.shape == (16,)
    # validate the voxel-step FD gradient against an independent
    # small-step directional FD of the same field
    g = np.asarray(grad)
    h = 0.005
    gfd = np.zeros_like(g)
    for a in range(3):
        e = np.zeros(3, np.float32)
        e[a] = h
        sp = np.asarray(tenso_sdf.sdf_only(params, cfg, pts + e, aabb))[:, 0]
        sm = np.asarray(tenso_sdf.sdf_only(params, cfg, pts - e, aabb))[:, 0]
        gfd[:, a] = (sp - sm) / (2 * h)
    cos = np.sum(g * gfd, -1) / (np.linalg.norm(g, axis=-1)
                                 * np.linalg.norm(gfd, axis=-1) + 1e-9)
    assert cos.min() > 0.99


def test_cubemap_roundtrip_directions():
    """dir -> (face,u,v) -> sampling a cubemap whose texels store their own
    direction reproduces the direction."""
    res = 32
    dirs_tex = jnp.asarray(cm.cubemap_dirs(res))
    rng = np.random.RandomState(0)
    d = rng.randn(500, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    got = np.array(cm.sample_cubemap(dirs_tex, jnp.asarray(d)))
    got /= np.maximum(np.linalg.norm(got, axis=-1, keepdims=True), 1e-9)
    cos = np.sum(got * d, -1)
    assert cos.min() > 0.995, cos.min()


def test_cubemap_solid_angles_sum_to_4pi():
    sa = cm.cubemap_solid_angles(16)
    np.testing.assert_allclose(sa.sum(), 4 * np.pi, rtol=1e-5)


def test_diffuse_cubemap_constant_env():
    """Cosine convolution of a constant env is the same constant."""
    env = jnp.full((6, 16, 16, 3), 2.5)
    out = np.asarray(cm.diffuse_cubemap(env))
    np.testing.assert_allclose(out, 2.5, rtol=1e-4)


def test_env_light_build_and_shade():
    cfg = light.EnvLightConfig(max_res=64)
    params = light.init_env_light(cfg)
    mips = light.build_mips(params, cfg)
    d = jnp.asarray([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])
    diff = np.asarray(light.shade(mips, d, None, cfg))
    np.testing.assert_allclose(diff, 0.5, rtol=1e-3)  # exp(log 0.5)
    spec = np.asarray(light.shade(mips, d, jnp.asarray([[0.1], [0.9]]), cfg))
    np.testing.assert_allclose(spec, 0.5, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(light.direct_light(params, d)), 0.5,
                               rtol=1e-5)


def test_cubemap_mip_atlas_matches_dense_blend():
    """The 2-adjacent-level atlas gather equals the triangle-weight blend
    over all levels (fwd + grads w.r.t. the pyramid)."""
    rng = np.random.RandomState(3)
    pyr_np = [rng.rand(6, r, r, 3).astype(np.float32) for r in (16, 8, 4)]
    d = rng.randn(64, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    lv = rng.uniform(-0.5, 3.0, (64,)).astype(np.float32)

    def dense(pyr, dirs, level):
        n_levels = len(pyr)
        lvc = jnp.clip(level, 0.0, n_levels - 1)
        ls = jnp.arange(n_levels, dtype=lvc.dtype)[:, None]
        ws = jnp.maximum(0.0, 1.0 - jnp.abs(lvc[None, :] - ls))
        out = 0.0
        for l, tex in enumerate(pyr):
            out = out + ws[l][:, None] * cm.sample_cubemap(tex, dirs)
        return out

    pyr = [jnp.asarray(p) for p in pyr_np]
    got = np.asarray(cm.sample_cubemap_mip(pyr, jnp.asarray(d),
                                           jnp.asarray(lv)))
    want = np.asarray(dense(pyr, jnp.asarray(d), jnp.asarray(lv)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    g_got = jax.grad(lambda p: jnp.sum(
        cm.sample_cubemap_mip(p, jnp.asarray(d), jnp.asarray(lv)) ** 2))(pyr)
    g_want = jax.grad(lambda p: jnp.sum(
        dense(p, jnp.asarray(d), jnp.asarray(lv)) ** 2))(pyr)
    for a, b in zip(g_got, g_want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_packed_bilinear_matches_4tap():
    """patch_pack_2d + sample_bilinear_packed == sample_bilinear_2d,
    including out-of-range (clamped) coordinates."""
    from tensoflow_tpu.ops import tensor_field as tf
    rng = np.random.RandomState(5)
    tex = jnp.asarray(rng.rand(17, 9, 3).astype(np.float32))
    uv = jnp.asarray(rng.uniform(-0.3, 1.3, (200, 2)).astype(np.float32))
    want = np.asarray(tf.sample_bilinear_2d(tex, uv))
    buf = tf.patch_pack_2d(tex)
    got = np.asarray(tf.sample_bilinear_packed(
        buf, 17, 9, uv[:, 0] * 17 - 0.5, uv[:, 1] * 9 - 0.5))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_packed_cubemap_matches_dense():
    rng = np.random.RandomState(6)
    tex = jnp.asarray(rng.rand(6, 16, 16, 3).astype(np.float32))
    d = rng.randn(300, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d)
    want = np.asarray(cm.sample_cubemap(tex, d))
    pbuf = cm.pack_cubemap_patches(tex)
    got = np.asarray(cm.sample_cubemap_packed(pbuf, 16, d))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    # packed mip pyramid vs per-level dense blend (+ gradient parity)
    pyr = [tex, cm.cubemap_mip(tex)]
    lv = jnp.asarray(rng.uniform(0.0, 1.0, (300,)).astype(np.float32))
    want_m = np.asarray(cm.sample_cubemap_mip(pyr, d, lv))

    def packed_mip(p):
        buf, offs, ress = cm.pack_cubemap_pyramid_patches(p)
        return cm.sample_cubemap_mip_packed(buf, offs, ress, d, lv)

    got_m = np.asarray(packed_mip(pyr))
    np.testing.assert_allclose(got_m, want_m, rtol=1e-5, atol=1e-6)
    g_got = jax.grad(lambda p: jnp.sum(packed_mip(p) ** 2))(pyr)
    g_want = jax.grad(lambda p: jnp.sum(
        cm.sample_cubemap_mip(p, d, lv) ** 2))(pyr)
    for a, b in zip(g_got, g_want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_fg_lut_sane():
    lut = shading.compute_fg_lut(64, 256)
    assert lut.shape == (64, 64, 2)
    assert np.isfinite(lut).all()
    a, b = lut[..., 0], lut[..., 1]
    # same ranges as the reference's shipped table (a,b in [0,1])
    assert (a >= 0).all() and (a <= 1.05).all()
    assert (b >= 0).all() and (b <= 1.0).all()
    assert (a + b <= 1.1).all()


def test_shading_forward_shapes():
    cfg = shading.ShadingConfig(app_feats_dim=16,
                                env=light.EnvLightConfig(max_res=32))
    params = shading.init_shading(jax.random.PRNGKey(0), cfg)
    mips = light.build_mips(params['envlight'], cfg.env)
    n = 12
    rng = np.random.RandomState(0)
    pts = jnp.asarray(rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32))
    normals = jnp.asarray(rng.randn(n, 3).astype(np.float32))
    view = jnp.asarray(rng.randn(n, 3).astype(np.float32))
    feats = jnp.asarray(rng.randn(n, 16).astype(np.float32))
    color, radiance, occ_info = shading.apply_shading(
        params, cfg, mips, pts, normals, view, feats, step=0)
    assert color.shape == (n, 3)
    assert radiance is None
    assert occ_info['occ_prob'].shape == (n, 1)
    assert np.isfinite(np.asarray(color)).all()
    assert (np.asarray(color) >= 0).all() and (np.asarray(color) <= 1).all()
