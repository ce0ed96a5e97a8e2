"""Tests for the VM tensor-field primitive against numpy oracles."""
import jax
import jax.numpy as jnp
import numpy as np

from tensoflow_tpu.ops import tensor_field as tf


def _bilerp_np(tex, uv):
    h, w, c = tex.shape
    u = uv[:, 0] * h - 0.5
    v = uv[:, 1] * w - 0.5
    u0, v0 = np.floor(u), np.floor(v)
    fu, fv = (u - u0)[:, None], (v - v0)[:, None]
    u0i = np.clip(u0.astype(int), 0, h - 1)
    u1i = np.clip(u0.astype(int) + 1, 0, h - 1)
    v0i = np.clip(v0.astype(int), 0, w - 1)
    v1i = np.clip(v0.astype(int) + 1, 0, w - 1)
    return ((1 - fu) * ((1 - fv) * tex[u0i, v0i] + fv * tex[u0i, v1i])
            + fu * ((1 - fv) * tex[u1i, v0i] + fv * tex[u1i, v1i]))


def test_bilinear_matches_numpy():
    rng = np.random.RandomState(0)
    tex = rng.randn(16, 16, 4).astype(np.float32)
    uv = rng.rand(100, 2).astype(np.float32)
    got = np.asarray(tf.sample_bilinear_2d(jnp.asarray(tex), jnp.asarray(uv)))
    np.testing.assert_allclose(got, _bilerp_np(tex, uv), atol=1e-5)


def test_bilinear_texel_centers_exact():
    rng = np.random.RandomState(1)
    tex = rng.randn(8, 8, 2).astype(np.float32)
    ij = np.stack(np.meshgrid(np.arange(8), np.arange(8), indexing='ij'), -1)
    uv = ((ij + 0.5) / 8.0).reshape(-1, 2).astype(np.float32)
    got = np.asarray(tf.sample_bilinear_2d(jnp.asarray(tex), jnp.asarray(uv)))
    np.testing.assert_allclose(got, tex.reshape(-1, 2), atol=1e-6)


def test_mip_level_blend():
    tex = np.ones((8, 8, 1), np.float32)
    tex[:4] = 3.0  # level-1 values average vertically
    pyr = tf.build_pyramid_2d(jnp.asarray(tex), 2)
    uv = jnp.asarray([[0.5, 0.5]], jnp.float32)
    v0 = np.asarray(tf.sample_mip_2d(pyr, uv, jnp.asarray([0.0])))
    v1 = np.asarray(tf.sample_mip_2d(pyr, uv, jnp.asarray([1.0])))
    vh = np.asarray(tf.sample_mip_2d(pyr, uv, jnp.asarray([0.5])))
    np.testing.assert_allclose(vh, 0.5 * (v0 + v1), atol=1e-6)
    # out-of-range levels clamp
    vlo = np.asarray(tf.sample_mip_2d(pyr, uv, jnp.asarray([-3.0])))
    np.testing.assert_allclose(vlo, v0, atol=1e-6)


def test_vm_features_product_structure():
    """Features must equal plane(u,v) * line(w) per component."""
    rng = np.random.RandomState(2)
    gs = [8, 8, 8]
    field = tf.init_vm_random(jax.random.PRNGKey(0), gs, 4, scale=1.0)
    xyz = rng.rand(10, 3).astype(np.float32)
    feats = np.asarray(tf.vm_features(field, jnp.asarray(xyz)))
    assert feats.shape == (10, 12)
    # oracle for plane 0: mat (0,1), vec 2
    p = np.asarray(field['planes'][0])
    l = np.asarray(field['lines'][0])
    pf = _bilerp_np(p, xyz[:, [0, 1]])
    x = xyz[:, 2] * l.shape[0] - 0.5
    x0 = np.floor(x)
    f = (x - x0)[:, None]
    x0i = np.clip(x0.astype(int), 0, l.shape[0] - 1)
    x1i = np.clip(x0.astype(int) + 1, 0, l.shape[0] - 1)
    lf = (1 - f) * l[x0i] + f * l[x1i]
    np.testing.assert_allclose(feats[:, :4], pf * lf, atol=1e-5)


def test_vm_gradients_flow_to_params_not_coords():
    field = tf.init_vm_random(jax.random.PRNGKey(0), [8, 8, 8], 2, scale=1.0)
    xyz = jnp.asarray(np.random.RandomState(0).rand(5, 3).astype(np.float32))

    def loss_wrt_params(f):
        return jnp.sum(tf.vm_features(f, xyz) ** 2)

    g = jax.grad(loss_wrt_params)(field)
    total = sum(float(jnp.abs(x).sum()) for x in jax.tree.leaves(g))
    assert total > 0

    def loss_wrt_coords(x):
        return jnp.sum(tf.vm_features(field, x) ** 2)

    gx = jax.grad(loss_wrt_coords)(xyz)
    assert float(jnp.abs(gx).sum()) == 0.0  # coords are stop-gradient'ed


def test_upsample_preserves_corner_values():
    field = tf.init_vm_random(jax.random.PRNGKey(1), [8, 8, 8], 2, scale=1.0)
    up = tf.upsample_vm(field, [16, 16, 16])
    for i in range(3):
        p0 = np.asarray(field['planes'][i])
        p1 = np.asarray(up['planes'][i])
        assert p1.shape == (16, 16, 2)
        np.testing.assert_allclose(p1[0, 0], p0[0, 0], atol=1e-6)
        np.testing.assert_allclose(p1[-1, -1], p0[-1, -1], atol=1e-6)


def test_tv_loss_zero_for_constant():
    field = {'planes': [jnp.ones((8, 8, 2))] * 3,
             'lines': [jnp.ones((8, 2))] * 3}
    assert float(tf.tv_loss_vm(field)) == 0.0


def test_gaussian_smooth_loss_zero_for_smooth():
    field = {'planes': [jnp.ones((12, 12, 2))] * 3,
             'lines': [jnp.ones((12, 2))] * 3}
    v = float(tf.gaussian_smooth_loss_vm(field))
    assert v < 1e-8
