"""Packed-atlas field path must match the reference slice path exactly.

pack_vm_field / vm_features_packed / vm_stencil_features are the hot-path
representation (one flat [T, C] gather buffer, see ops/tensor_field.py);
these tests pin them — forward and gradients — to the original
vm_features implementation they replace.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensoflow_tpu.fields import tenso_sdf
from tensoflow_tpu.ops import tensor_field as tf


def _mk_field(seed=0, gs=(16, 8, 4), c=4):
    field = tf.init_vm_random(jax.random.PRNGKey(seed), list(gs), c,
                              scale=1.0)
    # init_vm_random lines are constant (identical across mip levels, which
    # would mask mip-blend-semantics bugs) — randomize them
    keys = jax.random.split(jax.random.PRNGKey(seed + 100), 3)
    field['lines'] = [jax.random.normal(k, l.shape)
                      for k, l in zip(keys, field['lines'])]
    return field


@pytest.mark.parametrize('n_levels,with_level', [(1, False), (3, True)])
def test_packed_matches_unpacked_forward(n_levels, with_level):
    field = _mk_field()
    rng = np.random.RandomState(3)
    xyz = jnp.asarray(rng.rand(64, 3).astype(np.float32))
    level = (jnp.asarray(rng.rand(64).astype(np.float32) * (n_levels - 1))
             if with_level else None)
    want = tf.vm_features(field, xyz, level, n_levels)
    packed = tf.pack_vm_field(field, n_levels)
    got = tf.vm_features_packed(packed, xyz, level)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_packed_matches_unpacked_grad():
    field = _mk_field(1)
    rng = np.random.RandomState(4)
    xyz = jnp.asarray(rng.rand(32, 3).astype(np.float32))
    level = jnp.asarray(rng.rand(32).astype(np.float32) * 2.0)
    cot = jnp.asarray(rng.randn(32, 12).astype(np.float32))

    def loss_ref(f):
        return jnp.sum(tf.vm_features(f, xyz, level, 3) * cot)

    def loss_packed(f):
        return jnp.sum(
            tf.vm_features_packed(tf.pack_vm_field(f, 3), xyz, level) * cot)

    g_ref = jax.grad(loss_ref)(field)
    g_pk = jax.grad(loss_packed)(field)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4),
        g_ref, g_pk)


@pytest.mark.parametrize('n_levels,with_level', [(1, False), (2, True)])
def test_stencil_matches_seven_calls(n_levels, with_level):
    """vm_stencil_features == vm_features evaluated at the 7 offset points."""
    gs = (16, 8, 4)
    field = _mk_field(2, gs)
    rng = np.random.RandomState(5)
    n = 48
    xyz = rng.rand(n, 3).astype(np.float32) * 0.8 + 0.1
    level = (jnp.asarray(rng.rand(n).astype(np.float32) * (n_levels - 1))
             if with_level else None)
    d01 = [1.0 / (g - 1.0) for g in gs]
    packed = tf.pack_vm_field(field, n_levels)
    got = tf.vm_stencil_features(packed, jnp.asarray(xyz), d01, level)

    offs = np.zeros((7, 3), np.float32)
    for a in range(3):
        offs[1 + 2 * a, a] = d01[a]
        offs[2 + 2 * a, a] = -d01[a]
    for k in range(7):
        want = tf.vm_features(field, jnp.asarray(xyz + offs[k]), level,
                              n_levels)
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(want),
                                   atol=1e-5, rtol=1e-5)


def test_stencil_grad_flows_to_planes_and_lines():
    gs = (8, 8, 8)
    field = _mk_field(3, gs)
    rng = np.random.RandomState(6)
    xyz = jnp.asarray(rng.rand(16, 3).astype(np.float32))
    d01 = [1.0 / (g - 1.0) for g in gs]

    def loss(f):
        out = tf.vm_stencil_features(tf.pack_vm_field(f, 1), xyz, d01)
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(field)
    for p in g['planes'] + g['lines']:
        assert float(jnp.max(jnp.abs(p))) > 0.0
        assert np.all(np.isfinite(np.asarray(p)))


def test_sdf_with_grad_hessian_packed_matches_reference_path():
    """The full stencil head (fields/tenso_sdf) must agree with naive
    per-point apply_tenso_sdf evaluation."""
    cfg = tenso_sdf.SDFConfig(grid_size=(16, 16, 16), n_comp=8, sdf_dim=32,
                              app_dim=6, sdf_multires=3, n_levels=1,
                              gather_dtype='float32')
    params = tenso_sdf.init_tenso_sdf(jax.random.PRNGKey(0), cfg)
    aabb = jnp.asarray([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]])
    rng = np.random.RandomState(7)
    xyz = jnp.asarray((rng.rand(24, 3).astype(np.float32) - 0.5) * 1.6)

    sdf, app, grad, hess = tenso_sdf.sdf_with_grad_hessian(
        params, cfg, xyz, aabb, with_hessian=True)

    # oracle: naive center + 6 offset evaluations via apply_tenso_sdf
    eps = np.asarray(tenso_sdf.units(cfg, aabb))
    out_c = tenso_sdf.apply_tenso_sdf(params, cfg, xyz, aabb)
    np.testing.assert_allclose(np.asarray(sdf), np.asarray(out_c[:, 0]),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(app), np.asarray(out_c[:, 1:]),
                               atol=1e-4, rtol=1e-4)
    s_pm = []
    for a in range(3):
        for sign in (1.0, -1.0):
            off = np.zeros(3, np.float32)
            off[a] = sign * eps[a]
            s = tenso_sdf.apply_tenso_sdf(params, cfg,
                                          xyz + jnp.asarray(off), aabb)[:, 0]
            s_pm.append(np.asarray(s))
    grad_ref = np.stack(
        [(s_pm[2 * a] - s_pm[2 * a + 1]) / (2 * eps[a]) for a in range(3)],
        axis=-1)
    np.testing.assert_allclose(np.asarray(grad), grad_ref, atol=1e-3,
                               rtol=1e-3)
    hess_ref = np.stack(
        [(s_pm[2 * a] + s_pm[2 * a + 1] - 2 * np.asarray(sdf)) / eps[a] ** 2
         for a in range(3)], axis=-1)
    nh_ref = np.sum(grad_ref * hess_ref, -1) / (
        np.sum(grad_ref ** 2, -1) + 1e-5)
    np.testing.assert_allclose(np.asarray(hess), nh_ref, atol=1e-2,
                               rtol=1e-2)


@pytest.mark.parametrize('n_levels', [1, 2])
def test_pack_vm_patches_conv_matches_slices(n_levels):
    """Both patch-atlas pack implementations (size-gated in production:
    slice-concats for small planes, conv_general_dilated_patches for
    512^2-scale ones) must emit identical buffers and plane gradients."""
    field = _mk_field(7, gs=(16, 12, 8), c=4)
    a_conv = tf.pack_vm_patches(field, n_levels, pack_impl='conv')
    a_sl = tf.pack_vm_patches(field, n_levels, pack_impl='slices')
    np.testing.assert_allclose(np.asarray(a_conv.plane_buf),
                               np.asarray(a_sl.plane_buf),
                               atol=1e-6, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(a_conv.line_buf),
                               np.asarray(a_sl.line_buf),
                               atol=1e-6, rtol=1e-6)
    assert a_conv.meta == a_sl.meta

    rng = np.random.RandomState(11)
    cot = jnp.asarray(rng.randn(*a_sl.plane_buf.shape).astype(np.float32))

    def loss(f, impl):
        return jnp.sum(tf.pack_vm_patches(f, n_levels,
                                          pack_impl=impl).plane_buf * cot)

    g_conv = jax.grad(loss)(field, 'conv')
    g_sl = jax.grad(loss)(field, 'slices')
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4),
        g_conv, g_sl)


@pytest.mark.parametrize('n_levels,with_level', [(1, False), (3, True)])
def test_pack_vm_patches_p4_matches_p16(n_levels, with_level):
    """The p4 atlas (1x4 dv-span rows, 4 gathers/sample) must reproduce
    the p16 patch blocks and plane/line gradients exactly, including
    dynamic fractional-mip branches."""
    field = _mk_field(9, gs=(16, 12, 8), c=4)
    rng = np.random.RandomState(5)
    xyz = jnp.asarray(rng.rand(48, 3).astype(np.float32))
    level = (jnp.asarray(rng.rand(48).astype(np.float32) * (n_levels - 1))
             if with_level else None)
    delta = (0.01, 0.01, 0.01)

    def blocks(f, impl):
        atlas = tf.pack_vm_patches(f, n_levels, pack_impl=impl)
        pp, lp, fr, sig = tf.vm_patch_gather(atlas, xyz, delta, level)
        return pp, lp, fr

    pp16, lp16, fr16 = blocks(field, 'p16')
    pp4, lp4, fr4 = blocks(field, 'p4')
    for b in range(len(pp16)):
        for i in range(3):
            np.testing.assert_allclose(np.asarray(pp4[b][i]),
                                       np.asarray(pp16[b][i]),
                                       atol=1e-6, rtol=1e-6)
            np.testing.assert_allclose(np.asarray(lp4[b][i]),
                                       np.asarray(lp16[b][i]),
                                       atol=1e-6, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(fr4), np.asarray(fr16),
                               atol=1e-6, rtol=1e-6)

    cots = [jnp.asarray(rng.randn(*np.asarray(p).shape).astype(np.float32))
            for p in sum(pp16, [])]

    def loss(f, impl):
        atlas = tf.pack_vm_patches(f, n_levels, pack_impl=impl)
        pp, _, _, _ = tf.vm_patch_gather(atlas, xyz, delta, level)
        flat = sum(pp, [])
        return sum(jnp.sum(p * c) for p, c in zip(flat, cots))

    g16 = jax.grad(loss)(field, 'p16')
    g4 = jax.grad(loss)(field, 'p4')
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4),
        g16, g4)
