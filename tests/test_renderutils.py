"""Tests for the renderutils-compat PBR ops against analytic properties."""
import jax.numpy as jnp
import numpy as np

from tensoflow_tpu.ops import renderutils_compat as ru


def _rand_dirs(n, seed=0, up=True):
    rng = np.random.RandomState(seed)
    d = rng.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    if up:
        d[:, 2] = np.abs(d[:, 2])
    return d


def test_lambert_range():
    nrm = jnp.asarray([[0.0, 0.0, 1.0]])
    wi = jnp.asarray(_rand_dirs(50, up=False))
    v = np.asarray(ru.lambert(nrm, wi))
    assert (v >= 0).all() and (v <= 1 / np.pi + 1e-6).all()


def test_ndf_ggx_normalizes():
    """∫ D(h) cos dh over hemisphere ≈ 1."""
    n = 200000
    rng = np.random.RandomState(0)
    u = rng.rand(n, 2)
    theta = np.arccos(u[:, 0])
    ct = np.cos(theta)[:, None].astype(np.float32)
    alpha_sqr = 0.3 ** 2
    d = np.asarray(ru.ndf_ggx(alpha_sqr, jnp.asarray(ct)))
    integral = np.mean(d * ct) * 2 * np.pi
    assert abs(integral - 1.0) < 0.03


def test_masking_smith_bounds():
    a2 = 0.25
    ci = jnp.asarray(np.random.RandomState(0).rand(100, 1).astype(np.float32))
    co = jnp.asarray(np.random.RandomState(1).rand(100, 1).astype(np.float32))
    g = np.asarray(ru.masking_smith_ggx_correlated(a2, ci, co))
    assert (g > 0).all() and (g <= 1.0 + 1e-6).all()


def test_pbr_bsdf_reciprocal_positivity():
    rng = np.random.RandomState(0)
    n = 64
    pos = jnp.zeros((n, 3))
    nrm = jnp.asarray(np.tile([[0.0, 0, 1]], (n, 1)).astype(np.float32))
    view = jnp.asarray(_rand_dirs(n, 1) * 2)
    light = jnp.asarray(_rand_dirs(n, 2) * 2)
    kd = jnp.asarray(rng.rand(n, 3).astype(np.float32))
    arm = jnp.asarray(np.stack([np.zeros(n), rng.rand(n) * 0.9 + 0.1,
                                rng.rand(n)], -1).astype(np.float32))
    v = np.asarray(ru.pbr_bsdf(kd, arm, pos, nrm, view, light))
    assert np.isfinite(v).all()
    assert (v >= 0).all()


def test_prepare_shading_normal_identity():
    """Unperturbed normal (0,0,1) in tangent space returns the smooth
    normal; backfacing flips under two-sided shading."""
    n = jnp.asarray([[0.0, 0.0, 1.0]])
    t = jnp.asarray([[1.0, 0.0, 0.0]])
    pos = jnp.zeros((1, 3))
    view = jnp.asarray([[0.0, 0.0, 2.0]])
    pert = jnp.asarray([[0.0, 0.0, 1.0]])
    out = np.asarray(ru.prepare_shading_normal(pos, view, pert, n, t, n))
    np.testing.assert_allclose(out, [[0, 0, 1]], atol=1e-6)
    out2 = np.asarray(ru.prepare_shading_normal(
        pos, -view, pert, n, t, n, two_sided_shading=True))
    np.testing.assert_allclose(out2, [[0, 0, -1]], atol=1e-6)


def test_image_losses():
    a = jnp.ones((4, 4, 3)) * 0.5
    b = jnp.ones((4, 4, 3)) * 0.7
    assert abs(float(ru.image_loss(a, b, 'l1')) - 0.2) < 1e-6
    assert abs(float(ru.image_loss(a, b, 'mse')) - 0.04) < 1e-6
    assert float(ru.image_loss(a, a, 'smape')) == 0.0
    v = float(ru.image_loss(a, b, 'l1', tonemapper='log_srgb'))
    assert v > 0


def test_xfm_points_and_vectors():
    mat = np.eye(4, dtype=np.float32)
    mat[:3, 3] = [1, 2, 3]
    pts = jnp.asarray(np.random.RandomState(0).randn(1, 5, 3)
                      .astype(np.float32))
    out = np.asarray(ru.xfm_points(pts, jnp.asarray(mat[None])))
    np.testing.assert_allclose(out[..., :3], np.asarray(pts) + [1, 2, 3],
                               atol=1e-5)
    vec = np.asarray(ru.xfm_vectors(pts, jnp.asarray(mat[None])))
    np.testing.assert_allclose(vec, np.asarray(pts), atol=1e-5)
