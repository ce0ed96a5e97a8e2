"""Unit tests for core math ops against closed forms and numpy oracles."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensoflow_tpu.ops import math as tm
from tensoflow_tpu.ops import brdf, samplers


def test_positional_encoding_matches_reference_layout():
    x = np.random.RandomState(0).randn(5, 3).astype(np.float32)
    out = tm.positional_encoding(jnp.asarray(x), 3)
    assert out.shape == (5, tm.pe_dim(3, 3))
    np.testing.assert_allclose(out[:, :3], x, rtol=1e-6)
    np.testing.assert_allclose(out[:, 3:6], np.sin(x), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(out[:, 6:9], np.cos(x), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(out[:, 9:12], np.sin(2 * x), rtol=1e-5, atol=1e-6)


def test_srgb_roundtrip():
    x = np.linspace(0, 1, 100).astype(np.float32)
    y = tm.srgb_to_linear(tm.linear_to_srgb(jnp.asarray(x)))
    np.testing.assert_allclose(y, x, atol=2e-5)


def test_sphere_intersection():
    pts = jnp.array([[0.0, 0.0, 0.0], [0.5, 0.0, 0.0]])
    dirs = jnp.array([[1.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
    d = tm.get_sphere_intersection(pts, dirs)
    np.testing.assert_allclose(d[:, 0], [1.0, 0.5], atol=1e-5)


def test_sample_pdf_uniform_weights():
    bins = jnp.linspace(0.0, 1.0, 9)[None].repeat(4, 0)
    weights = jnp.ones((4, 8))
    s = tm.sample_pdf(bins, weights, 16)
    assert s.shape == (4, 16)
    # deterministic midpoints of a uniform pdf are evenly spaced
    np.testing.assert_allclose(np.diff(np.asarray(s[0])),
                               np.full(15, 1.0 / 16), atol=1e-4)


def test_sample_pdf_concentrated():
    bins = jnp.linspace(0.0, 1.0, 5)[None]
    weights = jnp.array([[0.0, 0.0, 1.0, 0.0]])  # all mass in [0.5, 0.75]
    s = np.asarray(tm.sample_pdf(bins, weights, 8))
    assert (s > 0.45).all() and (s < 0.80).all()


def test_ide_matches_torch_complex_oracle():
    """Check the real-arithmetic IDE against the reference's complex formula
    (ref: utils/ref_utils.py:85-115) implemented in numpy."""
    deg = 5
    mat, ml_array, sigma = tm._ide_tables(deg)
    rng = np.random.RandomState(1)
    xyz = rng.randn(32, 3).astype(np.float32)
    xyz /= np.linalg.norm(xyz, axis=-1, keepdims=True)
    kappa_inv = np.abs(rng.rand(32, 1).astype(np.float32)) * 0.3

    x, y, z = xyz[:, 0:1], xyz[:, 1:2], xyz[:, 2:3]
    vmz = np.concatenate([z ** i for i in range(mat.shape[0])], -1)
    vmxy = np.concatenate([(x + 1j * y) ** m for m in ml_array[0]], -1)
    sph = vmxy * (vmz @ mat)
    ide = sph * np.exp(-sigma * kappa_inv)
    want = np.concatenate([ide.real, ide.imag], -1)

    got = np.asarray(
        tm.integrated_dir_encoding(jnp.asarray(xyz), jnp.asarray(kappa_inv),
                                   deg))
    # fp32 catastrophic cancellation in the high-degree Vandermonde terms
    # bounds accuracy; compare in a norm-relative sense.
    err = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert err < 2e-3, err


def test_ggx_distribution_normalizes():
    """Integral of D(h) NoH over the hemisphere should be ~1."""
    n = 200000
    rng = np.random.RandomState(0)
    # uniform hemisphere samples
    u = rng.rand(n, 2)
    theta = np.arccos(u[:, 0])
    phi = 2 * np.pi * u[:, 1]
    noh = np.cos(theta)[:, None].astype(np.float32)
    alpha = 0.3
    d = np.asarray(brdf.distribution_ggx(jnp.asarray(noh), alpha))
    # pdf of uniform-hemisphere in solid angle = 1/(2pi)
    integral = np.mean(d[:, 0] * noh[:, 0]) * 2 * np.pi
    assert abs(integral - 1.0) < 0.02


def test_tangent_frame_orthonormal():
    rng = np.random.RandomState(0)
    n = rng.randn(100, 3).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    x, y, z = brdf.tangent_frame(jnp.asarray(n))
    np.testing.assert_allclose(np.sum(np.asarray(x) * np.asarray(y), -1), 0,
                               atol=1e-5)
    np.testing.assert_allclose(np.sum(np.asarray(x) * np.asarray(z), -1), 0,
                               atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(x), axis=-1), 1,
                               atol=1e-5)


def test_diffuse_sampling_is_cosine_distributed():
    table = samplers.direction_samples_01(512)
    n = np.array([[0.0, 0.0, 1.0]], np.float32)
    v = np.array([[0.0, 0.0, 1.0]], np.float32)
    dirs, angles, pdf, _ = samplers.sample_diffuse_directions(
        jnp.asarray(table), jnp.asarray(n), jnp.asarray(v), rng=None)
    dirs = np.asarray(dirs)[0]
    # all on upper hemisphere
    assert (dirs[:, 2] > -1e-4).all()
    # MC estimate of integral of cos over hemisphere using returned pdf ≈ pi
    cos = np.clip(dirs[:, 2], 0, 1)
    est = np.mean(cos / np.maximum(np.asarray(pdf)[0, :, 0], 1e-6))
    assert abs(est - np.pi) / np.pi < 0.05


def test_specular_sampling_pdf_consistency():
    """MC integral of D * NoH / (4 VoH) over sampled dirs with returned pdf
    should be ~1 (energy conservation of the GGX NDF)."""
    table = samplers.direction_samples_01(4096)
    n = np.array([[0.0, 0.0, 1.0]], np.float32)
    v = np.array([[0.0, 0.0, 1.0]], np.float32)
    rough = np.array([[0.2]], np.float32)
    dirs, angles, pdf, angles_h = samplers.sample_specular_directions(
        jnp.asarray(table), jnp.asarray(n), jnp.asarray(v), jnp.asarray(rough))
    h = np.asarray(dirs[0]) + v
    h /= np.linalg.norm(h, axis=-1, keepdims=True)
    noh = np.clip(h[:, 2], 0, 1)[:, None].astype(np.float32)
    voh = np.clip(np.sum(h * v, -1), 0, 1)[:, None].astype(np.float32)
    d = np.asarray(brdf.distribution_ggx(jnp.asarray(noh), 0.2))
    integrand = d * noh / np.maximum(4 * voh, 1e-6)
    est = np.mean(integrand / np.maximum(np.asarray(pdf)[0], 1e-8))
    assert abs(est - 1.0) < 0.05


def test_half_angle_roundtrip():
    rng = np.random.RandomState(3)
    n = rng.randn(8, 3).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    v = n + 0.3 * rng.randn(8, 3).astype(np.float32)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    table = samplers.direction_samples_01(16)
    dirs, angles, pdf, angles_h = samplers.sample_diffuse_directions(
        jnp.asarray(table), jnp.asarray(n), jnp.asarray(v))
    # convert half angles back to directions: should match sampled dirs
    d2, a2, hov, theta = samplers.half_angles_to_directions(
        angles_h, jnp.asarray(n), jnp.asarray(v))
    err = np.linalg.norm(np.asarray(d2) - np.asarray(dirs), axis=-1)
    # round trip is exact except where H is nearly degenerate (d ~ -v);
    # the bulk must reconstruct to float precision
    assert np.percentile(err, 90) < 1e-2, np.percentile(err, 90)
