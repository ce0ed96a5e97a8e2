"""Property tests for the TensoFlow normalizing flow.

Oracles (SURVEY §4): invertibility (flow ∘ flow_inv = id), log-jacobian
antisymmetry, and pdf normalization on the unit square.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensoflow_tpu.fields import flow as flow_mod


CFG = flow_mod.FlowConfig(grid_size=(32, 32, 32), n_bins=8)
AABB = jnp.asarray([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]])


def _setup(seed=0, pn=6):
    params = flow_mod.init_tenso_flow(jax.random.PRNGKey(seed), CFG)
    rng = np.random.RandomState(seed)
    pts = jnp.asarray(rng.uniform(-0.5, 0.5, (pn, 3)).astype(np.float32))
    refl = jnp.asarray(rng.rand(pn, 2).astype(np.float32))
    rough = jnp.asarray(rng.rand(pn, 1).astype(np.float32))
    return params, pts, refl, rough


def _randomize(params, scale=0.5, seed=1):
    """Perturb weights so the flow is non-trivial."""
    leaves, treedef = jax.tree.flatten(params)
    rng = jax.random.PRNGKey(seed)
    out = []
    for leaf in leaves:
        rng, k = jax.random.split(rng)
        out.append(leaf + scale * jax.random.normal(k, leaf.shape))
    return jax.tree.unflatten(treedef, out)


def test_pwquad_transform_roundtrip():
    rng = np.random.RandomState(0)
    n, k, b = 50, 1, 8
    wv = jnp.asarray(rng.randn(n, k, 2 * b + 1).astype(np.float32))
    x = jnp.asarray(rng.uniform(0.01, 0.99, (n, k)).astype(np.float32))
    y, logj_fwd = flow_mod.pwquad_flow_inv(x, wv)      # eval direction
    x2, logj_bwd = flow_mod.pwquad_flow(y, wv)         # solve direction
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=2e-3)
    np.testing.assert_allclose(np.asarray(logj_fwd), -np.asarray(logj_bwd),
                               atol=2e-2)


def test_pwquad_is_monotone_bijection_on_01():
    rng = np.random.RandomState(1)
    wv = jnp.asarray(rng.randn(1, 1, 17).astype(np.float32))
    x = jnp.linspace(0.001, 0.999, 200)[:, None]
    wvb = jnp.broadcast_to(wv, (200, 1, 17))
    y, _ = flow_mod.pwquad_flow_inv(x, wvb)
    y = np.asarray(y)[:, 0]
    assert (np.diff(y) > -1e-6).all()          # monotone
    assert y[0] < 0.05 and y[-1] > 0.95        # maps onto [0,1]


def test_pwlinear_transform_roundtrip():
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(30, 1, 8).astype(np.float32))
    x = jnp.asarray(rng.uniform(0.01, 0.99, (30, 1)).astype(np.float32))
    y, lj1 = flow_mod.pwlinear_flow_inv(x, q)
    x2, lj2 = flow_mod.pwlinear_flow(y, q)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-4)
    np.testing.assert_allclose(np.asarray(lj1), -np.asarray(lj2), atol=1e-4)


def test_flow_sample_density_consistency():
    """log q returned by sample() must match density evaluation at the
    sampled points (ref semantics: fields.py:1085 vs 1274)."""
    params, pts, refl, rough = _setup()
    params = _randomize(params, 0.05)
    x, logq_s = flow_mod.flow_sample(params, CFG, jax.random.PRNGKey(2),
                                     pts, AABB, refl, rough, 16, train=False)
    z, logq_d = flow_mod.flow_log_density(params, CFG, pts, AABB, refl,
                                          rough, x)
    # sample returns logj = -log q; density returns +log q
    np.testing.assert_allclose(np.asarray(logq_s), -np.asarray(logq_d),
                               atol=5e-2)


def test_flow_density_normalizes():
    """∫ q over the unit square ≈ ∫ prior = 2/pi (per conditioning point).

    The reference's SphereSampler prior pdf cos(theta01·pi/2) is
    unnormalized on the unit square (∫ = 2/pi, ref flow.py:78-80); the flow
    is measure-preserving, so the pushed-forward density integrates to the
    same constant."""
    params, pts, refl, rough = _setup(pn=2)
    params = _randomize(params, 0.05)
    g = 64
    u = (np.arange(g) + 0.5) / g
    xx, yy = np.meshgrid(u, u, indexing='ij')
    xgrid = jnp.asarray(np.stack([xx, yy], -1).reshape(1, -1, 2)
                        .astype(np.float32))
    xgrid = jnp.broadcast_to(xgrid, (2, g * g, 2))
    _, logq = flow_mod.flow_log_density(params, CFG, pts, AABB, refl, rough,
                                        xgrid)
    q = np.exp(np.asarray(logq))[..., 0]
    integral = q.mean(axis=1)
    np.testing.assert_allclose(integral, 2.0 / np.pi, atol=0.05)


def test_sphere_prior_normalizes():
    """prior pdf cos(theta*pi/2) * (pi/2 scaling) integrates to 2/pi * ...
    — check that the lattice+pdf pair gives consistent MC estimates."""
    x, logj = flow_mod.sphere_prior_sample(None, 1, 512, train=False)
    q = np.exp(-np.asarray(logj))[0, :, 0]
    # lattice points concentrate where pdf is high; E[1/q] under lattice
    # approximates the area of the unit square weighted correctly
    assert np.isfinite(q).all() and (q > 0).all()


def test_flow_gradients_finite():
    params, pts, refl, rough = _setup()
    params = _randomize(params, 0.05)
    x = jnp.asarray(np.random.RandomState(3).uniform(
        0.05, 0.95, (6, 8, 2)).astype(np.float32))

    def loss(p):
        _, logq = flow_mod.flow_log_density(p, CFG, pts, AABB, refl, rough,
                                            x)
        return -jnp.mean(logq)

    g = jax.grad(loss)(params)
    for leaf in jax.tree.leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()
    total = sum(float(jnp.abs(l).sum()) for l in jax.tree.leaves(g))
    assert total > 0


def test_realnvp_variant_sample_density_consistency():
    cfg = flow_mod.FlowConfig(grid_size=(16, 16, 16), flow_type='realnvp')
    params = flow_mod.init_tenso_flow(jax.random.PRNGKey(0), cfg)
    params = _randomize(params, 0.02)
    rng = np.random.RandomState(0)
    pts = jnp.asarray(rng.uniform(-0.5, 0.5, (4, 3)).astype(np.float32))
    refl = jnp.asarray(rng.rand(4, 2).astype(np.float32))
    rough = jnp.asarray(rng.rand(4, 1).astype(np.float32))
    x, logq_s = flow_mod.flow_sample(params, cfg, jax.random.PRNGKey(3),
                                     pts, AABB, refl, rough, 12,
                                     train=False)
    assert (np.asarray(x) > 0).all() and (np.asarray(x) < 1).all()
    _, logq_d = flow_mod.flow_log_density(params, cfg, pts, AABB, refl,
                                          rough, x)
    np.testing.assert_allclose(np.asarray(logq_s), -np.asarray(logq_d),
                               atol=5e-2)


def test_pwlinear_variant_end_to_end():
    cfg = flow_mod.FlowConfig(grid_size=(16, 16, 16), flow_type='pwlinear',
                              n_bins=8)
    params = flow_mod.init_tenso_flow(jax.random.PRNGKey(1), cfg)
    params = _randomize(params, 0.02)
    rng = np.random.RandomState(1)
    pts = jnp.asarray(rng.uniform(-0.5, 0.5, (4, 3)).astype(np.float32))
    refl = jnp.asarray(rng.rand(4, 2).astype(np.float32))
    rough = jnp.asarray(rng.rand(4, 1).astype(np.float32))
    x, logq_s = flow_mod.flow_sample(params, cfg, jax.random.PRNGKey(5),
                                     pts, AABB, refl, rough, 12,
                                     train=False)
    _, logq_d = flow_mod.flow_log_density(params, cfg, pts, AABB, refl,
                                          rough, x)
    np.testing.assert_allclose(np.asarray(logq_s), -np.asarray(logq_d),
                               atol=5e-2)
