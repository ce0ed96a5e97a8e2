"""Numerical parity against the reference's pure-python oracles.

Fixtures in tests/fixtures/ref_oracles.npz were generated ONCE by
scripts/gen_ref_fixtures.py, which ran the reference's torch CPU
implementations (renderutils/bsdf.py BRDF set, network/flow.py spline
transforms, utils/network_utils.py sample_pdf/get_weights) in float64 on
seeded inputs.  These tests pin this framework's JAX implementations to
those outputs — forward AND input gradients — without needing torch or
the reference tree at test time.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensoflow_tpu.fields import flow as flow_mod
from tensoflow_tpu.models import secondary
from tensoflow_tpu.ops import math as math_mod
from tensoflow_tpu.ops import renderutils_compat as ru

FIX = os.path.join(os.path.dirname(__file__), 'fixtures',
                   'ref_oracles.npz')


@pytest.fixture(scope='module')
def fx():
    return dict(np.load(FIX))


# ---------------------------------------------------------------------------
# BSDF set (ref: network/renderutils/bsdf.py:46-160)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize('bsdf_id,name', [(0, 'lambert'), (1, 'frostbite')])
def test_pbr_bsdf_matches_reference(fx, bsdf_id, name):
    args = (fx['pbr_kd'], fx['pbr_arm'], fx['pbr_pos'], fx['pbr_nrm'],
            fx['pbr_view_pos'], fx['pbr_light_pos'])

    def f(kd, arm, nrm):
        return jnp.sum(ru.pbr_bsdf(kd, arm, args[2], nrm, args[4],
                                   args[5], 0.08, bsdf_id))

    out = ru.pbr_bsdf(*args, 0.08, bsdf_id)
    np.testing.assert_allclose(np.asarray(out), fx[f'pbr_{name}_out'],
                               rtol=1e-5, atol=1e-5)
    g_kd, g_arm, g_nrm = jax.grad(f, argnums=(0, 1, 2))(
        args[0], args[1], args[3])
    np.testing.assert_allclose(np.asarray(g_kd), fx[f'pbr_{name}_g_kd'],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g_arm), fx[f'pbr_{name}_g_arm'],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g_nrm), fx[f'pbr_{name}_g_nrm'],
                               rtol=1e-4, atol=2e-4)


def test_prepare_shading_normal_matches_reference(fx):
    out = ru.prepare_shading_normal(
        fx['pbr_pos'], fx['pbr_view_pos'], fx['psn_perturbed'],
        fx['psn_smooth_nrm'], fx['psn_smooth_tng'], fx['psn_geom_nrm'],
        two_sided_shading=True, opengl=False)
    np.testing.assert_allclose(np.asarray(out), fx['psn_out'],
                               rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# NIS spline transforms (ref: network/flow.py:175-525)
# ---------------------------------------------------------------------------

def test_pwquad_flow_inv_matches_reference(fx):
    x, wv = fx['pwq_x'], fx['pwq_wv']

    def f(x, wv):
        y, logj = flow_mod.pwquad_flow_inv(x, wv)
        return jnp.sum(y) + jnp.sum(logj)

    y, logj = flow_mod.pwquad_flow_inv(x, wv)
    np.testing.assert_allclose(np.asarray(y), fx['pwq_inv_y'],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(logj), fx['pwq_inv_logj'],
                               rtol=1e-4, atol=1e-4)
    gx, gwv = jax.grad(f, argnums=(0, 1))(x, wv)
    np.testing.assert_allclose(np.asarray(gx), fx['pwq_inv_gx'],
                               rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(gwv), fx['pwq_inv_gwv'],
                               rtol=1e-3, atol=2e-3)


def test_pwquad_flow_matches_reference(fx):
    x, wv = fx['pwq_x'], fx['pwq_wv']

    def f(x, wv):
        y, logj = flow_mod.pwquad_flow(x, wv)
        return jnp.sum(y) + jnp.sum(logj)

    y, logj = flow_mod.pwquad_flow(x, wv)
    np.testing.assert_allclose(np.asarray(y), fx['pwq_fwd_x'],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(logj), fx['pwq_fwd_logj'],
                               rtol=1e-4, atol=1e-4)
    gy, gwv = jax.grad(f, argnums=(0, 1))(x, wv)
    np.testing.assert_allclose(np.asarray(gy), fx['pwq_fwd_gy'],
                               rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(gwv), fx['pwq_fwd_gwv'],
                               rtol=1e-3, atol=2e-3)


def test_pwquad_roundtrip(fx):
    x, wv = fx['pwq_x'], fx['pwq_wv']
    y, logj = flow_mod.pwquad_flow_inv(x, wv)
    x2, logj2 = flow_mod.pwquad_flow(y, wv)
    np.testing.assert_allclose(np.asarray(x2), x, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(logj + logj2),
                               np.zeros_like(logj), atol=1e-4)


def test_pwlinear_matches_reference(fx):
    x, q = fx['pwq_x'], fx['pwl_q']

    def f(x, q):
        y, logj = flow_mod.pwlinear_flow_inv(x, q)
        return jnp.sum(y) + jnp.sum(logj)

    y, logj = flow_mod.pwlinear_flow_inv(x, q)
    np.testing.assert_allclose(np.asarray(y), fx['pwl_inv_y'],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(logj), fx['pwl_inv_logj'],
                               rtol=1e-4, atol=1e-4)
    gx, gq = jax.grad(f, argnums=(0, 1))(x, q)
    np.testing.assert_allclose(np.asarray(gx), fx['pwl_inv_gx'],
                               rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(gq), fx['pwl_inv_gq'],
                               rtol=1e-3, atol=2e-3)

    x2, logj2 = flow_mod.pwlinear_flow(x, q)
    np.testing.assert_allclose(np.asarray(x2), fx['pwl_fwd_x'],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(logj2), fx['pwl_fwd_logj'],
                               rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# sample_pdf / get_weights (ref: utils/network_utils.py:117-170)
# ---------------------------------------------------------------------------

def test_sample_pdf_matches_reference(fx):
    n_samples = fx['spdf_samples'].shape[-1]
    u = jnp.linspace(0.5 / n_samples, 1.0 - 0.5 / n_samples, n_samples)
    u = jnp.broadcast_to(u, fx['spdf_bins'].shape[:-1] + (n_samples,))
    out = math_mod.sample_pdf(jnp.asarray(fx['spdf_bins']),
                              jnp.asarray(fx['spdf_weights']),
                              n_samples, u=u)
    np.testing.assert_allclose(np.asarray(out), fx['spdf_samples'],
                               rtol=1e-5, atol=1e-5)


def test_get_weights_matches_reference(fx):
    def sdf_fun(p):
        return jnp.linalg.norm(p, axis=-1, keepdims=True) - 0.5

    w, mid_sdf = secondary.march_weights(
        sdf_fun, 64.0, jnp.asarray(fx['gw_z_vals']),
        jnp.asarray(fx['gw_origins']), jnp.asarray(fx['gw_dirs']))
    np.testing.assert_allclose(np.asarray(w), fx['gw_weights'],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(mid_sdf), fx['gw_mid_sdf'],
                               rtol=1e-5, atol=1e-5)
