"""Fused Pallas stencil-head kernel vs the XLA reference path.

Runs the kernel in interpret mode (CPU); on TPU the same code compiles
via Mosaic.  Covers fwd + grads for both the 7-point stencil head and the
single-point head, including fractional mip levels and non-cubic grids.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensoflow_tpu.fields import mlp, tenso_sdf
from tensoflow_tpu.ops import pallas_stencil as ps


def _mk_params(cfg, seed=0):
    params = tenso_sdf.init_tenso_sdf(jax.random.PRNGKey(seed), cfg)
    k = jax.random.PRNGKey(seed + 1)
    params['field']['planes'] = [p + 0.1 * jax.random.normal(k, p.shape)
                                 for p in params['field']['planes']]
    params['field']['lines'] = [l + 0.1 * jax.random.normal(k, l.shape)
                                for l in params['field']['lines']]
    return params


AABB = jnp.asarray([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]])


@pytest.mark.parametrize('n_levels', [1, 2])
def test_stencil_head_matches_xla(n_levels):
    cfgx = tenso_sdf.SDFConfig(grid_size=(48, 40, 32), n_comp=36,
                               sdf_dim=256, app_dim=128, sdf_multires=3,
                               n_levels=n_levels, stencil_impl='xla')
    cfgp = cfgx._replace(stencil_impl='pallas')
    params = _mk_params(cfgx)
    rng = np.random.RandomState(0)
    n = 300
    xyz = jnp.asarray((rng.rand(n, 3) - 0.5).astype(np.float32) * 1.8)
    level = (jnp.asarray(rng.rand(n).astype(np.float32))
             if n_levels > 1 else None)

    def run(cfg, p):
        return tenso_sdf.sdf_with_grad_hessian(p, cfg, xyz, AABB,
                                               level=level,
                                               with_hessian=True)

    ox = run(cfgx, params)
    op = run(cfgp, params)
    np.testing.assert_allclose(op[0], ox[0], atol=2e-6)   # sdf
    np.testing.assert_allclose(op[1], ox[1], atol=2e-6)   # app
    np.testing.assert_allclose(op[2], ox[2], atol=1e-4)   # FD grad
    # hessian: catastrophic cancellation /eps^2 amplifies fwd noise
    np.testing.assert_allclose(op[3], ox[3], atol=5e-3)

    def loss(cfg):
        def f(p):
            sdf, app, grad, nh = run(cfg, p)
            return (jnp.sum(sdf ** 2) + jnp.sum(app ** 2)
                    + jnp.sum(grad ** 2) + jnp.sum(nh ** 2))
        return f

    gx = jax.grad(loss(cfgx))(params)
    gp = jax.grad(loss(cfgp))(params)
    for (path, a), b in zip(jax.tree_util.tree_leaves_with_path(gx),
                            jax.tree_util.tree_leaves(gp)):
        scale = float(jnp.abs(a).max()) + 1e-8
        np.testing.assert_allclose(
            np.asarray(b) / scale, np.asarray(a) / scale, atol=1e-2,
            err_msg=jax.tree_util.keystr(path))


def test_point_head_matches_dense():
    rng = np.random.RandomState(1)
    N, C, E, H, O = 200, 36, 21, 256, 129
    P = [jnp.asarray(rng.randn(N, C).astype(np.float32)) * 0.3
         for _ in range(3)]
    L = [jnp.asarray(rng.randn(N, C).astype(np.float32)) * 0.3
         for _ in range(3)]
    pe = jnp.asarray(rng.randn(N, E).astype(np.float32)) * 0.3
    w0 = [jnp.asarray(rng.randn(C, H).astype(np.float32)) * 0.1
          for _ in range(3)]
    w0pe = jnp.asarray(rng.randn(E, H).astype(np.float32)) * 0.1
    b0 = jnp.asarray(rng.randn(H).astype(np.float32)) * 0.1
    w1 = jnp.asarray(rng.randn(H, O).astype(np.float32)) * 0.1
    b1 = jnp.asarray(rng.randn(O).astype(np.float32)) * 0.1

    out = ps.point_head(P, L, pe, (*w0, w0pe), b0, w1, b1, tile=128,
                        interpret=True)
    z = sum((P[i] * L[i]) @ w0[i] for i in range(3)) + pe @ w0pe + b0[None]
    ref = mlp.softplus100(z) @ w1 + b1[None]
    np.testing.assert_allclose(out, ref, atol=2e-6)


def test_stencil_head_bf16_close():
    """bf16 compute path stays within bf16 tolerance of f32."""
    cfgf = tenso_sdf.SDFConfig(grid_size=(32, 32, 32), n_comp=36,
                               sdf_dim=256, app_dim=128, sdf_multires=3,
                               stencil_impl='pallas')
    cfgb = cfgf._replace(gather_dtype='bfloat16')
    params = _mk_params(cfgf)
    rng = np.random.RandomState(2)
    xyz = jnp.asarray((rng.rand(128, 3) - 0.5).astype(np.float32) * 1.8)
    sf, af, gf, _ = tenso_sdf.sdf_with_grad_hessian(params, cfgf, xyz, AABB)
    sb, ab, gb, _ = tenso_sdf.sdf_with_grad_hessian(params, cfgb, xyz, AABB)
    assert float(jnp.abs(sf - sb).max()) < 0.05
    assert float(jnp.abs(af - ab).max()) < 0.1
