"""Fused Pallas patch-stencil kernel vs the XLA reference path.

Runs the kernel in interpret mode (CPU); on TPU the same code compiles
via Mosaic.  Covers fwd + grads for both the 7-point stencil head and the
single-point head, including fractional mip levels (dynamic sigma lanes)
and non-cubic grids.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensoflow_tpu.fields import tenso_sdf
from tensoflow_tpu.ops import pallas_stencil as ps
from tensoflow_tpu.ops import tensor_field as tfield


def _mk_params(cfg, seed=0):
    params = tenso_sdf.init_tenso_sdf(jax.random.PRNGKey(seed), cfg)
    k = jax.random.PRNGKey(seed + 1)
    params['field']['planes'] = [p + 0.1 * jax.random.normal(k, p.shape)
                                 for p in params['field']['planes']]
    params['field']['lines'] = [l + 0.1 * jax.random.normal(k, l.shape)
                                for l in params['field']['lines']]
    # geometric init zeroes the feature rows of W0 — noise them so the
    # outputs (and grads) actually exercise the field-feature path
    w0 = params['mlp'][0]['w']
    params['mlp'][0]['w'] = w0 + 0.05 * jax.random.normal(k, w0.shape)
    return params


AABB = jnp.asarray([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]])


@pytest.mark.slow
@pytest.mark.parametrize('n_levels', [1, 2])
def test_stencil_head_matches_xla(n_levels):
    # small head dims: correctness only — full-size dims are exercised on
    # TPU by the bench; interpret-mode cost scales with dims * tiles
    cfgx = tenso_sdf.SDFConfig(grid_size=(48, 40, 32), n_comp=36,
                               sdf_dim=64, app_dim=32, sdf_multires=3,
                               n_levels=n_levels, stencil_impl='xla')
    cfgp = cfgx._replace(stencil_impl='pallas')
    params = _mk_params(cfgx)
    rng = np.random.RandomState(0)
    n = 100
    # include points just outside the grid to exercise border clamping
    xyz = jnp.asarray((rng.rand(n, 3) - 0.5).astype(np.float32) * 2.2)
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
    np.testing.assert_allclose(op[3], ox[3], rtol=1e-3, atol=5e-3)

    def loss(cfg):
        def f(p):
            sdf, app, grad, nh = run(cfg, p)
            # nh is excluded: the 1/eps^4 hessian amplification turns
            # benign 1e-6 fwd differences between the two tap
            # formulations into % -level grad differences.  The kernel
            # VJP itself is pinned to 1e-6 in test_head_vjp_exact.
            return (jnp.sum(sdf ** 2) + jnp.sum(app ** 2)
                    + jnp.sum(grad ** 2))
        return f

    gx = jax.grad(loss(cfgx))(params)
    gp = jax.grad(loss(cfgp))(params)
    for (path, a), b in zip(jax.tree_util.tree_leaves_with_path(gx),
                            jax.tree_util.tree_leaves(gp)):
        scale = float(jnp.abs(a).max()) + 1e-8
        np.testing.assert_allclose(
            np.asarray(b) / scale, np.asarray(a) / scale, atol=1e-2,
            err_msg=jax.tree_util.keystr(path))


def test_point_head_matches_apply():
    """Center-tap point head == the XLA single-point field forward."""
    cfg = tenso_sdf.SDFConfig(grid_size=(40, 40, 40), n_comp=36,
                              sdf_dim=64, app_dim=32, sdf_multires=3)
    params = _mk_params(cfg, seed=3)
    rng = np.random.RandomState(1)
    n = 131                                     # non-multiple of tile
    xyz = jnp.asarray((rng.rand(n, 3) - 0.5).astype(np.float32) * 2.1)
    from tensoflow_tpu.ops.math import contraction, positional_encoding
    xyz01 = contraction(xyz, AABB)

    ref = tenso_sdf.apply_tenso_sdf(params, cfg, xyz, AABB)

    atlas = tfield.pack_vm_patches(params['field'], 1, None)
    d01 = tenso_sdf._stencil_delta01(cfg)
    pp, lp, fr, sigmas = tfield.vm_patch_gather(atlas, xyz01, d01)
    C = cfg.n_comp
    w0 = params['mlp'][0]['w']
    out = ps.point_head(
        [p for row in pp for p in row], [l for row in lp for l in row],
        fr, sigmas, positional_encoding(xyz01, cfg.sdf_multires),
        (w0[:C], w0[C:2 * C], w0[2 * C:3 * C], w0[3 * C:]),
        params['mlp'][0]['b'], params['mlp'][1]['w'],
        params['mlp'][1]['b'], tile=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-5)


def test_patch_gather_matches_variants():
    """Patch taps reproduce the per-variant clamped bilinear lookups."""
    cfg = tenso_sdf.SDFConfig(grid_size=(24, 20, 16), n_comp=4)
    params = _mk_params(cfg, seed=5)
    rng = np.random.RandomState(2)
    n = 64
    # contracted coords in [0,1] (both paths clamp there — dr.texture
    # 'clamp' semantics); include exact 0/1 boundary points
    xyz01 = jnp.asarray(
        np.concatenate([rng.rand(n - 4, 3), np.zeros((2, 3)),
                        np.ones((2, 3))]).astype(np.float32))
    d01 = tenso_sdf._stencil_delta01(cfg)

    packed = tfield.pack_vm_field(params['field'], 1)
    P, L = tfield.vm_stencil_variants(packed, xyz01, d01)

    atlas = tfield.pack_vm_patches(params['field'], 1)
    pp, lp, fr, sigmas = tfield.vm_patch_gather(atlas, xyz01, d01)
    frn = np.asarray(fr)
    C = cfg.n_comp
    for i in range(3):
        slots = np.asarray(pp[0][i]).reshape(n, 16, C)
        fu, fv = frn[:, 2 * i], frn[:, 2 * i + 1]
        su, sv, sx = sigmas[0][i]
        for pv, (sgu, sgv) in enumerate(ps._PVAR_SIGN):
            ru = fu + sgu * su
            rv = fv + sgv * sv
            val = np.zeros((n, C), np.float32)
            for ku in (-1, 0, 1, 2):
                for kv in (-1, 0, 1, 2):
                    w = (np.maximum(0, 1 - np.abs(ru - ku))
                         * np.maximum(0, 1 - np.abs(rv - kv)))
                    val += w[:, None] * slots[:, (ku + 1) * 4 + kv + 1]
            np.testing.assert_allclose(val, np.asarray(P[i][pv]),
                                       atol=1e-5, err_msg=f'plane{i} v{pv}')
        lslots = np.asarray(lp[0][i]).reshape(n, 4, C)
        fx = frn[:, 6 + i]
        for lv, sg in enumerate(ps._LVAR_SIGN):
            r = fx + sg * sx
            val = np.zeros((n, C), np.float32)
            for k in (-1, 0, 1, 2):
                w = np.maximum(0, 1 - np.abs(r - k))
                val += w[:, None] * lslots[:, k + 1]
            np.testing.assert_allclose(val, np.asarray(L[i][lv]),
                                       atol=1e-5, err_msg=f'line{i} v{lv}')


def test_head_vjp_exact():
    """Kernel custom VJP == jax.grad of a jnp replica, to fp32 eps."""
    S, B, C, E, H, O = 7, 1, 4, 5, 8, 3
    N, TN = 16, 8
    rng = np.random.RandomState(0)
    pp = [jnp.asarray(rng.randn(N, 16 * C).astype(np.float32)) * 0.3
          for _ in range(3)]
    lp = [jnp.asarray(rng.randn(N, 4 * C).astype(np.float32)) * 0.3
          for _ in range(3)]
    fr_np = np.zeros((N, 2 * ps.FS), np.float32)
    fr_np[:, 0:6] = rng.rand(N, 6)
    fr_np[:, 6:9] = rng.rand(N, 3)
    fr_np[:, 9] = 1.0
    fr = jnp.asarray(fr_np)
    sigmas = (((1.0, 0.9, 0.8), (0.7, 0.6, 0.5), (1.0, 1.0, 1.0)),)
    pe = jnp.asarray(rng.randn(N, E).astype(np.float32)) * 0.3
    rot = jnp.asarray(rng.randn(S, 4, E).astype(np.float32)) * 0.5
    w0p = tuple(jnp.asarray(rng.randn(d, H).astype(np.float32)) * 0.3
                for d in (C, C, C, E))
    b0 = jnp.asarray(rng.randn(H).astype(np.float32)) * 0.3
    w1 = jnp.asarray(rng.randn(H, O).astype(np.float32)) * 0.3

    def pe_points(pe_c):
        m3 = jnp.concatenate([pe_c[:, 3:], pe_c[:, :3]], 1)
        p3 = jnp.concatenate([pe_c[:, E - 3:], pe_c[:, :E - 3]], 1)
        return [pe_c] + [pe_c * rot[s, 0] + m3 * rot[s, 1]
                         + p3 * rot[s, 2] + rot[s, 3]
                         for s in range(1, S)]

    def ref_head(pp, lp, pe_c, w0p, b0, w1):
        pe = pe_points(pe_c)
        def hats(r):
            return [jnp.maximum(0., 1. - jnp.abs(r - k))
                    for k in (-1, 0, 1, 2)]
        PV = [[None] * 5 for _ in range(3)]
        LV = [[None] * 3 for _ in range(3)]
        for i in range(3):
            slots = [pp[i][:, s * C:(s + 1) * C] for s in range(16)]
            fu = fr[:, 2 * i:2 * i + 1]
            fv = fr[:, 2 * i + 1:2 * i + 2]
            su, sv, sx = sigmas[0][i]
            for pv, (sgu, sgv) in enumerate(ps._PVAR_SIGN):
                wu = hats(fu + sgu * su)
                wv = hats(fv + sgv * sv)
                PV[i][pv] = sum((wu[ku] * wv[kv]) * slots[ku * 4 + kv]
                                for ku in range(4) for kv in range(4))
            ls = [lp[i][:, s * C:(s + 1) * C] for s in range(4)]
            fx = fr[:, 6 + i:7 + i]
            for lv, sg in enumerate(ps._LVAR_SIGN):
                wx = hats(fx + sg * sx)
                LV[i][lv] = sum(wx[k] * ls[k] for k in range(4))
        outs_c, offs = None, []
        w0 = jnp.concatenate(w0p, 0)
        for s in range(S):
            feats = [PV[i][pv] * LV[i][lv]
                     for i, (pv, lv) in enumerate(ps.MAPPING7[s])]
            x = jnp.concatenate(feats + [pe[s]], -1)
            h = jax.nn.softplus(100. * (x @ w0 + b0)) / 100.
            if s == 0:
                outs_c = h @ w1
            else:
                offs.append(h @ w1[:, 0])
        return outs_c, jnp.stack(offs, 0)

    def loss_ref(args):
        oc, oo = ref_head(*args)
        return jnp.sum(oc ** 2) + jnp.sum(oo ** 2)

    def loss_ker(args):
        pp_, lp_, pe_, w0p_, b0_, w1_ = args
        static = (7, TN, 'float32', B, C, sigmas, True)
        oc, oo = ps._head(static, tuple(pp_), tuple(lp_), fr, pe_, rot,
                          tuple(w0p_), b0_, w1_)
        return jnp.sum(oc ** 2) + jnp.sum(oo ** 2)

    args = (pp, lp, pe, w0p, b0, w1)
    np.testing.assert_allclose(float(loss_ref(args)),
                               float(loss_ker(args)), rtol=1e-6)
    gr = jax.grad(loss_ref)(args)
    gk = jax.grad(loss_ker)(args)
    for (path, a), b in zip(jax.tree_util.tree_leaves_with_path(gr),
                            jax.tree_util.tree_leaves(gk)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-6,
                                   err_msg=jax.tree_util.keystr(path))


def test_stencil_head_bf16_close():
    """bf16 compute path stays within bf16 tolerance of f32."""
    cfgf = tenso_sdf.SDFConfig(grid_size=(32, 32, 32), n_comp=36,
                               sdf_dim=64, app_dim=32, sdf_multires=3,
                               stencil_impl='pallas')
    cfgb = cfgf._replace(gather_dtype='bfloat16')
    params = _mk_params(cfgf)
    rng = np.random.RandomState(2)
    xyz = jnp.asarray((rng.rand(128, 3) - 0.5).astype(np.float32) * 1.8)
    sf, af, gf, _ = tenso_sdf.sdf_with_grad_hessian(params, cfgf, xyz, AABB)
    sb, ab, gb, _ = tenso_sdf.sdf_with_grad_hessian(params, cfgb, xyz, AABB)
    assert float(jnp.abs(sf - sb).max()) < 0.05
    assert float(jnp.abs(af - ab).max()) < 0.1
