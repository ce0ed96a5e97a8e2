"""RENDERER-level parity against the reference (torch CPU) — fixtures from
scripts/gen_ref_renderer_fixtures.py pin the full MCShadingNetwork.forward
(ref: network/fields.py:1453): tensorial material field, predictors, the
mixed MC estimator with deterministic Fibonacci directions, exact-occluder
visibility, inner/outer light MLPs — outputs AND gradients (the BASELINE
"allclose images & pixel gradients" row at renderer level)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensoflow_tpu.fields import mc_shading

FIX = os.path.join(os.path.dirname(__file__), 'fixtures',
                   'ref_renderer.npz')


@pytest.fixture(scope='module')
def fx():
    return dict(np.load(FIX))


def _linear_from_torch(z, prefix, idx):
    """torch weight_norm Linear -> our {'v','g','b'} (dim-0 weight norm:
    ours stores v [in,out], g [out])."""
    v = z[f'{prefix}__{idx}_parametrizations_weight_original1']  # [out,in]
    g = z[f'{prefix}__{idx}_parametrizations_weight_original0']  # [out,1]
    b = z[f'{prefix}__{idx}_bias']
    return {'v': jnp.asarray(v.T), 'g': jnp.asarray(g[:, 0]),
            'b': jnp.asarray(b)}


def _predictor_from_torch(z, prefix, n_layers):
    idxs = [2 * i for i in range(n_layers)]
    return {'layers': [_linear_from_torch(z, prefix, i) for i in idxs]}


def build_params_and_cfg(z):
    cfg = mc_shading.MCShadingConfig(
        diffuse_sample_num=16, specular_sample_num=8,
        outer_light_version='direction',
        use_nis_all=False, use_nis_diffuse=False, use_nis_specular=False,
        random_azimuth=False,
        grid_size=(32, 32, 32), inner_light_budget=0.0,
        secondary_budget=0.0,
        # the torch oracle is f32; the production bf16 estimator chains
        # are covered by their own tolerance test (test_mc_estimator)
        estimator_dtype='f32')
    params = mc_shading.init_mc_shading(jax.random.PRNGKey(0), cfg)
    # reference plane [1,C,g0,g1] sampled with u=xyz[m0] along axis 3 and
    # v=xyz[m1] along axis 2 (dr.texture u->W); ours is [g_m0, g_m1, C]
    # with xyz[m0] on axis 0 -> transpose (2,1,0)
    params['mat_field'] = {
        'planes': [jnp.asarray(np.transpose(z[f'w_plane{i}'][0], (2, 1, 0)))
                   for i in range(3)],
        'lines': [jnp.asarray(z[f'w_line{i}'][0, :, :, 0].T)
                  for i in range(3)],
    }
    params['metallic'] = _predictor_from_torch(z, 'w_metallic', 2)
    params['roughness'] = _predictor_from_torch(z, 'w_roughness', 2)
    params['albedo'] = _predictor_from_torch(z, 'w_albedo', 2)
    params['outer_light'] = _predictor_from_torch(z, 'w_outer', 4)
    params['inner_light'] = _predictor_from_torch(z, 'w_inner', 4)
    return params, cfg


def make_trace_fn(z):
    center = jnp.asarray(z['occ_center'], jnp.float32)
    radius = float(z['occ_radius'])

    def trace(o, d):
        oc = o - center
        b = jnp.sum(oc * d, -1)
        c = jnp.sum(oc * oc, -1) - radius ** 2
        disc = b * b - c
        hit = disc > 0
        t = -b - jnp.sqrt(jnp.maximum(disc, 0.0))
        hit = hit & (t > 0)
        t = jnp.where(hit, t, 10.0)
        inters = o + d * t[:, None] * hit[:, None].astype(o.dtype)
        n = inters - center
        n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True),
                            1e-8)
        flip = jnp.sum(n * d, -1, keepdims=True) >= 0
        n = jnp.where(flip, -n, n)
        return inters, n, t[:, None], hit
    return trace


def _forward(params, cfg, trace, pts, view, nrm):
    aabb = jnp.asarray([[-1.0] * 3, [1.0] * 3])
    return mc_shading.mc_forward(
        params, cfg, trace, 2.0 / 511.0, aabb, pts, view, nrm,
        mc_shading.ShadePhase(), jax.random.PRNGKey(0), False)


def test_material_feature_matches_reference(fx):
    params, cfg = build_params_and_cfg(fx)
    aabb = jnp.asarray([[-1.0] * 3, [1.0] * 3])
    feats = mc_shading.tenso_feature(params, cfg, jnp.asarray(fx['pts']),
                                     aabb)
    np.testing.assert_allclose(np.asarray(feats), fx['mat_feats'],
                               rtol=1e-4, atol=1e-5)


def test_full_shade_outputs_match_reference(fx):
    params, cfg = build_params_and_cfg(fx)
    out = _forward(params, cfg, make_trace_fn(fx),
                   jnp.asarray(fx['pts']), jnp.asarray(fx['view']),
                   jnp.asarray(fx['nrm']))
    np.testing.assert_allclose(np.asarray(out['rgb_pr']), fx['rgb_pr'],
                               rtol=2e-4, atol=2e-5)
    for k in ('albedo', 'metallic', 'roughness', 'diffuse_color',
              'specular_color', 'diffuse_light', 'specular_light',
              'visibility', 'indirect_light', 'approximate_light'):
        np.testing.assert_allclose(
            np.asarray(out[k]), fx[f'out_{k}'], rtol=2e-4, atol=2e-5,
            err_msg=k)


def test_full_shade_gradients_match_reference(fx):
    """Pixel gradients (d loss / d pts) and parameter gradients of the
    full shade match torch autograd through the reference."""
    params, cfg = build_params_and_cfg(fx)
    trace = make_trace_fn(fx)
    view = jnp.asarray(fx['view'])
    nrm = jnp.asarray(fx['nrm'])

    def loss_pts(pts):
        out = _forward(params, cfg, trace, pts, view, nrm)
        return jnp.sum(out['rgb_pr']) + jnp.sum(out['diffuse_color'])

    g_pts = jax.grad(loss_pts)(jnp.asarray(fx['pts']))
    np.testing.assert_allclose(np.asarray(g_pts), fx['g_pts'],
                               rtol=2e-3, atol=2e-5)

    def loss_params(p):
        out = _forward(p, cfg, trace, jnp.asarray(fx['pts']), view, nrm)
        return jnp.sum(out['rgb_pr']) + jnp.sum(out['diffuse_color'])

    g = jax.grad(loss_params)(params)
    np.testing.assert_allclose(
        np.asarray(g['mat_field']['planes'][0]),
        np.transpose(fx['g_mat_plane0'][0], (2, 1, 0)),
        rtol=2e-3, atol=1e-6)
    # albedo head: both weight-norm leaves + biases
    for idx in (0, 2):
        got = np.asarray(g['albedo']['layers'][idx // 2]['v'])
        want = fx[f'g_albedo__{idx}_parametrizations_weight_original1'].T
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-6,
                                   err_msg=f'albedo v{idx}')
        got_b = np.asarray(g['albedo']['layers'][idx // 2]['b'])
        np.testing.assert_allclose(got_b, fx[f'g_albedo__{idx}_bias'],
                                   rtol=2e-3, atol=1e-6,
                                   err_msg=f'albedo b{idx}')


def test_full_shade_bf16_default_path(fx):
    """The shipped default estimator_dtype='bf16' against the same torch
    oracle, widened tolerance: catches regressions in the production bf16
    chain (the f32 cases above pin exactness; this pins the default)."""
    params, cfg = build_params_and_cfg(fx)
    cfg = cfg._replace(estimator_dtype='bf16')
    out = _forward(params, cfg, make_trace_fn(fx),
                   jnp.asarray(fx['pts']), jnp.asarray(fx['view']),
                   jnp.asarray(fx['nrm']))
    # bf16 quantization through the prob division gives ~11% worst-case
    # element error on this fixture; the guarded failure mode (bf16 NDF
    # cancellation) is >2x, so 0.15 still separates cleanly
    np.testing.assert_allclose(np.asarray(out['rgb_pr']), fx['rgb_pr'],
                               rtol=0.15, atol=0.01)
    for k in ('diffuse_color', 'specular_color', 'visibility'):
        np.testing.assert_allclose(
            np.asarray(out[k]), fx[f'out_{k}'], rtol=0.15, atol=0.01,
            err_msg=k)


# ---------------------------------------------------------------------------
# NIS path (flows LIVE): the paper's novel path at renderer level
# (ref: fields.py:1082-1143, 1160-1205, 1260-1269, 1271-1333)
# ---------------------------------------------------------------------------

NIS_FIX = os.path.join(os.path.dirname(__file__), 'fixtures',
                       'ref_renderer_nis.npz')


@pytest.fixture(scope='module')
def nfx():
    return dict(np.load(NIS_FIX))


def _plain_linear(z, key):
    return {'w': jnp.asarray(z[f'{key}_weight'].T),
            'b': jnp.asarray(z[f'{key}_bias'])}


def flow_params_from_torch(z, pre):
    """torch TensoFlow state -> our flow param pytree (same orientation
    conventions as the mat field: plane [1,C,g0,g1] -> [g_m0,g_m1,C])."""
    field = {
        'planes': [jnp.asarray(np.transpose(z[f'{pre}__nis_plane_{i}'][0],
                                            (2, 1, 0))) for i in range(3)],
        'lines': [jnp.asarray(z[f'{pre}__nis_line_{i}'][0, :, :, 0].T)
                  for i in range(3)],
    }
    blocks = [{'layers': [_plain_linear(z, f'{pre}__flows_{b}_nn_{i}')
                          for i in (1, 3, 5, 7)]} for b in (0, 1)]
    return {'field': field,
            'nis_mat': [_plain_linear(z, f'{pre}__nis_mat_0'),
                        _plain_linear(z, f'{pre}__nis_mat_2')],
            'blocks': blocks}


def build_nis_params_and_cfg(z):
    cfg = mc_shading.MCShadingConfig(
        diffuse_sample_num=16, specular_sample_num=8,
        nis_diffuse_sample_num=8, nis_specular_sample_num=4,
        outer_light_version='direction',
        use_nis_all=False, use_nis_diffuse=True, use_nis_specular=True,
        random_azimuth=False,
        grid_size=(32, 32, 32), inner_light_budget=0.0,
        secondary_budget=0.0, estimator_dtype='f32')
    params = mc_shading.init_mc_shading(jax.random.PRNGKey(0), cfg)
    params['mat_field'] = {
        'planes': [jnp.asarray(np.transpose(z[f'w_plane{i}'][0], (2, 1, 0)))
                   for i in range(3)],
        'lines': [jnp.asarray(z[f'w_line{i}'][0, :, :, 0].T)
                  for i in range(3)],
    }
    params['metallic'] = _predictor_from_torch(z, 'w_metallic', 2)
    params['roughness'] = _predictor_from_torch(z, 'w_roughness', 2)
    params['albedo'] = _predictor_from_torch(z, 'w_albedo', 2)
    params['outer_light'] = _predictor_from_torch(z, 'w_outer', 4)
    params['inner_light'] = _predictor_from_torch(z, 'w_inner', 4)
    params['flow_diffuse'] = flow_params_from_torch(z, 'w_fd')
    params['flow_specular'] = flow_params_from_torch(z, 'w_fs')
    return params, cfg


def _nis_forward(params, cfg, trace, pts, view, nrm, copies=None):
    # `copies` are the FROZEN sampling flows (requires_grad=False in the
    # reference, fields.py:1059-1065) — stop_gradient'ed so no spurious
    # grad path reaches the live flows through the sampler
    aabb = jnp.asarray([[-1.0] * 3, [1.0] * 3])
    phase = mc_shading.ShadePhase(
        nis_sample_diffuse=True, nis_sample_specular=True,
        nis_loss_diffuse=True, nis_loss_specular=True)
    copies = copies if copies is not None else params
    copies = jax.lax.stop_gradient(
        {k: copies[k] for k in ('flow_diffuse', 'flow_specular')})
    return mc_shading.mc_forward(
        params, cfg, trace, 2.0 / 511.0, aabb, pts, view, nrm,
        phase, jax.random.PRNGKey(0), False,
        flow_diffuse_copy=copies['flow_diffuse'],
        flow_specular_copy=copies['flow_specular'])


def test_nis_flow_copy_samples_match_reference(nfx):
    """The frozen-copy flow samples (Fibonacci prior -> pwquad coupling
    blocks) and their log-densities match torch exactly."""
    from tensoflow_tpu.fields import flow as flow_mod
    from tensoflow_tpu.ops.math import safe_normalize
    params, cfg = build_nis_params_and_cfg(nfx)
    aabb = jnp.asarray([[-1.0] * 3, [1.0] * 3])
    pts = jnp.asarray(nfx['pts'], jnp.float32)
    view = jnp.asarray(nfx['view'], jnp.float32)
    nrm = jnp.asarray(nfx['nrm'], jnp.float32)
    metallic, roughness, albedo = mc_shading.predict_materials(
        params, cfg, pts, aabb)
    va = mc_shading.direction_to_angle(
        safe_normalize(nrm), safe_normalize(view)[:, None, :])[:, 0]
    va01 = va / jnp.asarray([2 * np.pi, 0.5 * np.pi], va.dtype)
    for nm, pre, sn in (('diffuse', 'flow_diffuse', 8),
                        ('specular', 'flow_specular', 4)):
        x, logq = flow_mod.flow_sample(
            params[pre], cfg.flow, jax.random.PRNGKey(1), pts, aabb,
            va01, roughness, sn, train=False)
        np.testing.assert_allclose(np.asarray(x), nfx[f'{nm}_angles01'],
                                   rtol=1e-4, atol=2e-5, err_msg=nm)
        np.testing.assert_allclose(np.asarray(logq), nfx[f'{nm}_logq'],
                                   rtol=1e-3, atol=2e-4, err_msg=nm)


def test_nis_full_shade_matches_reference(nfx):
    """shade_mixed with BOTH flows live: mixed-estimator outputs, the
    half-vector-Jacobian pdfs (implicitly, through the mixed colors) and
    the NIS losses match torch."""
    params, cfg = build_nis_params_and_cfg(nfx)
    out = _nis_forward(params, cfg, make_trace_fn(nfx),
                       jnp.asarray(nfx['pts']), jnp.asarray(nfx['view']),
                       jnp.asarray(nfx['nrm']))
    np.testing.assert_allclose(np.asarray(out['rgb_pr']), nfx['rgb_pr'],
                               rtol=5e-4, atol=5e-5)
    for k in ('diffuse_color', 'specular_color', 'visibility',
              'albedo', 'metallic', 'roughness'):
        np.testing.assert_allclose(
            np.asarray(out[k]), nfx[f'out_{k}'], rtol=5e-4, atol=5e-5,
            err_msg=k)
    np.testing.assert_allclose(float(out['loss_nis_diffuse']),
                               float(nfx['loss_nis_diffuse']),
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(float(out['loss_nis_specular']),
                               float(nfx['loss_nis_specular']),
                               rtol=1e-3, atol=1e-5)


def test_nis_gradients_match_reference(nfx):
    """Gradients of (sum rgb + NIS losses) through the shading points AND
    the LIVE flow parameters (the NIS losses are the only path into the
    flows) match torch autograd."""
    params, cfg = build_nis_params_and_cfg(nfx)
    trace = make_trace_fn(nfx)
    view = jnp.asarray(nfx['view'])
    nrm = jnp.asarray(nfx['nrm'])

    def loss_pts(pts):
        out = _nis_forward(params, cfg, trace, pts, view, nrm)
        return (jnp.sum(out['rgb_pr']) + out['loss_nis_diffuse']
                + out['loss_nis_specular'])

    g_pts = jax.grad(loss_pts)(jnp.asarray(nfx['pts']))
    np.testing.assert_allclose(np.asarray(g_pts), nfx['g_pts'],
                               rtol=3e-3, atol=3e-5)

    def loss_params(p):
        out = _nis_forward(p, cfg, trace, jnp.asarray(nfx['pts']), view,
                           nrm)
        return (jnp.sum(out['rgb_pr']) + out['loss_nis_diffuse']
                + out['loss_nis_specular'])

    g = jax.grad(loss_params)(params)
    for nm, pre in (('fd', 'flow_diffuse'), ('fs', 'flow_specular')):
        got = np.asarray(g[pre]['field']['planes'][0])
        want = np.transpose(nfx[f'g_{nm}_plane0'][0], (2, 1, 0))
        np.testing.assert_allclose(got, want, rtol=3e-3, atol=1e-7,
                                   err_msg=f'{nm} plane0')
        got_w = np.asarray(g[pre]['blocks'][0]['layers'][0]['w'])
        np.testing.assert_allclose(got_w, nfx[f'g_{nm}_block0_w1'].T,
                                   rtol=3e-3, atol=1e-7,
                                   err_msg=f'{nm} block0 w1')
        got_m = np.asarray(g[pre]['nis_mat'][0]['w'])
        np.testing.assert_allclose(got_m, nfx[f'g_{nm}_nismat_w0'].T,
                                   rtol=3e-3, atol=1e-7,
                                   err_msg=f'{nm} nis_mat w0')
