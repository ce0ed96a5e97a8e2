"""SHAPE-renderer geometry-core parity vs the torch reference (fixtures
from scripts/gen_ref_shape_fixtures.py): the NeuS hierarchical sampler,
the TensoSDF mip-field + FD stencil (sdf/gradient/hessian), NeuS alpha,
nerfacc-semantics compositing weights — values AND gradients
(ref: shapeRenderer.py:871-1025, fields.py:227-317)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensoflow_tpu.fields import mlp, tenso_sdf
from tensoflow_tpu.models import shape_renderer as sr
from tensoflow_tpu.ops import composite

FIX = os.path.join(os.path.dirname(__file__), 'fixtures', 'ref_shape.npz')


@pytest.fixture(scope='module')
def fx():
    return dict(np.load(FIX))


def build_params_and_cfg(fx):
    sdf_cfg = tenso_sdf.SDFConfig(
        grid_size=(32, 32, 32), n_comp=8, sdf_dim=64, app_dim=16,
        n_levels=3, sdf_multires=3)
    rcfg = sr.ShapeRendererConfig(
        sdf=sdf_cfg, aabb=((-1.0,) * 3, (1.0,) * 3),
        n_samples=24, n_importance=16, up_sample_steps=4,
        perturb=0.0, clip_sample_variance=True, use_occ_grid=False,
        std_act='exp', inv_s_init=0.3)
    params = {
        'sdf': {
            'field': {
                # same plane-orientation mapping as the MC fixture
                # (dr.texture u->W): [1,C,g0,g1] -> ours [g0,g1,C] via
                # transpose (2,1,0)
                'planes': [jnp.asarray(
                    np.transpose(fx[f'w_sdf_plane{i}'][0], (2, 1, 0)))
                    for i in range(3)],
                'lines': [jnp.asarray(fx[f'w_sdf_line{i}'][0, :, :, 0].T)
                          for i in range(3)],
            },
            'mlp': [
                {'w': jnp.asarray(fx['w_mlp0_w'].T),
                 'b': jnp.asarray(fx['w_mlp0_b'])},
                {'w': jnp.asarray(fx['w_mlp1_w'].T),
                 'b': jnp.asarray(fx['w_mlp1_b'])},
            ],
        },
        'deviation': {'variance': jnp.asarray(fx['w_variance'])},
    }
    return params, rcfg


def test_hierarchical_sampler_matches_reference(fx):
    """Per-ray z-value sets of the 4-step NeuS importance sampler agree
    (ours is fixed-shape + mask; the reference emits inner-filtered flat
    lists)."""
    params, rcfg = build_params_and_cfg(fx)
    t_starts, t_ends, mask = sr.sample_ray_hierarchical(
        params, rcfg, jnp.asarray(fx['o']), jnp.asarray(fx['d']),
        jnp.asarray(fx['near']), jnp.asarray(fx['far']),
        jnp.asarray(fx['radiis']), jnp.asarray(fx['rays_cos']),
        jax.random.PRNGKey(0), is_train=False)
    t_starts = np.asarray(t_starts)
    mask = np.asarray(mask)
    rn = fx['o'].shape[0]
    for r in range(rn):
        ours = np.sort(t_starts[r][mask[r]])
        ref = np.sort(fx['t_starts'][fx['ray_indices'] == r])
        assert len(ours) == len(ref), (r, len(ours), len(ref))
        # positions agree to ~1e-3 (f32 accumulation through 4 chained
        # inverse-CDF rounds) — well under the ~1e-2 sample spacing
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=2e-3,
                                   err_msg=f'ray {r}')


def _flat_eval(params, rcfg, fx):
    """Our stencil path + NeuS alpha on the REFERENCE's sample list."""
    aabb = jnp.asarray(rcfg.aabb)
    ray_idx = fx['ray_indices']
    pts = (fx['o'][ray_idx]
           + fx['d'][ray_idx] * (0.5 * (fx['t_starts'] + fx['t_ends'])
                                 )[:, None]).astype(np.float32)
    dists = (fx['t_ends'] - fx['t_starts']).astype(np.float32)
    dirs = fx['d'][ray_idx].astype(np.float32)

    def compute(p):
        packed = tenso_sdf.pack_field(p['sdf'], rcfg.sdf)
        sdf, app, grads, hess = tenso_sdf.sdf_with_grad_hessian(
            p['sdf'], rcfg.sdf, jnp.asarray(pts), aabb,
            jnp.asarray(fx['levels']), with_hessian=True, packed=packed)
        inv_s = jnp.clip(mlp.apply_variance(p['deviation'], rcfg.std_act),
                         1e-6, 1e6)
        true_cos = jnp.sum(jnp.asarray(dirs) * grads, -1)
        iter_cos = composite.anneal_cos(true_cos, 0.37)
        alpha = composite.neus_alpha(sdf, inv_s, iter_cos,
                                     jnp.asarray(dists))
        return sdf, grads, hess, alpha, inv_s
    return compute, pts


def test_stencil_alpha_matches_reference(fx):
    params, rcfg = build_params_and_cfg(fx)
    compute, _ = _flat_eval(params, rcfg, fx)
    sdf, grads, hess, alpha, inv_s = compute(params)
    np.testing.assert_allclose(np.asarray(sdf), fx['sdf'],
                               rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(grads), fx['gradients'],
                               rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(hess), fx['hessian'],
                               rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(alpha), fx['alpha'],
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(float(inv_s), fx['inv_s'][0], rtol=1e-5)


def test_compositing_and_gradients_match_reference(fx):
    """compact_weights == nerfacc render_weight_from_alpha on the flat
    sorted list, and the full loss gradients (planes, MLP, variance)
    match torch autograd."""
    params, rcfg = build_params_and_cfg(fx)
    compute, _ = _flat_eval(params, rcfg, fx)
    rn = fx['o'].shape[0]
    ray_id = jnp.asarray(fx['ray_indices'], jnp.int32)
    slot_mask = jnp.ones((len(fx['ray_indices']),), bool)
    mid_t = jnp.asarray(0.5 * (fx['t_starts'] + fx['t_ends']))

    def loss_fn(p):
        sdf, grads, hess, alpha, _ = compute(p)
        w = composite.compact_weights(alpha, slot_mask, ray_id, rn)
        sums = composite.segment_sums_sorted(
            jnp.stack([w, w * mid_t], -1), ray_id, rn)
        eik = jnp.mean((jnp.linalg.norm(grads, axis=-1) - 1.0) ** 2)
        hess_l = jnp.mean(jnp.abs(hess))
        return (jnp.sum(sums[:, 0]) + jnp.sum(sums[:, 1]) + eik + hess_l,
                (w, sums))

    (loss, (w, sums)), g = jax.value_and_grad(
        loss_fn, has_aux=True)(params)
    np.testing.assert_allclose(np.asarray(w), fx['weights'],
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(sums[:, 0]), fx['acc'],
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(sums[:, 1]), fx['depth'],
                               rtol=2e-4, atol=2e-4)

    gp = np.transpose(np.asarray(g['sdf']['field']['planes'][0]),
                      (2, 1, 0))[None]
    np.testing.assert_allclose(gp, fx['g_sdf_plane0'],
                               rtol=2e-3, atol=2e-5)
    np.testing.assert_allclose(np.asarray(g['sdf']['mlp'][0]['w']).T,
                               fx['g_sdf_mlp_w0'], rtol=2e-3, atol=2e-5)
    np.testing.assert_allclose(float(g['deviation']['variance']),
                               float(fx['g_variance']), rtol=2e-3)
