"""Sample-compaction correctness: compacted rendering must match dense."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensoflow_tpu.fields import light as light_mod
from tensoflow_tpu.models import shape_renderer as sr
from tensoflow_tpu.ops import grid as grid_mod
from tensoflow_tpu.train.trainer import build_shape_config
from tensoflow_tpu import config as config_mod


def test_compact_indices_roundtrip():
    rng = np.random.RandomState(0)
    valid = jnp.asarray(rng.rand(200) < 0.3)
    vals = jnp.asarray(rng.randn(200, 3).astype(np.float32))
    src, slot_mask, dest = grid_mod.compact_indices(valid, 64)
    compacted = vals[src]
    back = grid_mod.scatter_back(compacted, dest, fill=-7.0)
    v = np.asarray(valid)
    np.testing.assert_allclose(np.asarray(back)[v], np.asarray(vals)[v])
    assert (np.asarray(back)[~v] == -7.0).all()
    assert int(slot_mask.sum()) == int(v.sum())


def test_compact_indices_budget_truncation():
    valid = jnp.ones((100,), bool)
    src, slot_mask, dest = grid_mod.compact_indices(valid, 40)
    assert int(slot_mask.sum()) == 40
    # first 40 sources kept in order
    np.testing.assert_array_equal(np.asarray(src), np.arange(40))
    d = np.asarray(dest)
    assert (d[:40] == np.arange(40)).all()
    assert (d[40:] == 40).all()  # dropped


@pytest.mark.slow
def test_dense_vs_compacted_render_agree():
    cfg = config_mod.load_config(extra={
        'train_ray_num': 64, 'n_samples': 8, 'n_importance': 8,
        'sdf_n_comp': 8, 'sdf_dim': 64, 'app_dim': 32,
        'use_occ_grid': True, 'occ_grid_reso': 32, 'occ_max_samples': 32,
        'apply_occ_loss': False, 'perturb': 0.0,
    })
    rcfg_d = build_shape_config(cfg, (32, 32, 32), 1)._replace(
        compact_samples_per_ray=0)
    rcfg_c = rcfg_d._replace(compact_samples_per_ray=32)  # full budget
    params = sr.init_shape_renderer(jax.random.PRNGKey(0), rcfg_d)
    occ_cfg = grid_mod.OccGridConfig(resolution=32)
    occ_state = grid_mod.init_occ_grid(occ_cfg)
    centers = grid_mod.occ_grid_cell_centers(occ_cfg)
    alphas = sr.compute_occ_alpha(params, rcfg_d, centers)
    occ_state = grid_mod.update_occ_grid(occ_state, occ_cfg, alphas, 0)

    rng = np.random.RandomState(0)
    n = 64
    o = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    o = o / np.linalg.norm(o, axis=-1, keepdims=True) * 2.0
    d = -o / 2 + 0.05 * rng.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    batch = {'rays_o': jnp.asarray(o), 'rays_d': jnp.asarray(d),
             'dirs': jnp.asarray(d),
             'radiis': jnp.full((n, 1), 1e-3),
             'rays_cos': jnp.ones((n, 1)),
             'rgbs': jnp.asarray(rng.rand(n, 3).astype(np.float32))}
    key = jax.random.PRNGKey(1)

    outs = {}
    for name, rcfg in (('dense', rcfg_d), ('compact', rcfg_c)):
        mips = light_mod.build_mips(params['shading']['envlight'],
                                    rcfg.shading.env)
        outs[name] = sr.render_rays(params, rcfg, mips, occ_state, batch,
                                    0, 1.0, key, False)
    np.testing.assert_allclose(np.asarray(outs['dense']['ray_rgb']),
                               np.asarray(outs['compact']['ray_rgb']),
                               atol=2e-5)
    np.testing.assert_allclose(float(outs['dense']['gradient_error']),
                               float(outs['compact']['gradient_error']),
                               rtol=2e-4)
    np.testing.assert_allclose(np.asarray(outs['dense']['acc']),
                               np.asarray(outs['compact']['acc']),
                               atol=2e-5)
