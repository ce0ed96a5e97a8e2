"""Occ-loss march sources: baked-lattice vs live-field (stage-1).

The occ-grid branch marches a BAKED SDF lattice (re-baked at every
occupancy update; ref shapeRenderer.py:1056-1100 accelerates the same
march with its occ grid); the fallback branch marches the live field
(ref get_intersection, shapeRenderer.py:1052-1054).  Both targets are
stop_gradient'ed, so the bake changes only forward cost — this test pins
the two branches to each other on a smooth (circle-init) SDF.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensoflow_tpu import config as config_mod
from tensoflow_tpu.fields import light as light_mod
from tensoflow_tpu.models import shape_renderer as sr
from tensoflow_tpu.ops import grid as grid_mod
from tensoflow_tpu.train.trainer import build_shape_config


@pytest.fixture(scope='module')
def setup():
    cfg = config_mod.load_config(extra={
        'train_ray_num': 64,
        'sdf_n_comp': 8, 'sdf_dim': 64, 'app_dim': 32,
        'use_occ_grid': True, 'occ_grid_reso': 48,
        'occ_max_samples': 32,
        'apply_occ_loss': True, 'occ_loss_step': -1,
        'occ_loss_max_pn': 64,
        'has_radiance_field': False,
    })
    rcfg = build_shape_config(cfg, (48, 48, 48), 1)
    params = sr.init_shape_renderer(jax.random.PRNGKey(0), rcfg)
    occ_cfg = grid_mod.OccGridConfig(resolution=48)
    occ_state = grid_mod.init_occ_grid(occ_cfg)
    centers = grid_mod.occ_grid_cell_centers(occ_cfg)
    alphas = sr.compute_occ_alpha_chunked(params, rcfg, centers)
    sdf = sr.compute_sdf_chunked(params, rcfg, centers)
    occ_state = grid_mod.update_occ_grid(occ_state, occ_cfg, alphas, 0,
                                         sdf=sdf)
    return cfg, rcfg, params, occ_state


def _batch(rays):
    rng = np.random.RandomState(3)
    o = rng.uniform(-1, 1, (rays, 3)).astype(np.float32)
    o = o / np.linalg.norm(o, axis=-1, keepdims=True) * 2.0
    d = -o + 0.05 * rng.randn(rays, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return {
        'rays_o': jnp.asarray(o), 'rays_d': jnp.asarray(d),
        'dirs': jnp.asarray(d),
        'radiis': jnp.full((rays, 1), 1e-3, jnp.float32),
        'rays_cos': jnp.ones((rays, 1), jnp.float32),
        'rgbs': jnp.asarray(rng.rand(rays, 3), jnp.float32),
        'masks': jnp.ones((rays, 1), jnp.float32),
    }


@pytest.mark.slow
def test_baked_march_matches_field_march(setup):
    cfg, rcfg, params, occ_state = setup
    batch = _batch(64)
    mips = light_mod.build_mips(params['shading']['envlight'],
                                rcfg.shading.env)

    def run(state):
        out = sr.render_rays(params, rcfg, mips, state, batch, 100, 1.0,
                             jax.random.PRNGKey(7), True,
                             occ_loss_on=True)
        return float(out['loss_occ'])

    baked = run(occ_state)
    field = run({k: v for k, v in occ_state.items() if k != 'sdf_rows'})
    assert np.isfinite(baked) and np.isfinite(field)
    # both march the same geometry; the lattice is trilinear at 48^3, so
    # the targets agree to interpolation error
    assert abs(baked - field) < 0.05, (baked, field)


def test_baked_sdf_interpolates_field(setup):
    cfg, rcfg, params, occ_state = setup
    occ_cfg = grid_mod.OccGridConfig(resolution=48)
    rng = np.random.RandomState(0)
    pts = jnp.asarray(rng.uniform(-0.7, 0.7, (512, 3)), jnp.float32)
    baked = grid_mod.sample_occ_sdf(occ_state, occ_cfg, pts)
    aabb = sr.aabb_array(rcfg)
    from tensoflow_tpu.fields import tenso_sdf
    live = tenso_sdf.sdf_only(params['sdf'], rcfg.sdf, pts, aabb)[:, 0]
    err = np.abs(np.asarray(baked) - np.asarray(live))
    assert float(np.median(err)) < 0.01
    assert float(err.max()) < 0.08
