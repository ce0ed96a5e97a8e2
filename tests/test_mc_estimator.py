"""Analytic validation of the stage-2 MC estimator.

Under a constant environment light L with no occluding geometry, the
diffuse term integrates exactly: E[albedo * kd * (cos/pi) * L / pdf] =
albedo * kd * L (the cosine-hemisphere integral of cos/pi is 1). This
pins down the estimator weights, pdfs and masking end-to-end.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensoflow_tpu.fields import mc_shading
from tensoflow_tpu.ops import sdf_trace
from tensoflow_tpu.ops.math import srgb_to_linear


@pytest.fixture(scope='module')
def setup():
    cfg = mc_shading.MCShadingConfig(
        diffuse_sample_num=256, specular_sample_num=64,
        grid_size=(16, 16, 16), light_reso=16,
        use_nis_diffuse=False, use_nis_specular=False,
        inner_light_budget=0.25)
    params = mc_shading.init_mc_shading(jax.random.PRNGKey(0), cfg)
    # no geometry anywhere: positive SDF everywhere -> all secondary rays
    # miss -> outer light only. init env light is constant exp(log 0.5)=0.5
    vals = np.full((32, 32, 32), 2.0, np.float32)
    grid = sdf_trace.SDFGrid(values=jnp.asarray(vals),
                             aabb=jnp.asarray([[-1.0] * 3, [1.0] * 3]))
    return cfg, params, grid


@pytest.mark.slow
def test_diffuse_estimator_matches_analytic(setup):
    cfg, params, grid = setup
    aabb = jnp.asarray([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]])
    rng = np.random.RandomState(0)
    n = 32
    normals = rng.randn(n, 3).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
    view = normals + 0.2 * rng.randn(n, 3).astype(np.float32)
    view /= np.linalg.norm(view, axis=-1, keepdims=True)
    pts = (0.1 * rng.randn(n, 3)).astype(np.float32)

    outputs = mc_shading.mc_forward(
        params, cfg, grid, 2.0 / 127, aabb, jnp.asarray(pts),
        jnp.asarray(view), jnp.asarray(normals),
        mc_shading.ShadePhase(), jax.random.PRNGKey(1), False)

    # analytic: diffuse_color_srgb = srgb(albedo * (1-metallic) * L), L=0.5
    metallic, roughness, albedo = mc_shading.predict_materials(
        params, cfg, jnp.asarray(pts), aabb)
    want_lin = np.asarray(albedo) * (1 - np.asarray(metallic)) * 0.5
    got_lin = np.asarray(srgb_to_linear(outputs['diffuse_color']))
    np.testing.assert_allclose(got_lin, want_lin, rtol=0.08, atol=5e-3)

    # no geometry -> full visibility, zero indirect light
    np.testing.assert_allclose(np.asarray(outputs['visibility']), 1.0,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(outputs['indirect_light']), 0.0,
                               atol=1e-6)


@pytest.mark.slow
def test_specular_estimator_white_furnace(setup):
    """Constant light: specular MC estimate should be finite, positive and
    bounded by the light level (energy conservation up to fresnel)."""
    cfg, params, grid = setup
    aabb = jnp.asarray([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]])
    rng = np.random.RandomState(1)
    n = 16
    normals = np.tile([[0.0, 0, 1]], (n, 1)).astype(np.float32)
    view = rng.randn(n, 3).astype(np.float32)
    view[:, 2] = np.abs(view[:, 2]) + 0.5
    view /= np.linalg.norm(view, axis=-1, keepdims=True)
    pts = (0.1 * rng.randn(n, 3)).astype(np.float32)

    outputs = mc_shading.mc_forward(
        params, cfg, grid, 2.0 / 127, aabb, jnp.asarray(pts),
        jnp.asarray(view), jnp.asarray(normals),
        mc_shading.ShadePhase(), jax.random.PRNGKey(2), False)
    spec = np.asarray(srgb_to_linear(outputs['specular_color']))
    assert np.isfinite(spec).all()
    assert (spec >= 0).all()
    assert (spec <= 0.5 * 1.2).all()  # bounded by light * margin


@pytest.mark.parametrize('olv,human', [
    pytest.param('direction', False, marks=pytest.mark.slow),
    ('sphere_direction', True)])
def test_outer_light_variants_forward(setup, olv, human):
    """MLP outer lights (direction / sphere_direction + human capturer
    light) shade finitely — the custom-scene config path."""
    _, _, grid = setup
    cfg = mc_shading.MCShadingConfig(
        diffuse_sample_num=16, specular_sample_num=8,
        grid_size=(16, 16, 16), light_reso=16, outer_light_version=olv,
        human_lights=human, inner_light_budget=0.25)
    params = mc_shading.init_mc_shading(jax.random.PRNGKey(0), cfg)
    aabb = jnp.asarray([[-1.0] * 3, [1.0] * 3])
    rng = np.random.RandomState(3)
    n = 4
    nrm = rng.randn(n, 3).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    view = nrm + 0.2 * rng.randn(n, 3).astype(np.float32)
    view /= np.linalg.norm(view, axis=-1, keepdims=True)
    pts = (0.1 * rng.randn(n, 3)).astype(np.float32)
    hp = (jnp.asarray(np.tile(np.eye(3, 4, dtype=np.float32), (n, 1, 1)))
          if human else None)
    out = mc_shading.mc_forward(
        params, cfg, grid, 2.0 / 127, aabb, jnp.asarray(pts),
        jnp.asarray(view), jnp.asarray(nrm), mc_shading.ShadePhase(),
        jax.random.PRNGKey(1), True, human_poses=hp)
    v = np.asarray(out['rgb_pr'])
    assert np.isfinite(v).all() and (v > 0).all()


def test_one_field_pack_per_step():
    """No VM field pytree (material or live/frozen flow) packs a gather
    atlas inside a traced stage-2 shade step: small-point-count evals
    sample raw planes directly (round-4; supersedes round-2 verdict W3's
    one-pack-per-field — per-call packing at 512^3 would rebuild
    multi-hundred-MB atlases, and even one pack per step is ~12ms)."""
    from tensoflow_tpu.ops import tensor_field as tfield

    cfg = mc_shading.MCShadingConfig(
        diffuse_sample_num=16, specular_sample_num=8,
        nis_diffuse_sample_num=4, nis_specular_sample_num=4,
        grid_size=(8, 8, 8), light_reso=8,
        use_nis_diffuse=True, use_nis_specular=True,
        inner_light_budget=0.25)
    params = mc_shading.init_mc_shading(jax.random.PRNGKey(0), cfg)
    frozen = {'flow_diffuse': jax.tree_util.tree_map(
                  jnp.copy, params['flow_diffuse']),
              'flow_specular': jax.tree_util.tree_map(
                  jnp.copy, params['flow_specular'])}
    vals = np.full((16, 16, 16), 2.0, np.float32)
    grid = sdf_trace.SDFGrid(values=jnp.asarray(vals),
                             aabb=jnp.asarray([[-1.0] * 3, [1.0] * 3]))

    counts = []
    orig = tfield.pack_vm_field

    def counting_pack(field, *a, **kw):
        counts.append(id(field['planes'][0]))
        return orig(field, *a, **kw)

    phase = mc_shading.ShadePhase(nis_sample_diffuse=True,
                                  nis_sample_specular=True,
                                  nis_loss_diffuse=True,
                                  nis_loss_specular=True)
    pn = 4
    pts = jnp.zeros((pn, 3))
    nrm = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (pn, 1))
    view = jnp.tile(jnp.asarray([[0.3, 0.1, 0.9]]), (pn, 1))
    tfield.pack_vm_field = counting_pack
    try:
        jax.make_jaxpr(
            lambda p, fz: mc_shading.mc_forward(
                p, cfg, grid, 2.0 / 16, grid.aabb, pts, view, nrm,
                phase, jax.random.PRNGKey(1), True,
                flow_diffuse_copy=fz['flow_diffuse'],
                flow_specular_copy=fz['flow_specular']))(params, frozen)
    finally:
        tfield.pack_vm_field = orig
    # round-4: stage-2 field evals (~2k pts/step, always level 0) sample
    # the raw planes directly — NO atlas packs inside the step at all
    # (packing cost ~12ms/field/step served a few thousand gathers;
    # round-2's one-pack-per-field invariant is superseded)
    assert len(counts) == 0, counts


@pytest.mark.parametrize('alpha', [0.04 ** 2, 0.01])
def test_bf16_estimator_low_roughness(setup, alpha):
    """bf16 estimator chain vs f32 at glossy (low-alpha) roughness.

    Regression for the bf16 GGX NDF cancellation: the denom
    noh^2*(a2-1)+1 cancels catastrophically in bf16 when importance
    sampling drives noh -> 1 and a2 ~ 1e-6 (62% of D evals off by >2x at
    the predict_materials floor before the NDF was pinned to f32)."""
    cfg, params, grid = setup
    aabb = jnp.asarray([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]])
    rng = np.random.RandomState(3)
    n = 16
    normals = rng.randn(n, 3).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
    view = normals + 0.3 * rng.randn(n, 3).astype(np.float32)
    view /= np.linalg.norm(view, axis=-1, keepdims=True)
    pts = (0.1 * rng.randn(n, 3)).astype(np.float32)
    metallic = jnp.full((n, 1), 0.9)
    roughness = jnp.full((n, 1), alpha)
    albedo = jnp.full((n, 3), 0.8)

    outs = {}
    for dt in ('f32', 'bf16'):
        c = cfg._replace(estimator_dtype=dt)
        colors, o = mc_shading.shade_mixed(
            params, c, grid, 2.0 / 127, aabb, jnp.asarray(pts),
            jnp.asarray(normals), jnp.asarray(view), metallic, roughness,
            albedo, mc_shading.ShadePhase(), jax.random.PRNGKey(4), False)
        outs[dt] = np.asarray(srgb_to_linear(o['specular_color']))
    assert np.isfinite(outs['bf16']).all()
    np.testing.assert_allclose(outs['bf16'], outs['f32'],
                               rtol=0.12, atol=2e-3)
