"""Secondary benchmark: stage-2 (material) train-step throughput.

Same protocol as bench.py (host-fetch timing, best-of-3 windows); prints one
JSON line.  bench.py calls run() so the driver's BENCH_r*.json records both
stages.  Geometry stand-in: an analytic sphere baked to the SDF trace grid
at 128^3 (labelled in the metric — no real dataset ships in this image).

STAGE-2 ANCHOR (vs_baseline denominator).  The reference repo publishes no
stage-2 timing; the anchor below is an op-count estimate of its MC step
(materialRenderer.py:537-564) on the RTX-3090-class GPU its README targets:
  * secondary rays: 2048 pts x (512+64 diffuse + 256+32 specular) = 1.77M
    BVH traces (ashawkey/_raytracing, ~1 Grays/s on simple meshes) ~ 2 ms
  * light eval (fields.py:905-975): hit fraction ~30% through the 256-wide
    inner-light MLP -> ~0.9 TFLOP fwd+bwd ~ 30-60 ms at realistic fp32
    utilisation; misses hit the cubemap texture (cheap)
  * MC estimator elementwise chains over [1.77M,3] incl. autograd:
    ~10 GB traffic ~ 11 ms at ~900 GB/s
  * two coupling-flow fwd/inv passes at 2048x96 + NIS losses + optimizer
    + per-step torch launch overhead ~ 15-25 ms
Total ~ 60-100 ms/step -> 20-34k rays/s; anchor pinned at the midpoint
25k rays/s (coincidentally equal to the stage-1 anchor: both stages are
configured at 2048 rays/step and land near 80 ms on that hardware class).
"""
from __future__ import annotations

import json
import time

import numpy as np

STAGE2_BASELINE_RAYS_PER_S = 25000.0   # see module docstring


def run():
    import jax
    import jax.numpy as jnp
    jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache_tpu')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    from tensoflow_tpu import config as config_mod
    from tensoflow_tpu.fields import mc_shading
    from tensoflow_tpu.models import material_renderer as mr
    from tensoflow_tpu.ops import sdf_trace
    from tensoflow_tpu.train import losses
    from tensoflow_tpu.train.trainer_mat import (build_material_config,
                                                 make_mat_optimizer)
    import optax

    rays = 2048
    cfg = config_mod.load_config(extra={
        'train_ray_num': rays, 'isMaterial': True,
        'shader_cfg': {'outer_light_version': 'envlight'},
    })
    geo_kwargs = {'grid_size': [128, 128, 128], 'sdf_n_comp': 36,
                  'sdf_dim': 256, 'app_dim': 128, 'n_levels': 1,
                  'aabb': [[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]]}
    rcfg = build_material_config(cfg, geo_kwargs)

    # analytic sphere SDF grid as the frozen geometry stand-in
    xs = np.linspace(-1, 1, rcfg.bake_resolution, dtype=np.float32)
    xx, yy, zz = np.meshgrid(xs, xs, xs, indexing='ij')
    vals = np.sqrt(xx ** 2 + yy ** 2 + zz ** 2) - 0.5
    grid = sdf_trace.pack_sdf_grid(sdf_trace.SDFGrid(
        values=jnp.asarray(vals),
        aabb=jnp.asarray([[-1.0] * 3, [1.0] * 3])))

    params = mc_shading.init_mc_shading(jax.random.PRNGKey(0), rcfg.shader)
    tx, opt_state = make_mat_optimizer(cfg, params, 0)
    weights = losses.schedule_weights(cfg, 2000)

    rng = np.random.RandomState(0)
    d = rng.randn(rays, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    pts = (d * 0.5).astype(np.float32)          # on the sphere surface
    batch = {
        'inters': jnp.asarray(pts),
        'normals': jnp.asarray(d),
        'rays_d': jnp.asarray(-d),
        'rgb': jnp.asarray(rng.rand(rays, 3).astype(np.float32)),
    }
    phase = mc_shading.ShadePhase(nis_loss_diffuse=True,
                                  nis_loss_specular=True)

    # grid must be a jit ARG — a closed-over packed grid becomes a 268MB
    # HLO constant and the axon remote compile rejects it (HTTP 413)
    def step_fn(params, opt_state, grid, batch, step, weights, rng):
        def loss_fn(p):
            outputs = mr.train_step_outputs(p, rcfg, grid, batch, phase,
                                            rng, step)
            total, _ = losses.total_loss_material(outputs, weights)
            return total
        total, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, total

    jitted = jax.jit(step_fn)
    params, opt_state, total = jitted(params, opt_state, grid, batch, 2000,
                                      weights, jax.random.PRNGKey(0))
    float(total)

    n_iters = 5
    best_dt = float('inf')
    for w in range(3):
        t0 = time.perf_counter()
        for i in range(n_iters):
            params, opt_state, total = jitted(
                params, opt_state, grid, batch, 2000 + i, weights,
                jax.random.PRNGKey(w * n_iters + i))
        float(total)
        best_dt = min(best_dt, time.perf_counter() - t0)

    rays_per_s = rays * n_iters / best_dt
    return {
        'metric': 'stage2_train_rays_per_s_per_chip',
        'value': round(rays_per_s, 1),
        'unit': 'rays/s',
        'vs_baseline': round(rays_per_s / STAGE2_BASELINE_RAYS_PER_S, 3),
        'step_ms': round(1e3 * best_dt / n_iters, 2),
        'geometry': 'analytic sphere @128^3 bake (no dataset in image)',
    }


def main():
    print(json.dumps(run()))


if __name__ == '__main__':
    main()
