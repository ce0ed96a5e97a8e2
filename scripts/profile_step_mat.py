#!/usr/bin/env python
"""Capture a device trace of the stage-2 (material) bench step and dump
per-op durations. Usage:
    python scripts/profile_step_mat.py [outdir]
then:
    protoc --decode_raw < <outdir>/plugins/profile/*/*.xplane.pb > /tmp/xm.txt
    python scripts/parse_xplane.py /tmp/xm.txt | head -60
"""
import glob
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = sys.argv[1] if len(sys.argv) > 1 else '/tmp/prof_mat'


def main():
    import jax
    jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache_tpu')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    import bench_material

    # reuse the bench's exact setup up to the first executed step by
    # tracing three steady-state steps under the profiler
    import jax.numpy as jnp
    import numpy as np
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
    batch = {
        'inters': jnp.asarray((d * 0.5).astype(np.float32)),
        'normals': jnp.asarray(d),
        'rays_d': jnp.asarray(-d),
        'rgb': jnp.asarray(rng.rand(rays, 3).astype(np.float32)),
    }
    phase = mc_shading.ShadePhase(nis_loss_diffuse=True,
                                  nis_loss_specular=True)

    def step_fn(params, opt_state, grid, batch, step, weights, rng):
        def loss_fn(p):
            outputs = mr.train_step_outputs(p, rcfg, grid, batch, phase,
                                            rng, step)
            total, _ = losses.total_loss_material(outputs, weights)
            return total
        total, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return params, opt_state, total

    jitted = jax.jit(step_fn)
    params, opt_state, total = jitted(params, opt_state, grid, batch, 2000,
                                      weights, jax.random.PRNGKey(0))
    float(total)

    with jax.profiler.trace(OUT):
        for i in range(3):
            params, opt_state, total = jitted(
                params, opt_state, grid, batch, 2001 + i, weights,
                jax.random.PRNGKey(i))
        float(total)

    pbs = glob.glob(os.path.join(OUT, 'plugins/profile/*/*.xplane.pb'))
    print('trace:', pbs)
    if pbs:
        with open('/tmp/xplane_mat.txt', 'w') as f:
            subprocess.run(['protoc', '--decode_raw'],
                           stdin=open(pbs[0], 'rb'), stdout=f, check=True)
        print('decoded -> /tmp/xplane_mat.txt')


if __name__ == '__main__':
    main()
