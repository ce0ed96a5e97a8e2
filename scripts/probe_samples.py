#!/usr/bin/env python
"""Probe the occ-sampler's per-ray valid-sample statistics in the exact
bench.py stage-1 configuration.

The compaction budget (compact_samples_per_ray, 64 in the bench) sizes
EVERY sample-proportional cost — stencil kernels, gathers, scatter-adds.
The reference's nerfacc estimator pays only for actually-occupied
samples; if the p99 here is well under the budget, the budget (not the
algorithm) is the throughput limiter.  Usage:
    python scripts/probe_samples.py [rays]
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache_tpu')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    from tensoflow_tpu import config as config_mod
    from tensoflow_tpu.models import shape_renderer as sr
    from tensoflow_tpu.ops import grid as grid_mod
    from tensoflow_tpu.train.trainer import build_shape_config

    rays = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    cfg = config_mod.load_config(extra={
        'train_ray_num': rays,
        'sdf_n_comp': 36, 'sdf_dim': 256, 'app_dim': 128,
        'use_occ_grid': True, 'occ_grid_reso': 128,
        'occ_max_samples': 192,
        'gather_dtype': 'bfloat16',
    })
    rcfg = build_shape_config(cfg, (128, 128, 128), 1)
    params = sr.init_shape_renderer(jax.random.PRNGKey(0), rcfg)
    occ_cfg = grid_mod.OccGridConfig(resolution=128)
    occ_state = grid_mod.init_occ_grid(occ_cfg)
    centers = grid_mod.occ_grid_cell_centers(occ_cfg)
    alphas = jax.jit(lambda p, c: sr.compute_occ_alpha_chunked(p, rcfg, c))(
        params, centers)
    sdf0 = jax.jit(lambda p, c: sr.compute_sdf_chunked(p, rcfg, c))(
        params, centers)
    occ_state = grid_mod.update_occ_grid(occ_state, occ_cfg, alphas, 0,
                                         sdf=sdf0)

    rng = np.random.RandomState(0)
    o = rng.uniform(-1, 1, (rays, 3)).astype(np.float32)
    o = o / np.linalg.norm(o, axis=-1, keepdims=True) * 2.0
    d = -o / np.linalg.norm(o, axis=-1, keepdims=True)
    d += 0.1 * rng.randn(rays, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    near = jnp.full((rays, 1), 0.5, jnp.float32)
    far = jnp.full((rays, 1), 3.5, jnp.float32)
    voxel = 2.0 / rcfg.occ_grid_reso
    step = rcfg.step_ratio * voxel
    n_cand = int(np.ceil(3.0 / step))

    @jax.jit
    def counts(state, o, d):
        ts, te, mask = grid_mod.occ_grid_sampling(
            state, occ_cfg, o, d, near, far, float(step), n_cand,
            rcfg.occ_max_samples)
        return jnp.sum(mask.astype(jnp.int32), axis=1)

    c = np.asarray(counts(occ_state, jnp.asarray(o), jnp.asarray(d)))
    print(f'rays={rays} budget={rcfg.compact_samples_per_ray} '
          f'occ_max={rcfg.occ_max_samples}')
    print(f'valid samples/ray: mean={c.mean():.1f} median={np.median(c):.0f}'
          f' p95={np.percentile(c, 95):.0f} p99={np.percentile(c, 99):.0f}'
          f' max={c.max()}')
    total = c.sum()
    budget = rays * rcfg.compact_samples_per_ray
    print(f'total valid={total} global budget={budget} '
          f'utilization={100.0 * total / budget:.1f}%')


if __name__ == '__main__':
    main()
