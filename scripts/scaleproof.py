#!/usr/bin/env python
"""Scale-proof the stage-1 schedule: compile + time the train step at each
grid phase of the 128^3 -> 512^3 upsample schedule (VERDICT r1 item 5).

Usage: python scripts/scaleproof.py [reso ...]   (default 128 256 512)
Prints one line per phase: grid, n_levels, compile_s, step_ms, rays/s.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def run_phase(reso, n_levels, trace=False):
    import jax
    import jax.numpy as jnp
    from tensoflow_tpu import config as config_mod
    from tensoflow_tpu.fields import light as light_mod
    from tensoflow_tpu.models import shape_renderer as sr
    from tensoflow_tpu.ops import grid as grid_mod
    from tensoflow_tpu.train import losses
    from tensoflow_tpu.train.trainer import build_shape_config, make_optimizer
    import optax

    rays = 2048
    cfg = config_mod.load_config(extra={
        'train_ray_num': rays,
        'sdf_n_comp': 36, 'sdf_dim': 256, 'app_dim': 128,
        'use_occ_grid': True, 'occ_grid_reso': 128,
        'occ_max_samples': 192,
        'apply_occ_loss': True, 'occ_loss_step': -1,
        'occ_loss_max_pn': 2048,
        'has_radiance_field': False,
        'apply_mask_loss': True,
        'gather_dtype': 'bfloat16',
    })
    rcfg = build_shape_config(cfg, (reso, reso, reso), n_levels)
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
    tx, opt_state = make_optimizer(cfg, params, 0)
    weights = losses.schedule_weights(cfg, 30000)

    rng = np.random.RandomState(0)
    o = rng.uniform(-1, 1, (rays, 3)).astype(np.float32)
    o = o / np.linalg.norm(o, axis=-1, keepdims=True) * 2.0
    d = -o / np.linalg.norm(o, axis=-1, keepdims=True)
    d += 0.1 * rng.randn(rays, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    # adaptive sample budget, sized EXACTLY like the trainer's
    # maybe_adapt_budget (mirrors bench.py; a fixed 64 budget measures
    # dead compaction slots the production trainer would have shed)
    from tensoflow_tpu.train.trainer import BUDGET_BUCKETS, BUDGET_MARGIN
    import jax.numpy as jnp
    voxel = (occ_cfg.aabb_max - occ_cfg.aabb_min) / occ_cfg.resolution
    mstep = rcfg.step_ratio * voxel
    n_cand = int(np.ceil(3.0 / mstep))

    @jax.jit
    def _mean_valid(state, oo, dd):
        near = jnp.full((rays, 1), 0.5, jnp.float32)
        far = jnp.full((rays, 1), 3.5, jnp.float32)
        _, _, mask = grid_mod.occ_grid_sampling(
            state, occ_cfg, oo, dd, near, far, float(mstep), n_cand,
            rcfg.occ_max_samples)
        return jnp.mean(jnp.sum(mask.astype(jnp.float32), axis=1))

    mean_valid = float(_mean_valid(occ_state, jnp.asarray(o),
                                   jnp.asarray(d)))
    cap = rcfg.compact_samples_per_ray
    budget = next((b for b in BUDGET_BUCKETS
                   if b >= mean_valid * BUDGET_MARGIN and b <= cap), cap)
    rcfg = rcfg._replace(compact_samples_per_ray=budget)
    print(f'[budget] mean_valid={mean_valid:.1f} -> '
          f'compact_samples_per_ray={budget}', flush=True)
    batch = {k: jnp.asarray(v) for k, v in {
        'rays_o': o, 'rays_d': d, 'dirs': d,
        'radiis': np.full((rays, 1), 1e-3, np.float32),
        'rays_cos': np.ones((rays, 1), np.float32),
        'rgbs': rng.rand(rays, 3).astype(np.float32),
        'masks': (rng.rand(rays, 1) > 0.5).astype(np.float32),
    }.items()}

    def step_fn(params, opt_state, occ_state, ray_batch, step, weights, rng):
        def loss_fn(p):
            mips = light_mod.build_mips(p['shading']['envlight'],
                                        rcfg.shading.env)
            outputs = sr.train_step_outputs(p, rcfg, mips, occ_state,
                                            ray_batch, step, rng, False,
                                            True)
            total, _ = losses.total_loss_shape(outputs, weights)
            return total
        total, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, total

    t0 = time.perf_counter()
    jitted = jax.jit(step_fn)
    params, opt_state, total = jitted(params, opt_state, occ_state, batch,
                                      30000, weights, jax.random.PRNGKey(0))
    v = float(total)
    compile_s = time.perf_counter() - t0
    assert np.isfinite(v), f'non-finite loss at {reso}^3'

    iters = 8
    best = float('inf')
    for w in range(3):
        t0 = time.perf_counter()
        for i in range(iters):
            params, opt_state, total = jitted(
                params, opt_state, occ_state, batch, 30000 + i, weights,
                jax.random.PRNGKey(w * iters + i))
        float(total)
        best = min(best, (time.perf_counter() - t0) / iters)
    step_ms = best * 1e3
    print(f'grid={reso}^3 n_levels={n_levels} compile={compile_s:.1f}s '
          f'step={step_ms:.2f}ms rays_s={rays / best:.0f} loss={v:.4f}',
          flush=True)
    result = {'grid': reso, 'n_levels': n_levels,
              'step_ms': round(step_ms, 2),
              'rays_per_s': round(rays / best, 1),
              'sample_budget': budget,
              'compile_s': round(compile_s, 1)}

    if trace:
        outdir = f'/tmp/scaleproof_trace_{reso}'
        import shutil
        shutil.rmtree(outdir, ignore_errors=True)
        with jax.profiler.trace(outdir):
            for i in range(2):
                params, opt_state, total = jitted(
                    params, opt_state, occ_state, batch, 40000 + i,
                    weights, jax.random.PRNGKey(i))
            float(total)
        import glob
        import xplane_bin
        pbs = glob.glob(os.path.join(outdir,
                                     'plugins/profile/*/*.xplane.pb'))
        planes = xplane_bin.parse(pbs[0])
        _, meta, lines2 = planes[0]
        wins = xplane_bin.step_windows(lines2, meta)
        mid = wins[-1]
        rows, busy_ms, gb = xplane_bin.busy_breakdown(lines2, meta, mid, 30)
        print(f'[trace {reso}^3] step {(mid[1]-mid[0])/1e9:.2f} ms, '
              f'{gb:.1f} GB boundary bytes')
        for ms, c, nm in rows:
            print(f'  {ms:9.3f} ms  x{c:<4d} {nm[:140]}', flush=True)
    return result


def main():
    import jax
    jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache_tpu')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    args = sys.argv[1:]
    trace = '--trace' in args
    args = [a for a in args if a != '--trace']
    resos = [int(x) for x in args] or [128, 256, 512]
    levels = {128: 1, 256: 2, 512: 3}
    for r in resos:
        run_phase(r, levels.get(r, 1), trace)


if __name__ == '__main__':
    main()
