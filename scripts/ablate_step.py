#!/usr/bin/env python
"""Component ablations of the stage-1 bench step on TPU.

Times (tunnel-safe best-of-windows) the full step and variants with parts
disabled, so BENCH perf work targets measured costs, not guesses.
Usage: python scripts/ablate_step.py [which ...]
  which in: full no_occ_loss fwd_only sampler shading_off
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, vary, iters=8, windows=3):
    """fn(i) -> pytree; fn must RETURN everything it wants kept alive
    (outputs not returned are DCE'd by XLA — returning only the loss
    silently benchmarks a forward-only program)."""
    import jax
    out = fn(0)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    leaf0 = jax.tree_util.tree_leaves(out)[0]
    float(np.asarray(leaf0).reshape(-1)[0])
    best = float('inf')
    for w in range(windows):
        t0 = time.perf_counter()
        last = None
        for i in range(iters):
            last = fn(w * iters + i + 1)
        leaf = jax.tree_util.tree_leaves(last)[0]
        float(np.asarray(leaf).reshape(-1)[0])
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def main():
    which = sys.argv[1:] or ['full', 'no_occ_loss', 'fwd_only', 'sampler']
    import jax
    import jax.numpy as jnp
    jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache_tpu')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    from tensoflow_tpu import config as config_mod
    from tensoflow_tpu.fields import light as light_mod
    from tensoflow_tpu.models import shape_renderer as sr
    from tensoflow_tpu.ops import grid as grid_mod
    from tensoflow_tpu.train import losses
    from tensoflow_tpu.train.trainer import build_shape_config, make_optimizer
    import optax

    rays = 2048
    base_extra = {
        'train_ray_num': rays,
        'sdf_n_comp': 36, 'sdf_dim': 256, 'app_dim': 128,
        'use_occ_grid': True, 'occ_grid_reso': 128,
        'occ_max_samples': 192,
        'apply_occ_loss': True, 'occ_loss_step': -1,
        'occ_loss_max_pn': 2048,
        'has_radiance_field': False,
        'apply_mask_loss': True,
        'gather_dtype': 'bfloat16',
    }

    rng = np.random.RandomState(0)
    o = rng.uniform(-1, 1, (rays, 3)).astype(np.float32)
    o = o / np.linalg.norm(o, axis=-1, keepdims=True) * 2.0
    d = -o / np.linalg.norm(o, axis=-1, keepdims=True)
    d += 0.1 * rng.randn(rays, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    batch_np = {
        'rays_o': o, 'rays_d': d, 'dirs': d,
        'radiis': np.full((rays, 1), 1e-3, np.float32),
        'rays_cos': np.ones((rays, 1), np.float32),
        'rgbs': rng.rand(rays, 3).astype(np.float32),
        'masks': (rng.rand(rays, 1) > 0.5).astype(np.float32),
    }

    def build(extra, grad=True):
        cfg = config_mod.load_config(extra=extra)
        rcfg = build_shape_config(cfg, (128, 128, 128), 1)
        params = sr.init_shape_renderer(jax.random.PRNGKey(0), rcfg)
        occ_cfg = grid_mod.OccGridConfig(resolution=128)
        occ_state = grid_mod.init_occ_grid(occ_cfg)
        centers = grid_mod.occ_grid_cell_centers(occ_cfg)
        alphas = jax.jit(
            lambda p, c: sr.compute_occ_alpha_chunked(p, rcfg, c))(
                params, centers)
        sdf0 = jax.jit(lambda p, c: sr.compute_sdf_chunked(p, rcfg, c))(
            params, centers)
        occ_state = grid_mod.update_occ_grid(occ_state, occ_cfg, alphas, 0,
                                             sdf=sdf0)
        tx, opt_state = make_optimizer(cfg, params, 0)
        weights = losses.schedule_weights(cfg, 2000)
        batch = {k: jnp.asarray(v) for k, v in batch_np.items()}

        def step_fn(params, opt_state, occ_state, ray_batch, step, weights,
                    rng):
            def loss_fn(p):
                mips = light_mod.build_mips(p['shading']['envlight'],
                                            rcfg.shading.env)
                outputs = sr.train_step_outputs(p, rcfg, mips, occ_state,
                                                ray_batch, step, rng, False,
                                                True)
                total, _ = losses.total_loss_shape(outputs, weights)
                return total
            if grad:
                # return updated params/opt_state (and rethread them below)
                # or XLA DCEs the whole backward pass + optimizer update
                total, grads = jax.value_and_grad(loss_fn)(params)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return params, opt_state, total
            return loss_fn(params)

        jitted = jax.jit(step_fn)

        state = {'params': params, 'opt': opt_state}

        def run(i):
            if grad:
                state['params'], state['opt'], total = jitted(
                    state['params'], state['opt'], occ_state, batch,
                    2000 + i, weights, jax.random.PRNGKey(i))
                return total
            return jitted(state['params'], state['opt'], occ_state, batch,
                          2000 + i, weights, jax.random.PRNGKey(i))
        return run, (params, rcfg, occ_state, batch)

    results = {}
    for name in which:
        if name == 'full':
            run, _ = build(dict(base_extra))
        elif name == 'no_occ_loss':
            run, _ = build(dict(base_extra, apply_occ_loss=False))
        elif name == 'xla_stencil':
            run, _ = build(dict(base_extra, stencil_impl='xla'))
        elif name == 'no_compact':
            run, _ = build(dict(base_extra, compact_samples_per_ray=0))
        elif name == 'fwd_only':
            run, _ = build(dict(base_extra), grad=False)
        elif name == 'stencil':
            # isolated SDF stencil fwd+bwd at compacted scale (131k pts)
            _, (params, rcfg, occ_state, batch) = build(dict(base_extra))
            m = rays * 64
            pts = jnp.asarray(
                rng.uniform(-0.8, 0.8, (m, 3)).astype(np.float32))
            lv = jnp.zeros((m, 1), jnp.float32)
            aabb = sr.aabb_array(rcfg)

            from tensoflow_tpu.fields import tenso_sdf

            @jax.jit
            def stencil_step(p, pts, lv):
                def f(p):
                    sdf, app, grad, hess = tenso_sdf.sdf_with_grad_hessian(
                        p['sdf'], rcfg.sdf, pts, aabb, lv,
                        with_hessian=True)
                    return (jnp.sum(sdf) + jnp.sum(app) + jnp.sum(grad)
                            + jnp.sum(hess))
                val, g = jax.value_and_grad(f)(p)
                return val, jax.tree_util.tree_map(jnp.sum, g)

            def run(i):
                return stencil_step(params, pts + i * 1e-6, lv)
        elif name == 'shading_off':
            # radiance+shading cost isolation: keep occ loss off too
            run, _ = build(dict(base_extra, apply_occ_loss=False),
                           grad=False)
        elif name == 'sampler':
            _, (params, rcfg, occ_state, batch) = build(dict(base_extra))

            occ_cfg = grid_mod.OccGridConfig(resolution=128)
            near, far = sr.near_far_from_sphere(batch['rays_o'],
                                                batch['dirs'])
            ss = sr.step_size(rcfg)
            nc = sr.n_march_candidates(rcfg)

            @jax.jit
            def samp(rng):
                t0, t1, valid = grid_mod.occ_grid_sampling(
                    occ_state, occ_cfg, batch['rays_o'], batch['dirs'],
                    near, far, ss, nc, rcfg.occ_max_samples, rng)
                return t0.sum() + t1.sum() + valid.sum()

            def run(i):
                return samp(jax.random.PRNGKey(i))
        elif name in ('sampler_query', 'sampler_compact'):
            # split occ_grid_sampling into its two halves
            _, (params, rcfg, occ_state, batch) = build(dict(base_extra))
            occ_cfg = grid_mod.OccGridConfig(resolution=128)
            near, far = sr.near_far_from_sphere(batch['rays_o'],
                                                batch['dirs'])
            ss = sr.step_size(rcfg)
            nc = sr.n_march_candidates(rcfg)
            ms = rcfg.occ_max_samples

            if name == 'sampler_query':
                @jax.jit
                def part(rng):
                    i = jnp.arange(nc, dtype=jnp.float32)
                    jitter = jax.random.uniform(rng, (rays, 1))
                    t0 = near + (i[None, :] + jitter) * ss
                    tm = t0 + 0.5 * ss
                    pts = (batch['rays_o'][:, None, :]
                           + batch['dirs'][:, None, :] * tm[..., None])
                    occ = grid_mod.query_binary(
                        occ_state, occ_cfg, pts.reshape(-1, 3))
                    return occ.reshape(rays, -1).sum()
            else:
                @jax.jit
                def part(rng):
                    occ = jax.random.uniform(rng, (rays, nc)) < 0.15
                    ii = jnp.arange(nc, dtype=jnp.int32)
                    pos = jnp.cumsum(occ.astype(jnp.int32), axis=1) - 1
                    keep = occ & (pos < ms)
                    dest = jnp.where(keep, pos, ms)
                    slots = jnp.full((rays, ms + 1), nc, jnp.int32)
                    slots = slots.at[
                        jnp.arange(rays, dtype=jnp.int32)[:, None],
                        dest].set(jnp.broadcast_to(ii[None, :], (rays, nc)),
                                  mode='drop')
                    return slots[:, :ms].sum()

            def run(i):
                return part(jax.random.PRNGKey(i))
        else:
            print(f'unknown ablation {name}')
            continue
        ms = timeit(run, None)
        results[name] = ms
        print(f'{name:14s} {ms:8.2f} ms', flush=True)

    if 'full' in results:
        for k, v in results.items():
            if k != 'full':
                print(f'delta full-{k}: {results["full"] - v:+.2f} ms')


if __name__ == '__main__':
    main()
