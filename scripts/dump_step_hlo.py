import sys, os
sys.path.insert(0, '/root/repo')
import jax
jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache_tpu')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
import jax.numpy as jnp
import numpy as np
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
rcfg = build_shape_config(cfg, (128, 128, 128), 1)
params = sr.init_shape_renderer(jax.random.PRNGKey(0), rcfg)
occ_cfg = grid_mod.OccGridConfig(resolution=128)
occ_state = grid_mod.init_occ_grid(occ_cfg)
tx, opt_state = make_optimizer(cfg, params, 0)
weights = losses.schedule_weights(cfg, 2000)
rng = np.random.RandomState(0)
o = rng.uniform(-1, 1, (rays, 3)).astype(np.float32)
o = o / np.linalg.norm(o, axis=-1, keepdims=True) * 2.0
d = -o / np.linalg.norm(o, axis=-1, keepdims=True)
d += 0.1 * rng.randn(rays, 3).astype(np.float32)
d /= np.linalg.norm(d, axis=-1, keepdims=True)
batch = {
    'rays_o': jnp.asarray(o), 'rays_d': jnp.asarray(d), 'dirs': jnp.asarray(d),
    'radiis': jnp.full((rays, 1), 1e-3, jnp.float32),
    'rays_cos': jnp.ones((rays, 1), jnp.float32),
    'rgbs': jnp.asarray(rng.rand(rays, 3).astype(np.float32)),
    'masks': jnp.asarray((rng.rand(rays, 1) > 0.5).astype(np.float32)),
}

def step_fn(params, opt_state, occ_state, ray_batch, step, weights, rng):
    def loss_fn(p):
        mips = light_mod.build_mips(p['shading']['envlight'], rcfg.shading.env)
        outputs = sr.train_step_outputs(p, rcfg, mips, occ_state, ray_batch,
                                        step, rng, False, True)
        total, _ = losses.total_loss_shape(outputs, weights)
        return total
    total, grads = jax.value_and_grad(loss_fn)(params)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, total

lowered = jax.jit(step_fn).lower(params, opt_state, occ_state, batch, 2000,
                                 weights, jax.random.PRNGKey(0))
compiled = lowered.compile()
txt = compiled.as_text()
with open('/tmp/step_hlo.txt', 'w') as f:
    f.write(txt)
print('bytes:', len(txt))
