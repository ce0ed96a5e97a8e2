"""Stage-1 (shape) trainer: one jit-compiled step per grid phase.

Functional re-design of the reference TrainerInv driving ShapeRenderer
(ref: train/trainer_inv.py:169-305).  Structure:

  * all step-dependent schedules (loss ramps, lr cosine, anneal) are
    evaluated host-side into scalars each step and passed traced — the
    compiled graph is fixed within a grid phase
  * grid upsampling (ref: trainer_inv.py:283-291) starts a new phase: param
    shapes change, the optimizer is re-created (fresh Adam moments, lr
    rebased), and the step function recompiles once
  * the occupancy grid EMA update runs as its own jitted function every
    ``occ_update_interval`` steps (ref: shapeRenderer.py:1285-1290)
  * with a device mesh, the ray batch is sharded over 'data' and parameters
    are replicated; XLA inserts the gradient all-reduce
"""
from __future__ import annotations

import functools
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .. import config as config_mod
from ..data import database as db_mod
from ..data import rays as rays_mod
from ..fields import light as light_mod
from ..fields import shading as shading_mod
from ..fields import tenso_sdf
from ..models import shape_renderer as sr
from ..ops import grid as grid_mod
from ..parallel import sharding
from . import checkpoints, losses

# adaptive sample-budget buckets (compact_samples_per_ray candidates) and
# the safety margin over the EMA of mean valid samples/ray; shared with
# bench.py so the benchmark sizes its budget exactly like the trainer.
# The budget pools GLOBALLY across the ray batch, so the batch total
# concentrates (CLT over ~2k rays: std ~2% of total); 1.5x covers the
# between-occ-update drift, and overflow degrades gracefully (the
# heaviest rays lose their farthest samples for one interval).
BUDGET_BUCKETS = (16, 24, 32, 48, 64, 96, 128)
BUDGET_MARGIN = 1.5


def build_shape_config(cfg: Dict[str, Any], grid_size, n_levels: int
                       ) -> sr.ShapeRendererConfig:
    tile = int(cfg.get('stencil_tile', 256))
    if tile <= 0 or tile % 8 != 0:
        raise ValueError(
            f'stencil_tile={tile} must be a positive multiple of 8 '
            '(TPU sublane size — the Pallas stencil head tiles rows by it)')
    sdf_cfg = tenso_sdf.SDFConfig(
        grid_size=tuple(int(g) for g in grid_size),
        n_comp=cfg['sdf_n_comp'], sdf_dim=cfg['sdf_dim'],
        app_dim=cfg['app_dim'], n_levels=n_levels,
        sdf_multires=cfg['sdf_multires'],
        init_radius=float(cfg.get('init_radius', 0.2)),
        gather_dtype=cfg.get('gather_dtype', 'float32'),
        stencil_impl=cfg.get('stencil_impl', 'auto'),
        stencil_tile=tile)
    shading_cfg = shading_mod.ShadingConfig(
        app_feats_dim=cfg['app_dim'],
        has_radiance_field=cfg['has_radiance_field'],
        radiance_field_step=cfg['radiance_field_step'],
        env=light_mod.EnvLightConfig(max_res=128))
    return sr.ShapeRendererConfig(
        sdf=sdf_cfg, shading=shading_cfg,
        aabb=tuple(tuple(x) for x in cfg['aabb']),
        std_act=cfg['std_act'], inv_s_init=cfg['inv_s_init'],
        freeze_inv_s_step=cfg['freeze_inv_s_step'],
        n_samples=cfg['n_samples'], n_importance=cfg['n_importance'],
        up_sample_steps=cfg['up_sample_steps'], perturb=cfg['perturb'],
        anneal_end=cfg['anneal_end'], train_ray_num=cfg['train_ray_num'],
        test_ray_num=cfg['test_ray_num'],
        clip_sample_variance=cfg['clip_sample_variance'],
        use_occ_grid=cfg['use_occ_grid'], occ_grid_reso=cfg['occ_grid_reso'],
        step_ratio=cfg['step_ratio'], occ_max_samples=cfg['occ_max_samples'],
        compact_samples_per_ray=cfg.get('compact_samples_per_ray', 64),
        rgb_loss=cfg['rgb_loss'], apply_occ_loss=cfg['apply_occ_loss'],
        apply_tv_loss=cfg['apply_tv_loss'],
        apply_sparse_loss=cfg['apply_sparse_loss'],
        apply_hessian_loss=cfg['apply_hessian_loss'],
        apply_gaussian_loss=cfg['apply_gaussian_loss'],
        gaussian_loss_step=cfg['gaussianLoss_step'],
        occ_loss_step=cfg['occ_loss_step'],
        occ_loss_max_pn=cfg['occ_loss_max_pn'],
        occ_sdf_thresh=cfg['occ_sdf_thresh'],
        apply_mask_loss=cfg['apply_mask_loss'],
        has_radiance_field=cfg['has_radiance_field'],
        radiance_field_step=cfg['radiance_field_step'],
        isBGWhite=cfg['isBGWhite'], blend_ratio=cfg['blend_ratio'],
        predict_BG=cfg['predict_BG'],
        n_bg_samples=cfg.get('n_bg_samples', 32))


def lr_factor_fn(cfg):
    """Cosine decay factor (ref: trainer_inv.py:339-343)."""
    ratio = cfg['lr_decay_target_ratio']
    iters = cfg['lr_decay_iters']

    def factor(step):
        # jnp: called with a traced count inside the optax schedule
        progress = step / iters
        return ((jnp.cos(jnp.pi * progress) + 1.0) * 0.5 * (1 - ratio)
                + ratio)
    return factor


def param_group_label(path_str: str) -> str:
    """xyz = tensor grids; env = envlight cubemap; net = everything else
    (ref: trainer_inv.py:111-126, fields get_optparam_groups)."""
    if "'field'" in path_str or '.field.' in path_str:
        return 'xyz'
    if 'envlight' in path_str:
        return 'env'
    return 'net'


def scale_by_tree(scales):
    """Stateless transform: multiply each update leaf by a fixed scale."""

    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        return jax.tree.map(lambda u, s: u * s, updates, scales), state

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(cfg, params, reset_step: int, label_fn=None):
    """Per-group Adam as ONE adam pass + per-leaf base-lr scales.

    All groups share the same cosine schedule shape (ref cosine factor is
    global, trainer_inv.py:247-252), so group lrs differ only by a constant
    — a single scale tree replaces optax.multi_transform, whose masked
    3-way state compiles pathologically on the TPU backend."""
    label_fn = label_fn or param_group_label
    factor = lr_factor_fn(cfg)
    base = {'xyz': cfg['lr_xyz_init'], 'net': cfg['lr_net_init'],
            'env': cfg['lr_env_init']}
    f0 = factor(reset_step)

    def sched(count):
        return factor(reset_step + count) / f0

    scales = jax.tree_util.tree_map_with_path(
        lambda path, _: base[label_fn(jax.tree_util.keystr(path))], params)
    tx = optax.chain(
        optax.scale_by_adam(b1=0.9, b2=0.99),
        optax.scale_by_schedule(sched),
        scale_by_tree(scales),
        optax.scale(-1.0),
    )
    return tx, tx.init(params)


class ShapeTrainer:
    """End-to-end stage-1 training (geometry reconstruction)."""

    def __init__(self, cfg: Dict[str, Any], mesh=None, model_dir=None):
        self.cfg = cfg
        self.mesh = mesh
        self.model_dir = model_dir or f"data/model/{cfg['name']}"
        self.rng = jax.random.PRNGKey(cfg['random_seed'])

        self.n_voxel_list = config_mod.voxel_schedule(cfg)
        n0 = self.n_voxel_list.pop(0)
        grid_size = config_mod.n_to_reso(n0, cfg['aabb'])
        self.rcfg = build_shape_config(cfg, grid_size, cfg['max_levels'])

        self.rng, k = jax.random.split(self.rng)
        self.params = sr.init_shape_renderer(k, self.rcfg)
        self.occ_cfg = grid_mod.OccGridConfig(resolution=cfg['occ_grid_reso'])
        self.occ_state = grid_mod.init_occ_grid(self.occ_cfg)
        self.alpha_mask = None
        self.start_step = 0
        self.best_para = 0.0
        self.tx, self.opt_state = make_optimizer(cfg, self.params, 0)
        self.opt_reset_step = 0
        self._compiled = {}
        self.occ_update_interval = 100
        self._budget_ema = None

        if self.mesh is not None:
            self.params = sharding.replicate_tree(self.mesh, self.params)
            self.opt_state = sharding.replicate_tree(self.mesh,
                                                     self.opt_state)
            self.occ_state = sharding.replicate_tree(self.mesh,
                                                     self.occ_state)

    # ------------------------------------------------------------------
    # data
    # ------------------------------------------------------------------
    def init_dataset(self):
        cfg = self.cfg
        self.database = db_mod.parse_database_name(
            cfg['database_name'], cfg['dataset_dir'],
            isWhiteBG=cfg['isBGWhite'])
        train_ids, test_ids = db_mod.get_database_split(
            self.database, split_manul=cfg['split_manul'])
        self.train_ids, self.test_ids = list(train_ids), list(test_ids)
        info = rays_mod.build_imgs_info(self.database, self.train_ids,
                                        cfg['apply_mask_loss'])
        if cfg['nerfDataType']:
            batch, rn, h, w = rays_mod.construct_ray_batch_nerf(
                info, cfg['apply_mask_loss'])
        else:
            batch, rn, h, w = rays_mod.construct_ray_batch_w2c(
                info, cfg['apply_mask_loss'])
        batch = rays_mod.filter_rays_aabb(batch, cfg['aabb'])
        self.batcher = rays_mod.RayBatcher(batch, cfg['train_ray_num'],
                                           cfg['random_seed'])

    # ------------------------------------------------------------------
    # compiled step
    # ------------------------------------------------------------------
    def _get_step_fn(self, phase_key):
        if phase_key in self._compiled:
            return self._compiled[phase_key]
        rcfg = self.rcfg
        tx = self.tx
        radiance_on, occ_on = phase_key[1], phase_key[2]

        def step_fn(params, opt_state, occ_state, ray_batch, step, weights,
                    rng, alpha_mask):
            def loss_fn(p):
                mips = light_mod.build_mips(p['shading']['envlight'],
                                            rcfg.shading.env)
                outputs = sr.train_step_outputs(
                    p, rcfg, mips, occ_state, ray_batch, step, rng,
                    radiance_on, occ_on, alpha_mask=alpha_mask)
                total, terms = losses.total_loss_shape(outputs, weights)
                aux = {'psnr': outputs['psnr'], 'std': outputs['std'],
                       'sample_num': outputs['sample_num'], **terms}
                return total, aux

            (total, aux), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            aux['loss'] = total
            return params, opt_state, aux

        if self.mesh is not None:
            jitted = jax.jit(
                step_fn,
                donate_argnums=(0, 1),
                out_shardings=(sharding.replicated(self.mesh),
                               sharding.replicated(self.mesh),
                               sharding.replicated(self.mesh)))
        else:
            jitted = jax.jit(step_fn, donate_argnums=(0, 1))
        self._compiled[phase_key] = jitted
        return jitted

    def _get_occ_update_fn(self, prune: bool = True):
        key = ('occ', self.rcfg, prune)
        if key in self._compiled:
            return self._compiled[key]
        rcfg = self.rcfg
        occ_cfg = self.occ_cfg

        @jax.jit
        def occ_update(params, occ_state, step, rng):
            centers = grid_mod.occ_grid_cell_centers(occ_cfg)
            cell = (occ_cfg.aabb_max - occ_cfg.aabb_min) / occ_cfg.resolution
            jitter = (jax.random.uniform(rng, centers.shape) - 0.5) * cell
            pts = centers + jitter
            alphas = sr.compute_occ_alpha_chunked(params, rcfg, pts)
            # bake the SDF at the unjittered lattice in the same pass —
            # the occ-loss march reads it instead of the live field
            sdf = sr.compute_sdf_chunked(params, rcfg, centers)
            return grid_mod.update_occ_grid(occ_state, occ_cfg, alphas, step,
                                            sdf=sdf, prune=prune)

        self._compiled[key] = occ_update
        return occ_update

    # ------------------------------------------------------------------
    def occ_warmup_steps(self) -> int:
        return int(self.cfg.get('occ_warmup_steps', 10000))

    def maybe_set_march_stride(self, step: int):
        """During the occ no-prune warmup the binary grid is fully
        occupied, so the fixed per-ray budget must stride the candidate
        lattice to cover the whole ray; afterwards the surface band is
        thin and stride returns to 1 (one recompile per change)."""
        if not self.rcfg.use_occ_grid:
            return
        if step < self.occ_warmup_steps():
            want = max(-(-sr.n_march_candidates(self.rcfg)
                         // self.rcfg.occ_max_samples), 1)
        else:
            want = 1
        if want != self.rcfg.march_stride:
            self.rcfg = self.rcfg._replace(march_stride=want)

    # ------------------------------------------------------------------
    # phases / schedules
    # ------------------------------------------------------------------
    def maybe_upsample(self, step: int):
        """Grid upsample + optimizer reset (ref: trainer_inv.py:283-291)."""
        ul = self.cfg.get('upsample_list')
        if not ul or step not in ul or not self.n_voxel_list:
            return False
        n_vox = self.n_voxel_list.pop(0)
        reso = config_mod.n_to_reso(n_vox, self.cfg['aabb'])
        new_sdf, new_sdf_cfg = tenso_sdf.upsample_tenso_sdf(
            self.params['sdf'], self.rcfg.sdf, reso)
        self.params = {**self.params, 'sdf': new_sdf}
        self.rcfg = self.rcfg._replace(sdf=new_sdf_cfg)
        self.tx, self.opt_state = make_optimizer(self.cfg, self.params, step)
        self.opt_reset_step = step
        self._compiled = {}
        if self.mesh is not None:
            self.params = sharding.replicate_tree(self.mesh, self.params)
            self.opt_state = sharding.replicate_tree(self.mesh,
                                                     self.opt_state)
        return True

    def phase_flags(self, step: int):
        radiance_on = (self.cfg['has_radiance_field']
                       and step > self.cfg['radiance_field_step'])
        occ_on = step >= self.cfg['occ_loss_step']
        return radiance_on, occ_on

    def maybe_adapt_budget(self, step: int, aux):
        """Right-size the global sample-compaction budget to the live
        occupancy (every occ-update interval, from the step's mean valid
        samples/ray).  The reference's nerfacc estimator pays only for
        actually-occupied samples (variable-length lists); with fixed
        TPU shapes the equivalent is a phase-keyed recompile onto a
        smaller budget bucket — the occ grid tightens to a surface band
        over training and a stale budget wastes most of the stencil /
        gather / scatter work (measured 15.7%% slot utilization on the
        bench occupancy, scripts/probe_samples.py)."""
        if not (self.rcfg.use_occ_grid
                and self.cfg.get('adaptive_sample_budget', True)):
            return
        if step % self.occ_update_interval != 0 or 'sample_num' not in aux:
            return
        mean = float(aux['sample_num'])   # one scalar fetch per interval
        self._budget_ema = (mean if self._budget_ema is None
                            else 0.5 * self._budget_ema + 0.5 * mean)
        cap = int(self.cfg.get('compact_samples_per_ray', 64))
        need = self._budget_ema * BUDGET_MARGIN
        bucket = next((b for b in BUDGET_BUCKETS if b >= need and b <= cap),
                      cap)
        if bucket != self.rcfg.compact_samples_per_ray:
            self.rcfg = self.rcfg._replace(compact_samples_per_ray=bucket)

    # ------------------------------------------------------------------
    # main loop
    # ------------------------------------------------------------------
    def train(self, n_steps: Optional[int] = None, log_every: int = 100,
              callback=None):
        if not hasattr(self, 'batcher'):
            self.init_dataset()
        total = n_steps if n_steps is not None else self.cfg['total_step']
        end_step = min(self.start_step + total, self.cfg['total_step'])

        logs = []
        for step in range(self.start_step, end_step):
            self.maybe_set_march_stride(step)
            if self.rcfg.use_occ_grid and step % self.occ_update_interval == 0:
                self.rng, k = jax.random.split(self.rng)
                self.occ_state = self._get_occ_update_fn(
                    prune=step >= self.occ_warmup_steps())(
                    self.params, self.occ_state, step, k)

            batch = self.batcher.next_batch()
            if self.mesh is not None:
                batch = sharding.shard_batch(self.mesh, batch)
            weights = losses.schedule_weights(self.cfg, step)
            radiance_on, occ_on = self.phase_flags(step)
            fn = self._get_step_fn((self.rcfg, radiance_on, occ_on,
                                    self.alpha_mask is not None))
            self.rng, k = jax.random.split(self.rng)
            self.params, self.opt_state, aux = fn(
                self.params, self.opt_state, self.occ_state, batch,
                step, weights, k, self.alpha_mask)

            if (step + 1) % log_every == 0 or step == self.start_step:
                host = {k_: float(v) for k_, v in aux.items()
                        if np.ndim(v) == 0}
                host['step'] = step + 1
                logs.append(host)
                if callback:
                    callback(host)

            self.maybe_adapt_budget(step, aux)
            self.maybe_update_alpha_mask(step)
            if self.maybe_upsample(step):
                pass
        self.start_step = end_step
        return logs

    def maybe_update_alpha_mask(self, step: int):
        """Alpha-mask refresh schedule (ref: trainer_inv.py:272-279) —
        only for the non-occupancy-grid sampler."""
        lst = self.cfg.get('update_AlphaMask_lst')
        if (self.rcfg.use_occ_grid or not lst or step not in lst):
            return
        self.alpha_mask = sr.build_alpha_mask(
            self.params, self.rcfg,
            mul_length=self.cfg.get('mul_length', 10),
            alpha_thresh=self.cfg.get('alphaMask_thres', 1e-4))

    # ------------------------------------------------------------------
    # checkpointing
    # ------------------------------------------------------------------
    def save(self, path: str):
        checkpoints.save_checkpoint(path, {
            'step': self.start_step,
            'best_para': self.best_para,
            'params': self.params,
            'opt_state': self.opt_state,
            'occ_state': self.occ_state,
            'alpha_mask': checkpoints.pack_alpha_mask(self.alpha_mask),
            'opt_reset_step': self.opt_reset_step,
            'N_voxel_list': self.n_voxel_list,
            'kwargs': {
                'grid_size': list(self.rcfg.sdf.grid_size),
                'n_levels': self.rcfg.sdf.n_levels,
                'sdf_n_comp': self.rcfg.sdf.n_comp,
                'sdf_dim': self.rcfg.sdf.sdf_dim,
                'app_dim': self.rcfg.sdf.app_dim,
                'sdf_multires': self.rcfg.sdf.sdf_multires,
                'aabb': [list(a) for a in self.rcfg.aabb],
            },
        })

    def load(self, path: str):
        ckpt = checkpoints.load_checkpoint(path)
        kw = ckpt['kwargs']
        self.rcfg = build_shape_config(
            self.cfg, kw['grid_size'], kw['n_levels'])
        self.params = jax.tree.map(jnp.asarray, ckpt['params'])
        self.occ_state = jax.tree.map(jnp.asarray, ckpt['occ_state'])
        self.n_voxel_list = ckpt['N_voxel_list']
        self.start_step = ckpt['step']
        self.best_para = ckpt.get('best_para', 0.0)
        self.alpha_mask = checkpoints.unpack_alpha_mask(
            ckpt.get('alpha_mask'))
        # restore Adam moments + schedule count against the ORIGINAL reset
        # step (ref: trainer_inv.py:108-113); any shape mismatch falls back
        # to a fresh optimizer rebased at the resume step
        reset = ckpt.get('opt_reset_step', self.start_step)
        self.tx, self.opt_state = make_optimizer(self.cfg, self.params,
                                                 reset)
        self.opt_state, ok = checkpoints.restore_opt_state(
            ckpt.get('opt_state'), self.opt_state)
        if not ok:
            reset = self.start_step
            self.tx, self.opt_state = make_optimizer(
                self.cfg, self.params, reset)
        self.opt_reset_step = reset
        self._compiled = {}

    # ------------------------------------------------------------------
    # validation / rendering
    # ------------------------------------------------------------------
    def render_image(self, pose, K, h, w, step: Optional[int] = None,
                     chunk: Optional[int] = None):
        """Full-frame NVS render (ref: shapeRenderer.py:568-668)."""
        step = step if step is not None else 300000
        chunk = chunk or self.cfg['test_ray_num']
        info = {'imgs': np.zeros((1, h, w, 3), np.float32),
                'Ks': K[None].astype(np.float32),
                'poses': pose[None].astype(np.float32)}
        if self.cfg['nerfDataType']:
            batch, rn, _, _ = rays_mod.construct_ray_batch_nerf(info)
        else:
            batch, rn, _, _ = rays_mod.construct_ray_batch_w2c(info)
        del batch['rgbs']

        rcfg = self.rcfg
        key = ('eval', rcfg, chunk)
        if key not in self._compiled:
            @jax.jit
            def eval_fn(params, occ_state, ray_batch, rng):
                mips = light_mod.build_mips(params['shading']['envlight'],
                                            rcfg.shading.env)
                return sr.render_rays(
                    params, rcfg, mips, occ_state, ray_batch, step, 1.0,
                    rng, False, radiance_on=self.cfg['has_radiance_field'],
                    eval_extras=True)
            self._compiled[key] = eval_fn
        eval_fn = self._compiled[key]

        keys_out = ['ray_rgb', 'normal', 'normal_vis', 'acc', 'depth',
                    'albedo', 'roughness', 'metallic', 'occ_prob',
                    'occ_prob_gt', 'diffuse_color', 'specular_color',
                    'diffuse_light', 'specular_light', 'indirect_light']
        out = {k: [] for k in keys_out}
        for ri in range(0, rn, chunk):
            sub = {k: v[ri:ri + chunk] for k, v in batch.items()}
            n_real = len(sub['rays_o'])
            if n_real < chunk:  # pad to fixed shape
                pad = chunk - n_real
                sub = {k: np.concatenate([v, v[-1:].repeat(pad, 0)], 0)
                       for k, v in sub.items()}
            self.rng, k = jax.random.split(self.rng)
            res = eval_fn(self.params, self.occ_state, sub, k)
            for kk in keys_out:
                if kk in res:
                    out[kk].append(np.asarray(res[kk])[:n_real])
        return {k: np.concatenate(v, 0).reshape(h, w, -1)
                for k, v in out.items() if v}

    def validate(self, max_views: Optional[int] = None,
                 downsample: Optional[float] = None):
        """Mean PSNR over the held-out split (ref: trainer_inv.py:217-237).

        Evaluates ALL val views by default, matching the reference's
        ValidationEvaluator (train_valid.py:18-51); pass max_views to
        subsample (tests / quick checks)."""
        import cv2
        psnrs = []
        ds = downsample if downsample is not None else (
            self.cfg['downsample_ratio'] if self.cfg['test_downsample_ratio']
            else 1.0)
        vids = self.test_ids if max_views is None else \
            self.test_ids[:max_views]
        for vid in vids:
            gt = self.database.get_image(vid).astype(np.float32) / 255.0
            K = self.database.get_K(vid).copy()
            pose = self.database.get_pose(vid)
            h, w = gt.shape[:2]
            if ds != 1.0:
                h, w = int(h * ds), int(w * ds)
                gt = cv2.resize(gt, (w, h), interpolation=cv2.INTER_LINEAR)
                K = np.diag([ds, ds, 1.0]).astype(np.float32) @ K
            out = self.render_image(pose, K, h, w)
            from . import metrics_vis
            res = metrics_vis.eval_and_dump(
                gt, out, self.cfg['name'], self.start_step, vid)
            psnrs.append(res['psnr'])
        return float(np.mean(psnrs))
