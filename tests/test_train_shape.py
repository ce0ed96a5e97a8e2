"""End-to-end stage-1 training smoke tests on the procedural toy scene."""
import jax
import numpy as np
import pytest

from tensoflow_tpu import config as config_mod
from tensoflow_tpu.train.trainer import ShapeTrainer


def tiny_cfg(**over):
    cfg = config_mod.load_config(extra={
        'name': 'test_toy',
        'database_name': 'toy/sphere_48_8',
        'dataset_dir': 'unused',
        'nerfDataType': True,
        'train_ray_num': 256,
        'n_samples': 24,
        'n_importance': 24,
        'up_sample_steps': 4,
        'sdf_n_comp': 8,
        'sdf_dim': 64,
        'app_dim': 32,
        'N_voxel_init': 32 ** 3,
        'N_voxel_final': 32 ** 3,
        'apply_occ_loss': False,
        'apply_mask_loss': True,
        'occ_loss_max_pn': 128,
        'anneal_end': 200,
        'total_step': 100000,
        'split_manul': False,
        **over,
    })
    return cfg


@pytest.mark.slow
def test_shape_training_loss_decreases():
    cfg = tiny_cfg()
    trainer = ShapeTrainer(cfg)
    trainer.init_dataset()
    logs = trainer.train(n_steps=60, log_every=10)
    assert len(logs) >= 3
    first, last = logs[0], logs[-1]
    assert np.isfinite(last['loss'])
    assert last['loss_rgb'] < first['loss_rgb'], (first, last)
    assert last['psnr'] > first['psnr']


@pytest.mark.slow
def test_shape_training_occ_grid_path():
    cfg = tiny_cfg(use_occ_grid=True, occ_grid_reso=32, occ_max_samples=48)
    trainer = ShapeTrainer(cfg)
    trainer.init_dataset()
    logs = trainer.train(n_steps=30, log_every=10)
    assert np.isfinite(logs[-1]['loss'])
    assert logs[-1]['sample_num'] > 0


@pytest.mark.slow
def test_occ_grid_path_actually_converges():
    """The occ sampler path must LEARN, not just run (round-4 regression:
    pruning against the untrained field locked sampling away from the
    object — psnr stayed ~8.7 while NeuS reached 24; the no-prune warmup
    window + strided full-ray coverage fixes the bootstrap)."""
    cfg = tiny_cfg(use_occ_grid=True, occ_grid_reso=32, occ_max_samples=32)
    trainer = ShapeTrainer(cfg)
    trainer.init_dataset()
    assert trainer.rcfg.march_stride == 1  # set lazily at first step
    logs = trainer.train(n_steps=150, log_every=50)
    assert trainer.rcfg.march_stride > 1   # warmup stride active
    assert logs[-1]['psnr'] > logs[0]['psnr'] + 4.0, logs
    # post-warmup pruning still works end-to-end
    cfg2 = tiny_cfg(use_occ_grid=True, occ_grid_reso=32,
                    occ_max_samples=32, occ_warmup_steps=0)
    t2 = ShapeTrainer(cfg2)
    t2.init_dataset()
    t2.train(n_steps=5, log_every=5)
    assert t2.rcfg.march_stride == 1
    occ = np.asarray(t2.occ_state['binary'])
    assert occ.mean() < 1.0                # pruned immediately


@pytest.mark.slow
def test_checkpoint_roundtrip(tmp_path):
    cfg = tiny_cfg()
    trainer = ShapeTrainer(cfg)
    trainer.init_dataset()
    trainer.train(n_steps=5, log_every=5)
    path = str(tmp_path / 'model.pkl')
    trainer.save(path)

    t2 = ShapeTrainer(cfg)
    t2.load(path)
    assert t2.start_step == trainer.start_step
    a = jax.tree.leaves(trainer.params)[0]
    b = jax.tree.leaves(t2.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_render_image_shapes():
    cfg = tiny_cfg()
    trainer = ShapeTrainer(cfg)
    trainer.init_dataset()
    trainer.train(n_steps=3, log_every=3)
    db = trainer.database
    out = trainer.render_image(db.get_pose(0), db.get_K(0), 24, 24,
                               chunk=288)
    assert out['ray_rgb'].shape == (24, 24, 3)
    assert np.isfinite(out['ray_rgb']).all()
    assert out['normal_vis'].shape == (24, 24, 3)


@pytest.mark.slow
def test_checkpoint_resume_after_upsample(tmp_path):
    """Resume across a grid-upsample boundary: the restored grid size
    comes from the checkpoint kwargs, not the config's N_voxel_init
    (ref: trainer_inv.py:105-108 cfg.update(kwargs) on resume)."""
    cfg = tiny_cfg(N_voxel_init=16 ** 3, N_voxel_final=24 ** 3,
                   upsample_list=[3])
    trainer = ShapeTrainer(cfg)
    trainer.init_dataset()
    trainer.train(n_steps=6, log_every=6)          # upsample at step 3
    up_gs = tuple(trainer.rcfg.sdf.grid_size)
    assert up_gs != tuple(ShapeTrainer(cfg).rcfg.sdf.grid_size)
    path = str(tmp_path / 'model.pkl')
    trainer.save(path)

    t2 = ShapeTrainer(cfg)                          # fresh = 16^3 shapes
    t2.load(path)
    assert tuple(t2.rcfg.sdf.grid_size) == up_gs
    assert t2.n_voxel_list == trainer.n_voxel_list  # consumed entries gone
    np.testing.assert_array_equal(
        np.asarray(t2.params['sdf']['field']['planes'][0]),
        np.asarray(trainer.params['sdf']['field']['planes'][0]))
    t2.init_dataset()
    logs = t2.train(n_steps=2, log_every=1)
    assert np.isfinite(logs[-1]['loss'])


@pytest.mark.slow
def test_resume_step_bitwise(tmp_path):
    """The first post-resume step equals the would-have-been step bitwise:
    load() must restore the Adam moments and schedule count, not re-init
    them (ref: trainer_inv.py:108-113)."""
    from tensoflow_tpu.train import losses
    cfg = tiny_cfg()
    trainer = ShapeTrainer(cfg)
    trainer.init_dataset()
    trainer.train(n_steps=5, log_every=5)
    path = str(tmp_path / 'model.pkl')
    trainer.save(path)

    step = trainer.start_step
    batch = trainer.batcher.next_batch()
    weights = losses.schedule_weights(cfg, step)
    rng = jax.random.PRNGKey(123)
    key = (trainer.rcfg, *trainer.phase_flags(step), False)

    t2 = ShapeTrainer(cfg)
    t2.load(path)
    p2, o2, _ = t2._get_step_fn(key)(
        t2.params, t2.opt_state, t2.occ_state, batch, step, weights,
        rng, None)
    p1, o1, _ = trainer._get_step_fn(key)(
        trainer.params, trainer.opt_state, trainer.occ_state, batch, step,
        weights, rng, None)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_alpha_mask_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp
    from tensoflow_tpu.ops import grid as grid_mod
    from tensoflow_tpu.train import checkpoints
    rng = np.random.RandomState(0)
    mask = grid_mod.AlphaGridMask(
        aabb=jnp.asarray([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]]),
        volume=jnp.asarray((rng.rand(9, 7, 5) > 0.5).astype(np.float32)))
    payload = checkpoints.pack_alpha_mask(mask)
    assert payload['bits'].nbytes < mask.volume.size  # actually packed
    back = checkpoints.unpack_alpha_mask(payload)
    np.testing.assert_array_equal(np.asarray(back.volume),
                                  np.asarray(mask.volume))
    np.testing.assert_array_equal(np.asarray(back.aabb),
                                  np.asarray(mask.aabb))
    assert checkpoints.pack_alpha_mask(None) is None
    assert checkpoints.unpack_alpha_mask(None) is None


def test_restore_opt_state_shape_gate():
    from tensoflow_tpu.train import checkpoints
    fresh = {'mu': np.zeros((4, 3), np.float32), 'count': np.int32(0)}
    saved = {'mu': np.ones((4, 3), np.float32), 'count': np.int32(7)}
    out, ok = checkpoints.restore_opt_state(saved, fresh)
    assert ok and float(np.asarray(out['mu']).sum()) == 12.0
    bad = {'mu': np.ones((5, 3), np.float32), 'count': np.int32(7)}
    out, ok = checkpoints.restore_opt_state(bad, fresh)
    assert not ok and float(np.asarray(out['mu']).sum()) == 0.0
    out, ok = checkpoints.restore_opt_state(None, fresh)
    assert not ok


@pytest.mark.slow
def test_predict_bg_training(tmp_path):
    """NeRF++ inverted-sphere background: trains end-to-end and the BG
    color moves from its 0.5 init toward the white toy background.
    (The reference defines this net but its rendering raises
    NotImplementedError; ours is functional.)"""
    import jax.numpy as jnp
    from tensoflow_tpu.models import shape_renderer as sr
    cfg = tiny_cfg(apply_mask_loss=False, predict_BG=True,
                   isBGWhite=False, n_bg_samples=16)
    trainer = ShapeTrainer(cfg)
    assert 'bg' in trainer.params
    trainer.init_dataset()
    logs = trainer.train(n_steps=30, log_every=10)
    assert np.isfinite(logs[-1]['loss'])
    assert logs[-1]['loss'] < logs[0]['loss']
    o = jnp.asarray([[0.0, 0.0, 2.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    bg = np.asarray(sr.render_background(trainer.params['bg'], trainer.rcfg,
                                         o, d, None, False))[0]
    assert np.isfinite(bg).all()
    assert bg.mean() > 0.6      # moved from 0.5 toward white


@pytest.mark.slow
def test_large_grid_step_256():
    """One real train step at a 256^3 grid with 2 mip levels (verdict r2
    W7: nothing in the suite ran any field above 48^3 — patch-atlas
    sizes, take_rows_small's one-hot, and per-step repack all scale with
    grid size; this catches shape/memory bugs before TPU time is spent).
    Upsampling 128^3 -> 256^3 at step 1 also proves the upsample + opt
    reset at scale and turns the fractional-mip path on (n_levels=2).
    Tiny ray/sample counts keep it CPU-sized (~0.5 GB atlas)."""
    cfg = tiny_cfg(train_ray_num=32, n_samples=8, n_importance=8,
                   up_sample_steps=2, sdf_n_comp=36, sdf_dim=256,
                   app_dim=128,
                   N_voxel_init=128 ** 3, N_voxel_final=256 ** 3,
                   upsample_list=[1],
                   use_occ_grid=True, occ_grid_reso=64, occ_max_samples=16,
                   apply_occ_loss=True, occ_loss_step=-1,
                   occ_loss_max_pn=32, gather_dtype='bfloat16')
    trainer = ShapeTrainer(cfg)
    trainer.init_dataset()
    logs = trainer.train(n_steps=3, log_every=1)   # upsample after step 1
    plane = trainer.params['sdf']['field']['planes'][0]
    assert plane.shape[0] >= 250, plane.shape   # really at scale
    assert trainer.rcfg.sdf.n_levels >= 2       # fractional-mip path on
    assert np.isfinite(logs[-1]['loss'])


@pytest.mark.slow
def test_blobs_scene_training():
    """The higher-fidelity procedural scene (smooth-union blobs, varying
    albedo, analytic normals) trains end-to-end: rgb loss falls, psnr
    rises. This is the quality-evidence fixture for reference-scale runs
    (no real dataset ships in the image)."""
    cfg = tiny_cfg(database_name='toy/blobs_48_8')
    trainer = ShapeTrainer(cfg)
    trainer.init_dataset()
    logs = trainer.train(n_steps=60, log_every=10)
    assert np.isfinite(logs[-1]['loss'])
    assert logs[-1]['loss_rgb'] < logs[0]['loss_rgb']
    assert logs[-1]['psnr'] > logs[0]['psnr']


@pytest.mark.slow
def test_adaptive_sample_budget_switches_and_trains():
    """maybe_adapt_budget right-sizes compact_samples_per_ray to the live
    occupancy (nerfacc parity: pay only for occupied samples). A low
    sample_num report must drop the budget to a smaller bucket, trigger a
    phase-keyed recompile, and training must continue finite."""
    from tensoflow_tpu.train import trainer as trainer_mod
    cfg = tiny_cfg(use_occ_grid=True, occ_grid_reso=32, occ_max_samples=48,
                   compact_samples_per_ray=48)
    t = ShapeTrainer(cfg)
    t.init_dataset()
    logs = t.train(n_steps=2, log_every=1)
    # the toy occupancy is sparse: the step-0 report already adapts down
    adapted = t.rcfg.compact_samples_per_ray
    assert adapted in trainer_mod.BUDGET_BUCKETS and adapted <= 48
    # occupancy widened again: a high report switches UP (fresh EMA)
    t._budget_ema = None
    t.maybe_adapt_budget(t.occ_update_interval, {'sample_num': 40.0})
    assert t.rcfg.compact_samples_per_ray == 48   # 40 * 1.5 -> capped 48
    # tightened: low report drops to the smallest covering bucket
    t._budget_ema = None
    t.maybe_adapt_budget(t.occ_update_interval, {'sample_num': 5.0})
    assert t.rcfg.compact_samples_per_ray == 16
    logs = t.train(n_steps=2, log_every=1)        # recompiles, still sane
    assert np.isfinite(logs[-1]['loss'])
    # off-interval reports and disabled flag are no-ops
    t._budget_ema = None
    t.maybe_adapt_budget(t.occ_update_interval + 1, {'sample_num': 40.0})
    assert t.rcfg.compact_samples_per_ray == 16
    t.cfg['adaptive_sample_budget'] = False
    t.maybe_adapt_budget(2 * t.occ_update_interval, {'sample_num': 40.0})
    assert t.rcfg.compact_samples_per_ray == 16
