"""Multi-device sharded training on the virtual 8-device CPU mesh."""
import jax
import numpy as np
import pytest

from tensoflow_tpu import config as config_mod
from tensoflow_tpu.parallel import sharding
from tensoflow_tpu.train.trainer import ShapeTrainer


def test_mesh_has_8_devices():
    mesh = sharding.make_mesh()
    assert mesh.devices.size == 8


@pytest.mark.slow
def test_sharded_shape_training_matches_shapes():
    cfg = config_mod.load_config(extra={
        'name': 'test_shard',
        'database_name': 'toy/sphere_32_4',
        'dataset_dir': 'unused',
        'nerfDataType': True,
        'train_ray_num': 256,            # 32 rays per device
        'n_samples': 16, 'n_importance': 16, 'up_sample_steps': 4,
        'sdf_n_comp': 8, 'sdf_dim': 64, 'app_dim': 32,
        'N_voxel_init': 32 ** 3, 'N_voxel_final': 32 ** 3,
        'apply_occ_loss': False, 'apply_mask_loss': True,
        'anneal_end': 100,
    })
    mesh = sharding.make_mesh()
    trainer = ShapeTrainer(cfg, mesh=mesh)
    trainer.init_dataset()
    logs = trainer.train(n_steps=10, log_every=5)
    assert np.isfinite(logs[-1]['loss'])
    # params replicated: plane leaves report full (unsharded) shape
    plane = trainer.params['sdf']['field']['planes'][0]
    gs = trainer.rcfg.sdf.grid_size
    assert plane.shape == (gs[0], gs[1], 8)


@pytest.mark.slow
def test_sharded_and_single_device_agree():
    """One sharded step must produce the same loss as single-device
    (same data, same rng) — the collective is a pure all-reduce."""
    cfg = config_mod.load_config(extra={
        'name': 'test_shard_eq',
        'database_name': 'toy/sphere_32_4',
        'dataset_dir': 'unused',
        'nerfDataType': True,
        'train_ray_num': 64,
        'n_samples': 8, 'n_importance': 8, 'up_sample_steps': 4,
        'sdf_n_comp': 4, 'sdf_dim': 32, 'app_dim': 16,
        'N_voxel_init': 16 ** 3, 'N_voxel_final': 16 ** 3,
        'apply_occ_loss': False, 'apply_mask_loss': False,
        'perturb': 0.0,
        'anneal_end': 100,
    })
    mesh = sharding.make_mesh()
    t1 = ShapeTrainer(cfg)
    t1.init_dataset()
    t2 = ShapeTrainer(cfg, mesh=mesh)
    t2.init_dataset()
    l1 = t1.train(n_steps=2, log_every=1)
    l2 = t2.train(n_steps=2, log_every=1)
    np.testing.assert_allclose(l1[-1]['loss'], l2[-1]['loss'],
                               rtol=2e-4, atol=2e-5)
