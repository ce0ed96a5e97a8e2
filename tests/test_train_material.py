"""End-to-end stage-2 (material) training smoke test on the toy scene."""
import jax
import numpy as np
import pytest

from tensoflow_tpu import config as config_mod
from tensoflow_tpu.train.trainer import ShapeTrainer
from tensoflow_tpu.train.trainer_mat import MaterialTrainer


def shape_cfg():
    return config_mod.load_config(extra={
        'name': 'test_toy_shape',
        'database_name': 'toy/sphere_40_6',
        'dataset_dir': 'unused',
        'nerfDataType': True,
        'train_ray_num': 256,
        'n_samples': 24, 'n_importance': 24, 'up_sample_steps': 4,
        'sdf_n_comp': 8, 'sdf_dim': 64, 'app_dim': 32,
        'N_voxel_init': 32 ** 3, 'N_voxel_final': 32 ** 3,
        'apply_occ_loss': False, 'apply_mask_loss': True,
        'anneal_end': 100,
    })


def mat_cfg():
    return config_mod.load_config(extra={
        'name': 'test_toy_mat',
        'isMaterial': True,
        'database_name': 'toy/sphere_40_6',
        'dataset_dir': 'unused',
        'nerfDataType': True,
        'train_ray_num': 64,
        'bake_resolution': 64,
        'refine_with_neural_sdf': True,
        'shader_cfg': {
            'diffuse_sample_num': 32,
            'specular_sample_num': 16,
            'nis_diffuse_sample_num': 8,
            'nis_specular_sample_num': 8,
            'nis_start_iter': 5,
            'nis_loss_iter': 3,
            'nis_update_interval': 5,
            'grid_size': (32, 32, 32),
            'light_reso': 32,
        },
    })


@pytest.fixture(scope='module')
def geo_ckpt(tmp_path_factory):
    cfg = shape_cfg()
    trainer = ShapeTrainer(cfg)
    trainer.init_dataset()
    trainer.train(n_steps=40, log_every=20)
    path = str(tmp_path_factory.mktemp('geo') / 'model.pkl')
    trainer.save(path)
    return path


@pytest.mark.slow
def test_material_training_runs_and_improves(geo_ckpt):
    cfg = mat_cfg()
    trainer = MaterialTrainer(cfg, geo_ckpt)
    trainer.init_dataset(max_train_rays=20000)
    assert trainer.tbn > 500, 'too few surface hits traced'
    logs = trainer.train(n_steps=12, log_every=4)
    assert np.isfinite(logs[-1]['loss'])
    # nis phase kicked in (copies updated at step>=nis_start_iter)
    assert trainer.phase(11).nis_sample_diffuse
    assert np.isfinite(logs[-1]['loss_nis'])


@pytest.mark.slow
def test_material_nvs_render(geo_ckpt):
    cfg = mat_cfg()
    trainer = MaterialTrainer(cfg, geo_ckpt)
    trainer.init_dataset(max_train_rays=8000)
    trainer.train(n_steps=2, log_every=2)
    db = trainer.database
    out = trainer.render_image(db.get_pose(0), db.get_K(0), 20, 20,
                               chunk=400)
    assert out['rgb_pr'].shape == (20, 20, 3)
    assert np.isfinite(out['rgb_pr']).all()
    assert out['hit_mask'].sum() > 10  # sphere visible


@pytest.mark.slow
def test_vertex_material_baking(geo_ckpt):
    from tensoflow_tpu.models import material_renderer as mr
    cfg = mat_cfg()
    trainer = MaterialTrainer(cfg, geo_ckpt)
    verts = np.random.RandomState(0).uniform(
        -0.5, 0.5, (100, 3)).astype(np.float32)
    mats = mr.predict_vertex_materials(trainer.params, trainer.rcfg, verts,
                                       batch_size=64)
    assert mats['albedo'].shape == (100, 3)
    assert mats['roughness'].shape == (100, 1)
    assert (mats['roughness'] >= 0).all()


@pytest.mark.slow
def test_shade_mixed_all_path(geo_ckpt):
    cfg = mat_cfg()
    cfg['shader_cfg'].update({'shade_fn': 'shade_mixed_all',
                              'use_nis_all': True,
                              'use_nis_diffuse': False,
                              'use_nis_specular': False,
                              'nis_sample_num': 8})
    trainer = MaterialTrainer(cfg, geo_ckpt)
    trainer.init_dataset(max_train_rays=6000)
    logs = trainer.train(n_steps=8, log_every=4)
    assert np.isfinite(logs[-1]['loss'])


@pytest.mark.slow
def test_material_checkpoint_resume_flow_semantics(geo_ckpt, tmp_path):
    """Resume matches the reference: flow params restart from init
    ('flow' keys filtered, ref trainer_inv.py:102) and the frozen
    sampling copies are cleared; reset_flows=False restores exactly."""
    cfg = mat_cfg()
    trainer = MaterialTrainer(cfg, geo_ckpt)
    trainer.init_dataset(max_train_rays=8000)
    trainer.train(n_steps=7, log_every=4)          # past nis_start_iter
    assert 'diffuse' in trainer.flow_copies
    path = str(tmp_path / 'mat.pkl')
    trainer.save(path)

    resumed = MaterialTrainer(cfg, geo_ckpt)
    resumed.load(path)
    assert resumed.start_step == trainer.start_step
    assert resumed.flow_copies == {}
    # non-flow params restored exactly
    np.testing.assert_array_equal(
        np.asarray(resumed.params['metallic']['layers'][0]['v']),
        np.asarray(trainer.params['metallic']['layers'][0]['v']))
    # flow params re-initialized (differ from the trained ones)
    tr = np.asarray(
        jax.tree.leaves(trainer.params['flow_diffuse'])[0])
    rs = np.asarray(
        jax.tree.leaves(resumed.params['flow_diffuse'])[0])
    assert tr.shape == rs.shape and not np.allclose(tr, rs)

    exact = MaterialTrainer(cfg, geo_ckpt)
    exact.load(path, reset_flows=False)
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(exact.params['flow_diffuse'])[0]), tr)
    assert 'diffuse' in exact.flow_copies
