"""Launch-smoke the generated per-scene config suite.

Every YAML must make it through the same construction path the CLIs use:
shape configs through ShapeTrainer.__init__ (params + optimizer + a
hashable renderer config), material configs through
build_material_config (hashable shading config incl. YAML-list
coercion). Catches YAML/schema drift without needing the datasets."""
import glob
import os

import pytest

from tensoflow_tpu import config as config_mod

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SHAPE_CFGS = sorted(glob.glob(os.path.join(REPO, 'configs/shape/**/*.yaml'),
                              recursive=True))
MAT_CFGS = sorted(glob.glob(os.path.join(REPO, 'configs/mat/**/*.yaml'),
                            recursive=True))


@pytest.mark.parametrize('path', SHAPE_CFGS,
                         ids=[os.path.basename(p) for p in SHAPE_CFGS])
def test_shape_config_constructs(path):
    from tensoflow_tpu.train.trainer import ShapeTrainer
    cfg = config_mod.load_config(path=path)
    # shrink the grids/nets so 31 trainers construct quickly; the point
    # is schema + hashability, not full-size allocation
    cfg.update({'N_voxel_init': 16 ** 3, 'N_voxel_final': 24 ** 3,
                'sdf_n_comp': 4, 'sdf_dim': 32, 'app_dim': 16})
    trainer = ShapeTrainer(cfg)
    hash(trainer.rcfg)             # jit phase key must be hashable
    assert trainer.rcfg.train_ray_num == cfg['train_ray_num']


@pytest.mark.parametrize('path', MAT_CFGS,
                         ids=[os.path.basename(p) for p in MAT_CFGS])
def test_mat_config_builds(path):
    from tensoflow_tpu.train.trainer_mat import build_material_config
    cfg = config_mod.load_config(path=path)
    geo_kwargs = {'grid_size': [32, 32, 32], 'sdf_n_comp': 4,
                  'sdf_dim': 32, 'app_dim': 16, 'n_levels': 1,
                  'aabb': [[-1.0] * 3, [1.0] * 3]}
    rcfg = build_material_config(cfg, geo_kwargs)
    hash(rcfg)                      # jit phase key must be hashable
    assert rcfg.shader.outer_light_version in (
        'envlight', 'direction', 'sphere_direction')
