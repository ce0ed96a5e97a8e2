"""Relight backend smoke tests (verdict r2 item 8).

Blender itself is not in this image; these tests prove everything up to
the subprocess boundary: the bundle lands on disk with the right schema
and the generated driver is syntactically valid Python (so a user with a
Blender binary can run it unmodified).  The native JAX relighter is
executed for real on tiny inputs.
"""
import ast
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensoflow_tpu.eval import relight


def test_blender_bundle_emitted_and_driver_parses(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    poses = [np.eye(4, dtype=np.float32) for _ in range(2)]
    out = relight.run_blender_relight(
        {'name': 'toy_bundle', 'mesh': 'data/meshes/toy.ply'},
        hdr_path='env.hdr', poses=poses, hw=(64, 64))
    # no blender binary in this image -> bundle written, no render
    assert out is None
    out_dir = tmp_path / 'data' / 'relight' / 'toy_bundle'
    driver = out_dir / 'relight_driver.py'
    cfg_path = out_dir / 'relight_cfg.json'
    assert driver.exists() and cfg_path.exists()
    ast.parse(driver.read_text())  # generated driver is valid Python
    cfg = json.loads(cfg_path.read_text())
    assert cfg['mesh'] == 'data/meshes/toy.ply'
    assert cfg['hdr'] == 'env.hdr'
    assert cfg['width'] == 64 and cfg['height'] == 64
    assert len(cfg['poses']) == 2 and np.asarray(cfg['poses'][0]).shape \
        == (4, 4)
    assert cfg['out_pattern'].endswith('relit_%03d.png')
    for key in ('albedo', 'roughness', 'metallic'):
        assert cfg[key].endswith(f'{key}.npy')


def test_blender_driver_invoked_when_binary_exists(tmp_path, monkeypatch):
    """With a blender on PATH the bridge must exec it with the bundle
    (subprocess call shape matches ref eval_mat.py:141-152)."""
    monkeypatch.chdir(tmp_path)
    calls = {}
    monkeypatch.setattr(relight.shutil, 'which',
                        lambda name: '/usr/bin/blender')
    monkeypatch.setattr(relight.subprocess, 'check_call',
                        lambda argv: calls.setdefault('argv', argv))
    out = relight.run_blender_relight(
        {'name': 'toy_exec', 'mesh': 'm.ply', 'trans': True})
    assert out is not None and out.endswith('toy_exec')
    argv = calls['argv']
    assert argv[0] == '/usr/bin/blender'
    assert '--background' in argv and '--python' in argv
    assert argv[-1].endswith('relight_cfg.json')
    assert json.load(open(argv[-1]))['trans'] is True


def test_relight_direct_executes():
    from tensoflow_tpu.fields import mc_shading
    from tensoflow_tpu.ops import sdf_trace

    cfg = mc_shading.MCShadingConfig(grid_size=(8, 8, 8), light_reso=8)
    params = mc_shading.init_mc_shading(jax.random.PRNGKey(0), cfg)
    xs = np.linspace(-1, 1, 16, dtype=np.float32)
    xx, yy, zz = np.meshgrid(xs, xs, xs, indexing='ij')
    vals = np.sqrt(xx ** 2 + yy ** 2 + zz ** 2) - 0.5
    grid = sdf_trace.pack_sdf_grid(sdf_trace.SDFGrid(
        values=jnp.asarray(vals),
        aabb=jnp.asarray([[-1.0] * 3, [1.0] * 3])))
    aabb = jnp.asarray([[-1.0] * 3, [1.0] * 3])

    rng = np.random.RandomState(0)
    n = rng.randn(8, 3).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    env = jnp.full((6, 8, 8, 3), 0.5, jnp.float32)
    rgb = relight.relight_direct(
        params, cfg, grid, 2.0 / 16, aabb, n * 0.5, n, env, -n,
        jax.random.PRNGKey(1), n_samples=16)
    v = np.asarray(rgb)
    assert v.shape == (8, 3) and np.isfinite(v).all()
    assert (v >= 0).all() and (v <= 1).all()
