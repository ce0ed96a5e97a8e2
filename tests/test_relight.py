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


# ---------------------------------------------------------------------------
# mock-bpy execution (verdict r3 item 7): actually RUN the generated driver
# against a Blender-4.x-shaped bpy stand-in, so API typos / node-graph
# wiring regressions fail here instead of at a user's relight
# ---------------------------------------------------------------------------

class _Socket:
    def __init__(self, node, name):
        self.node = node
        self.name = name


class _SocketDict(dict):
    def __init__(self, node):
        super().__init__()
        self._node = node

    def __getitem__(self, name):
        if name not in self:
            super().__setitem__(name, _Socket(self._node, name))
        return super().__getitem__(name)


class _Node:
    def __init__(self, name):
        self.name = name
        self.layer_name = None
        self.image = None
        self.inputs = _SocketDict(self)
        self.outputs = _SocketDict(self)


class _Nodes:
    def __init__(self, preset=()):
        self._nodes = {n: _Node(n) for n in preset}
        self.created = []

    def __getitem__(self, name):
        return self._nodes[name]

    def new(self, type_):
        n = _Node(type_)
        self._nodes.setdefault(type_, n)
        self.created.append(type_)
        return n


class _Links:
    def __init__(self):
        self.pairs = []

    def new(self, out_sock, in_sock):
        self.pairs.append((out_sock.node.name, out_sock.name,
                           in_sock.node.name, in_sock.name))


class _Attr:
    def __init__(self, name, type_, domain):
        self.name, self.type, self.domain = name, type_, domain
        self.values = None
        self.data = self

    def foreach_set(self, key, arr):
        assert key == 'color'
        self.values = np.array(arr, np.float32)


class _ColorAttrs:
    def __init__(self):
        self.attrs = {}

    def new(self, name, type_, domain):
        a = _Attr(name, type_, domain)
        self.attrs[name] = a
        return a


def _make_mock_bpy(nloops, vidx_pattern, renders):
    import types as _t

    mesh = _t.SimpleNamespace()
    mesh.color_attributes = _ColorAttrs()
    mesh.materials = []

    class _Loops:
        def __len__(self):
            return nloops

        def foreach_get(self, key, arr):
            assert key == 'vertex_index'
            arr[:] = vidx_pattern

    mesh.loops = _Loops()
    obj = _t.SimpleNamespace(data=mesh, rotation_euler=[0.0, 0.0, 0.0])

    scene = _t.SimpleNamespace(
        render=_t.SimpleNamespace(engine=None, film_transparent=None,
                                  resolution_x=None, resolution_y=None,
                                  filepath=None),
        world=None, camera=None)

    bpy = _t.ModuleType('bpy')
    bpy.context = _t.SimpleNamespace(
        selected_objects=[obj], scene=scene,
        collection=_t.SimpleNamespace(
            objects=_t.SimpleNamespace(link=lambda o: None)))

    calls = {'ply': [], 'hdr': []}

    def _render(write_still=False):
        renders.append((scene.render.filepath,
                        np.array(scene.camera.matrix_world, np.float32)))

    bpy.ops = _t.SimpleNamespace(
        wm=_t.SimpleNamespace(
            read_factory_settings=lambda **k: None,
            ply_import=lambda filepath: calls['ply'].append(filepath)),
        render=_t.SimpleNamespace(render=_render))

    def _new_mat(name):
        m = _t.SimpleNamespace(name=name, use_nodes=False,
                               node_tree=_t.SimpleNamespace(
                                   nodes=_Nodes(('Principled BSDF',)),
                                   links=_Links()))
        return m

    def _new_world(name):
        return _t.SimpleNamespace(
            name=name, use_nodes=False,
            node_tree=_t.SimpleNamespace(nodes=_Nodes(('Background',)),
                                         links=_Links()))

    def _new_cam_obj(name, data):
        return _t.SimpleNamespace(name=name, data=data, matrix_world=None)

    bpy.data = _t.SimpleNamespace(
        materials=_t.SimpleNamespace(new=_new_mat),
        worlds=_t.SimpleNamespace(new=_new_world),
        cameras=_t.SimpleNamespace(
            new=lambda name: _t.SimpleNamespace(name=name)),
        objects=_t.SimpleNamespace(new=_new_cam_obj),
        images=_t.SimpleNamespace(
            load=lambda p: calls['hdr'].append(p) or
            _t.SimpleNamespace(filepath=p)))
    bpy._calls = calls
    bpy._obj = obj
    return bpy


def test_driver_executes_under_mock_bpy(tmp_path, monkeypatch):
    import runpy
    import sys

    monkeypatch.chdir(tmp_path)
    rng = np.random.RandomState(0)
    nverts, nloops = 20, 36
    mat_dir = tmp_path / 'data' / 'materials' / 'mockscene'
    mat_dir.mkdir(parents=True)
    albedo = rng.rand(nverts, 3).astype(np.float32)
    np.save(mat_dir / 'albedo.npy', albedo)
    rough = rng.rand(nverts, 1).astype(np.float32)
    np.save(mat_dir / 'roughness.npy', rough)
    metal = rng.rand(nverts, 1).astype(np.float32)
    np.save(mat_dir / 'metallic.npy', metal)
    poses = [np.asarray(np.eye(4) + 0.01 * i, np.float32)
             for i in range(2)]
    relight.run_blender_relight(
        {'name': 'mockscene', 'mesh': 'mesh.ply', 'trans': True},
        hdr_path='env.hdr', poses=poses, hw=(32, 48))
    out_dir = tmp_path / 'data' / 'relight' / 'mockscene'
    driver = out_dir / 'relight_driver.py'
    cfg_path = out_dir / 'relight_cfg.json'

    vidx = (np.arange(nloops) % nverts).astype(np.int32)
    renders = []
    bpy = _make_mock_bpy(nloops, vidx, renders)
    monkeypatch.setitem(sys.modules, 'bpy', bpy)
    monkeypatch.setattr(sys, 'argv',
                        ['blender', '--', str(cfg_path)])
    runpy.run_path(str(driver))

    # mesh + env loaded, z-up flip applied (trans=True)
    assert bpy._calls['ply'] == ['mesh.ply']
    assert bpy._calls['hdr'] == ['env.hdr']
    assert abs(bpy._obj.rotation_euler[0] - np.pi / 2) < 1e-6

    # vertex colors: per-corner albedo and (metallic, roughness) packing
    attrs = bpy._obj.data.color_attributes.attrs
    assert set(attrs) == {'albedo', 'metal_rough'}
    assert attrs['albedo'].domain == 'CORNER'
    ca = attrs['albedo'].values.reshape(nloops, 4)
    np.testing.assert_allclose(ca[:, :3], albedo[vidx], rtol=1e-6)
    cm = attrs['metal_rough'].values.reshape(nloops, 4)
    np.testing.assert_allclose(cm[:, 0], metal[vidx, 0], rtol=1e-6)
    np.testing.assert_allclose(cm[:, 1], rough[vidx, 0], rtol=1e-6)

    # principled node graph wiring
    mat = bpy._obj.data.materials[0]
    assert mat.use_nodes
    links = set(mat.node_tree.links.pairs)
    assert ('ShaderNodeVertexColor', 'Color',
            'Principled BSDF', 'Base Color') in links
    assert ('ShaderNodeSeparateColor', 'Red',
            'Principled BSDF', 'Metallic') in links
    assert ('ShaderNodeSeparateColor', 'Green',
            'Principled BSDF', 'Roughness') in links

    # environment light wired into the world background
    wlinks = set(bpy.context.scene.world.node_tree.links.pairs)
    assert ('ShaderNodeTexEnvironment', 'Color',
            'Background', 'Color') in wlinks

    # one render per pose, camera matrix = pose^T, cycles + resolution set
    assert bpy.context.scene.render.engine == 'CYCLES'
    assert bpy.context.scene.render.resolution_x == 48
    assert bpy.context.scene.render.resolution_y == 32
    assert len(renders) == 2
    for i, (path, mat_w) in enumerate(renders):
        assert path.endswith('relit_%03d.png' % i)
        np.testing.assert_allclose(mat_w, poses[i].T, rtol=1e-6)
