"""Relighting backends.

Two paths, mirroring and extending the reference:
  1. ``run_blender_relight``: the reference's subprocess bridge to Blender's
     Cycles with vertex-color materials (ref: eval_mat.py:136-173 +
     blender_backend/relight_backend.py). Emits the same bundle (mesh PLY +
     vertex material npys + a generated driver script) and invokes
     ``blender --background`` when a blender binary exists; otherwise the
     bundle is left on disk for offline rendering.
  2. ``relight_direct``: a self-contained JAX relighter — re-shades the
     baked vertex materials under a new environment map with the same GGX
     BRDF + sphere-traced visibility used in training. No external process;
     runs on TPU. This is the framework's native relighting path (no
     reference counterpart; the reference depends on Blender).
"""
from __future__ import annotations

import os
import shutil
import subprocess
from typing import Optional

import numpy as np

BLENDER_SCRIPT = r'''
# Auto-generated Blender driver (reference bridge semantics:
# blender_backend/relight_backend.py): import mesh, attach vertex-color
# principled material, light with an HDRI, render the given poses.
# Targets Blender 4.x APIs with pre-4.0 fallbacks.
import bpy, json, sys, numpy as np
argv = sys.argv[sys.argv.index('--') + 1:]
cfg = json.load(open(argv[0]))

bpy.ops.wm.read_factory_settings(use_empty=True)
if hasattr(bpy.ops.wm, 'ply_import'):      # Blender >= 4.0
    bpy.ops.wm.ply_import(filepath=cfg['mesh'])
else:                                      # legacy importer (< 4.0)
    bpy.ops.import_mesh.ply(filepath=cfg['mesh'])
obj = bpy.context.selected_objects[0]
if cfg.get('trans'):
    # z-up flip for GlossySynthetic-convention meshes
    # (ref: relight_backend.py:48-49 --trans)
    obj.rotation_euler[0] = np.pi / 2

albedo = np.load(cfg['albedo'])
rough = np.load(cfg['roughness'])
metal = np.load(cfg['metallic'])
mesh = obj.data
# vectorized per-corner color assignment (foreach_set; the per-loop python
# assignment the reference uses takes minutes on 500k-vert meshes)
nloops = len(mesh.loops)
vidx = np.empty(nloops, np.int32)
mesh.loops.foreach_get('vertex_index', vidx)
col_a = np.ones((nloops, 4), np.float32)
col_a[:, :3] = albedo[vidx]
col_m = np.zeros((nloops, 4), np.float32)
col_m[:, 0] = metal[vidx, 0]
col_m[:, 1] = rough[vidx, 0]
col_m[:, 3] = 1.0
if hasattr(mesh, 'color_attributes'):      # Blender >= 3.2
    ca = mesh.color_attributes.new('albedo', 'FLOAT_COLOR', 'CORNER')
    cm = mesh.color_attributes.new('metal_rough', 'FLOAT_COLOR', 'CORNER')
else:
    ca = mesh.vertex_colors.new(name='albedo')
    cm = mesh.vertex_colors.new(name='metal_rough')
ca.data.foreach_set('color', col_a.reshape(-1))
cm.data.foreach_set('color', col_m.reshape(-1))

mat = bpy.data.materials.new('baked')
mat.use_nodes = True
nt = mat.node_tree
bsdf = nt.nodes['Principled BSDF']
attr_a = nt.nodes.new('ShaderNodeVertexColor'); attr_a.layer_name = 'albedo'
attr_m = nt.nodes.new('ShaderNodeVertexColor'); attr_m.layer_name = 'metal_rough'
try:                                       # Blender >= 3.3 / 4.x
    sep = nt.nodes.new('ShaderNodeSeparateColor')
    sep_in, sep_r, sep_g = sep.inputs['Color'], sep.outputs['Red'], sep.outputs['Green']
except RuntimeError:                       # removed ShaderNodeSeparateRGB fallback
    sep = nt.nodes.new('ShaderNodeSeparateRGB')
    sep_in, sep_r, sep_g = sep.inputs['Image'], sep.outputs['R'], sep.outputs['G']
nt.links.new(attr_a.outputs['Color'], bsdf.inputs['Base Color'])
nt.links.new(attr_m.outputs['Color'], sep_in)
nt.links.new(sep_r, bsdf.inputs['Metallic'])
nt.links.new(sep_g, bsdf.inputs['Roughness'])
obj.data.materials.append(mat)

world = bpy.data.worlds.new('relight'); bpy.context.scene.world = world
world.use_nodes = True
env = world.node_tree.nodes.new('ShaderNodeTexEnvironment')
env.image = bpy.data.images.load(cfg['hdr'])
world.node_tree.links.new(env.outputs['Color'],
                          world.node_tree.nodes['Background'].inputs['Color'])

scene = bpy.context.scene
scene.render.engine = 'CYCLES'
scene.render.film_transparent = True
scene.render.resolution_x = cfg['width']
scene.render.resolution_y = cfg['height']
for i, pose in enumerate(cfg['poses']):
    cam_data = bpy.data.cameras.new(f'cam{i}')
    cam = bpy.data.objects.new(f'cam{i}', cam_data)
    bpy.context.collection.objects.link(cam)
    cam.matrix_world = np.array(pose).T.tolist()
    scene.camera = cam
    scene.render.filepath = cfg['out_pattern'] % i
    bpy.ops.render.render(write_still=True)
'''


def run_blender_relight(cfg, hdr_path: Optional[str] = None,
                        poses=None, hw=(800, 800)) -> Optional[str]:
    """Emit the relight bundle and run blender if present
    (ref: eval_mat.py:141-152 subprocess call)."""
    import json
    out_dir = os.path.join('data/relight', cfg['name'])
    os.makedirs(out_dir, exist_ok=True)
    script = os.path.join(out_dir, 'relight_driver.py')
    with open(script, 'w') as f:
        f.write(BLENDER_SCRIPT)
    bundle = {
        'mesh': cfg['mesh'],
        'albedo': os.path.join('data/materials', cfg['name'], 'albedo.npy'),
        'roughness': os.path.join('data/materials', cfg['name'],
                                  'roughness.npy'),
        'metallic': os.path.join('data/materials', cfg['name'],
                                 'metallic.npy'),
        'hdr': hdr_path or '',
        'trans': bool(cfg.get('trans', False)),
        'poses': [] if poses is None else [p.tolist() for p in poses],
        'width': hw[1], 'height': hw[0],
        'out_pattern': os.path.join(out_dir, 'relit_%03d.png'),
    }
    cfg_path = os.path.join(out_dir, 'relight_cfg.json')
    with open(cfg_path, 'w') as f:
        json.dump(bundle, f)
    blender = shutil.which('blender')
    if blender is None:
        print(f'blender not found; relight bundle written to {out_dir}')
        return None
    subprocess.check_call([blender, '--background', '--python', script,
                           '--', cfg_path])
    return out_dir


def relight_direct(mat_params, mc_cfg, grid, unit_size, aabb, verts, normals,
                   env_cubemap, rays_view, rng, n_samples: int = 128):
    """Native relighting: shade baked surface points under a swapped
    environment (TPU path, no Blender). env_cubemap: [6,R,R,3] linear."""
    import jax
    import jax.numpy as jnp
    from ..fields import mc_shading
    from ..ops import cubemap as cm
    from ..ops.math import linear_to_srgb, saturate_dot, safe_normalize
    from ..ops.samplers import direction_samples_01, sample_diffuse_directions
    from ..ops.brdf import specular_weight
    from ..ops import sdf_trace

    verts = jnp.asarray(verts)
    normals = jnp.asarray(normals)
    view = safe_normalize(jnp.asarray(rays_view))
    metallic, roughness, albedo = mc_shading.predict_materials(
        mat_params, mc_cfg, verts, aabb)

    table = jnp.asarray(direction_samples_01(n_samples))
    dirs, _, pdf, _ = sample_diffuse_directions(table, normals, view, rng)
    pn, sn, _ = dirs.shape
    o = jnp.broadcast_to(verts[:, None, :], dirs.shape).reshape(-1, 3)
    d = dirs.reshape(-1, 3)
    _, _, _, hit = sdf_trace.sphere_trace(grid, o + 2 * unit_size * d, d)
    vis = 1.0 - hit.reshape(pn, sn, 1).astype(verts.dtype)
    env = cm.sample_cubemap(env_cubemap, d).reshape(pn, sn, 3)

    kd = (1.0 - metallic)[:, None, :]
    diffuse_w = albedo[:, None, :] * kd * (
        saturate_dot(dirs, normals[:, None, :]) / np.pi)
    f0 = 0.04 * (1.0 - metallic) + metallic * albedo
    spec_w, nol = specular_weight(normals[:, None, :], view[:, None, :],
                                  dirs, f0[:, None, :],
                                  roughness[:, None, :])
    weights = (diffuse_w + spec_w) * (nol > 0)
    colors = jnp.mean(weights * env * vis / jnp.maximum(pdf, 1e-6), 1)
    return jnp.clip(linear_to_srgb(colors), 0.0, 1.0)
