"""Tests for native marching tetrahedra + PLY IO."""
import numpy as np

from tensoflow_tpu.ops import mesh


def _sphere_field(res, radius=0.6):
    xs = np.linspace(-1, 1, res, dtype=np.float32)
    xx, yy, zz = np.meshgrid(xs, xs, xs, indexing='ij')
    return np.sqrt(xx ** 2 + yy ** 2 + zz ** 2) - radius


def test_marching_tets_sphere():
    res = 48
    field = _sphere_field(res)
    verts, tris = mesh.marching_tets(field, 0.0)
    assert len(verts) > 500 and len(tris) > 1000
    # vertices lie near the isosurface of radius 0.6 (grid-index space)
    world = verts / (res - 1) * 2.0 - 1.0
    r = np.linalg.norm(world, axis=-1)
    assert abs(r.mean() - 0.6) < 0.02
    assert r.std() < 0.02
    # triangle indices valid
    assert tris.min() >= 0 and tris.max() < len(verts)


def test_marching_tets_watertight_sphere():
    """Every edge of a closed surface should appear exactly twice."""
    field = _sphere_field(32)
    verts, tris = mesh.marching_tets(field, 0.0)
    edges = {}
    for t in tris:
        for a, b in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
            key = (min(a, b), max(a, b))
            edges[key] = edges.get(key, 0) + 1
    counts = np.array(list(edges.values()))
    assert (counts == 2).mean() > 0.99


def test_extract_geometry_scaling():
    verts, tris = mesh.extract_geometry(
        np.array([-1.0, -1, -1]), np.array([1.0, 1, 1]), 48, 0.0,
        lambda p: np.linalg.norm(p, axis=-1) - 0.5)
    r = np.linalg.norm(verts, axis=-1)
    assert abs(r.mean() - 0.5) < 0.02


def test_ply_roundtrip(tmp_path):
    field = _sphere_field(24)
    verts, tris = mesh.marching_tets(field, 0.0)
    colors = np.random.RandomState(0).rand(len(verts), 3)
    p = str(tmp_path / 'm.ply')
    mesh.write_ply(p, verts, tris, colors)
    v2, t2 = mesh.read_ply(p)
    np.testing.assert_allclose(v2, verts, atol=1e-6)
    np.testing.assert_array_equal(t2, tris)
