"""Binary COLMAP model round-trip (write -> read -> compare), mirroring
the reference's colmap/test_read_write_model.py strategy."""
import numpy as np

from tensoflow_tpu.data import colmap_model as cm


def _model():
    rng = np.random.RandomState(0)
    cams = {
        1: cm.Camera(1, 'PINHOLE', 640, 480,
                     np.array([500.0, 510.0, 320.0, 240.0])),
        2: cm.Camera(2, 'SIMPLE_RADIAL', 800, 600,
                     np.array([450.0, 400.0, 300.0, 0.01])),
    }
    images = {}
    for i in (1, 2, 3):
        q = rng.randn(4)
        q /= np.linalg.norm(q)
        n = rng.randint(0, 5)
        images[i] = cm.Image(i, q, rng.randn(3), 1 + (i % 2),
                             f'frame_{i:04d}.png', rng.rand(n, 2) * 640,
                             rng.randint(-1, 100, n).astype(np.int64))
    pts = {}
    for j in (10, 11):
        t = rng.randint(1, 4)
        pts[j] = cm.Point3D(j, rng.randn(3),
                            rng.randint(0, 256, 3).astype(np.uint8),
                            float(rng.rand()),
                            rng.randint(1, 4, t).astype(np.int32),
                            rng.randint(0, 5, t).astype(np.int32))
    return cams, images, pts


def test_binary_roundtrip(tmp_path):
    cams, images, pts = _model()
    cm.write_model(cams, images, pts, str(tmp_path))
    c2, i2, p2 = cm.read_model(str(tmp_path))

    assert set(c2) == set(cams)
    for k in cams:
        assert c2[k].model == cams[k].model
        assert (c2[k].width, c2[k].height) == (cams[k].width,
                                               cams[k].height)
        np.testing.assert_allclose(c2[k].params, cams[k].params)

    assert set(i2) == set(images)
    for k in images:
        np.testing.assert_allclose(i2[k].qvec, images[k].qvec)
        np.testing.assert_allclose(i2[k].tvec, images[k].tvec)
        assert i2[k].name == images[k].name
        assert i2[k].camera_id == images[k].camera_id
        np.testing.assert_allclose(i2[k].xys, images[k].xys)
        np.testing.assert_array_equal(i2[k].point3D_ids,
                                      images[k].point3D_ids)

    assert set(p2) == set(pts)
    for k in pts:
        np.testing.assert_allclose(p2[k].xyz, pts[k].xyz)
        np.testing.assert_array_equal(p2[k].rgb, pts[k].rgb)
        assert p2[k].error == pts[k].error
        np.testing.assert_array_equal(p2[k].image_ids, pts[k].image_ids)
        np.testing.assert_array_equal(p2[k].point2D_idxs,
                                      pts[k].point2D_idxs)


def test_qvec_rotmat_roundtrip():
    rng = np.random.RandomState(1)
    for _ in range(10):
        q = rng.randn(4)
        q /= np.linalg.norm(q)
        if q[0] < 0:
            q = -q
        R = cm.qvec2rotmat(q)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-10)
        np.testing.assert_allclose(cm.rotmat2qvec(R), q, atol=1e-8)


def test_dense_array_roundtrip(tmp_path):
    """COLMAP Mat<float> depth/normal maps (ref: read_write_dense.py):
    W&H&C& header + column-major float32."""
    from tensoflow_tpu.data import colmap_dense as cd
    rng = np.random.RandomState(0)
    depth = rng.rand(13, 7).astype(np.float32)
    p = str(tmp_path / 'depth.bin')
    cd.write_array(depth, p)
    np.testing.assert_array_equal(cd.read_array(p), depth)
    normal = rng.rand(5, 9, 3).astype(np.float32)
    p2 = str(tmp_path / 'normal.bin')
    cd.write_array(normal, p2)
    np.testing.assert_array_equal(cd.read_array(p2), normal)


def test_fused_vis_roundtrip(tmp_path):
    """fused.ply + fused.ply.vis round-trip (ref: read_write_fused_vis.py
    / src/mvs/fusion.cc format)."""
    from tensoflow_tpu.data import colmap_dense as cd
    rng = np.random.RandomState(1)
    pts = [cd.FusedPoint(
        position=rng.randn(3).astype(np.float32),
        color=rng.randint(0, 255, 3).astype(np.uint8),
        normal=rng.randn(3).astype(np.float32),
        visible_image_idxs=rng.randint(0, 40, rng.randint(1, 6)))
        for _ in range(17)]
    ply = str(tmp_path / 'fused.ply')
    vis = str(tmp_path / 'fused.ply.vis')
    cd.write_fused(pts, ply, vis)
    back = cd.read_fused(ply, vis)
    assert len(back) == 17
    for a, b in zip(pts, back):
        np.testing.assert_allclose(b.position, a.position, rtol=1e-6)
        np.testing.assert_array_equal(b.color, a.color)
        np.testing.assert_allclose(b.normal, a.normal, rtol=1e-6)
        np.testing.assert_array_equal(b.visible_image_idxs,
                                      a.visible_image_idxs)


def test_generic_ply_points_ascii_and_binary(tmp_path):
    from tensoflow_tpu.data import colmap_dense as cd
    rng = np.random.RandomState(2)
    props = {'x': rng.rand(8).astype(np.float32),
             'y': rng.rand(8).astype(np.float32),
             'z': rng.rand(8).astype(np.float32),
             'red': rng.randint(0, 255, 8).astype(np.uint8)}
    p = str(tmp_path / 'pc.ply')
    cd.write_ply_points(p, props)
    back = cd.read_ply_points(p)
    for k in props:
        np.testing.assert_array_equal(back[k], props[k])
    # ascii variant
    with open(tmp_path / 'pc_ascii.ply', 'w') as f:
        f.write('ply\nformat ascii 1.0\nelement vertex 2\n'
                'property float x\nproperty float y\nproperty float z\n'
                'end_header\n0.5 1.0 2.0\n3.0 4.0 5.5\n')
    back2 = cd.read_ply_points(str(tmp_path / 'pc_ascii.ply'))
    np.testing.assert_allclose(back2['x'], [0.5, 3.0])
    np.testing.assert_allclose(back2['z'], [2.0, 5.5])
