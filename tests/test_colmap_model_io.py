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
