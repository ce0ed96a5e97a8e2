"""GlossyReal/Custom object-centred crop path (`real/<obj>/<size>`).

Builds a synthetic COLMAP scene on disk (text sparse model + rendered
marker images + object point cloud), then checks the crop geometry: the
rectified (pose, K) must reproject the object inside the square crop,
and a 3D marker painted into the raw frames must land at its reprojected
pixel in the warped crop (homography <-> pose/K consistency)."""
import os
import pickle

import numpy as np
import pytest

cv2 = pytest.importorskip('cv2')

from tensoflow_tpu.data import colmap_db
from tensoflow_tpu.ops.mesh import write_ply


H, W = 160, 200
SIZE = 96
MARKER = np.asarray([0.25, 0.1, 0.15], np.float32)   # on the point cloud


def _look_at_pose(eye, target):
    fwd = target - eye
    fwd = fwd / np.linalg.norm(fwd)
    right = np.cross(fwd, [0.0, 0.0, 1.0])
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    rot = np.stack([right, down, fwd], 0).astype(np.float64)
    t = -rot @ np.asarray(eye, np.float64)
    return np.concatenate([rot, t[:, None]], 1)


def _rotmat2qvec(R):
    from tensoflow_tpu.data.colmap_model import rotmat2qvec
    return rotmat2qvec(R)


@pytest.fixture(scope='module')
def scene(tmp_path_factory):
    root = tmp_path_factory.mktemp('glossy') / 'testobj'
    (root / 'images').mkdir(parents=True)
    sparse = root / 'colmap' / 'sparse' / '0'
    sparse.mkdir(parents=True)

    # object point cloud: jittered sphere around (0.2, 0.1, 0.1), r=0.15,
    # with the marker vertex appended
    rng = np.random.RandomState(0)
    d = rng.randn(256, 3)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    pts = (np.asarray([0.2, 0.1, 0.1]) + 0.15 * d).astype(np.float32)
    pts = np.concatenate([pts, MARKER[None]], 0)
    write_ply(str(root / 'object_point_cloud.ply'), pts,
              np.zeros((0, 3), np.int32))

    K = np.asarray([[220.0, 0, W / 2 + 9], [0, 220.0, H / 2 - 6],
                    [0, 0, 1]])
    eyes = [np.asarray(e, np.float64) for e in
            [[1.3, 0.2, 0.4], [0.3, 1.4, 0.5], [-0.9, -0.8, 0.7]]]
    poses = [_look_at_pose(e, np.asarray([0.2, 0.1, 0.1])) for e in eyes]

    with open(sparse / 'cameras.txt', 'w') as f:
        f.write(f'1 PINHOLE {W} {H} 220.0 220.0 {W/2+9} {H/2-6}\n')
    with open(sparse / 'images.txt', 'w') as f:
        for i, pose in enumerate(poses):
            q = _rotmat2qvec(pose[:, :3])
            t = pose[:, 3]
            f.write(f'{i+1} {q[0]} {q[1]} {q[2]} {q[3]} '
                    f'{t[0]} {t[1]} {t[2]} 1 view{i}.png\n')
            f.write('0.0 0.0 -1\n')

    # raw frames: grey background, red disk at the projected marker
    for i, pose in enumerate(poses):
        img = np.full((H, W, 3), 64, np.uint8)
        uv, _ = colmap_db.project_points(MARKER[None], pose, K)
        cv2.circle(img, (int(round(uv[0, 0])), int(round(uv[0, 1]))), 4,
                   (255, 0, 0), -1)
        cv2.imwrite(str(root / 'images' / f'view{i}.png'), img[..., ::-1])
    return root


def test_crop_geometry_and_marker(scene):
    db = colmap_db.GlossyRealDatabase(f'real/testobj/{SIZE}',
                                      str(scene.parent))
    for img_id in db.get_img_ids():
        img = db.get_image(img_id)
        assert img.shape == (SIZE, SIZE, 3)
        pose, K = db.get_pose(img_id), db.get_K(img_id)
        # rectified intrinsics: square, centred principal point
        assert K[0, 2] == pytest.approx(SIZE / 2)
        assert K[0, 0] == pytest.approx(K[1, 1])
        # normalized object reprojects inside the crop and fills most of it
        uv, depth = colmap_db.project_points(db.ref_points, pose, K)
        assert (depth > 0).all()
        assert uv.min() >= -2 and uv.max() <= SIZE + 2
        assert np.max(uv.max(0) - uv.min(0)) > 0.7 * SIZE
        # the painted marker warped to its reprojected pixel: ref_points[-1]
        # is the marker in the normalized frame
        muv, _ = colmap_db.project_points(db.ref_points[-1:], pose, K)
        x, y = int(round(muv[0, 0])), int(round(muv[0, 1]))
        patch = img[max(y - 3, 0):y + 4, max(x - 3, 0):x + 4]
        red = (patch[..., 0].astype(np.int32)
               - patch[..., 1].astype(np.int32))
        assert red.max() > 120, 'marker not found at reprojected pixel'


def test_crop_minification_blur_branch(scene):
    """size smaller than the projected object extent -> scale < 1 path
    (gaussian pre-filter + downscale warp) must stay geometrically
    consistent too."""
    db = colmap_db.GlossyRealDatabase('real/testobj/32', str(scene.parent))
    for img_id in db.get_img_ids():
        img = db.get_image(img_id)
        assert img.shape == (32, 32, 3)
        uv, depth = colmap_db.project_points(
            db.ref_points, db.get_pose(img_id), db.get_K(img_id))
        assert (depth > 0).all()
        assert uv.min() >= -2 and uv.max() <= 34


def test_crop_cache_roundtrip(scene):
    db1 = colmap_db.GlossyRealDatabase(f'real/testobj/{SIZE}',
                                       str(scene.parent))
    meta = os.path.join(db1.image_dir, 'meta_info.pkl')
    assert os.path.exists(meta)
    with open(meta, 'rb') as f:
        poses, Ks = pickle.load(f)
    db2 = colmap_db.GlossyRealDatabase(f'real/testobj/{SIZE}',
                                       str(scene.parent))
    for img_id in db1.get_img_ids():
        np.testing.assert_array_equal(db1.get_pose(img_id),
                                      db2.get_pose(img_id))
        np.testing.assert_array_equal(db1.get_K(img_id), Ks[img_id])
