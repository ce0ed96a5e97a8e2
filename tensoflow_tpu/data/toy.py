"""Procedural analytic test scene: a shaded sphere rendered on the fly.

No reference counterpart — this framework's own test/bench fixture.  It lets
the full train/eval pipeline run hermetically (no dataset downloads): an
analytic SDF sphere with Lambertian + Blinn-Phong shading under a fixed
directional light, rendered by exact ray-sphere intersection with the same
camera model as the blender-format datasets (nerfDataType poses).
"""
from __future__ import annotations

import numpy as np

from .database import BaseDatabase


def _look_at(eye, center=np.zeros(3), up=np.array([0.0, 0.0, 1.0])):
    """c2w pose, OpenGL convention (camera looks along -z)."""
    f = center - eye
    f = f / np.linalg.norm(f)
    s = np.cross(f, up)
    s = s / np.linalg.norm(s)
    u = np.cross(s, f)
    c2w = np.eye(4)
    c2w[:3, 0] = s
    c2w[:3, 1] = u
    c2w[:3, 2] = -f
    c2w[:3, 3] = eye
    return c2w


def render_sphere_view(pose_c2w, K, h, w, radius=0.5,
                       light_dir=np.array([0.5, 0.3, 0.8]),
                       albedo=np.array([0.7, 0.3, 0.2])):
    """Exact ray-traced lambertian+specular sphere. Returns (rgb u8, mask)."""
    i, j = np.meshgrid(np.arange(w), np.arange(h))
    dirs = np.stack([(i - K[0, 2] + 0.5) / K[0, 0],
                     -(j - K[1, 2] + 0.5) / K[1, 1],
                     -np.ones_like(i, np.float64)], -1)
    R, t = pose_c2w[:3, :3], pose_c2w[:3, 3]
    d = dirs @ R.T
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.broadcast_to(t, d.shape)

    b = 2 * np.sum(o * d, -1)
    c = np.sum(o * o, -1) - radius ** 2
    disc = b * b - 4 * c
    hit = disc > 0
    tq = (-b - np.sqrt(np.maximum(disc, 0))) / 2
    hit &= tq > 0
    pts = o + tq[..., None] * d
    n = pts / radius
    l = light_dir / np.linalg.norm(light_dir)
    diff = np.clip(np.sum(n * l, -1), 0, 1)
    hvec = l - d
    hvec = hvec / np.maximum(np.linalg.norm(hvec, axis=-1, keepdims=True),
                             1e-8)
    spec = np.clip(np.sum(n * hvec, -1), 0, 1) ** 40
    rgb = (albedo[None, None] * (0.25 + 0.75 * diff[..., None])
           + 0.5 * spec[..., None])
    rgb = np.clip(rgb, 0, 1)
    img = np.where(hit[..., None], rgb, 1.0)
    return (img * 255).astype(np.uint8), hit.astype(np.float32)


class ToyDatabase(BaseDatabase):
    """'toy/sphere_<res>_<n>' — n views on a circle at resolution res."""

    def __init__(self, database_name, dataset_dir=None, isTest=False,
                 isWhiteBG=True):
        super().__init__(database_name)
        parts = database_name.split('/')[1].split('_')
        res = int(parts[1]) if len(parts) > 1 else 100
        n_views = int(parts[2]) if len(parts) > 2 else 16
        self.H = self.W = res
        focal = 1.2 * res
        self.K = np.array([[focal, 0, res / 2],
                           [0, focal, res / 2], [0, 0, 1]], np.float32)
        rng = np.random.RandomState(0)
        self.poses, self.imgs, self.masks = [], [], []
        for vi in range(n_views):
            az = 2 * np.pi * vi / n_views
            el = 0.3 + 0.4 * rng.rand()
            eye = 2.2 * np.array([np.cos(az) * np.cos(el),
                                  np.sin(az) * np.cos(el), np.sin(el)])
            pose = _look_at(eye)
            img, mask = render_sphere_view(pose, self.K, res, res)
            self.poses.append(pose)
            self.imgs.append(img)
            self.masks.append(mask)
        self.img_ids = list(range(n_views))
        self.scale_factor = 1.0

    def get_image(self, i):
        return self.imgs[i]

    def get_K(self, i):
        return self.K

    def get_pose(self, i):
        return self.poses[i]

    def get_img_ids(self):
        return self.img_ids

    def get_depth(self, i):
        return np.zeros((self.H, self.W), np.float32), self.masks[i]

    def get_mask(self, i):
        return self.masks[i]

    def get_albedo(self, i):
        """Ground-truth albedo map (constant by construction)."""
        alb = np.empty((self.H, self.W, 3), np.float32)
        alb[:] = np.array([0.7, 0.3, 0.2], np.float32)
        return alb
