"""COLMAP-based scene databases: real captures and glossy-synthetic scenes.

Re-designed equivalents of the reference's COLMAP-backed adapters
(ref: dataset/database.py:102-286 GlossyReal/GlossySynthetic, 581-721
CustomDatabase): w2c poses parsed from a COLMAP sparse model, the scene
normalized into the unit sphere from an object point cloud, with the same
up/forward re-orientation convention for the known captures.
"""
from __future__ import annotations

import glob
import os
import pickle
from typing import Dict

import numpy as np

from .colmap_model import camera_K, qvec2rotmat, read_model
from .database import BaseDatabase, imread


GLOSSY_META = {
    # up/forward re-orientation of the public GlossyReal captures
    # (ref: database.py:103-109)
    'bear': {'forward': [0.539944, -0.342791, 0.341446],
             'up': [0.0512875, -0.645326, -0.762183]},
    'coral': {'forward': [0.004226, -0.235523, 0.267582],
              'up': [0.0477973, -0.748313, -0.661622]},
    'maneki': {'forward': [-2.336584, -0.406351, 0.482029],
               'up': [-0.0117387, -0.738751, -0.673876]},
    'bunny': {'forward': [0.437076, -1.672467, 1.436961],
              'up': [-0.0693234, -0.644819, -0.761185]},
    'vase': {'forward': [-0.911907, -0.132777, 0.180063],
             'up': [-0.01911, -0.738918, -0.673524]},
}


def _compute_rotation(vert, forward):
    """(ref: database.py:172-180)"""
    y = np.cross(vert, forward)
    x = np.cross(y, vert)
    vert = vert / np.linalg.norm(vert)
    x = x / np.linalg.norm(x)
    y = y / np.linalg.norm(y)
    return np.stack([x, y, vert], 0)


def normalize_poses(poses: Dict, ref_points: np.ndarray,
                    up=None, forward=None):
    """Rigidly map the object into the unit sphere; update w2c poses
    (ref: database.py:182-207). Returns (poses, scale, offset, R_rect)."""
    max_pt, min_pt = ref_points.max(0), ref_points.min(0)
    center = 0.5 * (max_pt + min_pt)
    offset = -center
    scale = 1.0 / np.max(np.linalg.norm(ref_points - center[None], axis=1))
    if up is not None:
        up = np.asarray(up, np.float64)
        forward = np.asarray(forward, np.float64)
        up = up / np.linalg.norm(up)
        forward = forward / np.linalg.norm(forward)
        r_rect = _compute_rotation(up, forward)
    else:
        r_rect = np.eye(3)
    out = {}
    for img_id, pose in poses.items():
        rot, t = pose[:, :3], pose[:, 3]
        r_new = rot @ r_rect.T
        t_new = (t - rot @ offset) * scale
        out[img_id] = np.concatenate(
            [r_new, t_new[:, None]], -1).astype(np.float32)
    return out, scale, offset, r_rect


def load_ply_points(path: str) -> np.ndarray:
    from ..ops.mesh import read_ply
    verts, _ = read_ply(path)
    return verts


class ColmapDatabase(BaseDatabase):
    """Shared base for COLMAP-parsed captures (w2c [3,4] poses)."""

    def _parse_colmap(self, sparse_dir: str):
        cache = os.path.join(self.root, 'cache.pkl')
        if os.path.exists(cache):
            with open(cache, 'rb') as f:
                (self.poses, self.Ks, self.image_names,
                 self.img_ids) = pickle.load(f)
            return
        cameras, images, _ = read_model(sparse_dir)
        self.poses, self.Ks, self.image_names = {}, {}, {}
        self.img_ids = []
        for img_id, image in images.items():
            self.img_ids.append(img_id)
            self.image_names[img_id] = image.name
            rot = qvec2rotmat(image.qvec)
            pose = np.concatenate([rot, image.tvec[:, None]], 1)
            self.poses[img_id] = pose.astype(np.float32)
            self.Ks[img_id] = camera_K(cameras[image.camera_id])
        with open(cache, 'wb') as f:
            pickle.dump((self.poses, self.Ks, self.image_names,
                         self.img_ids), f)

    def get_K(self, img_id):
        return self.Ks[img_id].copy()

    def get_pose(self, img_id):
        return self.poses[img_id].copy()

    def get_img_ids(self):
        return self.img_ids


class GlossyRealDatabase(ColmapDatabase):
    """(ref: database.py:102-247) 'real/<object>/raw_<len>'"""

    def __init__(self, database_name, dataset_dir):
        super().__init__(database_name)
        _, self.object_name, self.max_len = database_name.split('/')
        self.root = os.path.join(dataset_dir, self.object_name)
        self._parse_colmap(os.path.join(self.root, 'colmap', 'sparse', '0'))
        ref_points = load_ply_points(
            os.path.join(self.root, 'object_point_cloud.ply'))
        meta = GLOSSY_META.get(self.object_name, {})
        self.poses, self.scale_rect, self.offset_rect, self.R_rect = \
            normalize_poses(self.poses, ref_points,
                            meta.get('up'), meta.get('forward'))
        # resized image directory (ref: database.py:121-136)
        if self.max_len.startswith('raw'):
            first = os.path.join(self.root, 'images',
                                 self.image_names[self.img_ids[0]])
            h, w = imread(first).shape[:2]
            target = int(self.max_len.split('_')[1])
            ratio = target / max(h, w)
            th, tw = int(ratio * h), int(ratio * w)
            self.image_dir = os.path.join(self.root,
                                          f'images_{self.max_len}')
            os.makedirs(self.image_dir, exist_ok=True)
            import cv2
            for img_id in self.img_ids:
                dst = os.path.join(self.image_dir,
                                   self.image_names[img_id])
                if not os.path.exists(dst):
                    img = imread(os.path.join(self.root, 'images',
                                              self.image_names[img_id]))
                    cv2.imwrite(dst, cv2.resize(
                        img[..., ::-1], (tw, th),
                        interpolation=cv2.INTER_AREA))
                self.Ks[img_id] = (np.diag([tw / w, th / h, 1.0])
                                   @ self.Ks[img_id]).astype(np.float32)
        else:
            self.image_dir = os.path.join(self.root, 'images')

    def get_image(self, img_id):
        return imread(os.path.join(self.image_dir,
                                   self.image_names[img_id]))[..., :3]

    def get_depth(self, img_id):
        img = self.get_image(img_id)
        h, w = img.shape[:2]
        return np.ones([h, w], np.float32), np.ones([h, w], bool)


class GlossySyntheticDatabase(BaseDatabase):
    """(ref: database.py:249-286) 'syn/<model>' — per-view camera pickles."""

    def __init__(self, database_name, dataset_dir):
        super().__init__(database_name)
        _, model_name = database_name.split('/')
        self.root = os.path.join(dataset_dir, model_name)
        self.img_num = len(glob.glob(os.path.join(self.root, '*.pkl')))
        self.img_ids = [str(k) for k in range(self.img_num)]
        self.cams = []
        for k in range(self.img_num):
            with open(os.path.join(self.root, f'{k}-camera.pkl'),
                      'rb') as f:
                self.cams.append(pickle.load(f))
        self.scale_factor = 1.0

    def get_image(self, img_id):
        img = imread(os.path.join(self.root, f'{img_id}.png'))[..., :3]
        return img * self.get_mask(img_id)[..., None]

    def get_K(self, img_id):
        return self.cams[int(img_id)][1].astype(np.float32)

    def get_pose(self, img_id):
        pose = self.cams[int(img_id)][0].astype(np.float32).copy()
        pose[:, 3:] *= self.scale_factor
        return pose

    def get_img_ids(self):
        return self.img_ids

    def get_depth(self, img_id):
        depth = imread(os.path.join(self.root, f'{img_id}-depth.png'))
        depth = depth.astype(np.float32) / 65535 * 15
        return depth, depth < 14.5

    def get_mask(self, img_id):
        return self.get_depth(img_id)[1]


class CustomDatabase(ColmapDatabase):
    """(ref: database.py:581-721) 'custom/<object>/<max_len>' — user
    captures with COLMAP poses + object point cloud; optional masks dir."""

    def __init__(self, database_name, dataset_dir):
        super().__init__(database_name)
        _, self.object_name, self.max_len = database_name.split('/')
        self.root = os.path.join(dataset_dir, self.object_name)
        self._parse_colmap(os.path.join(self.root, 'colmap', 'sparse', '0'))
        pc = os.path.join(self.root, 'object_point_cloud.ply')
        if os.path.exists(pc):
            ref_points = load_ply_points(pc)
            self.poses, _, _, _ = normalize_poses(self.poses, ref_points)
        self.image_dir = os.path.join(self.root, 'images')
        self.mask_dir = os.path.join(self.root, 'masks')

    def get_image(self, img_id):
        return imread(os.path.join(self.image_dir,
                                   self.image_names[img_id]))[..., :3]

    def get_mask(self, img_id):
        p = os.path.join(self.mask_dir, self.image_names[img_id])
        if os.path.exists(p):
            m = imread(p)
            return (m[..., 0] if m.ndim == 3 else m) > 127
        img = self.get_image(img_id)
        return np.ones(img.shape[:2], bool)

    def get_depth(self, img_id):
        img = self.get_image(img_id)
        h, w = img.shape[:2]
        return np.ones([h, w], np.float32), self.get_mask(img_id)


def parse_colmap_database(database_name: str, dataset_dir: str
                          ) -> BaseDatabase:
    dtype = database_name.split('/')[0]
    if dtype == 'real':
        return GlossyRealDatabase(database_name, dataset_dir)
    if dtype == 'syn':
        return GlossySyntheticDatabase(database_name, dataset_dir)
    if dtype == 'custom':
        return CustomDatabase(database_name, dataset_dir)
    raise NotImplementedError(database_name)
