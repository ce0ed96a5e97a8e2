"""Stage-1 (geometry) shading network: split-sum PBR at each ray sample.

Functional equivalent of the reference ShapeShadingNetwork
(ref: network/fields.py:320-575): material MLP -> albedo/roughness/metallic;
diffuse = albedo * cosine-prefiltered envlight(normal); specular =
FG-LUT(NoV, roughness) * blended light, where the light interpolates between
an indirect-light MLP (IPE position + IDE reflection) and the direct
prefiltered envlight by a learned occlusion probability.

The FG LUT is *computed*, not shipped: standard split-sum BRDF integration
(Karis 2013) with GGX importance sampling, evaluated once in numpy at build
time (the reference loads the same table from assets/bsdf_256_256.bin,
ref fields.py:346-347).
"""
from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.math import (integrated_dir_encoding, ide_dim,
                        integrated_positional_encoding, linear_to_srgb,
                        positional_encoding, pe_dim, safe_normalize,
                        get_camera_plane_intersection)
from ..ops.tensor_field import sample_bilinear_packed
from . import light as envlight_mod
from . import mlp


class ShadingConfig(NamedTuple):
    human_light: bool = False
    sphere_direction: bool = False
    light_pos_freq: int = 8
    inner_init: float = -0.95
    light_exp_max: float = 0.0
    app_feats_dim: int = 128
    has_radiance_field: bool = False
    radiance_field_step: int = 0
    mat_pos_multires: int = -1
    env: envlight_mod.EnvLightConfig = envlight_mod.EnvLightConfig()


@functools.lru_cache(maxsize=2)
def compute_fg_lut_packed(res: int = 256, n_samples: int = 1024):
    """compute_fg_lut as a patch_pack_2d row table: ((rows, 8), (H, W))."""
    lut = compute_fg_lut(res, n_samples)
    h, w, c = lut.shape
    pad = np.pad(lut, ((1, 1), (1, 1), (0, 0)), mode='edge')
    slots = [pad[d0:d0 + h + 1, d1:d1 + w + 1]
             for d0 in (0, 1) for d1 in (0, 1)]
    packed = np.concatenate(slots, -1).reshape((h + 1) * (w + 1), 4 * c)
    return packed, (h, w)


@functools.lru_cache(maxsize=2)
def compute_fg_lut(res: int = 256, n_samples: int = 1024) -> np.ndarray:
    """Split-sum environment-BRDF LUT [roughness, NoV, 2].

    A(NoV, r), B(NoV, r) such that specular ≈ F0 * A + B.  GGX importance
    sampling (alpha = roughness^2) with the height-correlated Smith
    masking-shadowing term — numerically matches the table the reference
    ships as assets/bsdf_256_256.bin to ~1e-3.  Cached to disk after first
    computation (it takes ~1 min at full res).
    """
    import os
    cache = os.path.join(os.path.dirname(__file__), '..', 'assets',
                         f'fg_lut_{res}_{n_samples}.npy')
    if os.path.exists(cache):
        return np.load(cache)

    nov = np.linspace(0.5 / res, 1 - 0.5 / res, res)[None, :, None]   # [1,R,1]
    rough = np.linspace(0.5 / res, 1 - 0.5 / res, res)[:, None, None]  # [R,1,1]

    # hammersley sequence
    i = np.arange(n_samples)
    xi1 = (i + 0.5) / n_samples
    xi2 = np.array([int(bin(x)[2:].zfill(32)[::-1], 2) for x in i],
                   np.float64) / 2 ** 32

    a = rough ** 2
    phi = 2 * np.pi * xi1[None, None, :]
    cos_t = np.sqrt((1 - xi2[None, None, :])
                    / (1 + (a ** 2 - 1) * xi2[None, None, :]))
    sin_t = np.sqrt(np.maximum(1 - cos_t ** 2, 0))

    # view vector in tangent space (n = +z)
    v = np.stack([np.sqrt(np.maximum(1 - nov ** 2, 0))
                  * np.ones_like(cos_t),
                  np.zeros_like(cos_t * nov),
                  nov * np.ones_like(cos_t)], -1)
    h = np.stack([sin_t * np.cos(phi), sin_t * np.sin(phi), cos_t], -1)
    voh = np.sum(v * h, -1)
    l = 2 * voh[..., None] * h - v
    nol = l[..., 2]
    noh = np.clip(cos_t, 0, 1)
    voh = np.clip(voh, 0, 1)

    def lam(a2, c):
        c2 = c * c
        t2 = (1 - c2) / np.maximum(c2, 1e-9)
        return 0.5 * np.sqrt(1 + a2 * t2) - 0.5

    g = 1.0 / (1.0 + lam(a * a, nov) + lam(a * a, np.clip(nol, 1e-6, 1)))
    g_vis = np.where(nol > 0, g * voh / np.maximum(noh * nov, 1e-6), 0.0)
    fc = (1 - voh) ** 5
    a_term = np.mean((1 - fc) * g_vis, -1)
    b_term = np.mean(fc * g_vis, -1)
    out = np.stack([a_term, b_term], -1).astype(np.float32)
    try:
        os.makedirs(os.path.dirname(cache), exist_ok=True)
        np.save(cache, out)
    except OSError:
        pass
    return out


def init_shading(rng, cfg: ShadingConfig) -> Dict[str, Any]:
    ks = jax.random.split(rng, 8)
    feats = cfg.app_feats_dim
    sph_dim = ide_dim(5)                      # 72 (ref: fields.py:349)
    dir_dim = pe_dim(3, 6)
    pos_dim = pe_dim(3, cfg.light_pos_freq)

    if cfg.mat_pos_multires > 0:
        pos_in = pe_dim(3, cfg.mat_pos_multires)
    elif cfg.mat_pos_multires == 0:
        pos_in = 3
    else:
        pos_in = 0

    params = {
        'mat_mlp': mlp.init_predictor(ks[0], feats + pos_in, 5, 3,
                                      run_dim=128),
        'outer_light': mlp.init_predictor(
            ks[1], sph_dim * (2 if cfg.sphere_direction else 1), 3, 3,
            final_bias=float(np.log(0.5))),
        'envlight': envlight_mod.init_env_light(cfg.env),
        'inner_light': mlp.init_predictor(ks[2], pos_dim + sph_dim, 3, 3,
                                          final_bias=float(np.log(0.5))),
        'inner_weight': mlp.init_predictor(ks[3], pos_dim + dir_dim, 1, 3,
                                           final_bias=cfg.inner_init),
    }
    if cfg.has_radiance_field:
        params['rad_mlp'] = mlp.init_predictor(
            ks[4], feats + 3 + pe_dim(3, 4) + 3, 3, 3, run_dim=128)
    if cfg.human_light:
        params['human_light'] = mlp.init_predictor(
            ks[5], 2 * 2 * 6, 4, 3, final_bias=float(np.log(0.01)))
    return params


def _fix_normals(normals):
    """(ref: fields.py:484-485) avoid exactly-vertical zero-xy normals."""
    normals = safe_normalize(normals)
    degen = (normals[:, 0:1] + normals[:, 1:2]) == 0.0
    fallback = jnp.asarray([0.0, 1e-6, 1.0], normals.dtype)
    return jnp.where(degen, fallback[None, :], normals)


def predict_human_light(params, points, reflective, human_poses, roughness):
    """(ref: fields.py:377-393)"""
    inter, dists, hits = get_camera_plane_intersection(
        points, reflective, human_poses)
    scale = 0.3
    mean = inter[..., :2] * scale
    var = roughness * (dists[:, None] * scale) ** 2
    hits = hits & (jnp.linalg.norm(mean, axis=-1) < 1.5) & (dists > 0)
    hits = hits.astype(jnp.float32)[:, None]
    mean = mean * hits
    var = jnp.broadcast_to(var * hits, mean.shape)
    enc = integrated_positional_encoding(mean, var, 0, 6)
    hl = mlp.apply_predictor(params['human_light'], enc, 'exp', 5.0) * hits
    human_lights, human_weights = hl[..., :3], jnp.clip(hl[..., 3:], 0.0, 1.0)
    return human_lights, human_weights


def apply_shading(params, cfg: ShadingConfig, mips, points, normals,
                  view_dirs, feature_vectors, human_poses=None,
                  step: Optional[int] = None, inter_results: bool = False):
    """Forward shading (ref: fields.py:448-567).

    mips: prefiltered envlight pyramid from light.build_mips (built once per
    step outside, shared across samples).
    Returns (color [N,3], radiance or None, occ_info dict[, intermediates]).
    """
    normals = _fix_normals(normals)
    view_dirs = safe_normalize(view_dirs)
    reflective = jnp.sum(view_dirs * normals, -1, keepdims=True) * normals * 2 \
        - view_dirs
    nov = jnp.sum(normals * view_dirs, -1, keepdims=True)

    # material
    if cfg.mat_pos_multires > 0:
        mat_in = jnp.concatenate(
            [feature_vectors,
             positional_encoding(points, cfg.mat_pos_multires)], -1)
    elif cfg.mat_pos_multires == 0:
        mat_in = jnp.concatenate([feature_vectors, points], -1)
    else:
        mat_in = feature_vectors
    mat = mlp.apply_predictor(params['mat_mlp'], mat_in, 'sigmoid')
    albedo, roughness, metallic = mat[..., :3], mat[..., 3:4], mat[..., 4:]
    albedo = albedo * 0.77 + 0.03
    roughness = roughness * 0.9 + 0.09

    # radiance head (ref: fields.py:503-509).  A concrete step (eval
    # paths) gates here; a traced step means the caller's phase-keyed jit
    # already decided the head is on (trainer.phase_flags) — callers pass
    # step=None to disable (shape_renderer.render_rays).
    radiance = None
    if cfg.has_radiance_field and step is not None \
            and (not isinstance(step, (int, float, np.integer))
                 or step > cfg.radiance_field_step):
        rad_in = jnp.concatenate(
            [feature_vectors, points,
             positional_encoding(view_dirs, 4), normals], -1)
        radiance = mlp.apply_predictor(params['rad_mlp'], rad_in, 'sigmoid')

    # diffuse
    diffuse_albedo = (1.0 - metallic) * albedo
    diffuse_light = envlight_mod.shade(mips, normals, None, cfg.env)
    diffuse_color = diffuse_albedo * diffuse_light

    # specular lights (ref: fields.py:419-439)
    specular_albedo = 0.04 * (1.0 - metallic) + metallic * albedo
    ref_rough = integrated_dir_encoding(reflective, roughness, 5)
    direct_light = envlight_mod.shade(mips, reflective, roughness, cfg.env)
    pts_enc = positional_encoding(points, cfg.light_pos_freq)
    indirect_light = mlp.apply_predictor(
        params['inner_light'], jnp.concatenate([pts_enc, ref_rough], -1),
        'exp', cfg.light_exp_max)
    ref_enc = positional_encoding(reflective, 6)
    occ_in = jax.lax.stop_gradient(
        jnp.concatenate([pts_enc, ref_enc], -1))
    occ_prob = mlp.apply_predictor(params['inner_weight'], occ_in, 'none')
    occ_prob = occ_prob * 0.5 + 0.5
    occ_prob_c = jnp.clip(occ_prob, 0.0, 1.0)

    human_light, human_weight = 0.0, 0.0
    if cfg.human_light and human_poses is not None:
        human_light, human_weight = predict_human_light(
            params, points, reflective, human_poses, roughness)

    specular_light = (indirect_light * occ_prob_c
                      + (human_light * human_weight
                         + direct_light * (1.0 - human_weight))
                      * (1.0 - occ_prob_c))
    indirect_out = indirect_light * occ_prob_c

    # FG lookup (ref: fields.py:520-523); lut rows=roughness, cols=NoV.
    # Patch-packed: one wide gather instead of 4 narrow 2-channel ones
    # (the LUT is static so the packing is a host-side constant).
    lut_p, (res_h, res_w) = compute_fg_lut_packed()
    lut_p = jnp.asarray(lut_p)
    fg = sample_bilinear_packed(
        lut_p, res_h, res_w,
        jnp.clip(roughness[:, 0], 0.0, 1.0) * res_h - 0.5,
        jnp.clip(nov[:, 0], 0.0, 1.0) * res_w - 0.5)
    specular_ref = specular_albedo * fg[:, 0:1] + fg[:, 1:2]
    specular_color = specular_ref * specular_light

    color = jnp.clip(linear_to_srgb(diffuse_color + specular_color), 0.0, 1.0)

    occ_info = {'reflective': reflective, 'occ_prob': occ_prob,
                'roughness': roughness}

    if inter_results:
        inter = {
            'specular_albedo': specular_albedo,
            'specular_ref': jnp.clip(specular_ref, 0.0, 1.0),
            'specular_direct_light': direct_light,
            'specular_light': jnp.clip(linear_to_srgb(specular_light), 0, 1),
            'specular_color': jnp.clip(linear_to_srgb(specular_color), 0, 1),
            'diffuse_albedo': diffuse_albedo,
            'diffuse_light': jnp.clip(linear_to_srgb(diffuse_light), 0, 1),
            'diffuse_color': jnp.clip(linear_to_srgb(diffuse_color), 0, 1),
            'metallic': metallic,
            'roughness': roughness,
            'albedo': albedo,
            'occ_prob': jnp.clip(occ_prob, 0.0, 1.0),
            'indirect_light': indirect_out,
        }
        if cfg.human_light:
            inter['human_light'] = linear_to_srgb(human_light * human_weight)
        return color, radiance, occ_info, inter
    return color, radiance, occ_info


def predict_materials(params, cfg: ShadingConfig, points, feature_vectors):
    """(ref: fields.py:569-575)"""
    if cfg.mat_pos_multires > 0:
        mat_in = jnp.concatenate(
            [feature_vectors,
             positional_encoding(points, cfg.mat_pos_multires)], -1)
    elif cfg.mat_pos_multires == 0:
        mat_in = jnp.concatenate([feature_vectors, points], -1)
    else:
        mat_in = feature_vectors
    mat = mlp.apply_predictor(params['mat_mlp'], mat_in, 'sigmoid')
    return mat[..., 4:], mat[..., 3:4], mat[..., :3]  # metallic, rough, albedo
