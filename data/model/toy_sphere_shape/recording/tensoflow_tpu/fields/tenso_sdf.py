"""TensoSDF: VM-decomposed SDF + appearance field.

Functional equivalent of the reference's ``TensoSDF`` module
(ref: network/fields.py:20-317): 3 planes + 3 lines with circle-SDF init,
features fed through a 2-layer Softplus(beta=100) MLP with geometric init
producing ``[sdf, app_feat]``; first/second-order spatial derivatives by
central finite differences with step = voxel size.

TPU-first choices:
  * the 7-point FD stencil (center + 6 offsets, ref fields.py:227-260) is
    evaluated as ONE batched field call — a single fused gather+matmul
    program instead of 7 kernel launches
  * mip level is a per-sample float; pyramids are rebuilt inside the step
    (differentiable, ref mip semantics of dr.texture)
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import tensor_field as tfield
from ..ops.math import contraction, positional_encoding, pe_dim
from . import mlp


class SDFConfig(NamedTuple):
    grid_size: Tuple[int, int, int] = (128, 128, 128)
    n_comp: int = 36
    sdf_dim: int = 256
    app_dim: int = 128
    n_levels: int = 1
    sdf_multires: int = 3
    init_radius: float = 0.2
    # 'float32' | 'bfloat16': storage dtype for the gather hot path
    # (params stay f32 for Adam; cast once per step)
    gather_dtype: str = 'float32'


def units(cfg: SDFConfig, aabb) -> jnp.ndarray:
    """Voxel size per axis (ref: fields.py:60)."""
    gs = jnp.asarray(cfg.grid_size, jnp.float32)
    return (aabb[1] - aabb[0]) / (gs - 1.0)


def init_tenso_sdf(rng, cfg: SDFConfig) -> Dict[str, Any]:
    """Circle init + geometric MLP init (ref: fields.py:64-91, 101-131)."""
    k_field, k0, k1 = jax.random.split(rng, 3)
    field = tfield.init_vm_circle(cfg.grid_size, cfg.n_comp, cfg.init_radius)

    feat_ch = cfg.n_comp * 3
    xyz_ch = pe_dim(3, cfg.sdf_multires) if cfg.sdf_multires > 0 else 3
    d_in = feat_ch + xyz_ch
    out_ch = 1 + cfg.app_dim

    l0 = mlp.init_linear(k0, d_in, cfg.sdf_dim)
    l0 = mlp.linear_set_bias(l0, 0.0)
    if cfg.sdf_multires > 0:
        # zero everything, then N(0, sqrt(2)/sqrt(dim)) on the raw-xyz
        # passthrough columns of the PE block (ref: fields.py:84-86)
        w = jnp.zeros_like(l0['w'])
        sub = jax.random.normal(k0, (3, cfg.sdf_dim)) * (
            np.sqrt(2.0) / np.sqrt(cfg.sdf_dim))
        w = w.at[feat_ch:feat_ch + 3, :].set(sub)
        l0 = {'w': w, 'b': l0['b']}
    else:
        w = jax.random.normal(k0, l0['w'].shape) * (
            np.sqrt(2.0) / np.sqrt(cfg.sdf_dim))
        l0 = {'w': w, 'b': l0['b']}

    l1 = mlp.init_linear(k1, cfg.sdf_dim, out_ch)
    w1 = (jax.random.normal(k1, (cfg.sdf_dim, out_ch)) * 1e-4
          + np.sqrt(np.pi) / np.sqrt(cfg.sdf_dim))
    l1 = {'w': w1, 'b': jnp.full((out_ch,), -cfg.init_radius)}

    return {'field': field, 'mlp': [l0, l1]}


def apply_tenso_sdf(params, cfg: SDFConfig, xyz, aabb, level=None):
    """Field forward: [N,3] world coords -> [N, 1+app_dim]
    (ref: fields.py:262-299)."""
    xyz01 = contraction(xyz, aabb)
    gd = jnp.bfloat16 if cfg.gather_dtype == 'bfloat16' else None
    feats = tfield.vm_features(params['field'], xyz01, level, cfg.n_levels,
                               gather_dtype=gd)
    if cfg.sdf_multires > 0:
        # multires==3 embeds the *contracted* coords (ref: fields.py:294-295)
        pe_in = xyz01 if cfg.sdf_multires == 3 else xyz
        xyz_in = positional_encoding(pe_in, cfg.sdf_multires)
    else:
        xyz_in = xyz
    # split matmul instead of concat+matmul: avoids materializing the
    # [N, 129] concat (a large relayout copy on TPU) and keeps each
    # contraction K-dim MXU-friendly (108/21 instead of 129)
    w0 = params['mlp'][0]['w']
    nf = feats.shape[-1]
    h = (feats @ w0[:nf] + xyz_in @ w0[nf:]) + params['mlp'][0]['b']
    h = mlp.softplus100(h)
    return mlp.apply_linear(params['mlp'][1], h)


def sdf_only(params, cfg: SDFConfig, xyz, aabb, level=None):
    return apply_tenso_sdf(params, cfg, xyz, aabb, level)[..., :1]


def sdf_with_grad_hessian(params, cfg: SDFConfig, xyz, aabb, level=None,
                          with_hessian: bool = True):
    """SDF + app features + FD gradient (+ normal-projected hessian).

    One batched 7-point stencil (ref: fields.py:227-260). Returns
    (sdf [N], app_feat [N,app], grad [N,3], normal_hessian [N] or None).
    """
    n = xyz.shape[0]
    eps = units(cfg, aabb)                      # [3]
    offsets = jnp.stack([
        jnp.zeros((3,)),
        jnp.array([1.0, 0, 0]) * eps[0], -jnp.array([1.0, 0, 0]) * eps[0],
        jnp.array([0, 1.0, 0]) * eps[1], -jnp.array([0, 1.0, 0]) * eps[1],
        jnp.array([0, 0, 1.0]) * eps[2], -jnp.array([0, 0, 1.0]) * eps[2],
    ])                                          # [7,3]
    pts = (xyz[:, None, :] + offsets[None]).reshape(n * 7, 3)
    if level is not None:
        lv = jnp.broadcast_to(jnp.reshape(level, (n, 1)), (n, 7)).reshape(-1)
    else:
        lv = None

    out = apply_tenso_sdf(params, cfg, pts, aabb, lv)
    out = out.reshape(n, 7, -1)
    sdf = out[:, 0, 0]
    app = out[:, 0, 1:]
    s = out[:, 1:, 0].reshape(n, 3, 2)          # [N, axis, (+,-)]
    grad = (s[:, :, 0] - s[:, :, 1]) / (2.0 * eps[None, :])
    if with_hessian:
        hess = (s[:, :, 0] + s[:, :, 1] - 2.0 * sdf[:, None]) / (
            eps[None, :] ** 2)
        normal_hessian = jnp.sum(grad * hess, -1) / (
            jnp.sum(grad ** 2, -1) + 1e-5)
    else:
        normal_hessian = None
    return sdf, app, grad, normal_hessian


def gradient_only(params, cfg: SDFConfig, xyz, aabb, level=None):
    """FD gradient without hessian (eval path, ref: fields.py:227-248)."""
    n = xyz.shape[0]
    eps = units(cfg, aabb)
    offsets = jnp.stack([
        jnp.array([1.0, 0, 0]) * eps[0], -jnp.array([1.0, 0, 0]) * eps[0],
        jnp.array([0, 1.0, 0]) * eps[1], -jnp.array([0, 1.0, 0]) * eps[1],
        jnp.array([0, 0, 1.0]) * eps[2], -jnp.array([0, 0, 1.0]) * eps[2],
    ])
    pts = (xyz[:, None, :] + offsets[None]).reshape(n * 6, 3)
    lv = None
    if level is not None:
        lv = jnp.broadcast_to(jnp.reshape(level, (n, 1)), (n, 6)).reshape(-1)
    s = sdf_only(params, cfg, pts, aabb, lv).reshape(n, 3, 2)
    return (s[:, :, 0] - s[:, :, 1]) / (2.0 * eps[None, :])


def upsample_tenso_sdf(params, cfg: SDFConfig, res_target) -> Tuple[dict, SDFConfig]:
    """Coarse-to-fine upsample; bumps n_levels (ref: fields.py:168-178)."""
    new_levels = cfg.n_levels + 1
    res = (np.array(res_target) // 2 ** (new_levels - 1)) * 2 ** (new_levels - 1)
    new_field = tfield.upsample_vm(params['field'], res)
    new_cfg = cfg._replace(grid_size=tuple(int(r) for r in res),
                           n_levels=new_levels)
    return {'field': new_field, 'mlp': params['mlp']}, new_cfg
