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
    # 'auto' | 'xla' | 'pallas': stencil MLP-head implementation.
    # auto = fused Pallas kernel on TPU, XLA elsewhere; 'pallas' on a
    # non-TPU backend runs the kernel in interpret mode (tests).
    stencil_impl: str = 'auto'
    stencil_tile: int = 256      # Pallas head rows per grid step


def units(cfg: SDFConfig, aabb) -> jnp.ndarray:
    """FD stencil step per axis.

    The reference uses aabbSize/(gridSize-1) (ref: fields.py:60); we use
    aabbSize/gridSize — the same voxel-scale step to <1%, but exactly
    2^-level plane texels at every mip, which keeps the stencil's
    shifted bilinear taps inside the 4-slot patch window of the fused
    kernel (ops/pallas_stencil.py) for all levels."""
    gs = jnp.asarray(cfg.grid_size, jnp.float32)
    return (aabb[1] - aabb[0]) / gs


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


def pack_field(params, cfg: SDFConfig) -> tfield.PackedVMField:
    """Pack the VM field into the gather atlas; build ONCE per step and
    thread through every field call (pyramids + dtype cast hoisted)."""
    gd = jnp.bfloat16 if cfg.gather_dtype == 'bfloat16' else None
    return tfield.pack_vm_field(params['field'], cfg.n_levels, gd)


def _dot_f32(a, b):
    """MXU dot with f32 accumulation regardless of input dtype."""
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _compute_dtype(cfg: SDFConfig):
    return jnp.bfloat16 if cfg.gather_dtype == 'bfloat16' else jnp.float32


def _mlp_head(params, cfg: SDFConfig, feats_list, xyz_in):
    """Fused SDF-MLP forward: per-plane feats [[M, C]]*3 + embedded coords
    [M, E] -> [M, hidden].  Split-K contractions instead of a concat (a
    [M,129] lane-dim concat is a relayout copy on TPU), bf16 inputs / f32
    accumulation when gather_dtype is bf16."""
    cd = _compute_dtype(cfg)
    w0 = params['mlp'][0]['w']
    # ONE K=129 matmul: split-K partial dots each round-trip the f32
    # [M, hidden] accumulator through HBM (measured ~9ms per partial at
    # 917k rows) — the bf16 lane-concat of the inputs is far cheaper.
    x = jnp.concatenate([f.astype(cd) for f in feats_list]
                        + [xyz_in.astype(cd)], axis=-1)
    h = _dot_f32(x, w0.astype(cd)) + params['mlp'][0]['b']
    return mlp.softplus100(h)


def apply_tenso_sdf(params, cfg: SDFConfig, xyz, aabb, level=None,
                    packed=None):
    """Field forward: [N,3] world coords -> [N, 1+app_dim]
    (ref: fields.py:262-299)."""
    if packed is None:
        packed = pack_field(params, cfg)
    xyz01 = contraction(xyz, aabb)
    feats = tfield.vm_features_split(packed, xyz01, level)
    if cfg.sdf_multires > 0:
        # multires==3 embeds the *contracted* coords (ref: fields.py:294-295)
        pe_in = xyz01 if cfg.sdf_multires == 3 else xyz
        xyz_in = positional_encoding(pe_in, cfg.sdf_multires)
    else:
        xyz_in = xyz
    cd = _compute_dtype(cfg)
    h = _mlp_head(params, cfg, feats, xyz_in)
    w1 = params['mlp'][1]['w']
    return _dot_f32(h.astype(cd), w1.astype(cd)) + params['mlp'][1]['b']


def sdf_only(params, cfg: SDFConfig, xyz, aabb, level=None, packed=None):
    if packed is None:
        packed = pack_field(params, cfg)
    xyz01 = contraction(xyz, aabb)
    feats = tfield.vm_features_split(packed, xyz01, level)
    if cfg.sdf_multires > 0:
        pe_in = xyz01 if cfg.sdf_multires == 3 else xyz
        xyz_in = positional_encoding(pe_in, cfg.sdf_multires)
    else:
        xyz_in = xyz
    cd = _compute_dtype(cfg)
    h = _mlp_head(params, cfg, feats, xyz_in)
    # only the sdf column of the output head (halves layer-1 work)
    w1 = params['mlp'][1]['w'][:, :1]
    return _dot_f32(h.astype(cd), w1.astype(cd)) + params['mlp'][1]['b'][:1]


def _stencil_delta01(cfg: SDFConfig):
    """Per-axis stencil offset in contracted units: eps/(aabb_hi-aabb_lo)
    = 1/grid_size — static (aabb cancels; see units() for why /g)."""
    return [1.0 / g for g in cfg.grid_size]


def _pe_rot_table(offs, n_freqs: int):
    """Linear-combination table expressing PE(x + off) from PE(x).

    offs [S, 3] per-stencil-point coordinate offsets.  For the layout
    [x(3), sin(2^i x)(3), cos(2^i x)(3), ...] (ops/math.positional_encoding)
    the trig addition formulas give, per stencil point s:
        pe_s = pe*A0 + roll(pe,-3)*A1 + roll(pe,+3)*A2 + A3
    (roll along lanes; wrapped lanes carry zero coefficients).  Returns
    [S, 4, E] f32.  This keeps the kernel input at ONE center PE instead
    of S of them — the [7,N,E] PE pipeline cost ~18ms/step in layout
    copies and transposes (round-2 trace)."""
    s_pts = offs.shape[0]
    f = 2.0 ** jnp.arange(n_freqs, dtype=jnp.float32)       # [F]
    ang = offs[:, None, :] * f[None, :, None]               # [S, F, 3]
    c, s = jnp.cos(ang), jnp.sin(ang)
    ones3 = jnp.ones((s_pts, 3), jnp.float32)
    zeros3 = jnp.zeros((s_pts, 3), jnp.float32)
    a0, a1, a2, a3 = [ones3], [zeros3], [zeros3], [offs]
    for i in range(n_freqs):
        a0 += [c[:, i], c[:, i]]
        a1 += [s[:, i], zeros3]
        a2 += [zeros3, -s[:, i]]
        a3 += [zeros3, zeros3]
    return jnp.stack([jnp.concatenate(x, -1)
                      for x in (a0, a1, a2, a3)], axis=1)   # [S, 4, E]


def sdf_with_grad_hessian(params, cfg: SDFConfig, xyz, aabb, level=None,
                          with_hessian: bool = True, packed=None):
    """SDF + app features + FD gradient (+ normal-projected hessian).

    One batched 7-point stencil (ref: fields.py:227-260) with deduplicated
    texture lookups (ops/tensor_field.vm_stencil_features) and the
    offset-point MLP head reduced to the sdf column.  Returns
    (sdf [N], app_feat [N,app], grad [N,3], normal_hessian [N] or None).
    """
    if packed is None:
        packed = pack_field(params, cfg)
    n = xyz.shape[0]
    eps = units(cfg, aabb)                      # [3] world units (traced)
    d01 = _stencil_delta01(cfg)
    xyz01 = contraction(xyz, aabb)

    offs01 = np.zeros((7, 3), np.float32)
    for a in range(3):
        offs01[1 + 2 * a, a] = d01[a]
        offs01[2 + 2 * a, a] = -d01[a]

    cd = _compute_dtype(cfg)
    w1 = params['mlp'][1]['w']
    b1 = params['mlp'][1]['b']

    impl = cfg.stencil_impl
    if impl == 'auto':
        impl = 'pallas' if jax.default_backend() == 'tpu' else 'xla'
    if impl == 'pallas':
        from ..ops import pallas_stencil
        # patch atlas: one gathered row per texture per mip branch; the
        # kernel does the shifted bilinear taps + products + MLP head.
        # Built from params per call — XLA CSEs repeated builds within a
        # step program.
        gd = jnp.bfloat16 if cfg.gather_dtype == 'bfloat16' else None
        atlas = tfield.pack_vm_patches(params['field'], cfg.n_levels, gd)
        pp, lp, fr, sigmas = tfield.vm_patch_gather(atlas, xyz01, d01,
                                                    level)
        # center-point PE only; the kernel derives the 6 offset PEs from
        # the rotation table (trig addition — see _pe_rot_table)
        if cfg.sdf_multires > 0:
            if cfg.sdf_multires == 3:
                pe_c = positional_encoding(xyz01, cfg.sdf_multires)
                offs = jnp.asarray(offs01)
            else:
                pe_c = positional_encoding(xyz, cfg.sdf_multires)
                offs = jnp.asarray(offs01) * (aabb[1] - aabb[0])[None, :]
            rot = _pe_rot_table(offs, cfg.sdf_multires)
        else:
            pe_c = xyz
            offs = jnp.asarray(offs01) * (aabb[1] - aabb[0])[None, :]
            rot = _pe_rot_table(offs, 0)
        C = cfg.n_comp
        w0 = params['mlp'][0]['w']
        w0_parts = (w0[:C], w0[C:2 * C], w0[2 * C:3 * C], w0[3 * C:])
        interpret = jax.default_backend() != 'tpu'
        out_c, s_off6 = pallas_stencil.stencil_head(
            [p for row in pp for p in row], [l for row in lp for l in row],
            fr, sigmas, pe_c, rot, w0_parts, params['mlp'][0]['b'], w1, b1,
            tile=cfg.stencil_tile, interpret=interpret)
        sdf = out_c[:, 0]
        app = out_c[:, 1:]
        s = s_off6.reshape(3, 2, n)             # [axis, (+,-), N]
    else:
        # embedded coords of the 7 stencil points, stencil-major [7, N, E]
        if cfg.sdf_multires > 0:
            if cfg.sdf_multires == 3:
                pe_in = xyz01[None] + jnp.asarray(offs01)[:, None, :]
            else:
                offs_w = jnp.asarray(offs01) * (aabb[1] - aabb[0])[None, :]
                pe_in = xyz[None] + offs_w[:, None, :]
            xyz_in = positional_encoding(pe_in, cfg.sdf_multires)
        else:
            offs_w = jnp.asarray(offs01) * (aabb[1] - aabb[0])[None, :]
            xyz_in = xyz[None] + offs_w[:, None, :]
        # list of 3 arrays [7, N, C] (dedup'ed lookups, split per plane)
        feats = tfield.vm_stencil_features_split(packed, xyz01, d01, level)
        h = _mlp_head(params, cfg,
                      [f.reshape(7 * n, f.shape[-1]) for f in feats],
                      xyz_in.reshape(7 * n, -1))
        h = h.reshape(7, n, -1)
        # center point: full head (sdf + appearance features)
        out_c = _dot_f32(h[0].astype(cd), w1.astype(cd)) + b1
        sdf = out_c[:, 0]
        app = out_c[:, 1:]
        # offset points: only the sdf column (45% fewer layer-1 FLOPs)
        s_off = _dot_f32(h[1:].reshape(6 * n, -1).astype(cd),
                         w1[:, :1].astype(cd))[:, 0] + b1[0]
        s = s_off.reshape(3, 2, n)              # [axis, (+,-), N]
    grad = ((s[:, 0] - s[:, 1]) / (2.0 * eps[:, None])).T
    if with_hessian:
        hess = ((s[:, 0] + s[:, 1] - 2.0 * sdf[None, :]) / (
            eps[:, None] ** 2)).T
        normal_hessian = jnp.sum(grad * hess, -1) / (
            jnp.sum(grad ** 2, -1) + 1e-5)
    else:
        normal_hessian = None
    return sdf, app, grad, normal_hessian


def gradient_only(params, cfg: SDFConfig, xyz, aabb, level=None,
                  packed=None):
    """FD gradient without hessian (eval path, ref: fields.py:227-248)."""
    _, _, grad, _ = sdf_with_grad_hessian(params, cfg, xyz, aabb, level,
                                          with_hessian=False, packed=packed)
    return grad


def upsample_tenso_sdf(params, cfg: SDFConfig, res_target) -> Tuple[dict, SDFConfig]:
    """Coarse-to-fine upsample; bumps n_levels (ref: fields.py:168-178)."""
    new_levels = cfg.n_levels + 1
    res = (np.array(res_target) // 2 ** (new_levels - 1)) * 2 ** (new_levels - 1)
    new_field = tfield.upsample_vm(params['field'], res)
    new_cfg = cfg._replace(grid_size=tuple(int(r) for r in res),
                           n_levels=new_levels)
    return {'field': new_field, 'mlp': params['mlp']}, new_cfg
