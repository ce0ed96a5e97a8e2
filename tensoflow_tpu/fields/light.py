"""Trainable environment light: log-space cubemap + pre-filtered mips.

Functional equivalent of the reference EnvLight (ref: network/light.py):
a [6, R, R, 3] log-radiance cubemap parameter; per-step pre-filtering into a
specular mip chain + cosine-convolved diffuse map; roughness -> fractional
mip lookup; plain base lookup for the MC shader's direct light.
"""
from __future__ import annotations

from typing import Any, Dict, List, NamedTuple

import jax.numpy as jnp
import numpy as np

from ..ops import cubemap as cm


class EnvLightConfig(NamedTuple):
    max_res: int = 128
    min_res: int = 16
    min_roughness: float = 0.08
    max_roughness: float = 0.5
    exact_ggx_max_res: int = 32   # exact GGX conv at/below this res


def init_env_light(cfg: EnvLightConfig) -> Dict[str, Any]:
    """(ref: light.py:22-26) log(0.5)-filled trainable cubemap."""
    base = jnp.full((6, cfg.max_res, cfg.max_res, 3), float(np.log(0.5)))
    return {'base': base}


def build_mips(params, cfg: EnvLightConfig):
    """Per-step pre-filtering (ref: light.py:52-64).

    Returns {'specular': [levels of [6,r,r,3]], 'diffuse': [6,min,min,3]}.
    Differentiable w.r.t. the base parameter. High-res levels keep the
    box-filtered chain (narrow GGX kernel approx); levels at or below
    ``exact_ggx_max_res`` get the exact dense GGX convolution.
    """
    chain = cm.build_cubemap_pyramid(params['base'], cfg.min_res)
    diffuse = cm.diffuse_cubemap(chain[-1])
    n = len(chain)
    specular: List[jnp.ndarray] = []
    for idx in range(n):
        if idx < n - 1:
            rough = (idx / max(n - 2, 1)) * (
                cfg.max_roughness - cfg.min_roughness) + cfg.min_roughness
        else:
            rough = 1.0
        lvl = chain[idx]
        if lvl.shape[1] <= cfg.exact_ggx_max_res:
            lvl = cm.specular_cubemap(lvl, rough)
        specular.append(lvl)
    # patch-packed gather tables: shade() does 2 wide gathers (specular
    # trilinear) / 1 (diffuse) instead of 8 / 4 narrow ones
    spec_packed, _, _ = cm.pack_cubemap_pyramid_patches(specular)
    return {'specular': specular, 'diffuse': diffuse,
            'spec_packed': spec_packed,
            'diff_packed': cm.pack_cubemap_patches(diffuse)}


def get_mip(roughness, n_levels: int, cfg: EnvLightConfig):
    """roughness -> fractional mip level (ref: light.py:72-80)."""
    lo, hi = cfg.min_roughness, cfg.max_roughness
    below = (jnp.clip(roughness, lo, hi) - lo) / (hi - lo) * (n_levels - 2)
    above = (jnp.clip(roughness, hi, 1.0) - hi) / (1.0 - hi) + n_levels - 2
    return jnp.where(roughness < hi, below, above)


def shade(mips, dirs, roughness=None, cfg: EnvLightConfig = EnvLightConfig()):
    """Pre-filtered lookup (ref: light.py:95-122). dirs [N,3];
    roughness [N,1] or None (diffuse). Returns linear radiance [N,3]."""
    if roughness is None:
        if 'diff_packed' in mips:
            light = cm.sample_cubemap_packed(
                mips['diff_packed'], mips['diffuse'].shape[1], dirs)
        else:
            light = cm.sample_cubemap(mips['diffuse'], dirs)
    else:
        level = get_mip(roughness[:, 0], len(mips['specular']), cfg)
        if 'spec_packed' in mips:
            offs, ress, off = [], [], 0
            for tex in mips['specular']:
                f, r = tex.shape[0], tex.shape[1]
                offs.append(off)
                ress.append(r)
                off += f * (r + 1) * (r + 1)
            light = cm.sample_cubemap_mip_packed(
                mips['spec_packed'], tuple(offs), tuple(ress), dirs, level)
        else:
            light = cm.sample_cubemap_mip(mips['specular'], dirs, level)
    return jnp.exp(light)


def direct_light(params, dirs):
    """Unfiltered base lookup for the MC shader (ref: light.py:125-162).

    Packs the base cubemap into patch rows per call — the pack is a few MB
    of slicing amortized over the MC shader's millions of lookups."""
    pbuf = cm.pack_cubemap_patches(params['base'])
    return jnp.exp(cm.sample_cubemap_packed(pbuf, params['base'].shape[1],
                                            dirs))
