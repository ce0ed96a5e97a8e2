"""Functional MLP building blocks (pytree params, pure apply fns).

Equivalents of the reference's predictor factories and small nets:
  * weight-normalized k-layer predictors  (ref: network/other_field.py:20-121)
  * activation zoo incl. clamped exp      (ref: other_field.py:9-18)
  * MaterialFeatsNetwork skip MLP         (ref: network/fields.py:578-607)
  * SingleVarianceNetwork                 (ref: other_field.py:193-210)
  * NeRF++ background net                 (ref: other_field.py:213-305)

Weight norm follows torch's dim=0 convention: each output row w_o is
g_o * v_o / ||v_o||; at init g_o = ||v_o|| so W == V.
"""
from __future__ import annotations

import math
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# linear layers
# ---------------------------------------------------------------------------

def init_linear(rng, d_in: int, d_out: int, weight_norm: bool = False) -> Params:
    """torch.nn.Linear default init (kaiming-uniform, bound 1/sqrt(d_in))."""
    kw, kb = jax.random.split(rng)
    bound = 1.0 / math.sqrt(d_in)
    w = jax.random.uniform(kw, (d_in, d_out), minval=-bound, maxval=bound)
    b = jax.random.uniform(kb, (d_out,), minval=-bound, maxval=bound)
    if weight_norm:
        g = jnp.linalg.norm(w, axis=0)
        return {'v': w, 'g': g, 'b': b}
    return {'w': w, 'b': b}


def apply_linear(p: Params, x):
    if 'v' in p:
        v = p['v']
        w = v * (p['g'] / jnp.maximum(jnp.linalg.norm(v, axis=0), 1e-12))
        return x @ w + p['b']
    return x @ p['w'] + p['b']


def linear_set_bias(p: Params, value) -> Params:
    q = dict(p)
    q['b'] = jnp.full_like(p['b'], value)
    return q


# ---------------------------------------------------------------------------
# activations
# ---------------------------------------------------------------------------

def make_activation(name: str, exp_max: float = 0.0):
    if name == 'sigmoid':
        return jax.nn.sigmoid
    if name == 'exp':
        return lambda x: jnp.exp(jnp.minimum(x, exp_max))
    if name == 'none':
        return lambda x: x
    if name == 'relu':
        return jax.nn.relu
    if name == 'softplus':
        return jax.nn.softplus
    if name == 'tanh':
        return jnp.tanh
    raise NotImplementedError(name)


def softplus100(x):
    """Softplus(beta=100) as used by the SDF/flow feature MLPs
    (ref: fields.py:79, flow.py:695). Numerically: softplus(100x)/100."""
    return jax.nn.softplus(100.0 * x) / 100.0


# ---------------------------------------------------------------------------
# predictors (ref: other_field.py make_predictor_{2,3,4}layer)
# ---------------------------------------------------------------------------

def init_predictor(rng, d_in: int, d_out: int, n_layers: int = 3,
                   run_dim: Optional[int] = None, weight_norm: bool = True,
                   final_bias: Optional[float] = None) -> Params:
    """k hidden ReLU layers + linear head. run_dim defaults match the
    reference factories (128 for 2/3-layer, 256 for 4-layer)."""
    if run_dim is None:
        run_dim = 256 if n_layers >= 4 else 128
    dims = [d_in] + [run_dim] * (n_layers - 1) + [d_out]
    layers = []
    for i in range(len(dims) - 1):
        rng, k = jax.random.split(rng)
        layers.append(init_linear(k, dims[i], dims[i + 1], weight_norm))
    if final_bias is not None:
        layers[-1] = linear_set_bias(layers[-1], final_bias)
    return {'layers': layers}


def apply_predictor(p: Params, x, activation: str = 'sigmoid',
                    exp_max: float = 0.0, dot_dtype=None):
    """dot_dtype='bf16'-style jnp dtype runs the hidden dots in bf16
    (MXU-rate) with f32 accumulation via preferred_element_type; the
    activation and output stay f32.  Weight-norm row norms stay f32."""
    act = make_activation(activation, exp_max)
    h = x
    n = len(p['layers'])
    for i, layer in enumerate(p['layers']):
        if dot_dtype is not None:
            h = apply_linear_mixed(layer, h, dot_dtype)
        else:
            h = apply_linear(layer, h)
        if i < n - 1:
            h = jax.nn.relu(h)
    return act(h)


def apply_linear_mixed(p: Params, x, dot_dtype):
    """apply_linear with the matmul in ``dot_dtype`` (f32 accumulation)."""
    if 'v' in p:
        v = p['v']
        w = v * (p['g'] / jnp.maximum(jnp.linalg.norm(v, axis=0), 1e-12))
    else:
        w = p['w']
    y = jax.lax.dot(x.astype(dot_dtype), w.astype(dot_dtype),
                    preferred_element_type=jnp.float32)
    return y + p['b']


# ---------------------------------------------------------------------------
# MaterialFeatsNetwork (ref: fields.py:578-607)
# ---------------------------------------------------------------------------

def init_material_feats(rng, d_in: int, run_dim: int = 256) -> Params:
    m0_dims = [d_in, run_dim, run_dim, run_dim, run_dim]
    m1_dims = [d_in + run_dim, run_dim, run_dim, run_dim, run_dim]
    m0, m1 = [], []
    for i in range(4):
        rng, k = jax.random.split(rng)
        m0.append(init_linear(k, m0_dims[i], m0_dims[i + 1], True))
    for i in range(4):
        rng, k = jax.random.split(rng)
        m1.append(init_linear(k, m1_dims[i], m1_dims[i + 1], True))
    return {'m0': m0, 'm1': m1}


def apply_material_feats(p: Params, x_embedded):
    h = x_embedded
    for layer in p['m0']:
        h = jax.nn.relu(apply_linear(layer, h))
    h = jnp.concatenate([h, x_embedded], axis=-1)
    for i, layer in enumerate(p['m1']):
        h = apply_linear(layer, h)
        if i < len(p['m1']) - 1:
            h = jax.nn.relu(h)
    return h


# ---------------------------------------------------------------------------
# SingleVarianceNetwork (ref: other_field.py:193-210)
# ---------------------------------------------------------------------------

def init_variance(init_val: float) -> Params:
    return {'variance': jnp.asarray(float(init_val))}


def apply_variance(p: Params, activation: str = 'exp'):
    """Returns the scalar inv_s."""
    v = p['variance']
    if activation == 'exp':
        return jnp.exp(v * 10.0)
    if activation == 'linear':
        return v * 10.0
    if activation == 'square':
        return (v * 10.0) ** 2
    raise NotImplementedError(activation)


# ---------------------------------------------------------------------------
# NeRF++ background network (ref: other_field.py:213-305)
# ---------------------------------------------------------------------------

def init_nerf_bg(rng, d_in: int = 4, d_in_view: int = 3, width: int = 256,
                 depth: int = 8, multires: int = 10, multires_view: int = 4,
                 skips: Sequence[int] = (4,)) -> Params:
    from ..ops.math import pe_dim
    input_ch = pe_dim(d_in, multires)
    input_ch_view = pe_dim(d_in_view, multires_view)
    # layer 0: input_ch -> W; layer i>0: W -> W, except the layer right
    # after a skip concat which takes W + input_ch (ref: other_field.py:247-249
    # concat happens after applying layer i in `skips`).
    pts_layers = []
    for i in range(depth):
        rng, k = jax.random.split(rng)
        if i == 0:
            d = input_ch
        elif (i - 1) in skips:
            d = width + input_ch
        else:
            d = width
        pts_layers.append(init_linear(k, d, width))
    rng, k1, k2, k3, k4 = jax.random.split(rng, 5)
    return {
        'pts': pts_layers,
        'views0': init_linear(k1, input_ch_view + width, width // 2),
        'feature': init_linear(k2, width, width),
        'alpha': init_linear(k3, width, 1),
        'rgb': linear_set_bias(init_linear(k4, width // 2, 3),
                               float(np.log(0.5))),
    }


def apply_nerf_bg(p: Params, pts4, view_dirs, multires: int = 10,
                  multires_view: int = 4, skips=(4,)):
    """pts4: [N,4] (x/r, y/r, z/r, 1/r); returns (alpha [N,1], rgb [N,3])."""
    from ..ops.math import positional_encoding
    x = positional_encoding(pts4, multires)
    v = positional_encoding(view_dirs, multires_view)
    h = x
    for i, layer in enumerate(p['pts']):
        h = jax.nn.relu(apply_linear(layer, h))
        if i in skips:
            h = jnp.concatenate([x, h], axis=-1)
    alpha = apply_linear(p['alpha'], h)
    feat = apply_linear(p['feature'], h)
    h = jnp.concatenate([feat, v], axis=-1)
    h = jax.nn.relu(apply_linear(p['views0'], h))
    rgb = apply_linear(p['rgb'], h)
    return alpha, rgb


def apply_nerf_bg_density(p: Params, pts4, multires: int = 10, skips=(4,)):
    from ..ops.math import positional_encoding
    x = positional_encoding(pts4, multires)
    h = x
    for i, layer in enumerate(p['pts']):
        h = jax.nn.relu(apply_linear(layer, h))
        if i in skips:
            h = jnp.concatenate([x, h], axis=-1)
    return apply_linear(p['alpha'], h)
