"""TensoFlow: conditional normalizing flow for neural importance sampling.

Functional re-design of the reference flow module (ref: network/flow.py):
a 2-D flow on the unit square (normalized half-vector angles), built from
two alternating-mask coupling blocks whose element-wise transform is a
piecewise-quadratic spline; conditioning = tensorial VM feature of the
surface point ‖ embedded reflection angles ‖ (zeroed) roughness embedding.

TPU-first choices:
  * bin search by vectorized ``searchsorted`` instead of the reference's
    masked-argmax trick (ref: flow.py:355-366, 443-453) — identical result,
    one fused program, no NaN-trap control flow
  * the quadratic-solve "flow" direction and the polynomial "flow_inv"
    direction are closed-form and fully batched
  * frozen sampling copies (ref: fields.py:1050-1065) are just second param
    pytrees handled by the caller — no module state
"""
from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import tensor_field as tfield
from ..ops.math import contraction, positional_encoding, pe_dim
from ..ops.samplers import sphere_prior_angles_01
from . import mlp

EPS_BIN = 1e-6


class FlowConfig(NamedTuple):
    d: int = 2
    grid_size: Tuple[int, int, int] = (512, 512, 512)
    nis_n_comp: int = 12
    nis_dim: int = 64
    nis_feature_dim: int = 16
    nis_multires: int = 3
    refl_multires: int = 3
    roughness_multires: int = 3
    angle_multires: int = 3
    flow_type: str = 'pwquad'         # 'pwquad' | 'pwlinear' | 'realnvp'
    n_bins: int = 10
    n_levels: int = 3
    d_hidden: int = 64
    n_hidden: int = 3
    disable_tensorial: bool = False
    disable_reflected: bool = False

    @property
    def refl_ch(self) -> int:
        return pe_dim(2, self.refl_multires) if self.refl_multires > 0 else 2

    @property
    def rough_ch(self) -> int:
        return (pe_dim(1, self.roughness_multires)
                if self.roughness_multires > 0 else 1)

    @property
    def feature_dim(self) -> int:
        return self.nis_feature_dim + self.refl_ch + self.rough_ch

    @property
    def param_len(self) -> int:
        """Per-dim spline parameter count (ref: flow.py:644-648 bin_fn)."""
        if self.flow_type == 'pwquad':
            return 2 * self.n_bins + 1
        if self.flow_type == 'pwlinear':
            return self.n_bins
        if self.flow_type == 'realnvp':
            return 2
        raise NotImplementedError(self.flow_type)


# ---------------------------------------------------------------------------
# priors
# ---------------------------------------------------------------------------

def sphere_prior_sample(rng, pn: int, sn: int, train: bool):
    """Fibonacci cos-weighted lattice prior (ref: flow.py:52-90).

    Returns (x [pn,sn,2] in (0,1)^2, logj [pn,sn,1] = -log_prob)."""
    lattice = jnp.asarray(sphere_prior_angles_01(sn))        # [sn,2]
    x = jnp.broadcast_to(lattice[None], (pn, sn, 2))
    if train and rng is not None:
        roll = jax.random.uniform(rng, (pn, sn, 1))
        x = jnp.concatenate([(x[..., :1] + roll) % 1.0, x[..., 1:]], -1)
    x = jnp.clip(x, 1e-6, 1 - 1e-6)
    return x, -sphere_prior_log_prob(x)


def sphere_prior_log_prob(x):
    """pdf(theta01) = cos(theta01 * pi/2) (ref: flow.py:78-80)."""
    return jnp.log(jnp.cos(x[..., 1:] * (0.5 * np.pi)))


def ggx_prior_sample(rng, pn: int, sn: int, a: float = 0.04):
    """(ref: flow.py:92-120); a = 0.2^2."""
    u = jax.random.uniform(rng, (pn, sn, 2))
    e_phi, e_theta = u[..., :1], u[..., 1:]
    a2 = a * a
    cos_t = jnp.sqrt(jnp.maximum(
        (1 - e_theta) / jnp.maximum(1 + (a2 - 1) * e_theta, 1e-6), 1e-6))
    x = jnp.clip(jnp.concatenate([e_phi, cos_t ** 2], -1), 1e-6, 1 - 1e-6)
    return x, -ggx_prior_log_prob(x, a)


def ggx_prior_log_prob(x, a: float = 0.04):
    a2 = a * a
    cos2 = x[..., 1:]
    pdf = a2 / (cos2 * (a2 - 1) + 1) ** 2
    return jnp.log(jnp.maximum(pdf, 1e-6))


def uniform_prior_sample(rng, pn: int, sn: int, d: int = 2):
    x = jax.random.uniform(rng, (pn, sn, d))
    return x, jnp.zeros(x.shape[:-1] + (1,))


# ---------------------------------------------------------------------------
# element-wise transforms
# ---------------------------------------------------------------------------

def _modified_softmax(v_tilde, w):
    """Vertex values normalized so the spline integrates to 1
    (ref: flow.py:166-168)."""
    v = jnp.exp(v_tilde)
    norm = jnp.sum((v[..., :-1] + v[..., 1:]) / 2 * w, -1, keepdims=True)
    return v / norm


def _pwquad_prepare(wv_tilde):
    """Split + normalize spline params. wv_tilde [N,k,2b+1] ->
    (w [N,k,b], wsum_shift [N,k,b+1], v [N,k,b+1], vw [N,k,b+1])."""
    nb1 = (wv_tilde.shape[-1] + 1) // 2
    # clip raw spline params: keeps exp() finite in fp32 and bins
    # invertible under adversarial weights (the reference instead relies on
    # pdb NaN traps, flow.py:373-375)
    wv_tilde = jnp.clip(wv_tilde, -10.0, 10.0)
    v_tilde = wv_tilde[..., :nb1]
    w_tilde = wv_tilde[..., nb1:]
    w = jnp.maximum(jnp.exp(w_tilde), 1e-6)
    wsum = jnp.cumsum(w, -1)
    wnorm = wsum[..., -1:]
    w = jnp.maximum(w / wnorm, 1e-6)
    wsum = wsum / wnorm
    wsum_shift = jnp.concatenate([jnp.zeros_like(wsum[..., :1]), wsum], -1)
    v = jnp.maximum(_modified_softmax(v_tilde, w), 1e-6)
    vw = jnp.concatenate(
        [jnp.zeros_like(v[..., :1]),
         jnp.cumsum((v[..., :-1] + v[..., 1:]) / 2 * w, -1)], -1)
    return w, wsum_shift, v, vw


def _searchsorted_batch(sorted_vals, queries, max_bin=None):
    """sorted_vals [..., m] (bin right edges, increasing), queries [...] ->
    bin indices clipped to [0, max_bin] (default m - 1)."""
    m = sorted_vals.shape[-1]
    if max_bin is None:
        max_bin = m - 1
    # branchless count-compare (see ops/math.sample_pdf): one fused
    # broadcast instead of a vmapped binary search
    idx = jnp.sum(sorted_vals <= queries[..., None], axis=-1)
    return jnp.clip(idx, 0, max_bin)


def _take_bin(arr, mx):
    """arr [...,B], mx [...] -> arr[..., mx] elementwise.

    Branchless mask-reduce over the (tiny) bin axis instead of
    ``take_along_axis``: the latter lowers to a per-row gather whose
    narrow rows run at ~10ns each on TPU and whose VJP is a scatter —
    the round-3 stage-2 trace spent ~80ms/step in exactly these
    ([524288,11] gathers).  B madds fuse into the producer for free."""
    b = arr.shape[-1]
    iota = jax.lax.broadcasted_iota(mx.dtype, arr.shape, arr.ndim - 1)
    mask = (iota == mx[..., None]).astype(arr.dtype)
    return jnp.sum(arr * mask, axis=-1)


def pwquad_flow_inv(x, wv_tilde):
    """x -> y: evaluate the quadratic spline (ref: flow.py:332-413).

    x [N,k] in (0,1); wv_tilde [N,k,2b+1]. Returns (y [N,k], logj [N,1])."""
    w, wsum_shift, v, vw = _pwquad_prepare(wv_tilde)
    mx = _searchsorted_batch(wsum_shift[..., 1:], x)
    w_m = _take_bin(w, mx)
    alphas = jnp.clip((x - _take_bin(wsum_shift, mx)) / w_m, 0.0, 1.0)
    v0 = _take_bin(v, mx)
    v1 = _take_bin(v, mx + 1)
    out = (alphas ** 2 / 2 * (v1 - v0) * w_m + alphas * v0 * w_m
           + _take_bin(vw, mx))
    out = jnp.clip(out, EPS_BIN, 1.0 - EPS_BIN)
    deriv = v0 + (v1 - v0) * alphas
    logj = jnp.sum(jnp.log(jnp.maximum(deriv, 1e-12)), -1, keepdims=True)
    return out, logj


def pwquad_flow(y, wv_tilde):
    """y -> x: invert the spline by quadratic solve (ref: flow.py:415-525)."""
    w, wsum_shift, v, vw = _pwquad_prepare(wv_tilde)
    mx = _searchsorted_batch(vw[..., 1:], y)
    w_m = _take_bin(w, mx)
    v0 = _take_bin(v, mx)
    v1 = _take_bin(v, mx + 1)
    a = (v1 - v0) * w_m
    b = v0 * w_m
    c = _take_bin(vw, mx) - y
    eps = jnp.finfo(a.dtype).eps
    a = jnp.where(jnp.abs(a) < eps, eps, a)
    d = jnp.maximum(b * b - 2 * a * c, 0.0)
    sol1 = (-b - jnp.sqrt(d)) / a
    sol2 = (-b + jnp.sqrt(d)) / a
    sol = jnp.where((sol1 >= 0) & (sol1 < 1), sol1, sol2)
    sol = jnp.clip(sol, eps, 1.0 - eps)
    x = jnp.clip(w_m * sol + _take_bin(wsum_shift, mx),
                 eps, 1.0 - eps)
    deriv = v0 + (v1 - v0) * sol
    logj = -jnp.sum(jnp.log(jnp.maximum(deriv, 1e-12)), -1, keepdims=True)
    return x, logj


def pwlinear_flow_inv(x, q_tilde):
    """(ref: flow.py:193-249)"""
    b = q_tilde.shape[-1]
    w = 1.0 / b
    q = jnp.maximum(jax.nn.softmax(q_tilde, -1), 1e-6) / w
    mx = jnp.clip(jnp.floor(b * x).astype(jnp.int32), 0, b - 1)
    slopes = _take_bin(q, mx)
    q_left = jnp.concatenate(
        [jnp.zeros_like(q[..., :1]), jnp.cumsum(q, -1)[..., :-1] * w], -1)
    out = (x - mx * w) * slopes + _take_bin(q_left, mx)
    eps = jnp.finfo(out.dtype).eps
    out = jnp.clip(out, eps, 1 - eps)
    logj = jnp.sum(jnp.log(slopes), -1, keepdims=True)
    return out, logj


def pwlinear_flow(y, q_tilde):
    """(ref: flow.py:251-311)"""
    b = q_tilde.shape[-1]
    w = 1.0 / b
    q = jnp.maximum(jax.nn.softmax(q_tilde, -1), 1e-6) / w
    q_left = jnp.concatenate(
        [jnp.zeros_like(q[..., :1]), jnp.cumsum(q, -1)[..., :-1] * w], -1)
    mx = _searchsorted_batch(q_left[..., 1:], y, max_bin=b - 1)
    x = (y - _take_bin(q_left, mx)) / _take_bin(q, mx) + mx * w
    eps = jnp.finfo(x.dtype).eps
    x = jnp.clip(x, eps, 1 - eps)
    logj = -jnp.sum(jnp.log(_take_bin(q, mx)), -1, keepdims=True)
    return x, logj


def affine_flow(x, st):
    """RealNVP affine transform (ref: flow.py:528-547)."""
    es = jnp.exp(st[..., 0])
    y = es * x + st[..., 1]
    logj = jnp.sum(jnp.log(jnp.maximum(es, 1e-6)), -1, keepdims=True)
    return y, logj


def affine_flow_inv(x, st):
    es = jnp.exp(-st[..., 0])
    y = es * (x - st[..., 1])
    logj = jnp.sum(jnp.log(jnp.maximum(es, 1e-6)), -1, keepdims=True)
    return y, logj


_TRANSFORMS = {
    'pwquad': (pwquad_flow, pwquad_flow_inv),
    'pwlinear': (pwlinear_flow, pwlinear_flow_inv),
    'realnvp': (affine_flow, affine_flow_inv),
}


# ---------------------------------------------------------------------------
# coupling blocks
# ---------------------------------------------------------------------------

def init_block(rng, cfg: FlowConfig, mask_idx: int) -> Dict[str, Any]:
    """One coupling block (ref: flow.py:549-598). mask_idx 0 keeps dim 0,
    mask_idx 1 keeps dim 1."""
    d_pass = 1                                        # d=2, one passthrough
    d_in = (pe_dim(d_pass, cfg.angle_multires)
            if cfg.angle_multires > 0 else d_pass)
    d_out = (cfg.d - d_pass) * cfg.param_len
    dims = [d_in + cfg.feature_dim] + [cfg.d_hidden] * cfg.n_hidden + [d_out]
    layers = []
    for i in range(len(dims) - 1):
        rng, k = jax.random.split(rng)
        layers.append(mlp.init_linear(k, dims[i], dims[i + 1]))
    return {'layers': layers}


def _block_params(block, y_pass, feature, cfg: FlowConfig):
    """Spline params from the conditioning MLP (Reshift input activation +
    3x LeakyReLU hidden, ref: flow.py:576-598)."""
    if cfg.angle_multires > 0:
        y_emb = positional_encoding(y_pass, cfg.angle_multires)
    else:
        y_emb = y_pass
    h = jnp.concatenate([y_emb, feature], -1)
    if cfg.flow_type != 'realnvp':
        # Reshift input activation — pwquad/pwlinear only; the realnvp
        # registry entry has input_activation=None (ref: flow.py:644-648)
        h = h * 2.0 - 1.0
    n = len(block['layers'])
    for i, layer in enumerate(block['layers']):
        h = mlp.apply_linear(layer, h)
        if i < n - 1:
            h = jax.nn.leaky_relu(h, 0.01)
    return h.reshape(h.shape[:-1] + (cfg.d - 1, cfg.param_len))


def block_flow(block, y, logj, feature, cfg: FlowConfig, mask_idx: int,
               inverse: bool):
    """Apply one coupling block in 'flow' (sampling) or 'flow_inv'
    (density) direction (ref: flow.py:600-641)."""
    keep, move = (0, 1) if mask_idx == 0 else (1, 0)
    y_n = y[..., keep:keep + 1]
    y_m = y[..., move:move + 1]
    st = _block_params(block, y_n, feature, cfg)
    fwd, inv = _TRANSFORMS[cfg.flow_type]
    f = inv if inverse else fwd
    y_m_new, dlogj = f(y_m, st)
    out = jnp.zeros_like(y)
    out = out.at[..., keep].set(y_n[..., 0])
    out = out.at[..., move].set(y_m_new[..., 0])
    return out, logj + dlogj


# ---------------------------------------------------------------------------
# the conditional flow
# ---------------------------------------------------------------------------

def init_tenso_flow(rng, cfg: FlowConfig) -> Dict[str, Any]:
    """(ref: flow.py:649-707)"""
    k_field, k_mlp0, k_mlp1, k_b0, k_b1 = jax.random.split(rng, 5)
    field = tfield.init_vm_random(k_field, cfg.grid_size, cfg.nis_n_comp)
    feat_in = cfg.nis_n_comp * 3
    xyz_ch = pe_dim(3, cfg.nis_multires) if cfg.nis_multires > 0 else 3
    nis_mat = [mlp.init_linear(k_mlp0, feat_in + xyz_ch, cfg.nis_dim),
               mlp.init_linear(k_mlp1, cfg.nis_dim, cfg.nis_feature_dim)]
    return {
        'field': field,
        'nis_mat': nis_mat,
        'blocks': [init_block(k_b0, cfg, 0), init_block(k_b1, cfg, 1)],
    }


def flow_pack(params, cfg: FlowConfig):
    """Pack the flow's VM conditioning field into its gather atlas.

    Hoist to ONCE per train step per flow pytree (live + frozen copies
    are distinct trees, so per-call packing would rebuild several
    multi-hundred-MB atlases per step at 512^3 — round-2 verdict W3) and
    thread through flow_sample / flow_log_density."""
    return tfield.pack_vm_field(params['field'], cfg.n_levels)


def flow_feature(params, cfg: FlowConfig, pts, aabb, refl_angles01,
                 roughness, packed=None):
    """Conditioning feature (ref: flow.py:709-744, 801-816):
    VM field -> MLP(16) ‖ PE(reflection angles) ‖ zeroed roughness embed."""
    xyz01 = contraction(pts, aabb)
    if packed is None:
        # flows condition on ~2k points/step, always at level 0: skip the
        # atlas build (~12ms/field/step of pads/pools/concats, round-4
        # trace) and bilinear-sample the raw planes directly — identical
        # level-0 math (test_packed_field equivalence)
        feats = tfield.vm_features(params['field'], xyz01, None, 1)
    else:
        feats = tfield.vm_features_packed(packed, xyz01, None)
    if cfg.nis_multires > 0:
        xyz_in = positional_encoding(pts, cfg.nis_multires)
    else:
        xyz_in = pts
    h = jnp.concatenate([feats, xyz_in], -1)
    h = mlp.apply_linear(params['nis_mat'][0], h)
    h = mlp.softplus100(h)
    feat = mlp.apply_linear(params['nis_mat'][1], h)
    if cfg.disable_tensorial:
        feat = jnp.zeros_like(feat)

    if cfg.refl_multires > 0:
        refl = positional_encoding(refl_angles01, cfg.refl_multires)
    else:
        refl = refl_angles01
    if cfg.disable_reflected:
        refl = jnp.zeros_like(refl)
    # roughness embedding is zeroed in the reference (flow.py:814, 847)
    rough = jnp.zeros(pts.shape[:-1] + (cfg.rough_ch,), pts.dtype)
    return jnp.concatenate([feat, refl, rough], -1)


def _run_blocks(params, cfg: FlowConfig, x, logj, feature, inverse: bool):
    """x [pn,sn,2] or [M,2]; feature [pn,F] broadcast over sn."""
    pre_shape = x.shape[:-1]
    if x.ndim == 3:
        feature = jnp.broadcast_to(feature[:, None, :],
                                   (x.shape[0], x.shape[1],
                                    feature.shape[-1]))
    x = x.reshape(-1, cfg.d)
    logj = logj.reshape(-1, 1)
    feature = feature.reshape(-1, feature.shape[-1])
    order = ((1, 0) if inverse else (0, 1))
    for mi in order:
        x, logj = block_flow(params['blocks'][mi], x, logj, feature, cfg,
                             mi, inverse)
    return x.reshape(*pre_shape, cfg.d), logj.reshape(*pre_shape, 1)


def _prior_log_prob(cfg: FlowConfig, z):
    """Prior density per flow variant (ref registry flow.py:644-648:
    pwquad/pwlinear -> SphereSampler, realnvp -> factorized gaussian)."""
    if cfg.flow_type == 'realnvp':
        return jnp.sum(-0.5 * z ** 2 - 0.5 * np.log(2 * np.pi), -1,
                       keepdims=True)
    return sphere_prior_log_prob(z)


def _prior_sample(cfg: FlowConfig, rng, pn: int, sn: int, train: bool):
    if cfg.flow_type == 'realnvp':
        z = jax.random.normal(rng, (pn, sn, cfg.d))
        return z, -_prior_log_prob(cfg, z)
    return sphere_prior_sample(rng, pn, sn, train)


def flow_log_density(params, cfg: FlowConfig, pts, aabb, refl_angles01,
                     roughness, x, rays_id=None, packed=None):
    """Density evaluation: x -> (z, log q(x)) (ref: flow.py:801-831).

    pts [pn,3]; x [pn,sn,2] or [M,2] with rays_id [M] into pn."""
    x = jnp.clip(x, 1e-6, 1 - 1e-6)
    feature = flow_feature(params, cfg, pts, aabb, refl_angles01, roughness,
                           packed=packed)
    if rays_id is not None:
        feature = jnp.take(feature, rays_id, axis=0, mode='clip')
    logj = jnp.zeros(x.shape[:-1] + (1,), x.dtype)
    if cfg.flow_type == 'realnvp':
        # output sigmoid cell (ref: flow.py:126-144): invert it first
        z0 = jnp.clip(x, 1e-6, 1 - 1e-6)
        logj = logj - jnp.sum(
            jnp.log(jnp.maximum(z0 * (1 - z0), 1e-6)), -1, keepdims=True)
        x = jnp.log(z0 / (1 - z0))
    z, logj = _run_blocks(params, cfg, x, logj, feature, inverse=True)
    logqx = logj + _prior_log_prob(cfg, z)
    return z, logqx


def flow_sample(params, cfg: FlowConfig, rng, pts, aabb, refl_angles01,
                roughness, n_samples: int, train: bool = True,
                packed=None):
    """Sampling: prior -> x with log q (ref: flow.py:833-855).

    Returns (x [pn,sn,2], logq [pn,sn,1])."""
    pn = pts.shape[0]
    x, logj = _prior_sample(cfg, rng, pn, n_samples, train)
    feature = flow_feature(params, cfg, pts, aabb, refl_angles01, roughness,
                           packed=packed)
    x, logj = _run_blocks(params, cfg, x, logj, feature, inverse=False)
    if cfg.flow_type == 'realnvp':
        y = jnp.clip(jax.nn.sigmoid(x), 1e-6, 1 - 1e-6)
        logj = logj + jnp.sum(
            jnp.log(jnp.maximum(y * (1 - y), 1e-6)), -1, keepdims=True)
        x = y
    return x, logj
