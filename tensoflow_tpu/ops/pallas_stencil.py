"""Fused VM-field MLP head kernels (Pallas TPU).

The stencil hot path splits between XLA and Pallas by what each does
well: XLA performs the atlas row gathers + bilinear weighting (fast,
~0.5 ns/row on v5e; Mosaic has no arbitrary-row gather), while this
kernel fuses everything downstream — the per-plane plane*line products,
the split-K first MLP layer accumulated in VMEM, softplus(beta=100),
and the second layer with the offset-point sdf-column reduction — into
one VMEM-resident pass with a custom VJP.  In pure XLA this region
shatters into dozens of fusions exchanging GB-scale [7N, hidden] f32
intermediates through HBM (round-2 device trace: ~160 ms of a 200 ms
stencil fwd+bwd at 131k samples).

Inputs per stencil point s and plane i select one of the deduplicated
plane lookup variants [center, u+, u-, v+, v-] and line variants
[center, x+, x-] (see ops/tensor_field.vm_stencil_features_split).
Point 0 (center) produces the full [1+app_dim] head output; points 1..6
produce only the sdf column (ref: network/fields.py:227-299).

The backward kernel recomputes z/h per tile (rematerialization — the
[7N, hidden] activations never exist in HBM) and emits cotangents for
every P/L variant (product rule), the PE inputs, and all weights.
"""
from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import tensor_field as tfield

# plane lookup variants per (stencil point, plane): indices into the
# [center, u+, u-, v+, v-] / [center, x+, x-] variant lists.
N_PVAR = len(tfield._PLANE_SHIFTS)     # 5
N_LVAR = len(tfield._LINE_SHIFTS)      # 3


def _stencil_mapping() -> Tuple[Tuple[Tuple[int, int], ...], ...]:
    """mapping[s][i] = (plane_variant, line_variant) for stencil point s,
    plane i — mirrors vm_stencil_features_split's assembly."""
    out = []
    for d, sign in tfield._STENCIL:
        row = []
        for i in range(3):
            a, b = tfield.MAT_MODE[i]
            c = tfield.VEC_MODE[i]
            pi, li = 0, 0
            if d == a:
                pi = 1 if sign > 0 else 2
            elif d == b:
                pi = 3 if sign > 0 else 4
            elif d == c:
                li = 1 if sign > 0 else 2
            row.append((pi, li))
        out.append(tuple(row))
    return tuple(out)


MAPPING7 = _stencil_mapping()
MAPPING1 = (((0, 0), (0, 0), (0, 0)),)


def _softplus100(x):
    return jax.nn.softplus(100.0 * x) / 100.0


def _sig100(x):
    return jax.nn.sigmoid(100.0 * x)


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _dot_t(a, b):
    """a [M, K] x b [M, N] -> [K, N] (contraction over rows)."""
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _dot_rt(a, b):
    """a [M, K] x b [N, K] -> [M, N] (rhs transposed)."""
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _fwd_kernel(*refs, S, mapping, cd, nv):
    """refs: P(3*n_pvar), L(3*n_lvar), pe [S,TN,E], w0a..c [C,H],
    w0pe [E,H], b0 [1,H], w1 [H,O], out_c [TN,O], (out_off [S-1,TN])."""
    n_pvar, n_lvar = nv
    np_, nl_ = 3 * n_pvar, 3 * n_lvar
    P = refs[:np_]
    L = refs[np_:np_ + nl_]
    pe = refs[np_ + nl_]
    w0 = refs[np_ + nl_ + 1:np_ + nl_ + 4]
    w0pe = refs[np_ + nl_ + 4]
    b0 = refs[np_ + nl_ + 5]
    w1 = refs[np_ + nl_ + 6]
    out_c = refs[np_ + nl_ + 7]
    out_off = refs[np_ + nl_ + 8] if S > 1 else None

    for s in range(S):
        z = None
        for i in range(3):
            pv, lv = mapping[s][i]
            x = (P[i * n_pvar + pv][:].astype(jnp.float32)
                 * L[i * n_lvar + lv][:].astype(jnp.float32)).astype(cd)
            d = _dot(x, w0[i][:])
            z = d if z is None else z + d
        z = z + _dot(pe[s], w0pe[:]) + b0[:]
        h = _softplus100(z).astype(cd)
        if s == 0:
            out_c[:] = _dot(h, w1[:])
        else:
            out_off[s - 1, :] = _dot(h, w1[:, :1])[:, 0]


def _build_fwd(S, N, TN, C, E, H, O, cd, mapping, nv, interpret):
    np_, nl_ = 3 * nv[0], 3 * nv[1]
    grid = (N // TN,)
    row_spec = pl.BlockSpec((TN, C), lambda t: (t, 0),
                            memory_space=pltpu.VMEM)
    in_specs = [row_spec] * (np_ + nl_)
    in_specs.append(pl.BlockSpec((S, TN, E), lambda t: (0, t, 0),
                                 memory_space=pltpu.VMEM))
    for shape in [(C, H)] * 3 + [(E, H), (1, H), (H, O)]:
        in_specs.append(pl.BlockSpec(shape, lambda t: (0, 0),
                                     memory_space=pltpu.VMEM))
    out_shapes = [jax.ShapeDtypeStruct((N, O), jnp.float32)]
    out_specs = [pl.BlockSpec((TN, O), lambda t: (t, 0),
                              memory_space=pltpu.VMEM)]
    if S > 1:
        out_shapes.append(jax.ShapeDtypeStruct((S - 1, N), jnp.float32))
        out_specs.append(pl.BlockSpec((S - 1, TN), lambda t: (0, t),
                                      memory_space=pltpu.VMEM))
    kern = functools.partial(_fwd_kernel, S=S, mapping=mapping, cd=cd,
                             nv=nv)
    return pl.pallas_call(
        kern, grid=grid, in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shapes, interpret=interpret)


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------

def _bwd_kernel(*refs, S, mapping, cd, nv):
    """Recompute z/h per tile; emit dP/dL/dpe blocks and accumulate
    weight grads across the (sequential) grid.

    refs in: P(3*n_pvar), L(3*n_lvar), pe, w0a..c, w0pe, b0, w1,
             g_c [TN,O], (g_off [S-1,TN])
    refs out: dP, dL, dpe [S,TN,E], dw0a..c [C,H], dw0pe [E,H],
              db0 [1,H], dw1 [H,O], db1 [1,O]
    """
    n_pvar, n_lvar = nv
    np_, nl_ = 3 * n_pvar, 3 * n_lvar
    k = 0
    P = refs[k:k + np_]; k += np_
    L = refs[k:k + nl_]; k += nl_
    pe = refs[k]; k += 1
    w0 = refs[k:k + 3]; k += 3
    w0pe = refs[k]; k += 1
    b0 = refs[k]; k += 1
    w1 = refs[k]; k += 1
    g_c = refs[k]; k += 1
    g_off = None
    if S > 1:
        g_off = refs[k]; k += 1
    dP = refs[k:k + np_]; k += np_
    dL = refs[k:k + nl_]; k += nl_
    dpe = refs[k]; k += 1
    dw0 = refs[k:k + 3]; k += 3
    dw0pe = refs[k]; k += 1
    db0 = refs[k]; k += 1
    dw1 = refs[k]; k += 1
    db1 = refs[k]; k += 1

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in list(dw0) + [dw0pe, db0, dw1, db1]:
            r[:] = jnp.zeros_like(r)

    # zero the per-tile P/L cotangent blocks (accumulated over points)
    dPa = [jnp.zeros(dP[j].shape, jnp.float32) for j in range(np_)]
    dLa = [jnp.zeros(dL[j].shape, jnp.float32) for j in range(nl_)]

    for s in range(S):
        xs = []
        z = None
        for i in range(3):
            pv, lv = mapping[s][i]
            x = (P[i * n_pvar + pv][:].astype(jnp.float32)
                 * L[i * n_lvar + lv][:].astype(jnp.float32)).astype(cd)
            xs.append(x)
            d = _dot(x, w0[i][:])
            z = d if z is None else z + d
        z = z + _dot(pe[s], w0pe[:]) + b0[:]
        h = _softplus100(z)
        hc = h.astype(cd)
        if s == 0:
            g = g_c[:]                               # [TN, O]
            dh = _dot_rt(g.astype(cd), w1[:].astype(cd))   # [TN, H]
            dw1[:] += _dot_t(hc, g.astype(cd))
            db1[:] += jnp.sum(g, axis=0, keepdims=True)
        else:
            gs = g_off[s - 1, :][:, None]            # [TN, 1]
            dh = gs * w1[:, :1].astype(jnp.float32).T    # outer product
            dw1[:, :1] += _dot_t(hc, gs.astype(cd))
            db1[:, :1] += jnp.sum(gs, axis=0, keepdims=True)
        dz = (dh * _sig100(z)).astype(cd)            # [TN, H]
        db0[:] += jnp.sum(dz.astype(jnp.float32), axis=0, keepdims=True)
        dpe[s] = _dot_rt(dz, w0pe[:].astype(cd)).astype(dpe.dtype)
        for i in range(3):
            pv, lv = mapping[s][i]
            dx = _dot_rt(dz, w0[i][:].astype(cd))    # [TN, C] f32
            dw0[i][:] += _dot_t(xs[i], dz)
            pf = P[i * n_pvar + pv][:].astype(jnp.float32)
            lf = L[i * n_lvar + lv][:].astype(jnp.float32)
            dPa[i * n_pvar + pv] += dx * lf
            dLa[i * n_lvar + lv] += dx * pf
        dw0pe[:] += _dot_t(pe[s].astype(cd), dz)

    for j in range(np_):
        dP[j][:] = dPa[j].astype(dP[j].dtype)
    for j in range(nl_):
        dL[j][:] = dLa[j].astype(dL[j].dtype)


def _build_bwd(S, N, TN, C, E, H, O, cd, mapping, nv, interpret):
    np_, nl_ = 3 * nv[0], 3 * nv[1]
    grid = (N // TN,)
    row_spec = pl.BlockSpec((TN, C), lambda t: (t, 0),
                            memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(shape, lambda t: tuple(
        0 for _ in shape), memory_space=pltpu.VMEM)
    in_specs = [row_spec] * (np_ + nl_)
    in_specs.append(pl.BlockSpec((S, TN, E), lambda t: (0, t, 0),
                                 memory_space=pltpu.VMEM))
    for shape in [(C, H)] * 3 + [(E, H), (1, H), (H, O)]:
        in_specs.append(const(shape))
    in_specs.append(pl.BlockSpec((TN, O), lambda t: (t, 0),
                                 memory_space=pltpu.VMEM))
    if S > 1:
        in_specs.append(pl.BlockSpec((S - 1, TN), lambda t: (0, t),
                                     memory_space=pltpu.VMEM))

    out_shapes = ([jax.ShapeDtypeStruct((N, C), cd)] * (np_ + nl_)
                  + [jax.ShapeDtypeStruct((S, N, E), cd)]
                  + [jax.ShapeDtypeStruct((C, H), jnp.float32)] * 3
                  + [jax.ShapeDtypeStruct((E, H), jnp.float32),
                     jax.ShapeDtypeStruct((1, H), jnp.float32),
                     jax.ShapeDtypeStruct((H, O), jnp.float32),
                     jax.ShapeDtypeStruct((1, O), jnp.float32)])
    out_specs = ([row_spec] * (np_ + nl_)
                 + [pl.BlockSpec((S, TN, E), lambda t: (0, t, 0),
                                 memory_space=pltpu.VMEM)]
                 + [const((C, H))] * 3
                 + [const((E, H)), const((1, H)), const((H, O)),
                    const((1, O))])
    kern = functools.partial(_bwd_kernel, S=S, mapping=mapping, cd=cd,
                             nv=nv)
    return pl.pallas_call(
        kern, grid=grid, in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shapes, interpret=interpret)


# ---------------------------------------------------------------------------
# public op with custom VJP
# ---------------------------------------------------------------------------

def _pad_rows(x, n_pad):
    if x.shape[0] == n_pad:
        return x
    pad = [(0, n_pad - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad)


def _pad_mid(x, n_pad):
    if x.shape[1] == n_pad:
        return x
    return jnp.pad(x, [(0, 0), (0, n_pad - x.shape[1]), (0, 0)])


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _head(static, P, L, pe, w0s, b0, w1):
    return _head_fwd(static, P, L, pe, w0s, b0, w1)[0]


def _head_fwd(static, P, L, pe, w0s, b0, w1):
    S, TN, cd_name, nv, interpret = static
    cd = jnp.dtype(cd_name)
    n = P[0].shape[0]
    n_pad = -(-n // TN) * TN
    C = P[0].shape[1]
    E = pe.shape[-1]
    H = w1.shape[0]
    O = w1.shape[1]
    mapping = MAPPING7 if S == 7 else MAPPING1
    Pp = [_pad_rows(x.astype(cd), n_pad) for x in P]
    Lp = [_pad_rows(x.astype(cd), n_pad) for x in L]
    pep = _pad_mid(pe.astype(cd), n_pad)
    w0c = [w.astype(cd) for w in w0s]
    b0r = b0.reshape(1, H).astype(jnp.float32)
    w1c = w1.astype(cd)
    fwd = _build_fwd(S, n_pad, TN, C, E, H, O, cd, mapping, nv, interpret)
    outs = fwd(*Pp, *Lp, pep, *w0c, b0r, w1c)
    if S > 1:
        out_c, out_off = outs
        res = (out_c[:n], out_off[:, :n])
    else:
        res = (outs[0][:n], None)
    return res, (P, L, pe, w0s, b0, w1)


def _head_bwd(static, residuals, cot):
    S, TN, cd_name, nv, interpret = static
    cd = jnp.dtype(cd_name)
    P, L, pe, w0s, b0, w1 = residuals
    g_c, g_off = cot
    n = P[0].shape[0]
    n_pad = -(-n // TN) * TN
    C = P[0].shape[1]
    E = pe.shape[-1]
    H = w1.shape[0]
    O = w1.shape[1]
    mapping = MAPPING7 if S == 7 else MAPPING1
    Pp = [_pad_rows(x.astype(cd), n_pad) for x in P]
    Lp = [_pad_rows(x.astype(cd), n_pad) for x in L]
    pep = _pad_mid(pe.astype(cd), n_pad)
    w0c = [w.astype(cd) for w in w0s]
    b0r = b0.reshape(1, H).astype(jnp.float32)
    w1c = w1.astype(cd)
    args = [*Pp, *Lp, pep, *w0c, b0r, w1c,
            _pad_rows(g_c.astype(jnp.float32), n_pad)]
    if S > 1:
        g_off_p = jnp.pad(g_off.astype(jnp.float32),
                          [(0, 0), (0, n_pad - n)])
        args.append(g_off_p)
    bwd = _build_bwd(S, n_pad, TN, C, E, H, O, cd, mapping, nv, interpret)
    outs = bwd(*args)
    np_, nl_ = 3 * nv[0], 3 * nv[1]
    k = 0
    dP = tuple(outs[k + j][:n].astype(P[j].dtype) for j in range(np_))
    k += np_
    dL = tuple(outs[k + j][:n].astype(L[j].dtype) for j in range(nl_))
    k += nl_
    dpe = outs[k][:, :n].astype(pe.dtype); k += 1
    dw0 = tuple(outs[k + j].astype(w0s[j].dtype) for j in range(4)); k += 4
    db0 = outs[k][0].astype(b0.dtype); k += 1
    dw1 = outs[k].astype(w1.dtype); k += 1
    # db1 from the kernel's accumulator is not returned separately to the
    # caller signature; b1 is added OUTSIDE the kernel (see stencil_head).
    return dP, dL, dpe, dw0, db0, dw1


_head.defvjp(_head_fwd, _head_bwd)


def stencil_head(P: Sequence, L: Sequence, pe7, w0_parts: Sequence, b0,
                 w1, b1, tile: int = 256, interpret: bool = False):
    """7-point stencil MLP head.

    P: 15 arrays [N, C] (plane variants, plane-major); L: 9 arrays [N, C];
    pe7 [7, N, E]; w0_parts = (w0a, w0b, w0c, w0pe) row-splits of layer-0
    weights; b0 [H]; w1 [H, O]; b1 [O].
    Returns (out_center [N, O], sdf_off [6, N]); the biases are applied
    outside the kernel (keeps the VJP signature lean — their grads are
    the cotangent sums XLA derives for free).
    """
    cd = P[0].dtype if P[0].dtype == jnp.bfloat16 else jnp.float32
    static = (7, tile, jnp.dtype(cd).name, (N_PVAR, N_LVAR), interpret)
    out_c, out_off = _head(static, tuple(P), tuple(L), pe7,
                           tuple(w0_parts), b0, w1)
    return out_c + b1[None, :], out_off + b1[0]


def point_head(P: Sequence, L: Sequence, pe, w0_parts: Sequence, b0,
               w1, b1, tile: int = 256, interpret: bool = False):
    """Single-point MLP head: P/L are 3 arrays [N, C] each (center
    variants only); pe [N, E]; returns [N, O]."""
    cd = P[0].dtype if P[0].dtype == jnp.bfloat16 else jnp.float32
    static = (1, tile, jnp.dtype(cd).name, (1, 1), interpret)
    out_c, _ = _head(static, tuple(P), tuple(L), pe[None],
                     tuple(w0_parts), b0, w1)
    return out_c + b1[None, :]
