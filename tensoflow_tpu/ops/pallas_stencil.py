"""Fused VM-field stencil kernels (Pallas TPU), patch-gather design.

TPU gathers cost ~2.5 ns per gathered row regardless of row width
(round-2 measurement: the 60+18 rows/sample variant scheme spent ~23 ms
at 131k samples on gathers alone, dwarfing the ~2 ms of MLP math).  The
hot path therefore gathers ONE 4x4-texel patch row per texture per mip
branch (ops/tensor_field.pack_vm_patches / vm_patch_gather — 3 plane +
3 line rows per sample) and this kernel does everything else on-chip:

  * stencil-shifted clamped-bilinear taps as hat-function (linear
    B-spline) weights over the patch's static slots — exact for any
    per-texel shift sigma in [-1, 1], so fractional-mip shifts and the
    +-1-texel FD stencil share one formulation with NO dynamic slot
    indexing (see vm_patch_gather for the anchor convention);
  * per-plane plane*line products + the point PE packed CONTIGUOUSLY
    into one [S*TN, XW] VMEM scratch (XW = 3C+E rounded up to 128), so
    W0big is simply the true [3C+E, H] layer-0 weights zero-padded —
    every X row is ONE aligned full-width store (round-3 change: the
    earlier 4x128-slot layout spent ~3.6k vreg-ops/tile zeroing a
    [S*TN, 512] scratch and doubled the MXU K passes);
  * softplus(beta=100) and the second layer, with offset stencil points
    reduced to the sdf column (ref: network/fields.py:227-299).

The backward kernel recomputes activations per tile (the [7N, hidden]
intermediates never exist in HBM) and emits patch cotangents (which
XLA scatter-adds into the atlas — the VJP of the gather) plus all
weight gradients, accumulated across the sequential grid.

In pure XLA this region shattered into dozens of relayout copies and
per-variant gathers: 194 ms fwd+bwd at 131k samples vs ~5 ms of
speed-of-light (61 GFLOP fwd, ~1 GB of traffic).
"""
from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import tensor_field as tfield

SLOT = 128                              # TPU lane-vreg width
FS = tfield.FRAC_STRIDE                 # frac lanes per mip branch


def _xw(C: int, E: int) -> int:
    """X scratch width: 3 plane products + PE, rounded up to a vreg."""
    return -(-(3 * C + E) // SLOT) * SLOT

# plane lookup variants [center, u+, u-, v+, v-]; line [center, x+, x-]
_PVAR_SIGN = ((0, 0), (1, 0), (-1, 0), (0, 1), (0, -1))
_LVAR_SIGN = (0, 1, -1)


def _stencil_mapping() -> Tuple[Tuple[Tuple[int, int], ...], ...]:
    """mapping[s][i] = (plane_variant, line_variant) for stencil point s,
    plane i — the 7-point FD stencil in ops/tensor_field._STENCIL order."""
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


def _hat_terms(frac, sigma, sign):
    """Hat-function tap weights for a clamped-bilinear lookup shifted by
    sign*sigma texels.  frac [TN,1] in [0,1); sigma: python float (static
    mip) or [TN,1] (dynamic).  Returns [(k, weight [TN,1])] with k the
    patch slot offset in [-1,2] — only statically-possible taps emitted."""
    if isinstance(sigma, (int, float)):
        s = float(sigma) * sign
        r = frac + s if s != 0.0 else frac
        ks = [k for k in (-1, 0, 1, 2) if s - 1.0 < k < s + 2.0]
    else:
        if sign == 0:
            r = frac
            ks = [0, 1]
        else:
            r = frac + sign * sigma
            ks = [-1, 0, 1, 2]
    return [(k, jnp.maximum(0.0, 1.0 - jnp.abs(r - k))) for k in ks]


def _line_tap(slots, fx, sx, lv, bd):
    acc = None
    for k, w in _hat_terms(fx, sx, _LVAR_SIGN[lv]):
        t = w.astype(bd) * slots[k + 1]
        acc = t if acc is None else acc + t
    return acc


def _variants(P, L, fr, S, B, C, sigmas):
    """Compute the blended stencil tap values from patch refs.

    P/L: B*3 patch refs ([TN,16C] / [TN,4C]); fr [TN, 2*FS] f32.
    Returns (PV, LV): 3x5 / 3x3 lists of [TN,C] f32 (only the variants a
    7-point (or 1-point) stencil needs are materialized).

    Factorized separable evaluation (round 3): the u-shifted variants
    share the CENTER v-axis weights and vice versa, so per plane we form
    partial sums Rv[ku] = sum_kv wv0[kv]*slot[ku,kv] (center + u+/-
    derive from Rv) and Ru[kv] = sum_ku wu0[ku]*slot[ku,kv] (v+/-), and
    only 12 of 16 slots are ever touched — ~30%% fewer [TN,C]-wide VPU
    ops than blending each variant independently (the kernels are
    VPU-op-bound, not bandwidth-bound: CLAUDE.md round-3 trace).

    All [TN,C]-wide madds run in the patches' dtype (bf16 when gathers
    are bf16 — packed vregs halve the VPU op count; the [TN,1] weight
    products stay f32 and cast once).  The backward already rebuilt X
    from bf16-saved variants, so training gradients saw this rounding
    before round 3 made the forward consistent with it."""
    bd = P[0].dtype
    n_pv = 5 if S > 1 else 1
    n_lv = 3 if S > 1 else 1
    PV = [[None] * n_pv for _ in range(3)]
    LV = [[None] * n_lv for _ in range(3)]
    for b in range(B):
        f = lambda j: fr[:, b * FS + j:b * FS + j + 1]
        wgt = f(9)
        for i in range(3):
            pref = P[b * 3 + i]
            slot = lambda ku, kv: pref[
                :, ((ku + 1) * 4 + kv + 1) * C:
                ((ku + 1) * 4 + kv + 1 + 1) * C]
            fu, fv = f(2 * i), f(2 * i + 1)
            if sigmas[b] is not None:
                su, sv, _ = sigmas[b][i]
            else:
                su, sv = f(10 + 2 * i), f(11 + 2 * i)
            # center-axis hat weights carry the branch weight (a [TN,1]
            # product — free next to the [TN,C] madds it saves)
            wv0 = [(kv, (wgt * w).astype(bd))
                   for kv, w in _hat_terms(fv, sv, 0)]
            wu0 = [(ku, (wgt * w).astype(bd))
                   for ku, w in _hat_terms(fu, su, 0)]
            if n_pv == 1:
                c = None
                for ku, wu in _hat_terms(fu, su, 0):
                    rv = None
                    for kv, wv in wv0:
                        _t = wv * slot(ku, kv)
                        rv = _t if rv is None else rv + _t
                    t = wu.astype(bd) * rv
                    c = t if c is None else c + t
                PV[i][0] = c if PV[i][0] is None else PV[i][0] + c
            else:
                # Rv[ku]: v-blended rows for every ku a u-variant taps
                rv = {}
                for ku in (-1, 0, 1, 2):
                    acc = None
                    for kv, wv in wv0:
                        t = wv * slot(ku, kv)
                        acc = t if acc is None else acc + t
                    rv[ku] = acc
                for pv in (0, 1, 2):        # center, u+, u-
                    sgu = _PVAR_SIGN[pv][0]
                    acc = None
                    for ku, wu in _hat_terms(fu, su, sgu):
                        t = wu.astype(bd) * rv[ku]
                        acc = t if acc is None else acc + t
                    PV[i][pv] = (acc if PV[i][pv] is None
                                 else PV[i][pv] + acc)
                # Ru[kv]: u-blended rows for the v-shifted variants
                ru = {}
                for kv in (-1, 0, 1, 2):
                    acc = None
                    for ku, wu in wu0:
                        t = wu * slot(ku, kv)
                        acc = t if acc is None else acc + t
                    ru[kv] = acc
                for pv in (3, 4):           # v+, v-
                    sgv = _PVAR_SIGN[pv][1]
                    acc = None
                    for kv, wv in _hat_terms(fv, sv, sgv):
                        t = wv.astype(bd) * ru[kv]
                        acc = t if acc is None else acc + t
                    PV[i][pv] = (acc if PV[i][pv] is None
                                 else PV[i][pv] + acc)
            lslots = [L[b * 3 + i][:, s * C:(s + 1) * C]
                      for s in range(4)]
            fx = f(6 + i)
            if sigmas[b] is not None:
                sx = sigmas[b][i][2]
            else:
                sx = f(16 + i)
            wgt_b = wgt.astype(bd)
            for lv in range(n_lv):
                t = wgt_b * _line_tap(lslots, fx, sx, lv, bd)
                LV[i][lv] = t if LV[i][lv] is None else LV[i][lv] + t
    return PV, LV


def _assemble_x(X, PV, LV, pes, S, TN, C, E, mapping):
    """Fill the [S*TN, XW] scratch: per stencil point one CONTIGUOUS
    full-width row store [prod0 | prod1 | prod2 | pe | 0-pad] — the pad
    lanes match zero rows of w0big, and writing them explicitly avoids
    both a per-tile scratch zeroing and uninitialized-VMEM NaNs hitting
    the MXU."""
    xw = X.shape[-1]
    pad = xw - (3 * C + E)
    zpad = [jnp.zeros((TN, pad), X.dtype)] if pad else []
    for s in range(S):
        rows = slice(s * TN, (s + 1) * TN)
        prods = [(PV[i][mapping[s][i][0]]
                  * LV[i][mapping[s][i][1]]).astype(X.dtype)
                 for i in range(3)]
        X[rows, :] = jnp.concatenate(
            prods + [pes[s].astype(X.dtype)] + zpad, axis=1)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _pe_offsets(pe, rot, S):
    """Derive the S stencil-point PEs from the center PE via the
    [S,4,E] linear-combination table (see tenso_sdf._pe_rot_table).
    pe [TN,E] f32; returns list of S [TN,E] f32."""
    if S == 1:
        return [pe]
    e = pe.shape[-1]
    pe_m3 = jnp.concatenate([pe[:, 3:], pe[:, :3]], axis=1)   # roll -3
    pe_p3 = jnp.concatenate([pe[:, e - 3:], pe[:, :e - 3]], axis=1)
    out = [pe]
    for s in range(1, S):
        out.append(pe * rot[s, 0] + pe_m3 * rot[s, 1]
                   + pe_p3 * rot[s, 2] + rot[s, 3])
    return out


def _fwd_kernel(*refs, S, TN, B, C, E, sigmas, mapping, cd, save_v):
    """refs in: fr [TN,2FS], P (B*3 [TN,16C]), L (B*3 [TN,4C]),
    pe [TN,E], rot [S,4,E], w0big [XW,H], b0 [1,H], w1 [H,O],
    (w1row [1,H]);
    out: out_c [TN,O] f32, (out_off [S-1,TN] f32), (V [TN,VW] f32 tap
    variants saved for the backward); scratch X."""
    k = 0
    fr = refs[k]; k += 1
    P = refs[k:k + 3 * B]; k += 3 * B
    L = refs[k:k + 3 * B]; k += 3 * B
    pe = refs[k]; k += 1
    rot = refs[k]; k += 1
    w0big = refs[k]; k += 1
    b0 = refs[k]; k += 1
    w1 = refs[k]; k += 1
    w1row = None
    if S > 1:
        w1row = refs[k]; k += 1
    out_c = refs[k]; k += 1
    out_off = None
    if S > 1:
        out_off = refs[k]; k += 1
    v_out = None
    if save_v:
        v_out = refs[k]; k += 1
    X = refs[k]

    PV, LV = _variants(P, L, fr[:], S, B, C, sigmas)
    if save_v:
        # residuals in cd (bf16 when gathers are bf16): the variants are
        # sums of products of cd patches, so cd storage loses only the
        # blend's guard bits while halving ~450MB/step of HBM traffic
        v_out[:] = jnp.concatenate(
            [PV[i][pv] for i in range(3) for pv in range(len(PV[0]))]
            + [LV[i][lv] for i in range(3) for lv in range(len(LV[0]))],
            axis=1).astype(v_out.dtype)
    pes = _pe_offsets(pe[:].astype(jnp.float32), rot[:], S)
    _assemble_x(X, PV, LV, pes, S, TN, C, E, mapping)
    z = _dot(X[:], w0big[:]) + b0[:]            # [S*TN, H] f32
    h = _softplus100(z).astype(cd)
    out_c[:] = _dot(h[:TN], w1[:])
    if S > 1:
        # offset points only need the sdf column: a VPU lane-reduce
        # against w1's first column, NOT an MXU dot into a 128-lane-wide
        # output (that wrote 400MB/step of zero lanes to HBM)
        hh = h[TN:].astype(jnp.float32).reshape(S - 1, TN, -1)
        out_off[:] = jnp.sum(hh * w1row[:].astype(jnp.float32)[None],
                             axis=-1)


def _vw(S: int, C: int) -> int:
    """Saved-variant row width: (n_pv + n_lv) * 3 planes * C."""
    return ((5 + 3) if S > 1 else 2) * 3 * C


def _build_fwd(S, N, TN, B, C, E, H, O, cd, sigmas, mapping, interpret,
               save_v=False):
    grid = (N // TN,)
    const = lambda shape: pl.BlockSpec(shape,
                                       lambda t: tuple(0 for _ in shape))
    in_specs = [pl.BlockSpec((TN, 2 * FS), lambda t: (t, 0))]
    in_specs += [pl.BlockSpec((TN, 16 * C), lambda t: (t, 0))] * (3 * B)
    in_specs += [pl.BlockSpec((TN, 4 * C), lambda t: (t, 0))] * (3 * B)
    in_specs.append(pl.BlockSpec((TN, E), lambda t: (t, 0)))
    in_specs.append(const((S, 4, E)))
    in_specs += [const((_xw(C, E), H)), const((1, H)), const((H, O))]
    if S > 1:
        in_specs.append(const((1, H)))
    out_shapes = [jax.ShapeDtypeStruct((N, O), jnp.float32)]
    out_specs = [pl.BlockSpec((TN, O), lambda t: (t, 0))]
    if S > 1:
        out_shapes.append(
            jax.ShapeDtypeStruct((S - 1, N), jnp.float32))
        out_specs.append(pl.BlockSpec((S - 1, TN), lambda t: (0, t)))
    if save_v:
        out_shapes.append(jax.ShapeDtypeStruct((N, _vw(S, C)), cd))
        out_specs.append(pl.BlockSpec((TN, _vw(S, C)), lambda t: (t, 0)))
    kern = functools.partial(_fwd_kernel, S=S, TN=TN, B=B, C=C, E=E,
                             sigmas=sigmas, mapping=mapping, cd=cd,
                             save_v=save_v)
    return pl.pallas_call(
        kern, grid=grid, in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((S * TN, _xw(C, E)), cd)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary',),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret)


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------

def _bwd_kernel(*refs, S, TN, B, C, E, sigmas, mapping, cd):
    """Backward from saved tap variants: rebuild X (cheap products) and
    z on the MXU, emit patch/pe cotangents, accumulate weight grads
    across the (sequential) grid.  Takes V [TN,VW] (the forward's saved
    blended variants) instead of the raw patches — drops both the
    ~450MB/step of patch re-reads and the tap recompute (round 3)."""
    k = 0
    fr = refs[k]; k += 1
    V = refs[k]; k += 1
    pe = refs[k]; k += 1
    rot = refs[k]; k += 1
    w0big = refs[k]; k += 1
    b0 = refs[k]; k += 1
    w1 = refs[k]; k += 1
    w1row = None
    if S > 1:
        w1row = refs[k]; k += 1
    g_c = refs[k]; k += 1
    g_off = None
    if S > 1:
        g_off = refs[k]; k += 1
    dP = refs[k:k + 3 * B]; k += 3 * B
    dL = refs[k:k + 3 * B]; k += 3 * B
    dpe = refs[k]; k += 1
    dw0big = refs[k]; k += 1
    db0 = refs[k]; k += 1
    dw1 = refs[k]; k += 1
    dw1row = None
    if S > 1:
        dw1row = refs[k]; k += 1
    X = refs[k]; k += 1
    dX = refs[k]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw0big[:] = jnp.zeros_like(dw0big)
        db0[:] = jnp.zeros_like(db0)
        dw1[:] = jnp.zeros_like(dw1)
        if dw1row is not None:
            dw1row[:] = jnp.zeros_like(dw1row)

    # rebuild the activations from the saved variants (cd: the wide
    # madds of the rebuild/product-rule/routing sections all run packed
    # when cd is bf16 — these sections are VPU-op-bound)
    n_pv = 5 if S > 1 else 1
    n_lv = 3 if S > 1 else 1
    v = V[:]
    PV = [[v[:, (i * n_pv + pv) * C:(i * n_pv + pv + 1) * C]
           for pv in range(n_pv)] for i in range(3)]
    loff = 3 * n_pv * C
    LV = [[v[:, loff + (i * n_lv + lv) * C:loff + (i * n_lv + lv + 1) * C]
           for lv in range(n_lv)] for i in range(3)]
    pes = _pe_offsets(pe[:].astype(jnp.float32), rot[:], S)
    _assemble_x(X, PV, LV, pes, S, TN, C, E, mapping)
    z = _dot(X[:], w0big[:]) + b0[:]
    # one shared exp serves both softplus (h) and its derivative (sig)
    zs = 100.0 * z
    e = jnp.exp(-jnp.abs(zs))
    h = ((jnp.maximum(zs, 0.0) + jnp.log1p(e)) / 100.0).astype(cd)
    sig = jnp.where(zs >= 0.0, 1.0, e) / (1.0 + e)

    # second layer backward
    gc = g_c[:].astype(cd)                      # [TN, O]
    dw1[:] += _dot_t(h[:TN], gc)
    dh_c = _dot_rt(gc, w1[:])                   # [TN, H] f32
    if S > 1:
        # offset cotangents arrive as [S-1, TN] (sdf column only)
        go3 = g_off[:].astype(jnp.float32)[:, :, None]   # [S-1, TN, 1]
        h3 = h[TN:].astype(jnp.float32).reshape(S - 1, TN, -1)
        dw1row[:] += jnp.sum(h3 * go3, axis=(0, 1))[None, :]
        w1r = w1row[:].astype(jnp.float32)               # [1, H]
        dh_off = (go3 * w1r[None]).reshape((S - 1) * TN, -1)
        dh = jnp.concatenate([dh_c, dh_off], axis=0)
    else:
        dh = dh_c
    dz = (dh * sig).astype(cd)                  # [S*TN, H]
    db0[:] += jnp.sum(dz.astype(jnp.float32), axis=0, keepdims=True)
    dw0big[:] += _dot_t(X[:], dz)
    dX[:] = _dot_rt(dz, w0big[:])               # [S*TN, XW] f32

    # product rule into the variant cotangents
    dPV = [[None] * n_pv for _ in range(3)]
    dLV = [[None] * n_lv for _ in range(3)]
    dpe_acc = None
    e = E
    for s in range(S):
        rows = slice(s * TN, (s + 1) * TN)
        for i in range(3):
            pv, lv = mapping[s][i]
            dxi = dX[rows, i * C:(i + 1) * C].astype(cd)
            dp = dxi * LV[i][lv]
            dl = dxi * PV[i][pv]
            dPV[i][pv] = dp if dPV[i][pv] is None else dPV[i][pv] + dp
            dLV[i][lv] = dl if dLV[i][lv] is None else dLV[i][lv] + dl
        g_s = dX[rows, 3 * C:3 * C + E]
        if s == 0:
            dpe_acc = g_s
        else:
            # adjoint of pe_s = pe*A0 + roll(pe,-3)*A1 + roll(pe,+3)*A2
            t0 = g_s * rot[s, 0]
            t1 = g_s * rot[s, 1]
            t2 = g_s * rot[s, 2]
            t1r = jnp.concatenate([t1[:, e - 3:], t1[:, :e - 3]], axis=1)
            t2r = jnp.concatenate([t2[:, 3:], t2[:, :3]], axis=1)
            dpe_acc = dpe_acc + t0 + t1r + t2r
    dpe[:] = dpe_acc.astype(dpe.dtype)

    # hat weights route variant cotangents back to patch slots
    for b in range(B):
        f = lambda j: fr[:, b * FS + j:b * FS + j + 1]
        wgt = f(9)
        for i in range(3):
            fu, fv = f(2 * i), f(2 * i + 1)
            if sigmas[b] is not None:
                su, sv, sx = sigmas[b][i]
            else:
                su, sv = f(10 + 2 * i), f(11 + 2 * i)
                sx = f(16 + i)
            fx = f(6 + i)
            # transposed factorization (see _variants): route center/u+-
            # cotangents through dRv[ku] (shared center-v weights), v+-
            # through dRu[kv] — ~30% fewer [TN,C] madds than per-variant
            # pair routing
            dpatch = [None] * 16
            wv0 = [(kv, (wgt * w).astype(cd))
                   for kv, w in _hat_terms(fv, sv, 0)]
            wu0 = [(ku, (wgt * w).astype(cd))
                   for ku, w in _hat_terms(fu, su, 0)]
            drv = {}
            for pv in range(min(n_pv, 3)):          # center, u+, u-
                if dPV[i][pv] is None:
                    continue
                for ku, wu in _hat_terms(fu, su, _PVAR_SIGN[pv][0]):
                    t = wu.astype(cd) * dPV[i][pv]
                    drv[ku] = t if drv.get(ku) is None else drv[ku] + t
            for ku, g in drv.items():
                for kv, wv in wv0:
                    sl = (ku + 1) * 4 + (kv + 1)
                    t = wv * g
                    dpatch[sl] = t if dpatch[sl] is None \
                        else dpatch[sl] + t
            dru = {}
            for pv in range(3, n_pv):               # v+, v-
                if dPV[i][pv] is None:
                    continue
                for kv, wv in _hat_terms(fv, sv, _PVAR_SIGN[pv][1]):
                    t = wv.astype(cd) * dPV[i][pv]
                    dru[kv] = t if dru.get(kv) is None else dru[kv] + t
            for kv, g in dru.items():
                for ku, wu in wu0:
                    sl = (ku + 1) * 4 + (kv + 1)
                    t = wu * g
                    dpatch[sl] = t if dpatch[sl] is None \
                        else dpatch[sl] + t
            dref = dP[b * 3 + i]
            for sl in range(16):
                v = dpatch[sl]
                dref[:, sl * C:(sl + 1) * C] = (
                    jnp.zeros((TN, C), dref.dtype) if v is None
                    else v.astype(dref.dtype))
            dline = [None] * 4
            for lv in range(n_lv):
                if dLV[i][lv] is None:
                    continue
                g = wgt.astype(cd) * dLV[i][lv]
                for kx, wx in _hat_terms(fx, sx, _LVAR_SIGN[lv]):
                    t = wx.astype(cd) * g
                    dline[kx + 1] = t if dline[kx + 1] is None \
                        else dline[kx + 1] + t
            lref = dL[b * 3 + i]
            for sl in range(4):
                v = dline[sl]
                lref[:, sl * C:(sl + 1) * C] = (
                    jnp.zeros((TN, C), lref.dtype) if v is None
                    else v.astype(lref.dtype))


def _build_bwd(S, N, TN, B, C, E, H, O, cd, sigmas, mapping, interpret):
    grid = (N // TN,)
    const = lambda shape: pl.BlockSpec(shape,
                                       lambda t: tuple(0 for _ in shape))
    p_spec = pl.BlockSpec((TN, 16 * C), lambda t: (t, 0))
    l_spec = pl.BlockSpec((TN, 4 * C), lambda t: (t, 0))
    pe_spec = pl.BlockSpec((TN, E), lambda t: (t, 0))
    in_specs = [pl.BlockSpec((TN, 2 * FS), lambda t: (t, 0))]
    in_specs.append(pl.BlockSpec((TN, _vw(S, C)), lambda t: (t, 0)))
    in_specs.append(pe_spec)
    in_specs.append(const((S, 4, E)))
    in_specs += [const((_xw(C, E), H)), const((1, H)), const((H, O))]
    if S > 1:
        in_specs.append(const((1, H)))
    in_specs.append(pl.BlockSpec((TN, O), lambda t: (t, 0)))
    if S > 1:
        in_specs.append(pl.BlockSpec((S - 1, TN), lambda t: (0, t)))

    out_shapes = ([jax.ShapeDtypeStruct((N, 16 * C), cd)] * (3 * B)
                  + [jax.ShapeDtypeStruct((N, 4 * C), cd)] * (3 * B)
                  + [jax.ShapeDtypeStruct((N, E), jnp.float32),
                     jax.ShapeDtypeStruct((_xw(C, E), H), jnp.float32),
                     jax.ShapeDtypeStruct((1, H), jnp.float32),
                     jax.ShapeDtypeStruct((H, O), jnp.float32)])
    out_specs = ([p_spec] * (3 * B) + [l_spec] * (3 * B)
                 + [pe_spec, const((_xw(C, E), H)), const((1, H)),
                    const((H, O))])
    if S > 1:
        out_shapes.append(jax.ShapeDtypeStruct((1, H), jnp.float32))
        out_specs.append(const((1, H)))
    kern = functools.partial(_bwd_kernel, S=S, TN=TN, B=B, C=C, E=E,
                             sigmas=sigmas, mapping=mapping, cd=cd)
    return pl.pallas_call(
        kern, grid=grid, in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((S * TN, _xw(C, E)), cd),
                        pltpu.VMEM((S * TN, _xw(C, E)), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary',),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret)


# ---------------------------------------------------------------------------
# public op with custom VJP
# ---------------------------------------------------------------------------

def _pad_rows(x, n_pad):
    if x.shape[0] == n_pad:
        return x
    pad = [(0, n_pad - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad)


def _w0big(w0_parts, H, cd):
    """Layer-0 weights in X-row order: contiguous [3C+E, H] zero-padded
    to the vreg-aligned scratch width (pad rows are zero, so the pad
    lanes of X never reach z)."""
    rows = list(w0_parts)                    # 3x [C,H] + [E,H]
    k = sum(w.shape[0] for w in rows)
    pad = -(-k // SLOT) * SLOT - k
    if pad:
        rows.append(jnp.zeros((pad, H), rows[0].dtype))
    return jnp.concatenate(rows, axis=0).astype(cd)


def _prep(static, pp, lp, fr, pe, rot, w0_parts, b0, w1):
    S, TN, cd_name, B, C, sigmas, interpret = static
    cd = jnp.dtype(cd_name)
    n = fr.shape[0]
    n_pad = -(-n // TN) * TN
    H = w1.shape[0]
    O = w1.shape[1]
    E = pe.shape[-1]
    mapping = MAPPING7 if S == 7 else MAPPING1
    args = [_pad_rows(fr.astype(jnp.float32), n_pad)]
    args += [_pad_rows(x.astype(cd), n_pad) for x in pp]
    args += [_pad_rows(x.astype(cd), n_pad) for x in lp]
    args.append(_pad_rows(pe.astype(cd), n_pad))
    args.append(rot.astype(jnp.float32))
    args += [_w0big(w0_parts, H, cd),
             b0.reshape(1, H).astype(jnp.float32), w1.astype(cd)]
    if S > 1:
        args.append(w1[:, 0].reshape(1, H).astype(cd))
    return cd, n, n_pad, E, H, O, mapping, args


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _head(static, pp, lp, fr, pe, rot, w0_parts, b0, w1):
    # primal-only path: no saved-variant output (inference/eval calls
    # would otherwise write ~450MB/step of dead residuals)
    S, TN, cd_name, B, C, sigmas, interpret = static
    cd, n, n_pad, E, H, O, mapping, args = _prep(
        static, pp, lp, fr, pe, rot, w0_parts, b0, w1)
    outs = _build_fwd(S, n_pad, TN, B, C, E, H, O, cd, sigmas, mapping,
                      interpret)(*args)
    if S > 1:
        return (outs[0][:n], outs[1][:, :n])
    return (outs[0][:n], None)


def _head_fwd(static, pp, lp, fr, pe, rot, w0_parts, b0, w1):
    S, TN, cd_name, B, C, sigmas, interpret = static
    cd, n, n_pad, E, H, O, mapping, args = _prep(
        static, pp, lp, fr, pe, rot, w0_parts, b0, w1)
    fwd = _build_fwd(S, n_pad, TN, B, C, E, H, O, cd, sigmas, mapping,
                     interpret, save_v=True)
    outs = fwd(*args)
    if S > 1:
        res = (outs[0][:n], outs[1][:, :n])
    else:
        res = (outs[0][:n], None)
    # V stays padded to the tile multiple — the backward reuses it as-is
    return res, (fr, pe, rot, w0_parts, b0, w1, outs[-1])


def _head_bwd(static, residuals, cot):
    S, TN, cd_name, B, C, sigmas, interpret = static
    fr, pe, rot, w0_parts, b0, w1, v_saved = residuals
    cd = jnp.dtype(cd_name)
    n = fr.shape[0]
    n_pad = -(-n // TN) * TN
    H = w1.shape[0]
    O = w1.shape[1]
    E = pe.shape[-1]
    mapping = MAPPING7 if S == 7 else MAPPING1
    args = [_pad_rows(fr.astype(jnp.float32), n_pad), v_saved,
            _pad_rows(pe.astype(cd), n_pad), rot.astype(jnp.float32),
            _w0big(w0_parts, H, cd),
            b0.reshape(1, H).astype(jnp.float32), w1.astype(cd)]
    if S > 1:
        args.append(w1[:, 0].reshape(1, H).astype(cd))
    g_c, g_off = cot
    args.append(_pad_rows(g_c.astype(jnp.float32), n_pad))
    if S > 1:
        g = g_off.astype(jnp.float32)
        if g.shape[1] != n_pad:
            g = jnp.pad(g, [(0, 0), (0, n_pad - g.shape[1])])
        args.append(g)
    bwd = _build_bwd(S, n_pad, TN, B, C, E, H, O, cd, sigmas, mapping,
                     interpret)
    outs = bwd(*args)
    k = 0
    dpp = tuple(outs[k + j][:n].astype(cd) for j in range(3 * B))
    k += 3 * B
    dlp = tuple(outs[k + j][:n].astype(cd) for j in range(3 * B))
    k += 3 * B
    dpe = outs[k][:n].astype(pe.dtype); k += 1
    dw0big = outs[k]; k += 1
    dw0 = []
    off = 0
    for w in w0_parts:
        dw0.append(dw0big[off:off + w.shape[0]].astype(w.dtype))
        off += w.shape[0]
    db0 = outs[k][0].astype(b0.dtype); k += 1
    dw1 = outs[k].astype(w1.dtype); k += 1
    if S > 1:
        dw1 = dw1.at[:, 0].add(outs[k][0].astype(w1.dtype))
    dfr = jnp.zeros_like(fr)    # fracs/sigmas are stop-gradient coords
    # rot is a pure function of static stencil offsets — no grads
    return (dpp, dlp, dfr, dpe, jnp.zeros_like(rot), tuple(dw0), db0,
            dw1)


_head.defvjp(_head_fwd, _head_bwd)


def _static_cfg(S, pp, lp, fr, sigmas, tile, interpret):
    cd = pp[0].dtype if pp[0].dtype == jnp.bfloat16 else jnp.float32
    B = len(sigmas)
    C = pp[0].shape[-1] // 16
    return (S, tile, jnp.dtype(cd).name, B, C, tuple(sigmas), interpret)


def stencil_head(pp, lp, fr, sigmas, pe_c, pe_rot, w0_parts: Sequence,
                 b0, w1, b1, tile: int = 256, interpret: bool = False):
    """7-point stencil MLP head on patch-gather inputs.

    pp/lp: per-branch-per-plane patch lists (flattened, b-major) from
    vm_patch_gather; fr [N, 2*FRAC_STRIDE]; sigmas static per-branch
    shifts (or None entries for dynamic mips); pe_c [N, E] CENTER-point
    embedding + pe_rot [7, 4, E] linear-combination table (the kernel
    derives the 6 offset-point PEs via trig addition — see
    tenso_sdf._pe_rot_table); w0_parts = (w0a, w0b, w0c, w0pe) row-splits
    of layer-0 weights; b0 [H]; w1 [H, O]; b1 [O].
    Returns (out_center [N, O], sdf_off [6, N]); biases applied outside
    the kernel (their grads are free cotangent sums in XLA)."""
    static = _static_cfg(7, pp, lp, fr, sigmas, tile, interpret)
    out_c, out_off = _head(static, tuple(pp), tuple(lp), fr, pe_c, pe_rot,
                           tuple(w0_parts), b0, w1)
    return out_c + b1[None, :], out_off + b1[0]


def point_head(pp, lp, fr, sigmas, pe, w0_parts: Sequence, b0, w1, b1,
               tile: int = 256, interpret: bool = False):
    """Single-point MLP head (center taps only): pe [N, E] -> [N, O]."""
    static = _static_cfg(1, pp, lp, fr, sigmas, tile, interpret)
    rot = jnp.zeros((1, 4, pe.shape[-1]), jnp.float32)  # unused for S=1
    out_c, _ = _head(static, tuple(pp), tuple(lp), fr, pe, rot,
                     tuple(w0_parts), b0, w1)
    return out_c + b1[None, :]
