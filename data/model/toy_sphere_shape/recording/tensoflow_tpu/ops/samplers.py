"""Direction samplers for the Monte-Carlo shader and flow priors.

Host-side lattice construction (numpy, done once at model build) + traced
JAX direction/pdf math.  Faithful to the reference semantics:
  * Fibonacci sphere lattice      (ref: utils/base_utils.py:869-888)
  * cosine-hemisphere diffuse     (ref: network/fields.py:824-856)
  * GGX half-vector specular      (ref: network/fields.py:858-903)
  * Halton / stratified sequences (ref: utils/base_utils.py:68-83)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .brdf import distribution_ggx, tangent_frame
from .math import saturate_dot, safe_normalize

EPS = 1e-6


# ---------------------------------------------------------------------------
# host-side lattices
# ---------------------------------------------------------------------------

def fibonacci_sphere(num_samples: int, begin_elevation: float = 0):
    """Fibonacci lattice on the upper sphere (ref: base_utils.py:869-882).

    Returns (azimuths [n], elevations [n]) in radians.
    """
    ratio = (begin_elevation + 90) / 180
    num_points = int(num_samples // (1 - ratio))
    phi = (np.sqrt(5) - 1.0) / 2.0
    ns = np.arange(num_points - num_samples, num_points, dtype=np.float64)
    z = 2.0 * ns / num_points - 1.0
    azimuths = (2 * np.pi * ns * phi) % (2 * np.pi)
    elevations = np.arcsin(z)
    return azimuths, elevations


def az_el_to_points(azimuths, elevations):
    """(ref: base_utils.py:884-888)"""
    z = np.sin(elevations)
    x = np.cos(azimuths) * np.cos(elevations)
    y = np.sin(azimuths) * np.cos(elevations)
    return np.stack([x, y, z], -1)


def direction_samples_01(num_samples: int) -> np.ndarray:
    """The shader's precomputed (az,el) table scaled to [0,1]^2
    (ref: fields.py:733-742). Returns float32 [n, 2]."""
    az, el = fibonacci_sphere(num_samples, 0)
    az = az * 0.5 / np.pi
    el = 1.0 - 2.0 * el / np.pi
    return np.stack([az, el], -1).astype(np.float32)


def sphere_prior_angles_01(num_samples: int) -> np.ndarray:
    """Flow SphereSampler lattice (ref: flow.py:62-76). float32 [n, 2]."""
    begin_elevation = 1
    ratio = (begin_elevation + 90) / 180
    num_points = int(num_samples // (1 - ratio))
    phi = (np.sqrt(5) - 1.0) / 2.0
    ns = np.arange(num_points - num_samples, num_points, dtype=np.float64)
    z = 2.0 * ns / num_points - 1.0
    phis = (2 * np.pi * ns * phi) % (2 * np.pi) / (2 * np.pi)
    thetas = np.arcsin(z) / (0.5 * np.pi)
    return np.stack([phis, thetas], -1).astype(np.float32)


def halton_sequence(dim_num: int, sample_num: int) -> np.ndarray:
    """Halton low-discrepancy sequence (replaces the ghalton wheel used at
    ref: base_utils.py:68-71). Returns float32 [sample_num, dim_num]."""
    primes = [2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47, 53]
    assert dim_num <= len(primes)
    out = np.zeros((sample_num, dim_num), dtype=np.float64)
    for d in range(dim_num):
        b = primes[d]
        n = np.arange(1, sample_num + 1, dtype=np.int64)
        f = np.ones(sample_num)
        r = np.zeros(sample_num)
        nn = n.copy()
        while nn.max() > 0:
            f = f / b
            r = r + f * (nn % b)
            nn = nn // b
        out[:, d] = r
    return out.astype(np.float32)


def stratified_samples_1d(sample_num: int, rng: np.random.Generator | None = None):
    """(ref: base_utils.py:73-80)"""
    rng = rng or np.random.default_rng()
    t = np.linspace(0.0, 1.0, sample_num, dtype=np.float32)
    mids = 0.5 * (t[1:] + t[:-1])
    upper = np.concatenate([mids, t[-1:]])
    lower = np.concatenate([t[:1], mids])
    return (lower + (upper - lower) * rng.random(sample_num)).astype(np.float32)


def stratified_samples_2d(sample_num: int, rng: np.random.Generator | None = None):
    """(ref: base_utils.py:82-83)"""
    return np.stack([stratified_samples_1d(sample_num, rng),
                     stratified_samples_1d(sample_num, rng)], -1)


# ---------------------------------------------------------------------------
# traced direction sampling (dense [pn, sn, ...] layouts)
# ---------------------------------------------------------------------------

def _angles_of(directions, x, y, z):
    """(phi, theta) of ``directions`` in the (x,y,z) tangent frame
    (ref: fields.py:1035-1048)."""
    cx = jnp.sum(x[..., None, :] * directions, -1, keepdims=True)
    cy = jnp.sum(y[..., None, :] * directions, -1, keepdims=True)
    cz = jnp.clip(jnp.sum(z[..., None, :] * directions, -1, keepdims=True),
                  -1 + EPS, 1 - EPS)
    phi = (jnp.arctan2(cy, cx) + 2 * np.pi) % (2 * np.pi)
    theta = jnp.arccos(cz)
    return jnp.concatenate([phi, theta], axis=-1)


def direction_to_angle(normals, directions):
    """Public wrapper (ref: fields.py:1035-1048). normals [pn,3],
    directions [pn,sn,3] -> angles [pn,sn,2]."""
    x, y, z = tangent_frame(normals)
    return _angles_of(directions, x, y, z)


def sample_diffuse_directions(samples01, normals, view_dirs, rng=None):
    """Cosine-hemisphere sampling about each normal (ref: fields.py:824-856).

    samples01: [sn,2] (az,el) table in [0,1]; normals/view_dirs: [pn,3];
    rng: JAX PRNG key for the train-time random azimuth roll (None = eval).

    Returns (directions [pn,sn,3], angles [pn,sn,2], pdf [pn,sn,1],
             angles_half [pn,sn,2]).
    """
    pn = normals.shape[0]
    x, y, z = tangent_frame(normals)

    az = samples01[None, :, 0:1] * (2 * np.pi)   # [1,sn,1]
    el = samples01[None, :, 1:2]                 # [1,sn,1]
    el_sqrt = jnp.sqrt(el + 1e-7)
    if rng is not None:
        roll = jax.random.uniform(rng, (pn, 1, 1)) * (2 * np.pi)
        az = (az + roll) % (2 * np.pi)
    coeff_z = jnp.sqrt(1.0 - el + 1e-7)
    coeff_x = el_sqrt * jnp.cos(az)
    coeff_y = el_sqrt * jnp.sin(az)

    theta = jnp.arcsin(jnp.clip(el_sqrt, 0.0, 1.0 - EPS))
    angles = jnp.concatenate([jnp.broadcast_to(az, (pn,) + az.shape[1:]),
                              jnp.broadcast_to(theta, (pn,) + theta.shape[1:])],
                             axis=-1)

    directions = (coeff_x * x[:, None, :] + coeff_y * y[:, None, :]
                  + coeff_z * z[:, None, :])

    pdf = (saturate_dot(directions, normals[:, None, :]) / np.pi
           * (jnp.cos((1.0 - el) * np.pi / 2) * np.pi / 2))

    h = safe_normalize(directions + view_dirs[:, None, :])
    angles_half = _angles_of(h, x, y, z)
    return directions, angles, pdf, angles_half


def sample_specular_directions(samples01, normals, view_dirs, roughness,
                               rng=None):
    """GGX half-vector importance sampling (ref: fields.py:858-903).

    samples01: [sn,2]; normals/view_dirs [pn,3]; roughness [pn,1] = GGX alpha.
    Returns (directions [pn,sn,3], angles [pn,sn,2], pdf [pn,sn,1],
             angles_half [pn,sn,2]).
    """
    pn = normals.shape[0]
    x, y, z = tangent_frame(normals)
    a = roughness[:, None, :]                       # [pn,1,1]

    az = samples01[None, :, 0:1]                    # [1,sn,1]
    el = samples01[None, :, 1:2]
    phi = az * (2 * np.pi)
    cos_theta = jnp.sqrt(jnp.maximum(
        (1.0 - el) / jnp.maximum(1.0 + (a * a - 1.0) * el, EPS), EPS))
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta ** 2, EPS))

    if rng is not None:
        roll = jax.random.uniform(rng, (pn, 1, 1)) * (2 * np.pi)
        phi = (phi + roll) % (2 * np.pi)

    coeff_x = jnp.cos(phi) * sin_theta
    coeff_y = jnp.sin(phi) * sin_theta
    coeff_z = cos_theta

    angles_h = jnp.concatenate(
        [jnp.broadcast_to(phi, (pn, phi.shape[1], 1)),
         jnp.arcsin(jnp.clip(sin_theta, 0.0, 1.0 - EPS))], axis=-1)
    h = (coeff_x * x[:, None, :] + coeff_y * y[:, None, :]
         + coeff_z * z[:, None, :])

    voh = saturate_dot(view_dirs[:, None, :], h)
    directions = voh * h * 2.0 - view_dirs[:, None, :]
    angles = _angles_of(directions, x, y, z)

    noh = jnp.maximum(coeff_z, 0.0)
    pdf = (distribution_ggx(noh, a) * noh / jnp.maximum(4.0 * voh, EPS)
           * (jnp.cos((1.0 - el) * np.pi / 2) * np.pi / 2))
    return directions, angles, pdf, angles_h


def half_angles_to_directions(angles_half, normals, view_dirs):
    """Flow samples are half-vector angles; convert to outgoing directions
    with the reflection about H (ref: fields.py:1086-1108).

    angles_half: [pn,sn,2] (phi, theta) in radians; returns
    (directions [pn,sn,3], angles [pn,sn,2], hov [pn,sn,1], theta [pn,sn,1]).
    """
    phi, theta = angles_half[..., 0:1], angles_half[..., 1:2]
    x, y, z = tangent_frame(normals)
    coeff_z = jnp.cos(theta)
    coeff_x = jnp.sin(theta) * jnp.cos(phi)
    coeff_y = jnp.sin(theta) * jnp.sin(phi)
    h = (coeff_x * x[:, None, :] + coeff_y * y[:, None, :]
         + coeff_z * z[:, None, :])
    hov = saturate_dot(view_dirs[:, None, :], h)
    directions = hov * h * 2.0 - view_dirs[:, None, :]
    angles = _angles_of(directions, x, y, z)
    return directions, angles, hov, theta


def angles_to_directions(angles, normals):
    """Direct (non-half) angle -> direction in the tangent frame
    (ref: fields.py:1124-1132)."""
    phi, theta = angles[..., 0:1], angles[..., 1:2]
    x, y, z = tangent_frame(normals)
    coeff_z = jnp.cos(theta)
    coeff_x = jnp.sin(theta) * jnp.cos(phi)
    coeff_y = jnp.sin(theta) * jnp.sin(phi)
    return (coeff_x * x[:, None, :] + coeff_y * y[:, None, :]
            + coeff_z * z[:, None, :])
