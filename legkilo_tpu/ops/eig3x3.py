"""Closed-form batched symmetric 3x3 eigendecomposition.

The reference calls Eigen::EigenSolver per voxel per refit
(/root/reference/legkilo/src/core/slam/voxel_map.cc:55-70).  On TPU we need
thousands of tiny eigenproblems per bucket, so LAPACK-style iteration is the
wrong shape — this is the standard trigonometric closed form (Smith 1961)
plus cross-product eigenvectors, fully vectorized over leading batch dims and
safe in float32.

Returns eigenvalues ascending (min, mid, max) to match the reference's
min/mid/max naming.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

_EPS = 1e-12

# Abramowitz–Stegun 4.4.46 coefficients for acos on [0, 1].
_ACOS_C = (
    1.5707963050, -0.2145988016, 0.0889789874, -0.0501743046,
    0.0308918810, -0.0170881256, 0.0066700901, -0.0012624911,
)


def acos_poly(x: jnp.ndarray) -> jnp.ndarray:
    """arccos via the A&S 4.4.46 polynomial (|err| <= 2e-8, f32-exact).

    Mosaic (Pallas TPU) has no acos lowering, so the Pallas refit kernel
    (ops/pallas/plane_fit_rows.py) needs this form; eigh3x3 uses the same
    polynomial so both paths compute identical math.
    """
    ax = jnp.clip(jnp.abs(x), 0.0, 1.0)
    poly = _ACOS_C[7]
    for c in _ACOS_C[6::-1]:
        poly = poly * ax + c
    a = jnp.sqrt(jnp.maximum(1.0 - ax, 0.0)) * poly
    return jnp.where(x < 0.0, jnp.pi - a, a)


def eigh3x3(A: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Eigendecomposition of symmetric [..., 3, 3] matrices.

    Returns (evals [..., 3] ascending, evecs [..., 3, 3] with evecs[..., :, k]
    the unit eigenvector for evals[..., k]).
    """
    dtype = A.dtype
    a00, a01, a02 = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    a11, a12, a22 = A[..., 1, 1], A[..., 1, 2], A[..., 2, 2]

    p1 = a01 * a01 + a02 * a02 + a12 * a12
    q = (a00 + a11 + a22) / 3.0
    p2 = (a00 - q) ** 2 + (a11 - q) ** 2 + (a22 - q) ** 2 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 0.0))

    diagonal = p1 < _EPS  # already (numerically) diagonal
    p_safe = jnp.where(p > _EPS, p, jnp.ones_like(p))

    eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype), A.shape)
    B = (A - q[..., None, None] * eye) / p_safe[..., None, None]
    # det(B) / 2
    detB = (
        B[..., 0, 0] * (B[..., 1, 1] * B[..., 2, 2] - B[..., 1, 2] * B[..., 2, 1])
        - B[..., 0, 1] * (B[..., 1, 0] * B[..., 2, 2] - B[..., 1, 2] * B[..., 2, 0])
        + B[..., 0, 2] * (B[..., 1, 0] * B[..., 2, 1] - B[..., 1, 1] * B[..., 2, 0])
    )
    r = jnp.clip(detB / 2.0, -1.0, 1.0)
    phi = acos_poly(r) / 3.0

    e_max = q + 2.0 * p * jnp.cos(phi)
    e_min = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    e_mid = 3.0 * q - e_max - e_min

    # Diagonal fallback: eigenvalues are the (sorted) diagonal.
    diag_vals = jnp.sort(jnp.stack([a00, a11, a22], axis=-1), axis=-1)
    evals = jnp.where(
        diagonal[..., None],
        diag_vals,
        jnp.stack([e_min, e_mid, e_max], axis=-1),
    )

    v_min = _eigvec(A, evals[..., 0])
    v_max = _eigvec(A, evals[..., 2])
    # Degenerate guard: if v_max collapsed onto v_min (e.g. repeated evals),
    # replace it with an arbitrary vector orthogonal to v_min.
    dot = jnp.sum(v_min * v_max, axis=-1, keepdims=True)
    v_max = v_max - dot * v_min
    nrm = jnp.linalg.norm(v_max, axis=-1, keepdims=True)
    fallback = _any_orthogonal(v_min)
    v_max = jnp.where(nrm > 1e-4, v_max / jnp.maximum(nrm, _EPS), fallback)
    v_mid = jnp.cross(v_max, v_min)  # completes a basis; sign is arbitrary

    evecs = jnp.stack([v_min, v_mid, v_max], axis=-1)
    return evals, evecs


def _eigvec(A: jnp.ndarray, lam: jnp.ndarray) -> jnp.ndarray:
    """Unit eigenvector of symmetric A for eigenvalue lam via row crosses."""
    eye = jnp.broadcast_to(jnp.eye(3, dtype=A.dtype), A.shape)
    M = A - lam[..., None, None] * eye
    r0, r1, r2 = M[..., 0, :], M[..., 1, :], M[..., 2, :]
    c0 = jnp.cross(r0, r1)
    c1 = jnp.cross(r0, r2)
    c2 = jnp.cross(r1, r2)
    n0 = jnp.sum(c0 * c0, axis=-1)
    n1 = jnp.sum(c1 * c1, axis=-1)
    n2 = jnp.sum(c2 * c2, axis=-1)
    best = jnp.argmax(jnp.stack([n0, n1, n2], axis=-1), axis=-1)
    cand = jnp.stack([c0, c1, c2], axis=-2)  # [..., 3, 3]
    v = jnp.take_along_axis(cand, best[..., None, None].repeat(3, -1), axis=-2)[
        ..., 0, :
    ]
    nrm = jnp.linalg.norm(v, axis=-1, keepdims=True)

    # Degenerate fallbacks.  If all row crosses vanish, lam has multiplicity
    # >= 2 and the eigenspace is the orthogonal complement of the largest row
    # of M (rank-1 case); if M itself vanishes, any unit vector works.
    rn = jnp.stack(
        [jnp.sum(r0 * r0, -1), jnp.sum(r1 * r1, -1), jnp.sum(r2 * r2, -1)], axis=-1
    )
    rbest = jnp.take_along_axis(
        M, jnp.argmax(rn, -1)[..., None, None].repeat(3, -1), axis=-2
    )[..., 0, :]
    rbest_n = jnp.linalg.norm(rbest, axis=-1, keepdims=True)
    # Scale-relative thresholds so large/small matrices behave alike.
    scale = jnp.maximum(jnp.max(rn, axis=-1, keepdims=True), _EPS)
    plane_fallback = _any_orthogonal(rbest / jnp.maximum(rbest_n, _EPS))
    sphere_fallback = jnp.zeros_like(v).at[..., 0].set(1.0)
    fallback = jnp.where(rbest_n > _EPS, plane_fallback, sphere_fallback)
    # nrm > _EPS keeps the normalization exact: a cross that passes the
    # scale-relative test but underflows the guard would otherwise yield a
    # non-unit "eigenvector" (seen with ~0 matrices in f32).
    good_cross = (nrm * nrm > 1e-12 * scale * scale) & (nrm > _EPS)
    v = jnp.where(good_cross, v / jnp.maximum(nrm, _EPS), fallback)
    return v


def _any_orthogonal(v: jnp.ndarray) -> jnp.ndarray:
    """A unit vector orthogonal to unit vector v, branch-free."""
    # Cross with whichever basis vector is least aligned with v.
    ex = jnp.zeros_like(v).at[..., 0].set(1.0)
    ey = jnp.zeros_like(v).at[..., 1].set(1.0)
    use_x = jnp.abs(v[..., 0:1]) < 0.9
    base = jnp.where(use_x, ex, ey)
    w = jnp.cross(v, base)
    return w / jnp.maximum(jnp.linalg.norm(w, axis=-1, keepdims=True), _EPS)
