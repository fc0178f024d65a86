"""Pallas kernel for the voxel-map refit tail (deferred insert phase).

``fit_planes`` (core/plane_fit.py) — the closed-form re-derivation of the
reference's per-voxel plane fit (init_plane,
/root/reference/legkilo/src/core/slam/voxel_map.cc:42-117) from moment
sufficient statistics — lowers to ~380 XLA entry instructions of [budget,
small] ops.  On this target the batched phases are dispatch-bound at ~8 us
per entry instruction regardless of FLOPs (docs/PERF_NOTES.md), so the refit
alone costs ~3 ms.  This kernel folds the whole fit — 3x3 eigendecomposition,
eigenvector crosses with all degenerate fallbacks, and the 6x6
plane-parameter covariance contraction — into ONE launch over transposed SoA
rows ([component, slot]), exactly the layout scheme of match_geom.py.

Mosaic has no acos/atan2 lowering, so ``phi = arccos(r)/3`` uses the
Abramowitz–Stegun 4.4.46 polynomial (|err| <= 2e-8, below f32 resolution);
ops/eig3x3.py uses the same polynomial so the XLA and Pallas paths compute
identical math (equivalence: tests/test_plane_fit_pallas.py).

Row contracts (B = refit budget, a multiple of 128):

    mom_t  [69,  B]  symmetry-packed moments (voxel_map._pack_moments)
    meta_t [4,   B]  meta rows (n, new_n, initialized, is_plane)
    par    [1,   8]  planer_threshold at [0, 0]
    out    [35,  B]  plane row (31: center_rel, normal, evals, radius,
                     plane_var upper triangle) then meta_fit row (4: n, 0,
                     1, is_plane) — the exact rows _insert_finish scatters.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...ops.eig3x3 import acos_poly

_EPS = 1e-12        # matches ops/eig3x3._EPS
_ALPHA_EPS = 1e-7   # matches core/plane_fit._ALPHA_EPS


def _cross(a, b):
    return [
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    ]


def _dot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _any_orthogonal(v):
    """Unit vector orthogonal to unit vector v (eig3x3._any_orthogonal)."""
    use_x = jnp.abs(v[0]) < 0.9
    base = [
        jnp.where(use_x, 1.0, 0.0),
        jnp.where(use_x, 0.0, 1.0),
        jnp.zeros_like(v[0]),
    ]
    w = _cross(v, base)
    nrm = jnp.sqrt(jnp.maximum(_dot(w, w), 0.0))
    inv = 1.0 / jnp.maximum(nrm, _EPS)
    return [w[i] * inv for i in range(3)]


def _eigvec(cov, lam):
    """Unit eigenvector for eigenvalue lam (eig3x3._eigvec, row-unrolled)."""
    m = [[cov[i][j] - lam if i == j else cov[i][j] for j in range(3)] for i in range(3)]
    r0, r1, r2 = m[0], m[1], m[2]
    c0 = _cross(r0, r1)
    c1 = _cross(r0, r2)
    c2 = _cross(r1, r2)
    n0 = _dot(c0, c0)
    n1 = _dot(c1, c1)
    n2 = _dot(c2, c2)
    # argmax([n0, n1, n2]) with first-max tie-breaking
    pick0 = (n0 >= n1) & (n0 >= n2)
    pick1 = (~pick0) & (n1 >= n2)
    v = [
        jnp.where(pick0, c0[i], jnp.where(pick1, c1[i], c2[i]))
        for i in range(3)
    ]
    nrm2 = _dot(v, v)
    nrm = jnp.sqrt(jnp.maximum(nrm2, 0.0))

    rn0 = _dot(r0, r0)
    rn1 = _dot(r1, r1)
    rn2 = _dot(r2, r2)
    rp0 = (rn0 >= rn1) & (rn0 >= rn2)
    rp1 = (~rp0) & (rn1 >= rn2)
    rbest = [
        jnp.where(rp0, r0[i], jnp.where(rp1, r1[i], r2[i]))
        for i in range(3)
    ]
    rbest_n = jnp.sqrt(jnp.maximum(_dot(rbest, rbest), 0.0))
    inv_rb = 1.0 / jnp.maximum(rbest_n, _EPS)
    plane_fb = _any_orthogonal([rbest[i] * inv_rb for i in range(3)])
    has_row = rbest_n > _EPS
    fallback = [
        jnp.where(has_row, plane_fb[0], jnp.ones_like(rbest_n)),
        jnp.where(has_row, plane_fb[1], jnp.zeros_like(rbest_n)),
        jnp.where(has_row, plane_fb[2], jnp.zeros_like(rbest_n)),
    ]
    scale = jnp.maximum(jnp.maximum(rn0, jnp.maximum(rn1, rn2)), _EPS)
    good = (nrm2 > 1e-12 * scale * scale) & (nrm > _EPS)
    inv_n = 1.0 / jnp.maximum(nrm, _EPS)
    return [jnp.where(good, v[i] * inv_n, fallback[i]) for i in range(3)]


def _sym6(i, j):
    """Index of (i, j) within the packed upper triangle of a sym 3x3."""
    i, j = min(i, j), max(i, j)
    return {(0, 0): 0, (0, 1): 1, (0, 2): 2, (1, 1): 3, (1, 2): 4, (2, 2): 5}[
        (i, j)
    ]


def _fit_kernel(par_ref, mom_ref, meta_ref, out_ref):
    f32 = mom_ref.dtype

    def mr(i):
        return mom_ref[i : i + 1, :]

    threshold = par_ref[0, 0]
    n = jnp.maximum(meta_ref[0:1, :], 1.0)
    inv_n = 1.0 / n
    # Packed row layout (voxel_map._pack_moments): m1 @0, m2 sym6 @3,
    # s0 sym6 @9, s1 @15 (sym6 x 3), s2 @33 (sym6 x sym6).
    cr = [mr(i) * inv_n for i in range(3)]
    s0 = [[mr(9 + _sym6(i, j)) for j in range(3)] for i in range(3)]

    cov = [[None] * 3 for _ in range(3)]
    for i in range(3):
        for j in range(i, 3):
            cov[i][j] = mr(3 + _sym6(i, j)) * inv_n - cr[i] * cr[j]
            cov[j][i] = cov[i][j]

    # ---- eigenvalues (eig3x3.eigh3x3, acos via shared polynomial) ----
    p1s = cov[0][1] ** 2 + cov[0][2] ** 2 + cov[1][2] ** 2
    q = (cov[0][0] + cov[1][1] + cov[2][2]) / 3.0
    p2 = (cov[0][0] - q) ** 2 + (cov[1][1] - q) ** 2 + (cov[2][2] - q) ** 2 + 2.0 * p1s
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 0.0))
    diagonal = p1s < _EPS
    p_safe = jnp.where(p > _EPS, p, 1.0)
    inv_p = 1.0 / p_safe
    b = [[((cov[i][j] - q) if i == j else cov[i][j]) * inv_p for j in range(3)] for i in range(3)]
    detb = (
        b[0][0] * (b[1][1] * b[2][2] - b[1][2] * b[2][1])
        - b[0][1] * (b[1][0] * b[2][2] - b[1][2] * b[2][0])
        + b[0][2] * (b[1][0] * b[2][1] - b[1][1] * b[2][0])
    )
    r = jnp.clip(detb / 2.0, -1.0, 1.0)
    phi = acos_poly(r) / 3.0
    e_max_t = q + 2.0 * p * jnp.cos(phi)
    e_min_t = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    e_mid_t = 3.0 * q - e_max_t - e_min_t

    d0, d1, d2 = cov[0][0], cov[1][1], cov[2][2]
    dmin = jnp.minimum(jnp.minimum(d0, d1), d2)
    dmax = jnp.maximum(jnp.maximum(d0, d1), d2)
    dmid = d0 + d1 + d2 - dmin - dmax
    lam_min = jnp.where(diagonal, dmin, e_min_t)
    lam_mid = jnp.where(diagonal, dmid, e_mid_t)
    lam_max = jnp.where(diagonal, dmax, e_max_t)

    v_min = _eigvec(cov, lam_min)
    v_max = _eigvec(cov, lam_max)
    dot = _dot(v_min, v_max)
    v_max = [v_max[i] - dot * v_min[i] for i in range(3)]
    nrm = jnp.sqrt(jnp.maximum(_dot(v_max, v_max), 0.0))
    fb = _any_orthogonal(v_min)
    inv = 1.0 / jnp.maximum(nrm, _EPS)
    ok = nrm > 1e-4
    v_max = [jnp.where(ok, v_max[i] * inv, fb[i]) for i in range(3)]
    v_mid = _cross(v_max, v_min)

    is_plane = lam_min < threshold
    is_plane_f = jnp.where(is_plane, 1.0, 0.0).astype(f32)

    # ---- plane_var (fit_planes contraction, scalar-unrolled) ----
    evecs = [v_min, v_mid, v_max]  # columns
    lams = [lam_min, lam_mid, lam_max]
    alphas = []
    bs = []
    for k in (1, 2):
        e_m = evecs[k]
        denom = n * (lam_min - lams[k])
        denom = jnp.where(jnp.abs(denom) < _ALPHA_EPS, -_ALPHA_EPS, denom)
        alphas.append(1.0 / denom)
        bmat = [[e_m[i] * v_min[j] + v_min[i] * e_m[j] for j in range(3)] for i in range(3)]
        bs.append(bmat)

    # t[b,c,d,a] = s2[b,c,d,a] - s1[b,c,d] cr[a] - s1[b,c,a] cr[d]
    #              + s0[b,c] cr[d] cr[a]
    def s1v(bi, ci, di):
        return mr(15 + _sym6(bi, ci) * 3 + di)

    def s2v(bi, ci, di, ai):
        return mr(33 + _sym6(bi, ci) * 6 + _sym6(di, ai))

    def tv(bi, ci, di, ai):
        return (
            s2v(bi, ci, di, ai)
            - s1v(bi, ci, di) * cr[ai]
            - s1v(bi, ci, ai) * cr[di]
            + s0[bi][ci] * cr[di] * cr[ai]
        )

    # w_j[b,a] = sum_{c,d} b_j[c,d] t[b,c,d,a]; c_ij = sum_{a,b} b_i[a,b] w_j[b,a]
    c_mat = [[None, None], [None, None]]
    for j in range(2):
        w = [[None] * 3 for _ in range(3)]
        for bi in range(3):
            for ai in range(3):
                acc = None
                for ci in range(3):
                    for di in range(3):
                        term = bs[j][ci][di] * tv(bi, ci, di, ai)
                        acc = term if acc is None else acc + term
                w[bi][ai] = acc
        for i in range(2):
            acc = None
            for ai in range(3):
                for bi in range(3):
                    term = bs[i][ai][bi] * w[bi][ai]
                    acc = term if acc is None else acc + term
            c_mat[i][j] = acc

    # p1m[b,c,a] = s1[b,c,a] - s0[b,c] cr[a]; u_i[c] = sum_{a,b} b_i[a,b] p1m[b,c,a]
    us = []
    for i in range(2):
        u = []
        for ci in range(3):
            acc = None
            for ai in range(3):
                for bi in range(3):
                    p1m = s1v(bi, ci, ai) - s0[bi][ci] * cr[ai]
                    term = bs[i][ai][bi] * p1m
                    acc = term if acc is None else acc + term
            u.append(acc)
        us.append(u)

    e12 = [evecs[1], evecs[2]]
    t_nn = [[None] * 3 for _ in range(3)]
    t_nq = [[None] * 3 for _ in range(3)]
    for r_ in range(3):
        for s_ in range(3):
            acc_nn = None
            for i in range(2):
                for j in range(2):
                    term = alphas[i] * alphas[j] * c_mat[i][j] * e12[i][r_] * e12[j][s_]
                    acc_nn = term if acc_nn is None else acc_nn + term
            t_nn[r_][s_] = acc_nn
            acc_nq = None
            for i in range(2):
                term = alphas[i] * inv_n * e12[i][r_] * us[i][s_]
                acc_nq = term if acc_nq is None else acc_nq + term
            t_nq[r_][s_] = acc_nq

    inv_n2 = inv_n * inv_n

    def pv(r_, c_):
        # full 6x6 [[t_nn, t_nq], [t_nq^T, s0/n^2]]
        if r_ < 3 and c_ < 3:
            return t_nn[r_][c_]
        if r_ < 3:
            return t_nq[r_][c_ - 3]
        if c_ < 3:
            return t_nq[c_][r_ - 3]
        return s0[r_ - 3][c_ - 3] * inv_n2

    # symmetric upper triangle only (voxel_map plane-row packing)
    pv_rows = [
        pv(r_, c_) * is_plane_f for r_ in range(6) for c_ in range(r_, 6)
    ]

    radius = jnp.sqrt(jnp.maximum(lam_max, 0.0))
    meta_fit = [
        meta_ref[0:1, :],
        jnp.zeros_like(n),
        jnp.ones_like(n),
        is_plane_f,
    ]
    out_ref[:] = jnp.concatenate(
        cr + v_min + [lam_min, lam_mid, lam_max, radius] + pv_rows + meta_fit,
        axis=0,
    )


@functools.partial(jax.jit, static_argnames=("interpret", "block"))
def fit_rows_call(par, mom_t, meta_t, interpret=False, block=512):
    """One-launch plane refit over transposed rows; see module docstring."""
    b = mom_t.shape[1]
    f32 = mom_t.dtype
    block = min(block, b)
    grid = (b // block,)

    def full_row(w):
        return pl.BlockSpec((1, w), lambda g: (0, 0), memory_space=pltpu.VMEM)

    def col(w):
        return pl.BlockSpec((w, block), lambda g: (0, g), memory_space=pltpu.VMEM)

    return pl.pallas_call(
        _fit_kernel,
        out_shape=jax.ShapeDtypeStruct((35, b), f32),
        grid=grid,
        in_specs=[full_row(8), col(69), col(4)],
        out_specs=col(35),
        interpret=interpret,
    )(par, mom_t, meta_t)
