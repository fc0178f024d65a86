"""Pallas kernel for the deferred insert phase's per-row moment math.

The insert phase recomputes world points with each bucket's post-update
pose, propagates the world-frame point covariance, and builds the
symmetry-packed moment rows that scatter-add into the voxel tables
(KILO.cc:216-231 recompute + UpdateVoxelMap accumulation,
voxel_map.cc:185-241; the moment formulation is core/plane_fit.py).  As XLA
graphs this is ~30 small fusions over [R, 3x3]/[R, 69] tensors — on a
launch-taxed target the phase is kernel-count-bound (docs/PERF_NOTES.md
round-4 census: insert is the +3.78 ms dominant phase).  This kernel folds
all of it into ONE launch:

    p_w   = R_b p_i + t_b                         (post-update bucket pose)
    var   = (R_b E) bc (R_b E)^T
          + (R_b [p_i]x) C_rr (R_b [p_i]x)^T + C_pp
    p~    = p_w - voxel_center
    row   = [m1(3) m2(6) | s0(6) s1(18) s2(36)]   (_pack_moments order)

Layout: transposed SoA like ops/pallas/match_geom.py — every per-row
quantity is a [W, R] array so each op is a full-lane vector op.  R (the
ancestor-gated insert_row_cap) must be a multiple of the block size.

Only the scatter-adds, threshold logic, and refit stay outside (XLA
scatters; the refit has its own kernel, ops/pallas/plane_fit_rows.py).
Equivalence vs the XLA path: tests/test_insert_rows_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# par row layout: ext_r(9)
_P_EXT_R = 0
PAR_W = 16

# _SYM6 pairs over a row-major 3x3 (upper triangle) — must match
# core/voxel_map._SYM6 = (0, 1, 2, 4, 5, 8).
_SYM6_PAIRS = ((0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2))


def _moments_kernel(
    par_ref,    # [1, PAR_W] f32
    prow_ref,   # [12, bs] per-point rows: p_i(3), lidar-frame sensor cov(9)
    brow_ref,   # [30, bs] per-row bucket rows: rot(9), pos(3),
                # rot-block cov(9), pos-block cov(9) — the chain's packed
                # per-bucket output layout, gathered once per row
    key_ref,    # [3, bs] voxel key as f32 (exact for |k| < 2^24)
    size_ref,   # [1, bs] voxel edge length at the row's level
    out_ref,    # out [69, bs]: m1(3) m2(6) s0(6) s1(18) s2(36)
):
    def s(i):
        return par_ref[0, i]

    pi = [prow_ref[i : i + 1, :] for i in range(3)]
    r = [brow_ref[i : i + 1, :] for i in range(9)]
    tb = [brow_ref[9 + i : 10 + i, :] for i in range(3)]

    # p_w = rb @ p_i + pb
    pw = [
        r[3 * i + 0] * pi[0] + r[3 * i + 1] * pi[1] + r[3 * i + 2] * pi[2] + tb[i]
        for i in range(3)
    ]

    # re = rb @ ext_r (scalar ext entries)
    e = [s(_P_EXT_R + i) for i in range(9)]
    re = [None] * 9
    for i in range(3):
        for j in range(3):
            re[3 * i + j] = (
                r[3 * i + 0] * e[0 + j]
                + r[3 * i + 1] * e[3 + j]
                + r[3 * i + 2] * e[6 + j]
            )

    # rc = rb @ skew(p_i)
    sk = [
        None, -pi[2], pi[1],
        pi[2], None, -pi[0],
        -pi[1], pi[0], None,
    ]

    def skel(i, j):
        v = sk[3 * i + j]
        return 0.0 if v is None else v

    rcm = [None] * 9
    for i in range(3):
        for j in range(3):
            rcm[3 * i + j] = (
                r[3 * i + 0] * skel(0, j)
                + r[3 * i + 1] * skel(1, j)
                + r[3 * i + 2] * skel(2, j)
            )

    def sandwich_rows(m, c):
        """Rows of m @ c @ m^T for row-lists m (9) and c (3x3 rows)."""
        t = [None] * 9
        for i in range(3):
            for j in range(3):
                t[3 * i + j] = (
                    m[3 * i + 0] * c[0][j]
                    + m[3 * i + 1] * c[1][j]
                    + m[3 * i + 2] * c[2][j]
                )
        out = [None] * 9
        for i in range(3):
            for j in range(3):
                out[3 * i + j] = (
                    t[3 * i + 0] * m[3 * j + 0]
                    + t[3 * i + 1] * m[3 * j + 1]
                    + t[3 * i + 2] * m[3 * j + 2]
                )
        return out

    bc = [[prow_ref[3 + 3 * i + j : 4 + 3 * i + j, :] for j in range(3)]
          for i in range(3)]
    crr = [[brow_ref[12 + 3 * i + j : 13 + 3 * i + j, :] for j in range(3)]
           for i in range(3)]
    w1 = sandwich_rows(re, bc)
    w2 = sandwich_rows(rcm, crr)
    var = [w1[k] + w2[k] + brow_ref[21 + k : 22 + k, :] for k in range(9)]

    # p~ = p_w - voxel center; voxel center = (key + 0.5) * size
    size = size_ref[0:1, :]
    prel = [pw[i] - (key_ref[i : i + 1, :] + 0.5) * size for i in range(3)]

    # m2 / var upper triangles in _SYM6 order
    m2_6 = [prel[i] * prel[j] for (i, j) in _SYM6_PAIRS]
    v_6 = [var[3 * i + j] for (i, j) in _SYM6_PAIRS]

    rows = list(prel) + m2_6 + v_6
    for v in v_6:                       # s1[v, a] = var[v] * p~[a]
        for a in range(3):
            rows.append(v * prel[a])
    for v in v_6:                       # s2[v, q] = var[v] * m2[q]
        for q in m2_6:
            rows.append(v * q)

    out_ref[:] = jnp.concatenate(rows, axis=0)


@functools.partial(jax.jit, static_argnames=("interpret", "block"))
def moments_call(
    par, prow_t, brow_t, key_t, size_t,
    interpret=False, block=512,
):
    """One-launch packed moment rows: returns [69, R] (m1 m2 | s0 s1 s2)."""
    r = prow_t.shape[1]
    f32 = prow_t.dtype
    grid = (r // block,)

    def full_row(w):
        return pl.BlockSpec((1, w), lambda g: (0, 0), memory_space=pltpu.VMEM)

    def col(w):
        return pl.BlockSpec((w, block), lambda g: (0, g), memory_space=pltpu.VMEM)

    return pl.pallas_call(
        _moments_kernel,
        out_shape=jax.ShapeDtypeStruct((69, r), f32),
        grid=grid,
        in_specs=[
            full_row(PAR_W), col(12), col(30), col(3), col(1),
        ],
        out_specs=col(69),
        interpret=interpret,
    )(par, prow_t, brow_t, key_t, size_t)
