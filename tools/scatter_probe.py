"""Microbenchmark: TPU scatter-add cost vs index uniqueness.

Hypothesis (docs/PERF_NOTES.md follow-up): XLA TPU lowers scatter with
potentially-duplicate indices to a sequential per-index loop, so the insert
phase's moment scatter-adds (~10.7k rows, duplicate voxel slots) pay ~2 ms
each; pre-reducing duplicates (sort + cumsum-diff) and scattering with
unique_indices=True should vectorize.

Run with the chip free (the tunnel serializes clients).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from legkilo_tpu.utils.timing import sync as _sync

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp


def timeit(fn, *args, reps=30):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    M, R, D = 196608, 10752, 129
    rng = np.random.default_rng(0)
    table = jnp.zeros((M, D), jnp.float32)
    rows = jnp.asarray(rng.normal(size=(R, D)), jnp.float32)
    # ~3k unique slots, heavy duplication (realistic for voxel inserts)
    idx_dup = jnp.asarray(rng.integers(0, 3000, size=R), jnp.int32)
    idx_unq = jnp.asarray(rng.permutation(M)[:R].astype(np.int32))

    @jax.jit
    def scat_dup(t, i, r):
        return t.at[i].add(r, mode="drop")

    @jax.jit
    def scat_unique_flag(t, i, r):
        return t.at[i].add(r, mode="drop", unique_indices=True)

    @jax.jit
    def sort_reduce_scat(t, i, r):
        perm = jnp.argsort(i)
        i_s = i[perm]
        r_s = r[perm]
        cs = jnp.cumsum(r_s, axis=0)
        last = jnp.concatenate([i_s[1:] != i_s[:-1], jnp.ones((1,), bool)])
        total = jnp.where(last[:, None], cs, 0.0)
        prev = jnp.concatenate(
            [jnp.zeros((1, D), r.dtype), jnp.where(last[:-1, None], cs[:-1], 0.0)]
        )
        prev = jax.lax.associative_scan(jnp.maximum, prev, axis=0)  # placeholder
        return t, i_s, total  # timing of the pieces only

    @jax.jit
    def sorted_unique_scat(t, i, r):
        # pretend rows are pre-reduced: sorted unique indices + unique flag
        perm = jnp.argsort(i)
        i_s = i[perm]
        r_s = r[perm]
        first = jnp.concatenate([jnp.ones((1,), bool), i_s[1:] != i_s[:-1]])
        tgt = jnp.where(first, i_s, M + jnp.arange(R, dtype=jnp.int32))
        return t.at[tgt].add(r_s, mode="drop", unique_indices=True)

    print(f"scatter-add dup idx         {timeit(scat_dup, table, idx_dup, rows):8.2f} ms")
    print(f"scatter-add dup idx+flag(!) {timeit(scat_unique_flag, table, idx_dup, rows):8.2f} ms")
    print(f"scatter-add unique idx      {timeit(scat_dup, table, idx_unq, rows):8.2f} ms")
    print(f"scatter-add unique idx+flag {timeit(scat_unique_flag, table, idx_unq, rows):8.2f} ms")
    print(f"sort+firstmask+uniq scatter {timeit(sorted_unique_scat, table, idx_dup, rows):8.2f} ms")

    @jax.jit
    def cumsum_rows(r):
        return jnp.cumsum(r, axis=0)

    print(f"cumsum [10752,129]          {timeit(cumsum_rows, rows):8.2f} ms")

    @jax.jit
    def sort_i(i):
        return jnp.sort(i)

    @jax.jit
    def argsort_i(i):
        return jnp.argsort(i)

    @jax.jit
    def gather_rows(r, i):
        return r[jnp.argsort(i)]

    print(f"sort [10752] i32            {timeit(sort_i, idx_dup):8.2f} ms")
    print(f"argsort [10752] i32         {timeit(argsort_i, idx_dup):8.2f} ms")
    print(f"argsort+gather rows         {timeit(gather_rows, rows, idx_dup):8.2f} ms")

    # scatter-set with duplicate identical values (threshold writeback path)
    meta = jnp.zeros((M, 5), jnp.float32)
    mrows = jnp.asarray(rng.normal(size=(R, 5)), jnp.float32)

    @jax.jit
    def scat_set(t, i, r):
        return t.at[i].set(r, mode="drop")

    print(f"scatter-set dup idx [R,5]   {timeit(scat_set, meta, idx_dup, mrows):8.2f} ms")


if __name__ == "__main__":
    main()


def donated_variants():
    import jax
    import jax.numpy as jnp
    import numpy as np
    import time

    M, R, D = 196608, 10752, 129
    rng = np.random.default_rng(0)
    rows = jnp.asarray(rng.normal(size=(R, D)), jnp.float32)
    idx_raw = rng.integers(0, 3000, size=R).astype(np.int32)
    # ~30% dropped rows (miss sentinel), like the real insert
    drop = rng.random(R) < 0.3
    idx_oob = jnp.asarray(np.where(drop, M, idx_raw), jnp.int32)
    idx_dup = jnp.asarray(idx_raw)
    meta_rows = jnp.asarray(rng.normal(size=(R, 5)), jnp.float32)

    def timeit_d(label, fn, table_shape, *args):
        t = jnp.zeros(table_shape, jnp.float32)
        t = fn(t, *args)
        _sync(t)
        t0 = time.perf_counter()
        for _ in range(30):
            t = fn(t, *args)
        _sync(t)
        print(f"{label:36s} {(time.perf_counter()-t0)/30*1e3:8.2f} ms")

    @jax.jit
    def undonated(t, i, r):
        return t.at[i].add(r, mode="drop")

    donated = jax.jit(undonated, donate_argnums=0)

    @jax.jit
    def undonated_gather_after(t, i, r):
        t = t.at[i].add(r, mode="drop")
        g = t.at[i].get(mode="fill", fill_value=0.0)
        return t + 0.0 * jnp.sum(g)

    donated_gather_after = jax.jit(
        lambda t, i, r: undonated_gather_after.__wrapped__(t, i, r),
        donate_argnums=0,
    )

    timeit_d("undonated dup-idx", undonated, (M, D), idx_dup, rows)
    timeit_d("donated   dup-idx", donated, (M, D), idx_dup, rows)
    timeit_d("donated   dup+oob idx", donated, (M, D), idx_oob, rows)
    timeit_d("donated   dup+oob + gather-after", donated_gather_after, (M, D), idx_oob, rows)

    @jax.jit
    def two_scats(t, m, i, r, mr):
        t = t.at[i].add(r, mode="drop")
        m = m.at[i].add(mr, mode="drop")
        g = m.at[i].get(mode="fill", fill_value=0.0)
        m = m.at[i].set(g, mode="drop")
        return t, m

    two_scats_d = jax.jit(
        lambda t, m, i, r, mr: two_scats.__wrapped__(t, m, i, r, mr),
        donate_argnums=(0, 1),
    )

    def timeit_2(label, fn):
        t = jnp.zeros((M, D), jnp.float32)
        m = jnp.zeros((M, 5), jnp.float32)
        t, m = fn(t, m, idx_oob, rows, meta_rows)
        _sync(t)
        t0 = time.perf_counter()
        for _ in range(30):
            t, m = fn(t, m, idx_oob, rows, meta_rows)
        _sync(t)
        print(f"{label:36s} {(time.perf_counter()-t0)/30*1e3:8.2f} ms")

    timeit_2("donated full accumulate shape", two_scats_d)


if __name__ == "__main__":
    pass
