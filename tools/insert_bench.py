"""Sub-step latency attribution inside voxel_map.insert_points on-device.

Times each stage as its own jitted function over realistic steady-state
data: key building, probe/claim, moment accumulation scatter, threshold
logic, refit dedup, plane fit, writebacks.  Run with the chip free.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from legkilo_tpu.utils.timing import sync as _sync


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from legkilo_tpu.config import Config
    from legkilo_tpu.core import voxel_map as vmx
    from legkilo_tpu.core.plane_fit import fit_planes, point_moments
    from legkilo_tpu.core.voxel_map import (
        MapConfig, _find_or_insert_flat, _pack_moments, _probe_find_flat,
        _unpack_moments, level_size, make_map, map_config_from, voxel_key,
    )

    cfg = Config()
    cfg.voxel_map.capacity_log2 = 16
    cfg.voxel_map.insert_rounds = 1
    mc = map_config_from(cfg.voxel_map)
    L, C = mc.levels, mc.capacity
    miss = L * C

    rng = np.random.default_rng(0)
    N = 3584
    p_w = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32) * 8.0)
    var = jnp.asarray(
        np.tile(np.eye(3, dtype=np.float32)[None] * 0.01, (N, 1, 1))
    )
    mask = jnp.asarray(np.ones((N,), dtype=bool))

    vm = make_map(mc)
    # Populate the map once so probes hit occupied slots.
    vm = vmx.insert_points(vm, mc, p_w, var, mask)
    _sync(vm.occ)

    dtype = vm.mom.dtype

    def build_keys(p_w):
        keys_l, vc_l = [], []
        for lvl in range(mc.levels):
            size = level_size(mc, lvl)
            k = voxel_key(p_w, size)
            keys_l.append(k)
            vc_l.append((k.astype(dtype) + 0.5) * size)
        keys = jnp.concatenate(keys_l, axis=0)
        vc = jnp.concatenate(vc_l, axis=0)
        lvl_ids = jnp.repeat(jnp.arange(L, dtype=jnp.int32), N)
        return keys, vc, lvl_ids

    keys, vc, lvl_ids = jax.jit(build_keys)(p_w)
    mask_f = jnp.tile(mask, L)
    ptab_flat = vm.ptab.reshape(miss, vmx.PTAB_DIM)
    meta_flat = vm.meta.reshape(miss, vmx.META_DIM)
    mom_flat = jnp.concatenate(
        [vm.mom, vm.moms.astype(vm.mom.dtype)], axis=-1
    ).reshape(miss, vmx.MOM_DIM)

    def probe_only(ptab_flat, keys, lvl_ids):
        return _probe_find_flat(ptab_flat, keys, lvl_ids, mc)

    def find_or_insert(ptab_flat, keys, lvl_ids, mask_f):
        return _find_or_insert_flat(ptab_flat, keys, lvl_ids, mask_f, mc)

    def moments(p_w, vc, var):
        p_rel = jnp.tile(p_w, (L, 1)) - vc
        return jnp.concatenate(
            _pack_moments(point_moments(p_rel, jnp.tile(var, (L, 1, 1)))),
            axis=-1,
        )

    pt2, slot, ok = jax.jit(find_or_insert)(ptab_flat, keys, lvl_ids, mask_f)
    _sync(slot)
    mom_rows = jax.jit(moments)(p_w, vc, var)
    _sync(mom_rows)

    def accumulate(meta_flat, mom_flat, slot, ok, mom_rows):
        meta_at = meta_flat.at[slot].get(mode="fill", fill_value=0.0)
        contrib = ok & (meta_at[:, vmx._M_N] < float(mc.max_points_num))
        tgt = jnp.where(contrib, slot, miss)
        counts = jnp.zeros((L * N, vmx.META_DIM), dtype=dtype)
        counts = counts.at[:, vmx._M_N].set(1.0).at[:, vmx._M_NEW].set(1.0)
        meta2 = meta_flat.at[tgt].add(counts, mode="drop")
        mom2 = mom_flat.at[tgt].add(mom_rows, mode="drop")
        return meta2, mom2, tgt, contrib

    meta2, mom2, tgt, contrib = jax.jit(accumulate)(
        meta_flat, mom_flat, slot, ok, mom_rows
    )
    _sync(meta2)

    def thresholds(meta2, tgt, contrib):
        meta_t = meta2.at[tgt].get(mode="fill", fill_value=0.0)
        n_t = meta_t[:, vmx._M_N]
        init_t = meta_t[:, vmx._M_INIT] > 0.5
        init_thresh = jnp.asarray(mc.init_num, dtype=dtype)[lvl_ids]
        refit = (
            contrib
            & (n_t > init_thresh)
            & (~init_t | (meta_t[:, vmx._M_NEW] > float(mc.update_size_threshold)))
        )
        return refit, meta_t

    refit, meta_t = jax.jit(thresholds)(meta2, tgt, contrib)
    _sync(refit)

    def dedup(refit, tgt):
        cand = jnp.where(refit, tgt, miss)
        srt = jnp.sort(cand)
        first = jnp.concatenate([jnp.ones((1,), dtype=bool), srt[1:] != srt[:-1]])
        first = first & (srt < miss)
        pos = jnp.cumsum(first.astype(jnp.int32)) - 1
        pos_t = jnp.where(first & (pos < mc.refit_budget), pos, mc.refit_budget)
        return jnp.full((mc.refit_budget,), miss, dtype=jnp.int32).at[pos_t].set(
            srt, mode="drop"
        )

    fs = jax.jit(dedup)(refit, tgt)
    _sync(fs)

    def refit_fit(meta2, mom2, fs):
        meta_r = meta2.at[fs].get(mode="fill", fill_value=0.0)
        mom_r = mom2.at[fs].get(mode="fill", fill_value=0.0)
        n_r = jnp.maximum(meta_r[:, vmx._M_N], 1.0)
        fit = fit_planes(_unpack_moments(mom_r, n_r), mc.planer_threshold)
        return fit

    fit = jax.jit(refit_fit)(meta2, mom2, fs)
    _sync(fit.normal)

    def full(vm, p_w, var, mask):
        return vmx.insert_points(vm, mc, p_w, var, mask)

    fvm = jax.jit(full)(vm, p_w, var, mask)
    _sync(fvm.occ)

    reps = 30

    def timeit(label, fn, *a):
        outs = fn(*a)
        _sync(jax.tree.leaves(outs)[0])
        t0 = time.perf_counter()
        for _ in range(reps):
            outs = fn(*a)
        _sync(jax.tree.leaves(outs)[0])
        dt = (time.perf_counter() - t0) / reps * 1e3
        print(f"{label:24s} {dt:7.2f} ms")

    timeit("build_keys", jax.jit(build_keys), p_w)
    timeit("probe_only", jax.jit(probe_only), ptab_flat, keys, lvl_ids)
    timeit("find_or_insert", jax.jit(find_or_insert), ptab_flat, keys, lvl_ids, mask_f)
    timeit("moments", jax.jit(moments), p_w, vc, var)
    timeit("accumulate", jax.jit(accumulate), meta_flat, mom_flat, slot, ok, mom_rows)
    timeit("thresholds", jax.jit(thresholds), meta2, tgt, contrib)
    timeit("dedup", jax.jit(dedup), refit, tgt)
    timeit("refit_fit", jax.jit(refit_fit), meta2, mom2, fs)
    timeit("insert_points (full)", jax.jit(full), vm, p_w, var, mask)


if __name__ == "__main__":
    main()
