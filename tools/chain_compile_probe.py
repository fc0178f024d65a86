"""Compile-and-run probe for the suffstats Pallas chain kernel on TPU.

Measures Mosaic compile time and steady-state latency of the kernel at the
bench shape (NB=28, K=1, IMU mode).  Run with the chip free.

Usage: python tools/chain_compile_probe.py [--nb 28] [--k 1] [--kin]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from legkilo_tpu.utils.timing import sync as _sync


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nb", type=int, default=28)
    ap.add_argument("--k", type=int, default=1)
    ap.add_argument("--kin", action="store_true")
    ap.add_argument("--no-cache", action="store_true")
    ap.add_argument("--reps", type=int, default=50)
    args = ap.parse_args()

    import jax

    if not args.no_cache:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from legkilo_tpu.config import EskfConfig
    from legkilo_tpu.core import eskf as eskf_mod
    from legkilo_tpu.core.filter import FilterParams, ScanPacket
    from legkilo_tpu.core.filter import FilterCarry
    from legkilo_tpu.core.state import make_state
    from legkilo_tpu.ops.pallas.chain_stats import run_chain_stats

    nb, k = args.nb, args.k
    rng = np.random.default_rng(3)
    params = FilterParams(
        noise=eskf_mod.make_noise_params(EskfConfig()),
        ext_r=jnp.eye(3),
        ext_t=jnp.asarray([0.0, 0.0, 0.2]),
        g_over_acc_norm=jnp.asarray(1.0),
    )
    carry = FilterCarry(
        state=make_state(),
        cov=jnp.asarray(
            (lambda a: a @ a.T * 1e-4 + 1e-5 * np.eye(30))(
                rng.normal(size=(30, 30))
            ),
            dtype=jnp.float32,
        ),
        last_predict_t=jnp.float32(0.0),
        last_update_t=jnp.float32(0.0),
        vm=None,
        last_slide_pos=jnp.zeros(3),
    )
    bt = (np.arange(nb, dtype=np.float32) + 1) * 0.004
    acc = rng.normal(scale=0.05, size=(nb, k, 3)).astype(np.float32)
    acc[..., 2] += 9.81
    packet = ScanPacket(
        rebase=jnp.float32(0.0),
        end_offset=jnp.float32(nb * 0.004),
        bucket_time=jnp.asarray(bt),
        bucket_mask=jnp.ones(nb, dtype=bool),
        points=jnp.zeros((nb, 1, 3)),
        point_mask=jnp.zeros((nb, 1), dtype=bool),
        imu_time=jnp.asarray(
            np.clip(bt[:, None] - 0.001, 0, None) * np.ones((1, k), np.float32)
        ),
        imu_mask=jnp.asarray(rng.random((nb, k)) < 0.3),
        imu_acc=jnp.asarray(acc),
        imu_gyr=jnp.asarray(rng.normal(scale=0.02, size=(nb, k, 3)).astype(np.float32)),
        foot_pos=jnp.asarray(rng.normal(scale=0.2, size=(nb, k, 4, 3)).astype(np.float32)),
        foot_vel=jnp.asarray(rng.normal(scale=0.1, size=(nb, k, 4, 3)).astype(np.float32)),
        contact=jnp.asarray(rng.random((nb, k, 4)) < 0.5),
    )
    x = rng.normal(size=(nb, 40, 40)).astype(np.float32) * 0.1
    s40 = jnp.asarray(np.einsum("bij,bkj->bik", x, x))
    nmatch_b = jnp.asarray(rng.integers(0, 100, size=(nb,)), dtype=jnp.int32)

    print(f"backend={jax.default_backend()} nb={nb} k={k} kin={args.kin}", flush=True)
    t0 = time.perf_counter()
    out = run_chain_stats(
        carry, packet, params, s40, nmatch_b, use_kin=args.kin, interpret=False
    )
    _sync(out[0].cov)
    t1 = time.perf_counter()
    print(f"compile+first-run: {t1 - t0:.1f} s", flush=True)

    # CPU-interpret reference for a correctness spot-check.
    ref = run_chain_stats(
        carry, packet, params, s40, nmatch_b, use_kin=args.kin, interpret=True
    )
    err = float(jnp.max(jnp.abs(out[0].cov - ref[0].cov)))
    perr = float(jnp.max(jnp.abs(out[2] - ref[2])))
    print(f"max |cov - ref| = {err:.3e}  max |pos - ref| = {perr:.3e}", flush=True)

    for _ in range(3):
        out = run_chain_stats(
            carry, packet, params, s40, nmatch_b, use_kin=args.kin, interpret=False
        )
    _sync(out[0].cov)
    t0 = time.perf_counter()
    for _ in range(args.reps):
        out = run_chain_stats(
            carry, packet, params, s40, nmatch_b, use_kin=args.kin, interpret=False
        )
    _sync(out[0].cov)
    dt = (time.perf_counter() - t0) / args.reps * 1e3
    print(f"steady-state: {dt:.3f} ms/call", flush=True)


if __name__ == "__main__":
    main()
