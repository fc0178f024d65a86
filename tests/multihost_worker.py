"""Worker process for the 2-process jax.distributed CPU test (SURVEY §4d).

Launched by tests/test_multihost.py as:  python multihost_worker.py
<process_id> <num_processes> <coordinator_addr>.  Each process owns 4
virtual CPU devices; together they form the hierarchical (dcn=2, ici=4)
mesh, over which the full fleet step runs with replica sharding and
cross-process fleet-statistics reductions (gloo CPU collectives).
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")

import numpy as np  # noqa: E402


def main() -> int:
    pid, nproc, coord = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

    from legkilo_tpu.parallel import multihost

    multihost.initialize(
        coordinator_address=coord, num_processes=nproc, process_id=pid
    )
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.local_devices()) == 4
    assert len(jax.devices()) == 4 * nproc

    mesh = multihost.hierarchical_mesh()
    assert mesh.devices.shape == (nproc, 4), mesh.devices.shape
    assert mesh.axis_names == (multihost.DCN_AXIS, multihost.ICI_AXIS)

    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from __graft_entry__ import _tiny_config, _tiny_packet

    from legkilo_tpu.core import eskf as eskf_mod
    from legkilo_tpu.core.filter import FilterParams, StaticConfig, first_frame_map
    from legkilo_tpu.core.voxel_map import map_config_from
    from legkilo_tpu.parallel.mesh import shard_batch
    from legkilo_tpu.parallel.sweep import (
        batched_carry, broadcast_packets, make_fleet_step, perturb_params,
    )

    cfg = _tiny_config(capacity_log2=8)
    scfg = StaticConfig(
        map_cfg=map_config_from(cfg.voxel_map),
        use_kin=False,
        dept_err=cfg.voxel_map.dept_err,
        beam_err=cfg.voxel_map.beam_err,
    )
    params = FilterParams(
        noise=eskf_mod.make_noise_params(cfg.eskf),
        ext_r=jnp.eye(3),
        ext_t=jnp.asarray([0.0, 0.0, 0.2]),
        g_over_acc_norm=jnp.asarray(1.0),
    )
    B = 4 * nproc  # one replica per global device

    carry = shard_batch(batched_carry(scfg, B), mesh)
    bparams = shard_batch(perturb_params(params, B, scale=0.1), mesh)

    packets = [_tiny_packet(cfg, np.random.default_rng(s)) for s in (1, 2, 3)]
    pts0 = jnp.asarray(packets[0].points).reshape(-1, 3)
    mask0 = jnp.asarray(packets[0].point_mask).reshape(-1)
    boot = jax.jit(
        jax.vmap(lambda c, p: first_frame_map(c, scfg, p, pts0, mask0),
                 in_axes=(0, 0))
    )
    carry = boot(carry, bparams)

    step = make_fleet_step(scfg, mesh=mesh)
    stats = None
    for pk in packets:
        packet = shard_batch(broadcast_packets(pk, B), mesh)
        carry, out, stats = step(carry, packet, bparams)
    jax.block_until_ready(stats)

    # Stats are replicated (P()): every process holds the cross-process
    # reduction result.  Print for the parent to compare between workers.
    mm = float(stats.mean_matched)
    sp = float(stats.pos_spread)
    mp = np.asarray(stats.mean_pos)
    print(
        f"RESULT pid={pid} matched={mm:.3f} spread={sp:.6f} "
        f"pos={mp[0]:.6f},{mp[1]:.6f},{mp[2]:.6f}",
        flush=True,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
