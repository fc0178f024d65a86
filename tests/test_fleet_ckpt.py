"""Fleet checkpoint/resume: `sweep --save_ckpt/--resume` equivalence.

The single-filter resume-equivalence contract (tests/test_checkpoint.py),
fleet edition: running a distinct-bag fleet for 2K scans must equal running
K scans, checkpointing the batched carry + per-replica params, resuming,
and running K more.  The batched carry is the same pytree as the single
filter with a leading replica axis, so the same .npz container serializes
it (cli._save_fleet_ckpt / _load_fleet_ckpt).
"""

import json

import numpy as np
import pytest

from legkilo_tpu import cli
from legkilo_tpu.io.tum import read_tum


def _last_json(capsys):
    lines = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    return json.loads(lines[-1])


def test_fleet_checkpoint_resume_equivalence(tmp_path, capsys):
    common = ["sweep", "--distinct", "2", "--duration", "2.0"]

    full_dir = tmp_path / "full"
    assert cli.main(common + ["--traj_out", str(full_dir)]) == 0
    full = _last_json(capsys)
    n_total = full["scans"]
    assert n_total > 10

    # First half, CHUNKED (exercises checkpoint after the chunked fleet
    # step too), checkpointed at step 8.
    ck = tmp_path / "fleet_ck"
    h1_dir = tmp_path / "h1"
    assert cli.main(common + [
        "--max_steps", "8", "--chunk", "4",
        "--save_ckpt", str(ck), "--traj_out", str(h1_dir),
    ]) == 0
    out1 = _last_json(capsys)
    assert out1["scans"] == 8
    assert out1["checkpoint"].endswith(".npz")

    # Second half resumes from the checkpoint and runs to stream end.
    h2_dir = tmp_path / "h2"
    assert cli.main(common + [
        "--resume", out1["checkpoint"], "--traj_out", str(h2_dir),
    ]) == 0
    out2 = _last_json(capsys)
    assert out2["resumed_at"] == 8
    assert out2["scans"] == n_total - 8
    # per-replica ATE of the resumed window stays sane
    for name, ate in out2["ate_per_replica_m"].items():
        assert ate < 0.08, f"{name}: post-resume ATE {ate} m"

    # Concatenated split trajectories == the uninterrupted run, per replica.
    for r in range(2):
        tf, pf, qf = read_tum(str(full_dir / f"sim{r}.tum"))
        t1, p1, q1 = read_tum(str(h1_dir / f"sim{r}.tum"))
        t2, p2, q2 = read_tum(str(h2_dir / f"sim{r}.tum"))
        np.testing.assert_allclose(np.concatenate([t1, t2]), tf, atol=1e-6)
        np.testing.assert_allclose(np.concatenate([p1, p2]), pf, atol=1e-6)
        np.testing.assert_allclose(np.concatenate([q1, q2]), qf, atol=1e-6)


def test_fleet_checkpoint_shape_mismatch_fails_loudly(tmp_path, capsys):
    """Resuming with a different replica count must raise, not corrupt."""
    ck = tmp_path / "ck"
    assert cli.main([
        "sweep", "--distinct", "2", "--duration", "1.2",
        "--max_steps", "4", "--save_ckpt", str(ck),
    ]) == 0
    out = _last_json(capsys)
    with pytest.raises(ValueError):
        cli.main([
            "sweep", "--distinct", "4", "--duration", "1.2",
            "--resume", out["checkpoint"],
        ])
