"""Structural validation of the dataset-parity harness (tools/parity/).

The harness needs docker + the public bags (unavailable on this rig;
docs/PARITY.md), so this suite verifies everything verifiable *today*:
the scripts parse, every CLI invocation they make uses flags the CLI
actually accepts, the dataset names they expose map to reference configs
that load verbatim, and the evaluation path agrees with io.tum.  The day
the bags are available, the 2%-ATE check is one command.
"""

import re
import shutil
import subprocess
from pathlib import Path

import numpy as np
import pytest

from legkilo_tpu import cli
from legkilo_tpu.config import load as load_config

HARNESS = Path(__file__).resolve().parent.parent / "tools" / "parity"
REF_CONFIG_DIR = Path("/root/reference/legkilo/config")


def test_shell_scripts_parse():
    bash = shutil.which("bash")
    assert bash, "bash not available"
    for script in ("run_parity.sh", "replay_headless.sh"):
        path = HARNESS / script
        assert path.exists(), f"missing {script}"
        subprocess.run([bash, "-n", str(path)], check=True)


def _cli_accepts(argv):
    """True if the CLI's argparse accepts this argv (without executing)."""
    import argparse

    # Recreate the parser the same way main() does by monkeypatching
    # parse_args to capture the namespace and stop.
    captured = {}

    class _Stop(Exception):
        pass

    orig = argparse.ArgumentParser.parse_args

    def fake(self, args=None, namespace=None):
        ns = orig(self, argv, namespace)
        captured["ns"] = ns
        raise _Stop

    argparse.ArgumentParser.parse_args = fake
    try:
        cli.main(argv)
    except _Stop:
        return True
    except SystemExit:
        return False
    finally:
        argparse.ArgumentParser.parse_args = orig
    return False


def test_run_parity_cli_invocations_are_valid():
    """Every `python -m legkilo_tpu <cmd> --flag ...` line in run_parity.sh
    must parse against the real CLI (catches flag renames breaking the
    harness silently)."""
    text = (HARNESS / "run_parity.sh").read_text()
    calls = re.findall(
        r"python -m legkilo_tpu\s+(\w+)((?:\s+\\\n|\s+--[\w]+(?:\s+\"[^\"]*\"|\s+\S+)?)*)",
        text,
    )
    assert calls, "no CLI invocations found in run_parity.sh"
    seen = set()
    for cmd, rest in calls:
        seen.add(cmd)
        flags = re.findall(r"--(\w+)", rest)
        argv = [cmd]
        for f in flags:
            argv += [f"--{f}", "x"]
        assert _cli_accepts(argv), f"CLI rejects harness call: {argv}"
    assert {"run", "eval"} <= seen


@pytest.mark.skipif(not REF_CONFIG_DIR.exists(), reason="reference absent")
def test_dataset_names_map_to_loadable_reference_configs():
    """run_parity.sh passes $DATASET.yaml straight to both the container
    and our loader; all four documented names must load verbatim."""
    text = (HARNESS / "run_parity.sh").read_text() + (
        HARNESS / "README.md"
    ).read_text()
    for name in ("leg_fusion", "diter", "nclt", "hilti"):
        assert name in text
        cfg = load_config(str(REF_CONFIG_DIR / f"{name}.yaml"))
        assert cfg.lidar.lidar_type in (1, 2, 3)


@pytest.mark.skipif(not REF_CONFIG_DIR.exists(), reason="reference absent")
def test_replay_headless_sed_pattern_matches_reference_configs():
    """The golden-run script forces save_traj_enable via sed; the key must
    exist at line start in every reference config or the golden TUM file
    would never be written."""
    sed = (HARNESS / "replay_headless.sh").read_text()
    m = re.search(r"sed -e 's/\^([a-z_]+):", sed)
    assert m, "sed force-enable pattern not found"
    key = m.group(1)
    for name in ("leg_fusion", "diter", "nclt", "hilti"):
        text = (REF_CONFIG_DIR / f"{name}.yaml").read_text()
        assert re.search(rf"^{key}:", text, re.M), f"{key} missing in {name}"


def test_eval_cli_end_to_end(tmp_path, capsys):
    """The harness's step 3 (`eval --est --gt`) runs today: two synthetic
    TUM files -> JSON ATE line consistent with io.tum.ate_rmse."""
    from legkilo_tpu.io import tum

    rng = np.random.default_rng(0)
    t = np.arange(50) * 0.1
    pos = np.cumsum(rng.normal(size=(50, 3)) * 0.05, axis=0)
    rot = np.tile(np.eye(3), (50, 1, 1))
    est = pos + rng.normal(scale=0.01, size=pos.shape)
    gt_f, est_f = tmp_path / "gt.tum", tmp_path / "est.tum"
    with tum.TrajectoryWriter(str(gt_f)) as w:
        for i in range(50):
            w.write(t[i], rot[i], pos[i])
    with tum.TrajectoryWriter(str(est_f)) as w:
        for i in range(50):
            w.write(t[i], rot[i], est[i])
    rc = cli.main(["eval", "--est", str(est_f), "--gt", str(gt_f)])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    import json

    d = json.loads(out)
    assert 0.0 < d["ate_rmse_m"] < 0.05
