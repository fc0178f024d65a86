"""Filter checkpoint/resume.

The reference has no checkpointing at all (SURVEY.md §5): its estimator
state lives in pointer-based octrees that cannot be snapshotted.  Here the
entire filter — 30-dim state, covariance, clocks, and the full voxel map —
is one pytree of dense arrays, so checkpoint/resume is a straight
serialization to a compressed .npz (orbax is deliberately not used: this is
a single-host, single-pytree snapshot with no sharding to preserve, and npz
keeps the file a one-command inspectable artifact).

``extras`` carries the host-side resume state the runner needs beyond the
device carry (init-derived scale, packetizer clocks, pending events) — see
runner.OdometryRunner.save_checkpoint.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.filter import FilterCarry

_EXTRA_PREFIX = "x_"


def _flatten(carry: FilterCarry) -> dict:
    out = {}
    leaves, treedef = jax.tree.flatten(carry)
    for i, leaf in enumerate(leaves):
        out[f"leaf_{i:03d}"] = np.asarray(leaf)
    return out


def _unflatten(carry_like: FilterCarry, data: dict) -> FilterCarry:
    leaves, treedef = jax.tree.flatten(carry_like)
    new_leaves = []
    for i, leaf in enumerate(leaves):
        arr = data[f"leaf_{i:03d}"]
        if arr.shape != leaf.shape:
            raise ValueError(
                f"checkpoint leaf {i} shape {arr.shape} != expected {leaf.shape} "
                "(config mismatch?)"
            )
        new_leaves.append(jnp.asarray(arr, dtype=leaf.dtype))
    return jax.tree.unflatten(treedef, new_leaves)


def save(
    path: str,
    carry: FilterCarry,
    step: Optional[int] = None,
    extras: Optional[Dict[str, np.ndarray]] = None,
) -> str:
    """Save a filter checkpoint.  Returns the written path."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    data = _flatten(carry)
    if step is not None:
        data["step"] = np.asarray(step)
    for k, v in (extras or {}).items():
        data[_EXTRA_PREFIX + k] = np.asarray(v)
    np.savez_compressed(path if path.endswith(".npz") else path + ".npz", **data)
    return path if path.endswith(".npz") else path + ".npz"


def load(
    path: str, carry_like: FilterCarry
) -> Tuple[FilterCarry, Optional[int], Dict[str, np.ndarray]]:
    """Restore a checkpoint into the structure of ``carry_like``.

    Returns (carry, step, extras)."""
    with np.load(path) as data:
        step = int(data["step"]) if "step" in data else None
        carry = _unflatten(carry_like, data)
        extras = {
            k[len(_EXTRA_PREFIX):]: np.asarray(data[k])
            for k in data.files
            if k.startswith(_EXTRA_PREFIX)
        }
    return carry, step, extras
