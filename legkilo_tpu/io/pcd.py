"""Batched PCD map export.

Parity: PcdSaver (/root/reference/legkilo/src/common/pcd_saver.hpp) — buffer
``frames_per_file`` frames of world-frame cloud, voxel-downsample, write a
binary PCD file per batch into a timestamped session directory.  The
reference uses a dedicated writer thread; here writes happen on a
ThreadPoolExecutor so the replay loop never blocks on disk.
"""

from __future__ import annotations

import concurrent.futures
import os
import time
from typing import List, Optional

import numpy as np

from .dataset import voxel_downsample


def write_pcd(path: str, points: np.ndarray) -> None:
    """Write an xyz binary PCD v0.7 file."""
    pts = np.ascontiguousarray(points, dtype=np.float32)
    n = len(pts)
    header = (
        "# .PCD v0.7 - Point Cloud Data file format\n"
        "VERSION 0.7\n"
        "FIELDS x y z\n"
        "SIZE 4 4 4\n"
        "TYPE F F F\n"
        "COUNT 1 1 1\n"
        f"WIDTH {n}\n"
        "HEIGHT 1\n"
        "VIEWPOINT 0 0 0 1 0 0 0\n"
        f"POINTS {n}\n"
        "DATA binary\n"
    )
    with open(path, "wb") as f:
        f.write(header.encode())
        f.write(pts.tobytes())


def read_pcd(path: str) -> np.ndarray:
    """Read an xyz (binary or ascii) PCD file back into [N, 3]."""
    with open(path, "rb") as f:
        header = {}
        while True:
            line = f.readline().decode(errors="replace").strip()
            if line.startswith("#"):
                continue
            key, _, val = line.partition(" ")
            header[key] = val
            if key == "DATA":
                break
        n = int(header["POINTS"])
        if header["DATA"] == "binary":
            raw = f.read(n * 12)
            return np.frombuffer(raw, dtype=np.float32).reshape(n, 3).copy()
        pts = np.loadtxt(f, max_rows=n, dtype=np.float32)
        return pts.reshape(n, 3)


class PcdSaver:
    """Accumulate frames, downsample, write asynchronously."""

    def __init__(
        self,
        directory: str = "result/PCD",
        frames_per_file: int = 100,
        leaf_size: float = 0.1,
    ):
        stamp = time.strftime("%Y%m%d_%H%M%S")
        self.directory = os.path.join(directory, stamp)
        os.makedirs(self.directory, exist_ok=True)
        self.frames_per_file = frames_per_file
        self.leaf_size = leaf_size
        self._buffer: List[np.ndarray] = []
        self._file_idx = 0
        self._pool = concurrent.futures.ThreadPoolExecutor(max_workers=1)
        self._pending: List[concurrent.futures.Future] = []

    def save(self, cloud_world: np.ndarray, mask: Optional[np.ndarray] = None) -> None:
        pts = np.asarray(cloud_world, dtype=np.float32).reshape(-1, 3)
        if mask is not None:
            pts = pts[np.asarray(mask).reshape(-1)]
        pts = pts[np.isfinite(pts).all(axis=1) & (np.abs(pts) < 1e6).all(axis=1)]
        self._buffer.append(pts)
        if len(self._buffer) >= self.frames_per_file:
            self._flush()

    def _flush(self) -> None:
        if not self._buffer:
            return
        merged = np.concatenate(self._buffer)
        self._buffer = []
        idx = self._file_idx
        self._file_idx += 1
        leaf = self.leaf_size

        def job():
            pts, _ = voxel_downsample(merged, np.zeros(len(merged), dtype=np.float32), leaf)
            write_pcd(os.path.join(self.directory, f"map_{idx:04d}.pcd"), pts)

        self._pending.append(self._pool.submit(job))

    def close(self) -> None:
        self._flush()
        for fut in self._pending:
            fut.result()
        self._pool.shutdown()
