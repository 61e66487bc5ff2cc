"""Trajectory recording and KITTI/TUM file output.

Same layouts as the reference's writers (Tracking::SaveTrajectoryAndDraw,
src/Tracking.cc:124-136), parseable by the same tools (evo, KITTI devkit):

* KITTI: 12 numbers per line — row-major 3x4 [Rwc | twc] — at 9 decimals.
* TUM:   ``timestamp tx ty tz qx qy qz qw`` — timestamp at 6 decimals,
  the rest at 7 (cf. Stereo/cameratrajectory_{kitti,tum}.txt samples).

Not byte-identical: the reference streams through ``setprecision(9)`` (9
*significant* digits, default C++ float format), we write fixed 9-*decimal*
notation — equivalent information, different trailing-digit layout.

Kept host-side (plain numpy + file IO): trajectory writing is the reference's
per-frame ``ofstream`` append, which must not sync the device pipeline.
"""

from __future__ import annotations

import numpy as np


def kitti_line(T_wc: np.ndarray) -> str:
    R = T_wc[:3, :3]
    t = T_wc[:3, 3]
    vals = [R[0, 0], R[0, 1], R[0, 2], t[0],
            R[1, 0], R[1, 1], R[1, 2], t[1],
            R[2, 0], R[2, 1], R[2, 2], t[2]]
    return " ".join(f"{v:.9f}" for v in vals)


def tum_line(timestamp: float, T_wc: np.ndarray) -> str:
    from stereo_semantic_vo_tpu.core import lie
    import jax.numpy as jnp

    q = np.asarray(lie.rotation_to_quaternion(jnp.asarray(T_wc[:3, :3])))
    t = T_wc[:3, 3]
    nums = " ".join(f"{v:.7f}" for v in [t[0], t[1], t[2], q[0], q[1], q[2], q[3]])
    return f"{timestamp:.6f} {nums}"


class TrajectoryWriter:
    """Append-only dual-format trajectory writer (crash preserves the prefix,
    like the reference's per-frame ofstream flushes)."""

    def __init__(self, kitti_path: str | None = None, tum_path: str | None = None):
        self.kitti_path = kitti_path
        self.tum_path = tum_path
        self.poses: list[np.ndarray] = []
        self.timestamps: list[float] = []
        self._fk = open(kitti_path, "w") if kitti_path else None
        self._ft = open(tum_path, "w") if tum_path else None

    def append(self, T_wc: np.ndarray, timestamp: float) -> None:
        T_wc = np.asarray(T_wc, np.float64)
        self.poses.append(T_wc)
        self.timestamps.append(float(timestamp))
        if self._fk:
            self._fk.write(kitti_line(T_wc) + "\n")
            self._fk.flush()
        if self._ft:
            self._ft.write(tum_line(timestamp, T_wc) + "\n")
            self._ft.flush()

    def close(self) -> None:
        if self._fk:
            self._fk.close()
        if self._ft:
            self._ft.close()

    def positions(self) -> np.ndarray:
        return np.stack([p[:3, 3] for p in self.poses]) if self.poses else np.zeros((0, 3))


def load_kitti_poses(path: str) -> np.ndarray:
    """Read a KITTI pose file (N x 12 row-major 3x4) -> (N, 4, 4)."""
    data = np.loadtxt(path).reshape(-1, 3, 4)
    n = data.shape[0]
    out = np.tile(np.eye(4), (n, 1, 1))
    out[:, :3, :4] = data
    return out
