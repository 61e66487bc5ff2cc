"""Trajectory evaluation: ATE / RPE.

The reference evaluates offline with external tools against KITTI GT pose
files (Stereo/01.txt) — SURVEY.md §4.  Here evaluation is built in:
Umeyama SE(3) alignment + RMSE (the `evo`/TUM-benchmark definition of ATE)
and relative pose error over a fixed frame delta.  Host-side numpy.
"""

from __future__ import annotations

import numpy as np


def umeyama_alignment(est: np.ndarray, gt: np.ndarray, with_scale: bool = False):
    """Least-squares rigid alignment est -> gt for (N, 3) point sets.

    Returns (R, t, s) minimizing || gt - (s R est + t) ||^2.
    """
    mu_e = est.mean(axis=0)
    mu_g = gt.mean(axis=0)
    xe = est - mu_e
    xg = gt - mu_g
    cov = xg.T @ xe / est.shape[0]
    U, d, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1.0
    R = U @ S @ Vt
    if with_scale:
        var_e = (xe**2).sum() / est.shape[0]
        s = float(np.trace(np.diag(d) @ S) / var_e)
    else:
        s = 1.0
    t = mu_g - s * R @ mu_e
    return R, t, s


def ate_rmse(est_poses: np.ndarray, gt_poses: np.ndarray, align: bool = True) -> float:
    """Absolute trajectory error (RMSE, meters) between (N, 4, 4) pose arrays."""
    p_est = est_poses[:, :3, 3]
    p_gt = gt_poses[:, :3, 3]
    if align and len(p_est) >= 3:
        R, t, s = umeyama_alignment(p_est, p_gt)
        p_est = (s * (R @ p_est.T)).T + t
    err = np.linalg.norm(p_est - p_gt, axis=1)
    return float(np.sqrt((err**2).mean()))


def kitti_segment_errors(
    est_poses: np.ndarray,
    gt_poses: np.ndarray,
    lengths: tuple[float, ...] = (100.0, 200.0, 300.0, 400.0, 500.0, 600.0, 700.0, 800.0),
    step: int = 10,
):
    """KITTI odometry devkit metric: average translational error (%) and
    rotational error (deg/m) over all subsequences of the given path lengths.

    Returns (t_err_percent, r_err_deg_per_m) averaged over all segments, or
    (nan, nan) if the trajectory is shorter than the smallest length.
    """
    # cumulative distance along GT
    d = np.zeros(len(gt_poses))
    for i in range(1, len(gt_poses)):
        d[i] = d[i - 1] + np.linalg.norm(gt_poses[i][:3, 3] - gt_poses[i - 1][:3, 3])

    def frame_at_distance(start: int, dist: float) -> int | None:
        target = d[start] + dist
        idx = np.searchsorted(d, target)
        return int(idx) if idx < len(d) else None

    t_errs, r_errs = [], []
    for start in range(0, len(gt_poses), step):
        for L in lengths:
            end = frame_at_distance(start, L)
            if end is None:
                continue
            dg = np.linalg.inv(gt_poses[start]) @ gt_poses[end]
            de = np.linalg.inv(est_poses[start]) @ est_poses[end]
            e = np.linalg.inv(dg) @ de
            t_errs.append(np.linalg.norm(e[:3, 3]) / L)
            ang = np.clip((np.trace(e[:3, :3]) - 1) / 2, -1, 1)
            r_errs.append(np.degrees(abs(np.arccos(ang))) / L)
    if not t_errs:
        return float("nan"), float("nan")
    return float(np.mean(t_errs) * 100.0), float(np.mean(r_errs))


def rpe(est_poses: np.ndarray, gt_poses: np.ndarray, delta: int = 1):
    """Relative pose error over frame delta: (trans RMSE m, rot RMSE rad)."""
    t_errs, r_errs = [], []
    for i in range(len(est_poses) - delta):
        de = np.linalg.inv(est_poses[i]) @ est_poses[i + delta]
        dg = np.linalg.inv(gt_poses[i]) @ gt_poses[i + delta]
        e = np.linalg.inv(dg) @ de
        t_errs.append(np.linalg.norm(e[:3, 3]))
        ang = np.clip((np.trace(e[:3, :3]) - 1) / 2, -1, 1)
        r_errs.append(abs(np.arccos(ang)))
    return float(np.sqrt(np.mean(np.array(t_errs) ** 2))), float(
        np.sqrt(np.mean(np.array(r_errs) ** 2))
    )
