"""Deterministic correspondence sets for the OpenCV solver goldens.

The scene statistics mirror the tracker's operating point (KITTI intrinsics,
street-scale depths 5-60 m, ~0.5 px observation noise, 20% gross outliers
for PnP / 25% for F) so cv::solvePnPRansac and cv::findFundamentalMat are
exercised exactly where the reference runs them (pnpmatch.cc:227,336).

Run via tools/build_cv_goldens.sh; inputs + goldens are committed under
tests/fixtures/cv/.
"""

import os
import sys

import numpy as np

FX, FY, CX, CY = 718.856, 718.856, 607.1928, 185.2157

# ground-truth pose used for both sets (committed here so the Python test
# can score OpenCV's estimate and ours against the same truth)
RVEC = np.array([0.02, -0.035, 0.008])
TVEC = np.array([0.25, -0.08, 0.9])


def rodrigues(w):
    th = np.linalg.norm(w)
    if th < 1e-12:
        return np.eye(3)
    k = w / th
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * (K @ K)


def main(out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.RandomState(7)
    R = rodrigues(RVEC)

    # ---- PnP: 200 street-scale points, 0.5 px noise, 20% gross outliers ----
    N = 200
    X = np.stack(
        [rng.uniform(-20, 20, N), rng.uniform(-4, 3, N), rng.uniform(5, 60, N)],
        axis=-1,
    )
    pc = X @ R.T + TVEC
    u = FX * pc[:, 0] / pc[:, 2] + CX + rng.normal(0, 0.5, N)
    v = FY * pc[:, 1] / pc[:, 2] + CY + rng.normal(0, 0.5, N)
    out = rng.rand(N) < 0.20
    u[out] += rng.uniform(-120, 120, out.sum())
    v[out] += rng.uniform(-60, 60, out.sum())
    with open(os.path.join(out_dir, "pnp_input.txt"), "w") as f:
        f.write(f"{FX} {FY} {CX} {CY}\n")
        for i in range(N):
            f.write(f"{X[i,0]:.6f} {X[i,1]:.6f} {X[i,2]:.6f} {u[i]:.4f} {v[i]:.4f}\n")

    # ---- F: two views of the same cloud, 25% outliers ----------------------
    pc1 = X  # first camera at identity
    u1 = FX * pc1[:, 0] / pc1[:, 2] + CX + rng.normal(0, 0.5, N)
    v1 = FY * pc1[:, 1] / pc1[:, 2] + CY + rng.normal(0, 0.5, N)
    u2 = FX * pc[:, 0] / pc[:, 2] + CX + rng.normal(0, 0.5, N)
    v2 = FY * pc[:, 1] / pc[:, 2] + CY + rng.normal(0, 0.5, N)
    out2 = rng.rand(N) < 0.25
    u2[out2] += rng.uniform(-100, 100, out2.sum())
    v2[out2] += rng.uniform(-50, 50, out2.sum())
    with open(os.path.join(out_dir, "fmat_input.txt"), "w") as f:
        for i in range(N):
            f.write(f"{u1[i]:.4f} {v1[i]:.4f} {u2[i]:.4f} {v2[i]:.4f}\n")
    print(f"wrote inputs to {out_dir}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "tests/fixtures/cv")
