"""Real-texture stereo sequence synthesis for full-pipeline tests.

Round-2 validation covered real *pairs* (tests/test_real_images.py); the
tracker + ATE path ran only on procedural textures.  This module manufactures
a geometrically consistent multi-frame stereo sequence whose pixels come from
a camera: the reference's vendored urban driving pairs
(/root/reference/Thirdparty/libelas/img/urban*.pgm) are lifted to a 3D point
cloud through their golden MSA disparity (tests/fixtures/msa/, generated from
the reference's own solver — tools/build_msa.sh), then z-buffer splatted into
left/right views along a synthetic KITTI-like trajectory with known
ground-truth poses.

Rendering is nearest-pixel forward splatting with a z-buffer (numpy); small
holes (disocclusions, splat gaps) are filled by a 3x3 neighborhood minimum-
depth propagation so the tracker sees dense-ish texture.  The geometry is
exact for every splatted pixel: if the pipeline is correct, PnP + BA recover
the trajectory up to the splat quantization noise.
"""

from __future__ import annotations

import numpy as np

from fixtures_io import load_fixture


def _pose_rt(yaw: float, t: np.ndarray) -> np.ndarray:
    """T_wc for a camera yawed by ``yaw`` (around y, right-handed, z forward)
    at world position t."""
    c, s = np.cos(yaw), np.sin(yaw)
    T = np.eye(4, dtype=np.float64)
    T[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
    T[:3, 3] = t
    return T


def make_trajectory(n_frames: int, step: float = 0.25, yaw_rate: float = 0.003) -> np.ndarray:
    """(N, 4, 4) float64 T_wc ground truth: gentle forward drive with a slow
    constant yaw — KITTI-like magnitudes (0.25 m / frame ~ 9 km/h at 10 Hz)."""
    poses = []
    pos = np.zeros(3)
    yaw = 0.0
    for _ in range(n_frames):
        poses.append(_pose_rt(yaw, pos.copy()))
        fwd = np.array([np.sin(yaw), 0.0, np.cos(yaw)])
        pos += step * fwd
        yaw += yaw_rate
    return np.stack(poses)


def _splat(
    Xc: np.ndarray, colors: np.ndarray, fx: float, fy: float, cx: float, cy: float,
    H: int, W: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Project camera-frame points, z-buffer splat to (H, W).  Returns
    (image float32, depth float32 with +inf holes)."""
    z = Xc[:, 2]
    keep = z > 0.5
    Xc, colors, z = Xc[keep], colors[keep], z[keep]
    u = np.round(fx * Xc[:, 0] / z + cx).astype(np.int64)
    v = np.round(fy * Xc[:, 1] / z + cy).astype(np.int64)
    inb = (u >= 0) & (u < W) & (v >= 0) & (v < H)
    u, v, z, colors = u[inb], v[inb], z[inb], colors[inb]
    flat = v * W + u
    depth = np.full(H * W, np.inf, np.float32)
    np.minimum.at(depth, flat, z.astype(np.float32))
    # winner-take-all color: keep the color whose depth matches the z-buffer
    img = np.zeros(H * W, np.float32)
    win = z.astype(np.float32) <= depth[flat] * (1 + 1e-6)
    img[flat[win]] = colors[win]
    return img.reshape(H, W), depth.reshape(H, W)


def _fill_holes(img: np.ndarray, depth: np.ndarray, iters: int = 6) -> np.ndarray:
    """Fill inf-depth holes from the nearest (minimum-depth) 3x3 neighbor —
    disocclusions inherit background texture, which is what a camera sees."""
    H, W = img.shape
    out = img.copy()
    d = depth.copy()
    for _ in range(iters):
        holes = ~np.isfinite(d)
        if not holes.any():
            break
        # gather 8-neighborhood candidates
        best_d = np.full((H, W), np.inf, np.float32)
        best_c = np.zeros((H, W), np.float32)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                sh_d = np.full((H, W), np.inf, np.float32)
                sh_c = np.zeros((H, W), np.float32)
                ys = slice(max(dy, 0), H + min(dy, 0))
                yd = slice(max(-dy, 0), H + min(-dy, 0))
                xs = slice(max(dx, 0), W + min(dx, 0))
                xd = slice(max(-dx, 0), W + min(-dx, 0))
                sh_d[yd, xd] = d[ys, xs]
                sh_c[yd, xd] = out[ys, xs]
                take = sh_d < best_d
                best_d = np.where(take, sh_d, best_d)
                best_c = np.where(take, sh_c, best_c)
        fill = holes & np.isfinite(best_d)
        out = np.where(fill, best_c, out)
        d = np.where(fill, best_d, d)
    return out


def make_real_sequence(
    fixture: str = "urban2",
    n_frames: int = 30,
    out_hw: tuple[int, int] = (376, 1241),
    step: float = 0.25,
    yaw_rate: float = 0.003,
    bf: float = 386.1448,
    fx: float = 718.856,
    cx: float = 607.1928,
    cy: float = 185.2157,
):
    """-> (lefts (N,H,W) f32, rights (N,H,W) f32, T_wc_gt (N,4,4) f64).

    The source pair's golden MSA disparity gives metric depth via the KITTI
    stereo model depth = bf/d; the cloud is rendered at each GT pose into a
    virtual stereo rig with baseline bf/fx.
    """
    H, W = out_hw
    left_src, _, _, msa = load_fixture(fixture)
    Hs, Ws = left_src.shape
    oy, ox = max((Hs - H) // 2, 0), max((Ws - W) // 2, 0)
    left_src = left_src[oy : oy + H, ox : ox + W]
    msa = msa[oy : oy + H, ox : ox + W]

    ok = msa > 1.0
    # repair invalid-disparity pixels from row medians so the cloud is dense
    row_med = np.nanmedian(np.where(ok, msa, np.nan), axis=1)
    row_med = np.where(np.isfinite(row_med), row_med, np.nanmedian(msa[ok]))
    disp = np.where(ok, msa, row_med[:, None]).astype(np.float64)
    depth = bf / np.maximum(disp, 1.0)

    vs, us = np.mgrid[0:H, 0:W]
    z = depth.ravel()
    x = (us.ravel() - cx) / fx * z
    y = (vs.ravel() - cy) / fx * z
    Xw = np.stack([x, y, z], axis=-1)  # world frame = source camera frame
    colors = left_src.ravel().astype(np.float32)

    baseline = bf / fx
    poses = make_trajectory(n_frames, step, yaw_rate)
    lefts, rights = [], []
    for T_wc in poses:
        T_cw = np.linalg.inv(T_wc)
        Xc = Xw @ T_cw[:3, :3].T + T_cw[:3, 3]
        li, ld = _splat(Xc, colors, fx, fx, cx, cy, H, W)
        Xr = Xc.copy()
        Xr[:, 0] -= baseline
        ri, rd = _splat(Xr, colors, fx, fx, cx, cy, H, W)
        lefts.append(_fill_holes(li, ld))
        rights.append(_fill_holes(ri, rd))
    return (
        np.stack(lefts).astype(np.float32),
        np.stack(rights).astype(np.float32),
        poses,
    )
