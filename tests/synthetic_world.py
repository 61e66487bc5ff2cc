"""Projective synthetic world for end-to-end VO tests.

Ray-casts a textured ground plane (y = +h) and a textured back wall
(z = z_wall) through an arbitrary camera pose — so sequences can translate
forward and rotate (yaw), unlike the integer-shift two-plane scene in
test_tracker.  Stereo pairs are rendered with a true baseline, giving exact
geometry for ATE/drift assertions.
"""

from __future__ import annotations

import numpy as np
from scipy.ndimage import map_coordinates


class PlanarWorld:
    def __init__(self, seed=0, ground_y=1.6, wall_z=40.0, tex_scale=0.18):
        from scipy.ndimage import gaussian_filter

        rng = np.random.RandomState(seed)

        def band_limited(shape):
            # multi-octave smoothed noise: structure at several scales so
            # descriptors survive projective resampling (raw noise textures
            # decorrelate at sub-pixel warps)
            acc = np.zeros(shape, np.float32)
            for sigma, w in [(1.0, 1.0), (3.0, 1.5), (8.0, 2.0)]:
                n = gaussian_filter(rng.uniform(-1, 1, shape).astype(np.float32), sigma)
                acc += w * n / (np.abs(n).max() + 1e-6)
            acc -= acc.min()
            acc *= 200.0 / acc.max()
            return (acc + 30.0).astype(np.float32)

        self.ground_tex = band_limited((2048, 2048))
        self.wall_tex = band_limited((2048, 2048))
        self.ground_y = ground_y
        self.wall_z = wall_z
        self.tex_scale = tex_scale
        # fronto-parallel facades (x_min, x_max, z): window correlation is
        # unbiased on these, unlike the foreshortened ground plane — the
        # depth structure a street scene actually provides
        self.facades = [
            (-14.0, -2.0, 9.0),
            (2.0, 15.0, 13.0),
            (-18.0, -1.0, 19.0),
            (1.0, 20.0, 26.0),
        ]
        self.facade_y = (-3.0, ground_y)

    def _sample(self, tex, u, v):
        # wraps around; u, v in "texture meters" scaled to texels
        su = np.mod(u / self.tex_scale * 8.0, tex.shape[1] - 1)
        sv = np.mod(v / self.tex_scale * 8.0, tex.shape[0] - 1)
        return map_coordinates(tex, [sv, su], order=1, mode="wrap").astype(np.float32)

    def render(self, T_wc: np.ndarray, fx, fy, cx, cy, H, W):
        """Render the view from camera-to-world pose T_wc (4x4)."""
        R = T_wc[:3, :3]
        c = T_wc[:3, 3]
        xs, ys = np.meshgrid(np.arange(W, dtype=np.float64), np.arange(H, dtype=np.float64))
        dirs_cam = np.stack([(xs - cx) / fx, (ys - cy) / fy, np.ones_like(xs)], axis=-1)
        dirs = dirs_cam @ R.T  # world-frame ray directions

        # ground plane y = ground_y (y points down): t = (gy - cy_) / dy
        dy = dirs[..., 1]
        t_g = np.where(dy > 1e-6, (self.ground_y - c[1]) / np.where(dy > 1e-6, dy, 1.0), np.inf)
        # back wall + facades (all z = const planes)
        dz = dirs[..., 2]
        dz_safe = np.where(np.abs(dz) > 1e-9, dz, 1e-9)

        t_best = t_g
        kind = np.zeros(t_g.shape, np.int8)  # 0 ground, 1 wall/facade

        def plane_hit(z_plane, x_range=None, y_range=None):
            t = (z_plane - c[2]) / dz_safe
            t = np.where((dz > 1e-6) & (t > 0.05), t, np.inf)
            if x_range is not None or y_range is not None:
                px_ = c[0] + t * dirs[..., 0]
                py_ = c[1] + t * dirs[..., 1]
                ok = np.isfinite(t)
                if x_range is not None:
                    ok &= (px_ >= x_range[0]) & (px_ <= x_range[1])
                if y_range is not None:
                    ok &= (py_ >= y_range[0]) & (py_ <= y_range[1])
                t = np.where(ok, t, np.inf)
            return t

        for xmin, xmax, z in self.facades:
            t_f = plane_hit(z, (xmin, xmax), self.facade_y)
            closer = t_f < t_best
            kind = np.where(closer, 1, kind)
            t_best = np.where(closer, t_f, t_best)
        t_w = plane_hit(self.wall_z)
        closer = t_w < t_best
        kind = np.where(closer, 1, kind)
        t_best = np.where(closer, t_w, t_best)

        t = t_best
        hit = np.isfinite(t)
        ts = np.where(hit, t, 1.0)
        px = c[0] + ts * dirs[..., 0]
        pz = c[2] + ts * dirs[..., 2]
        py = c[1] + ts * dirs[..., 1]

        g_val = self._sample(self.ground_tex, px, pz)
        w_val = self._sample(self.wall_tex, px, py + 0.13 * pz)  # decorrelate facades
        img = np.where(kind == 0, g_val, w_val)
        img = np.where(hit, img, 40.0)
        return img.astype(np.float32)

    def render_stereo(self, T_wc, fx, fy, cx, cy, H, W, baseline):
        left = self.render(T_wc, fx, fy, cx, cy, H, W)
        T_r = T_wc.copy()
        T_r[:3, 3] = T_wc[:3, 3] + T_wc[:3, :3] @ np.array([baseline, 0.0, 0.0])
        right = self.render(T_r, fx, fy, cx, cy, H, W)
        return left, right


def turning_trajectory(n, speed=0.3, yaw_rate=0.01):
    """Forward motion with constant yaw rate -> (n, 4, 4) T_wc poses."""
    poses = []
    pos = np.zeros(3)
    yaw = 0.0
    for i in range(n):
        cy_, sy = np.cos(yaw), np.sin(yaw)
        R = np.array([[cy_, 0, sy], [0, 1, 0], [-sy, 0, cy_]])
        T = np.eye(4)
        T[:3, :3] = R
        T[:3, 3] = pos
        poses.append(T.copy())
        pos = pos + R @ np.array([0.0, 0.0, speed])
        yaw += yaw_rate
    return np.stack(poses)
