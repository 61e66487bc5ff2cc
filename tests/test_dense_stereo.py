import jax.numpy as jnp
import numpy as np
from scipy.signal import convolve2d

from stereo_semantic_vo_tpu.core.config import StereoConfig
from stereo_semantic_vo_tpu.kernels.median import median3x3, median5x5
from stereo_semantic_vo_tpu.ops.dense_stereo import dense_disparity

CFG = StereoConfig(max_disparity=48)


def textured(seed, H=120, W=240):
    rng = np.random.RandomState(seed)
    img = rng.uniform(0, 255, (H, W)).astype(np.float32)
    return convolve2d(img, np.ones((3, 3)) / 9.0, mode="same").astype(np.float32)


def occluded_pair(seed, H=120, W=240, x_edge=120, d_bg=5, d_fg=30):
    """Stereo pair with a real occlusion: a near surface (d_fg) right of
    ``x_edge`` overwrites the far surface's (d_bg) matches in the right
    image, so left pixels just left of the edge have no true match and the
    LR check must fail there."""
    left = textured(seed, H, W)
    rng = np.random.RandomState(seed + 1000)
    right = rng.uniform(0, 255, (H, W)).astype(np.float32)
    for x in range(W):  # ascending: the near surface overwrites (wins)
        d = d_bg if x < x_edge else d_fg
        xr = x - d
        if 0 <= xr < W:
            right[:, xr] = left[:, x]
    return left, right


class TestMedian:
    def test_median3_constant(self):
        img = jnp.full((16, 16), 7.0)
        np.testing.assert_allclose(median3x3(img), img)

    def test_median3_impulse_removed(self):
        img = np.zeros((16, 16), np.float32)
        img[8, 8] = 100.0
        out = median3x3(jnp.asarray(img))
        assert float(out[8, 8]) == 0.0

    def test_median5_impulse_removed(self):
        img = np.zeros((16, 16), np.float32)
        img[8, 8] = 100.0
        img[8, 9] = 100.0
        out = median5x5(jnp.asarray(img))
        assert float(out[8, 8]) == 0.0

    def test_median_matches_scipy(self):
        from scipy.ndimage import median_filter

        img = textured(5, 32, 32)
        ours = np.asarray(median3x3(jnp.asarray(img)))
        ref = median_filter(img, size=3, mode="nearest")
        np.testing.assert_allclose(ours[1:-1, 1:-1], ref[1:-1, 1:-1], atol=1e-5)


class TestDenseDisparity:
    def test_constant_shift(self):
        d_true = 12
        left = textured(0)
        right = np.roll(left, -d_true, axis=1)
        out = dense_disparity(jnp.asarray(left), jnp.asarray(right), CFG)
        disp = np.asarray(out.disparity)
        valid = np.asarray(out.valid)
        # interior region (outside disparity border and wrap-around edge)
        inner = np.zeros_like(valid)
        inner[5:-5, 60:-20] = True
        ok = valid & inner
        assert ok.mean() > 0.25
        err = np.abs(disp[ok] - d_true)
        assert np.median(err) < 0.5
        assert (err < 1.0).mean() > 0.9

    def test_two_plane(self):
        left = textured(1)
        H, W = left.shape
        right = np.empty_like(left)
        right[: H // 2] = np.roll(left[: H // 2], -8, axis=1)
        right[H // 2 :] = np.roll(left[H // 2 :], -24, axis=1)
        out = dense_disparity(jnp.asarray(left), jnp.asarray(right), CFG)
        disp = np.asarray(out.disparity)
        valid = np.asarray(out.valid)
        top = valid[10 : H // 2 - 5, 60:-20]
        bot = valid[H // 2 + 5 : -10, 60:-20]
        assert abs(np.median(disp[10 : H // 2 - 5, 60:-20][top]) - 8) < 0.6
        assert abs(np.median(disp[H // 2 + 5 : -10, 60:-20][bot]) - 24) < 0.6

    def test_invalid_marked(self):
        left = textured(2)
        right = np.roll(left, -30, axis=1)
        out = dense_disparity(jnp.asarray(left), jnp.asarray(right), CFG)
        disp = np.asarray(out.disparity)
        valid = np.asarray(out.valid)
        # invalid pixels carry the -1 sentinel
        assert (disp[~valid] == -1.0).all()

    def test_measured_excludes_repaired(self):
        """With refine on, `valid` includes inpainted pixels but `measured`
        only LR-consistent ones (MSA stable-pixel semantics)."""
        left, right = occluded_pair(3)
        out = dense_disparity(jnp.asarray(left), jnp.asarray(right), CFG)
        valid = np.asarray(out.valid)
        measured = np.asarray(out.measured)
        # measured is a strict subset of valid, and refinement repaired some
        assert (measured <= valid).all()
        repaired = valid & ~measured
        assert repaired.sum() > 0
        # the occluded band (left pixels [x_edge-(d_fg-d_bg), x_edge)) is
        # mostly not measured
        region = measured[10:-10, 97:118]
        assert region.mean() < 0.5

    def test_dense_sparse_mode_gates_on_measured(self):
        """Map-point depth through sparse_mode='dense' must reject keypoints
        whose disparity was inpainted by the refinement pass."""
        import dataclasses

        from stereo_semantic_vo_tpu.core import Camera, CameraConfig
        from stereo_semantic_vo_tpu.ops.stereo import sparse_disparity

        left, right = occluded_pair(4)
        cfg = dataclasses.replace(CFG, sparse_mode="dense")
        dd = dense_disparity(jnp.asarray(left), jnp.asarray(right), cfg)
        repaired = np.asarray(dd.valid) & ~np.asarray(dd.measured)
        # keep away from image borders so keypoint clipping can't move them
        repaired[:5] = repaired[-5:] = False
        repaired[:, :5] = repaired[:, -5:] = False
        ys, xs = np.nonzero(repaired)
        assert len(ys) > 0
        uv = jnp.asarray(
            np.stack([xs[:64], ys[:64]], axis=-1).astype(np.float32)
        )
        cam = Camera.from_config(CameraConfig())
        st = sparse_disparity(
            jnp.asarray(left), jnp.asarray(right), uv,
            jnp.ones(uv.shape[0], bool), cam, cfg,
        )
        assert not bool(np.asarray(st.valid).any()), (
            "repaired (inpainted) pixels must not produce valid stereo depth"
        )


class TestColorCost:
    """MSA's 3-channel color cost (MSA.cpp:78-97): channel-mean absolute
    difference.  Grayscale-isoluminant color texture is ambiguous to the
    1-channel cost but trivially matchable in color — the color path must
    recover the shift where the gray path cannot."""

    def test_isoluminant_texture_needs_color(self):
        rng = np.random.RandomState(7)
        H, W, d_true = 64, 256, 10
        # R and G carry opposite random texture; gray = (R+G+B)/3 is constant
        t = rng.uniform(0, 80, (H, W + 32)).astype(np.float32)
        rgb = np.stack([120 + t, 120 - t, np.full_like(t, 120.0)], axis=-1)
        gray = rgb.mean(axis=-1)  # constant 120 everywhere
        l_rgb, r_rgb = rgb[:, :W], rgb[:, d_true : d_true + W]
        l_g, r_g = gray[:, :W], gray[:, d_true : d_true + W]

        out_c = dense_disparity(
            jnp.asarray(l_g), jnp.asarray(r_g), CFG,
            left_rgb=jnp.asarray(l_rgb), right_rgb=jnp.asarray(r_rgb),
        )
        disp = np.asarray(out_c.disparity)
        valid = np.asarray(out_c.valid)
        inner = np.zeros_like(valid)
        inner[5:-5, 60:-40] = True
        ok = valid & inner
        assert ok.mean() > 0.2
        assert np.median(np.abs(disp[ok] - d_true)) < 0.6

        # the grayscale engine sees a constant image: nothing valid to match
        out_g = dense_disparity(jnp.asarray(l_g), jnp.asarray(r_g), CFG)
        ok_g = np.asarray(out_g.valid) & inner
        assert ok_g.mean() < 0.05
