"""IO + pipeline integration: synthetic KITTI-layout sequence on disk."""

import os

import numpy as np
import pytest

from stereo_semantic_vo_tpu.core.config import (
    CameraConfig,
    ORBConfig,
    PnPConfig,
    StereoConfig,
    VOConfig,
)
from stereo_semantic_vo_tpu.engine.pipeline import VOPipeline
from stereo_semantic_vo_tpu.io import kitti
from tests.test_tracker import H, TX_STEP, W, render


@pytest.fixture(scope="module")
def kitti_seq(tmp_path_factory):
    """Write the synthetic two-plane sequence as a KITTI-layout dir."""
    from PIL import Image

    root = tmp_path_factory.mktemp("seq")
    os.makedirs(root / "image_2")
    os.makedirs(root / "image_3")
    os.makedirs(root / "boxes")
    n = 5
    for t in range(n):
        left, right = render(t)
        Image.fromarray(np.asarray(left).astype(np.uint8)).save(root / "image_2" / f"{t:06d}.png")
        Image.fromarray(np.asarray(right).astype(np.uint8)).save(root / "image_3" / f"{t:06d}.png")
        # offline box file (reference format: left right top bottom ints)
        with open(root / "boxes" / f"{t + 1}.txt", "w") as f:
            if t >= 1:
                f.write("10 50 10 40\n")
    np.savetxt(root / "times.txt", np.arange(n) * 0.1)
    return str(root)


CFG = VOConfig(
    camera=CameraConfig(fx=200.0, fy=200.0, cx=W / 2, cy=H / 2, bf=40.0, width=W, height=H),
    orb=ORBConfig(max_keypoints=256, n_levels=3),
    stereo=StereoConfig(max_disparity=48),
    pnp=PnPConfig(num_hypotheses=128),
)


class TestKittiIO:
    def test_sequence_paths(self, kitti_seq):
        paths = kitti.load_sequence_paths(kitti_seq)
        assert len(paths.left) == 5
        assert paths.left[0].endswith("image_2/000000.png")
        assert paths.timestamps[3] == pytest.approx(0.3)

    def test_image_load(self, kitti_seq):
        img = kitti.load_image_gray(os.path.join(kitti_seq, "image_2", "000000.png"))
        assert img.shape == (H, W) and img.dtype == np.float32

    def test_offline_boxes(self, kitti_seq):
        b, v = kitti.load_offline_boxes(os.path.join(kitti_seq, "boxes", "2.txt"), 8)
        assert v[0] and not v[1]
        # file row "10 50 10 40" = left right top bottom -> x1 y1 x2 y2
        np.testing.assert_allclose(b[0], [10, 10, 50, 40])

    def test_missing_box_file_empty(self):
        b, v = kitti.load_offline_boxes("/nonexistent/1.txt", 8)
        assert not v.any()


class TestPipelineEndToEnd:
    def test_run_writes_trajectories(self, kitti_seq, tmp_path):
        paths = kitti.load_sequence_paths(kitti_seq)
        frames = kitti.iter_frames(paths, os.path.join(kitti_seq, "boxes"), 8)
        pipe = VOPipeline(CFG, out_dir=str(tmp_path))
        summary = pipe.run(frames)
        assert summary["n_frames"] == 5
        kfile = tmp_path / "cameratrajectory_kitti.txt"
        tfile = tmp_path / "cameratrajectory_tum.txt"
        assert kfile.exists() and tfile.exists()
        poses = np.loadtxt(kfile)
        assert poses.shape == (5, 12)
        # recovered camera x-positions ~ GT lateral motion
        xs = poses[:, 3]
        gt = np.arange(5) * TX_STEP
        assert np.abs(xs - gt).max() < 0.08
        tum = np.loadtxt(tfile)
        assert tum.shape == (5, 8)
        np.testing.assert_allclose(tum[:, 0], np.arange(5) * 0.1, atol=1e-6)
