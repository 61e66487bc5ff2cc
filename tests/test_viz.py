import numpy as np

from stereo_semantic_vo_tpu.viz.matches import draw_boxes, draw_matches
from stereo_semantic_vo_tpu.viz.plot import plot_map_points, plot_trajectory


class TestViz:
    def test_trajectory_plot(self, tmp_path):
        p = np.cumsum(np.random.RandomState(0).uniform(0, 0.5, (30, 3)), axis=0)
        out = plot_trajectory(p, p + 0.05, str(tmp_path / "t.png"))
        assert (tmp_path / "t.png").stat().st_size > 1000

    def test_map_plot(self, tmp_path):
        pts = np.random.RandomState(1).uniform(-5, 5, (100, 3))
        out = plot_map_points(pts, np.ones(100, bool), None, str(tmp_path / "m.png"))
        assert (tmp_path / "m.png").stat().st_size > 1000

    def test_matches_plot(self, tmp_path):
        img = np.random.RandomState(2).uniform(0, 255, (48, 64)).astype(np.float32)
        uv = np.random.RandomState(3).uniform(5, 40, (20, 2)).astype(np.float32)
        draw_matches(img, img, uv, uv + 2, np.ones(20, bool), str(tmp_path / "mm.png"))
        assert (tmp_path / "mm.png").stat().st_size > 1000

    def test_boxes_plot(self, tmp_path):
        img = np.zeros((48, 64), np.float32)
        boxes = np.array([[5, 5, 25, 25]], np.float32)
        draw_boxes(img, boxes, np.ones(1, bool), out_path=str(tmp_path / "b.png"))
        assert (tmp_path / "b.png").stat().st_size > 1000
