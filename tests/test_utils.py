import numpy as np

from stereo_semantic_vo_tpu.core.config import VOConfig, ORBConfig, CameraConfig
from stereo_semantic_vo_tpu.engine.state import init_state
from stereo_semantic_vo_tpu.utils.checkpoint import load_state, save_state
from stereo_semantic_vo_tpu.utils.profiling import StageTimer


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        cfg = VOConfig(
            camera=CameraConfig(width=64, height=48),
            orb=ORBConfig(max_keypoints=32),
        )
        state = init_state(cfg)
        state = state._replace(frame_idx=state.frame_idx + 5)
        p = str(tmp_path / "ckpt.npz")
        save_state(p, state)
        back = load_state(p, init_state(cfg))
        assert int(back.frame_idx) == 4
        np.testing.assert_array_equal(back.map_Xw, state.map_Xw)
        np.testing.assert_array_equal(back.map_create_id, state.map_create_id)


class TestStageTimer:
    def test_summary(self):
        t = StageTimer()
        for _ in range(3):
            with t.stage("a"):
                pass
        s = t.summary()
        assert s["a"]["n"] == 3 and s["a"]["median_s"] >= 0.0
        assert "a" in t.report()
