"""Windowed local BA integrated with the tracker on the synthetic scene."""

import jax.numpy as jnp
import numpy as np

from stereo_semantic_vo_tpu.engine.state import init_state
from stereo_semantic_vo_tpu.engine.tracker import FrameInput, init_step, track_step
from stereo_semantic_vo_tpu.engine.window_ba import WindowBA
from tests.test_tracker import CFG, TX_STEP, empty_boxes, render


def run_with_window_ba(n_frames, refine_every=1):
    state = init_state(CFG)
    wba = WindowBA(CFG)
    boxes, bv = empty_boxes()
    stats_log = []
    outs = []
    for t in range(n_frames):
        left, right = render(t)
        frame = FrameInput(left=left, right=right, boxes=boxes, boxes_valid=bv)
        if t == 0:
            state, out = init_step(state, frame, CFG)
        else:
            state, out = track_step(state, frame, CFG)
        wba.push(out)
        if wba.ready() and t % refine_every == 0:
            state, stats = wba.refine(state)
            stats_log.append(stats)
            out = out._replace(T_cw=state.T_cw)
        outs.append(out)
    return state, outs, stats_log


class TestWindowBA:
    def test_refine_runs_and_links_landmarks(self):
        state, outs, stats = run_with_window_ba(6)
        assert len(stats) >= 2
        # landmarks must be co-observed across frames (uid linking works)
        assert stats[-1]["n_points"] > 20
        assert stats[-1]["n_obs"] > 50

    def test_trajectory_stays_accurate(self):
        state, outs, stats = run_with_window_ba(6)
        # final refined pose still matches GT lateral motion
        T_cw = np.asarray(state.T_cw)
        T_wc = np.linalg.inv(T_cw)
        gt = np.array([5 * TX_STEP, 0.0, 0.0])
        assert np.linalg.norm(T_wc[:3, 3] - gt) < 0.06

    def test_obs_uid_stability(self):
        """A landmark matched over consecutive frames keeps one uid."""
        state, outs, _ = run_with_window_ba(4)
        u2 = np.asarray(outs[2].obs_uid)
        u3 = np.asarray(outs[3].obs_uid)
        v2 = np.asarray(outs[2].obs_valid)
        v3 = np.asarray(outs[3].obs_valid)
        shared = np.intersect1d(u2[v2], u3[v3])
        assert len(shared) > 20  # many landmarks tracked across both frames
