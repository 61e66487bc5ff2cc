"""Windowed local BA integrated with the tracker on the synthetic scene.

Round-4 redesign: the observation window is device-resident (VOState.win_*),
and refinement is one pure jitted call (window_ba.refine_state) with no host
assembly or syncs — usable every frame and inside a scan (round-3 verdict,
missing #4).
"""

import numpy as np

from stereo_semantic_vo_tpu.engine.state import init_state
from stereo_semantic_vo_tpu.engine.tracker import FrameInput, init_step, track_step
from stereo_semantic_vo_tpu.engine.window_ba import (
    _window_view,
    build_observations,
    refine_state,
)
from tests.test_tracker import CFG, TX_STEP, empty_boxes, render


def run_with_window_ba(n_frames, refine_every=1):
    state = init_state(CFG)
    boxes, bv = empty_boxes()
    outs = []
    for t in range(n_frames):
        left, right = render(t)
        frame = FrameInput(left=left, right=right, boxes=boxes, boxes_valid=bv)
        if t == 0:
            state, out = init_step(state, frame, CFG)
        else:
            state, out = track_step(state, frame, CFG)
        if t >= CFG.window.window_frames - 1 and t % refine_every == 0:
            state = refine_state(state, CFG)
            out = out._replace(T_cw=state.T_cw)
        outs.append(out)
    return state, outs


def final_obs(state):
    W = CFG.window.window_frames
    K = CFG.orb.max_keypoints
    _, _, win_uid, win_uv, win_valid, win_disp = _window_view(state, W, K)
    return build_observations(
        state.map_uid, state.map_valid, state.map_bad, state.frame_idx,
        win_uid, win_uv, win_valid, W, K, win_disp,
    )


class TestWindowBA:
    def test_refine_runs_and_links_landmarks(self):
        state, outs = run_with_window_ba(6)
        obs = final_obs(state)
        # landmarks must be co-observed across frames (uid linking works)
        assert int(np.asarray(obs.point_valid).sum()) > 20
        assert int(obs.n_obs) > 50

    def test_trajectory_stays_accurate(self):
        state, outs = run_with_window_ba(6)
        # final refined pose still matches GT lateral motion
        T_cw = np.asarray(state.T_cw)
        T_wc = np.linalg.inv(T_cw)
        gt = np.array([5 * TX_STEP, 0.0, 0.0])
        assert np.linalg.norm(T_wc[:3, 3] - gt) < 0.06

    def test_refine_every_frame_matches_deferred_dispatch(self):
        """refine_state is a pure function of state: dispatching it every
        frame must keep (not degrade) trajectory accuracy."""
        state, outs = run_with_window_ba(6, refine_every=1)
        state2, outs2 = run_with_window_ba(6, refine_every=2)
        T1 = np.linalg.inv(np.asarray(state.T_cw))
        T2 = np.linalg.inv(np.asarray(state2.T_cw))
        gt = np.array([5 * TX_STEP, 0.0, 0.0])
        assert np.linalg.norm(T1[:3, 3] - gt) < 0.06
        assert np.linalg.norm(T2[:3, 3] - gt) < 0.06

    def test_obs_uid_stability(self):
        """A landmark matched over consecutive frames keeps one uid."""
        state, outs = run_with_window_ba(4)
        u2 = np.asarray(outs[2].obs_uid)
        u3 = np.asarray(outs[3].obs_uid)
        v2 = np.asarray(outs[2].obs_valid)
        v3 = np.asarray(outs[3].obs_valid)
        shared = np.intersect1d(u2[v2], u3[v3])
        assert len(shared) > 20  # many landmarks tracked across both frames
