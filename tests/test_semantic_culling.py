"""Dynamic-object culling: a moving textured patch under a detection box.

The mover translates vertically (off the horizontal epipolar lines of the
laterally-translating camera), so the epipolar test (pnpmatch.cc:103-144
semantics) must brand its matches dynamic; box margins must prevent map-point
creation on it (Tracking.cc:61, frame.cc:182-238 semantics)."""

import jax.numpy as jnp
import numpy as np

from stereo_semantic_vo_tpu.engine.state import init_state
from stereo_semantic_vo_tpu.engine.tracker import FrameInput, init_step, track_step
from tests.test_tracker import CFG, D1, DX1, DX2, H, TEX, W, render

OBJ = np.random.RandomState(7).uniform(0, 255, (40, 40)).astype(np.float32)
OBJ_X = 120
OBJ_Y0 = 30
OBJ_VY = 6  # px/frame downward — off-epipolar motion


def render_with_mover(t, detected=True):
    left, right = render(t)
    left = np.asarray(left).copy()
    right = np.asarray(right).copy()
    y = OBJ_Y0 + t * OBJ_VY
    # the object sits at the far plane's depth (disparity D1)
    left[y : y + 40, OBJ_X : OBJ_X + 40] = OBJ
    right[y : y + 40, OBJ_X - D1 : OBJ_X - D1 + 40] = OBJ
    box = np.array([[OBJ_X - 5, y - 5, OBJ_X + 45, y + 45]], np.float32)
    boxes = np.zeros((8, 4), np.float32)
    boxes[0] = box
    bv = np.zeros(8, bool)
    bv[0] = detected
    return jnp.asarray(left), jnp.asarray(right), jnp.asarray(boxes), jnp.asarray(bv)


def run(n_frames, miss_first=False):
    """miss_first simulates detector latency: the object is undetected at
    t=0 (so map points ARE created on it), detected afterwards — the scenario
    the epipolar dynamic test exists for."""
    state = init_state(CFG)
    outs = []
    for t in range(n_frames):
        left, right, boxes, bv = render_with_mover(t, detected=not (miss_first and t == 0))
        frame = FrameInput(left=left, right=right, boxes=boxes, boxes_valid=bv)
        if t == 0:
            state, out = init_step(state, frame, CFG)
        else:
            state, out = track_step(state, frame, CFG)
        outs.append(out)
    return state, outs


class TestSemanticCulling:
    def test_no_map_points_created_in_box(self):
        state, outs = run(1)
        Xw = np.asarray(state.map_Xw)
        valid = np.asarray(state.map_valid)
        # project valid init points back: all should be outside the padded box
        fx, cx, cy = CFG.camera.fx, CFG.camera.cx, CFG.camera.cy
        u = fx * Xw[:, 0] / np.maximum(Xw[:, 2], 1e-6) + cx
        v = fx * Xw[:, 1] / np.maximum(Xw[:, 2], 1e-6) + cy
        inside = (
            (u > OBJ_X - 5) & (u < OBJ_X + 45) & (v > OBJ_Y0 - 5) & (v < OBJ_Y0 + 45)
        )
        assert not (inside & valid).any()

    def test_dynamic_matches_culled_and_pose_clean(self):
        state, outs = run(5, miss_first=True)
        total_culled = sum(int(o.n_culled_dynamic) for o in outs[1:])
        assert total_culled > 0, "epipolar test never fired on the mover"
        # pose must remain accurate despite the moving object
        from tests.test_tracker import TX_STEP

        for t, out in enumerate(outs):
            assert bool(out.pnp_ok)
            pos = np.asarray(out.T_wc)[:3, 3]
            gt = np.array([t * TX_STEP, 0.0, 0.0])
            assert np.linalg.norm(pos - gt) < 0.08

    def test_culling_disabled_when_semantics_off(self):
        import dataclasses

        cfg_off = dataclasses.replace(CFG, use_semantics=False)
        state = init_state(cfg_off)
        outs = []
        for t in range(3):
            left, right, boxes, bv = render_with_mover(t)
            frame = FrameInput(left=left, right=right, boxes=boxes, boxes_valid=bv)
            if t == 0:
                state, out = init_step(state, frame, cfg_off)
            else:
                state, out = track_step(state, frame, cfg_off)
            outs.append(out)
        assert all(int(o.n_culled_dynamic) == 0 for o in outs)
