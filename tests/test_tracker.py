"""End-to-end tracker test on a synthetic two-plane scene with exact
integer-pixel camera motion (no resampling error)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from scipy.signal import convolve2d

from stereo_semantic_vo_tpu.core.config import (
    CameraConfig,
    ORBConfig,
    PnPConfig,
    StereoConfig,
    VOConfig,
)
from stereo_semantic_vo_tpu.engine.state import init_state
from stereo_semantic_vo_tpu.engine.tracker import FrameInput, init_step, track_step

H, W = 240, 320
FX = 200.0
BF = 40.0
CAM = CameraConfig(fx=FX, fy=FX, cx=W / 2, cy=H / 2, bf=BF, width=W, height=H)
CFG = VOConfig(
    camera=CAM,
    orb=ORBConfig(max_keypoints=256, n_levels=3),
    stereo=StereoConfig(max_disparity=48),
    pnp=PnPConfig(num_hypotheses=128),
)

# two fronto-parallel planes: top half at Z1, bottom half at Z2
D1, D2 = 16, 32                # integer disparities
Z1, Z2 = BF / D1, BF / D2      # 2.5 m, 1.25 m
DX1 = 2                        # px/frame shift of the far plane
TX_STEP = DX1 * Z1 / FX        # camera x-step (m) -> integer shifts on both planes
DX2 = int(round(FX * TX_STEP / Z2))  # = 4


def make_texture(seed=0):
    rng = np.random.RandomState(seed)
    tex = rng.uniform(0, 255, (H, W + 400)).astype(np.float32)
    return convolve2d(tex, np.ones((2, 2)) / 4.0, mode="same").astype(np.float32)


TEX = make_texture()


def render(t):
    """Left/right images at frame t (camera at x = t * TX_STEP)."""
    left = np.empty((H, W), np.float32)
    right = np.empty((H, W), np.float32)
    s1 = t * DX1
    s2 = t * DX2
    left[: H // 2] = TEX[: H // 2, s1 : s1 + W]
    left[H // 2 :] = TEX[H // 2 :, s2 : s2 + W]
    right[: H // 2] = TEX[: H // 2, s1 + D1 : s1 + D1 + W]
    right[H // 2 :] = TEX[H // 2 :, s2 + D2 : s2 + D2 + W]
    return jnp.asarray(left), jnp.asarray(right)


def empty_boxes(n=8):
    return jnp.zeros((n, 4), jnp.float32), jnp.zeros((n,), bool)


def run_sequence(n_frames, cfg=CFG):
    state = init_state(cfg)
    boxes, bv = empty_boxes()
    outs = []
    for t in range(n_frames):
        left, right = render(t)
        frame = FrameInput(left=left, right=right, boxes=boxes, boxes_valid=bv)
        if t == 0:
            state, out = init_step(state, frame, cfg)
        else:
            state, out = track_step(state, frame, cfg)
        outs.append(out)
    return state, outs


class TestTrackerSynthetic:
    def test_translation_recovered(self):
        n = 6
        state, outs = run_sequence(n)
        for t, out in enumerate(outs):
            assert bool(out.pnp_ok), f"frame {t} lost tracking"
            T_wc = np.asarray(out.T_wc)
            cam_pos = T_wc[:3, 3]
            gt = np.array([t * TX_STEP, 0.0, 0.0])
            err = np.linalg.norm(cam_pos - gt)
            assert err < 0.05, f"frame {t}: pos {cam_pos} vs {gt} (err {err:.3f})"
            # rotation should stay ~identity
            ang = np.arccos(np.clip((np.trace(T_wc[:3, :3]) - 1) / 2, -1, 1))
            assert ang < 0.02

    def test_match_and_map_counts(self):
        state, outs = run_sequence(4)
        assert int(outs[0].n_new_points) > 50
        for out in outs[1:]:
            assert int(out.n_matches_last) > 30
            assert int(out.n_ba_inliers) > 20
        # local-map matching kicks in once regions age past the last frame
        assert int(np.asarray(outs[-1].n_matches_map)) >= 0

    def test_window_pruning(self):
        state, _ = run_sequence(6)
        ids = np.asarray(state.map_create_id)
        valid = np.asarray(state.map_valid)
        live = valid & (ids > 6 - CFG.window.window_frames)
        # slots from expired frames must not be considered live by age mask
        assert (ids[valid] > -100).all()
        assert live.sum() > 0

    def test_stationary_camera(self):
        state = init_state(CFG)
        boxes, bv = empty_boxes()
        left, right = render(0)
        frame = FrameInput(left=left, right=right, boxes=boxes, boxes_valid=bv)
        state, _ = init_step(state, frame, CFG)
        state, out = track_step(state, frame, CFG)
        assert bool(out.pnp_ok)
        assert np.linalg.norm(np.asarray(out.T_wc)[:3, 3]) < 0.02


class TestDepthGate:
    def test_th_depth_blocks_far_points(self):
        """ThDepth (Stereo/KITTI00-02.yaml:31): points beyond th_depth
        baselines are too uncertain to seed the map.  The far plane sits at
        Z1 = 2.5 m = 12.5 baselines; gating at 10 baselines must exclude it
        while the near plane (6.25 baselines) still seeds."""
        boxes, bv = empty_boxes()
        frame = FrameInput(*render(0), boxes, bv)

        cfg_all = CFG
        cfg_near = dataclasses.replace(
            CFG, camera=dataclasses.replace(CAM, th_depth=10.0)
        )
        _, out_all = init_step(init_state(cfg_all), frame, cfg_all)
        state_near, out_near = init_step(init_state(cfg_near), frame, cfg_near)

        assert int(out_near.n_new_points) < int(out_all.n_new_points)
        # surviving creations are (essentially) all on the near bottom-half
        # plane — coarse-pyramid keypoints straddling the plane boundary may
        # inherit mixed disparities, hence the small tolerance
        uv_y = np.asarray(out_near.kp_uv)[np.asarray(out_near.obs_valid), 1]
        assert uv_y.size > 0
        assert (uv_y > H // 2 - 10).mean() > 0.9
