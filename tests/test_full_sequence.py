"""Full-sequence end-to-end test on the projective synthetic world: forward
motion + yaw (the lateral-shift scenes can't exercise rotation recovery).
Asserts ATE and KITTI segment drift against exact ground truth."""

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
from stereo_semantic_vo_tpu.eval.ate import ate_rmse, rpe
from tests.synthetic_world import PlanarWorld, turning_trajectory

# KITTI-like conditioning: bf ~ 243 puts the 8-35 m scene at 7-30 px of
# disparity (the real KITTI rig is bf=386 over 5-30 m)
H, W = 240, 480
FX = 450.0
BASELINE = 0.54
CAM = CameraConfig(fx=FX, fy=FX, cx=W / 2, cy=H / 2, bf=FX * BASELINE, width=W, height=H)
CFG = VOConfig(
    camera=CAM,
    orb=ORBConfig(max_keypoints=384, n_levels=3),
    stereo=StereoConfig(max_disparity=48),
    pnp=PnPConfig(num_hypotheses=192),
)

N_FRAMES = 25


@pytest.fixture(scope="module")
def run_results():
    world = PlanarWorld(seed=3, wall_z=35.0)
    gt = turning_trajectory(N_FRAMES, speed=0.2, yaw_rate=0.008)
    pipe = VOPipeline(CFG, out_dir=None, write_trajectory=False)
    for t in range(N_FRAMES):
        left, right = world.render_stereo(
            gt[t], FX, FX, W / 2, H / 2, H, W, BASELINE
        )
        pipe.process_frame(left, right, None, None, t * 0.1)
    pipe.flush()
    est = np.stack([np.eye(4)] * N_FRAMES)
    for i, out in enumerate(pipe.outputs):
        est[i] = np.asarray(out.T_wc, np.float64)
    return est, gt, pipe


class TestFullSequence:
    def test_all_frames_tracked(self, run_results):
        est, gt, pipe = run_results
        oks = [bool(o.pnp_ok) for o in pipe.outputs]
        assert all(oks), f"lost tracking at frames {[i for i, o in enumerate(oks) if not o]}"
        assert pipe.n_reinits == 0

    def test_ate_bound(self, run_results):
        est, gt, pipe = run_results
        err = ate_rmse(est, gt, align=False)
        path_len = np.sum(np.linalg.norm(np.diff(gt[:, :3, 3], axis=0), axis=1))
        assert err < 0.02 * path_len, f"ATE {err:.3f} m over {path_len:.1f} m path"

    def test_yaw_recovered(self, run_results):
        est, gt, pipe = run_results
        # final yaw ~ N * yaw_rate; compare rotation angle of last pose
        def yaw_of(T):
            return np.arctan2(T[0, 2], T[2, 2])

        yaw_est = yaw_of(est[-1])
        yaw_gt = yaw_of(gt[-1])
        assert abs(yaw_est - yaw_gt) < 0.02, (yaw_est, yaw_gt)

    def test_per_frame_drift(self, run_results):
        est, gt, pipe = run_results
        t_err, r_err = rpe(est, gt)
        assert t_err < 0.03   # meters per frame step
        assert r_err < 0.005  # radians per frame step
