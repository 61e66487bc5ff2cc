import numpy as np
import jax.numpy as jnp

from stereo_semantic_vo_tpu.core import lie
from stereo_semantic_vo_tpu.engine import trajectory
from stereo_semantic_vo_tpu.eval.ate import ate_rmse, rpe, umeyama_alignment


def make_traj(n=20, seed=0):
    rng = np.random.RandomState(seed)
    poses = [np.eye(4)]
    for _ in range(n - 1):
        xi = np.concatenate([rng.uniform(-0.1, 0.5, 3), rng.uniform(-0.02, 0.02, 3)])
        dT = np.asarray(lie.se3_exp(jnp.asarray(xi, jnp.float32)), np.float64)
        poses.append(poses[-1] @ dT)
    return np.stack(poses)


class TestFormats:
    def test_kitti_line_format(self):
        line = trajectory.kitti_line(np.eye(4))
        parts = line.split(" ")
        assert len(parts) == 12
        assert parts[0] == "1.000000000" and parts[3] == "0.000000000"

    def test_tum_line_format(self):
        line = trajectory.tum_line(0.103760, np.eye(4))
        parts = line.split(" ")
        assert len(parts) == 8
        assert parts[0] == "0.103760"
        assert parts[7] == "1.0000000"  # identity quaternion qw

    def test_writer_roundtrip(self, tmp_path):
        kfile = str(tmp_path / "traj_kitti.txt")
        tfile = str(tmp_path / "traj_tum.txt")
        w = trajectory.TrajectoryWriter(kfile, tfile)
        poses = make_traj(10)
        for i, T in enumerate(poses):
            w.append(T, i * 0.1)
        w.close()
        back = trajectory.load_kitti_poses(kfile)
        assert back.shape == (10, 4, 4)
        np.testing.assert_allclose(back[:, :3, 3], poses[:, :3, 3], atol=1e-8)
        tum = np.loadtxt(tfile)
        assert tum.shape == (10, 8)


class TestATE:
    def test_identical_zero(self):
        p = make_traj()
        assert ate_rmse(p, p) < 1e-9

    def test_rigid_offset_aligned_out(self):
        p = make_traj()
        offset = np.eye(4)
        offset[:3, 3] = [5.0, -2.0, 1.0]
        q = np.einsum("ij,njk->nik", offset, p)
        assert ate_rmse(q, p, align=True) < 1e-6
        assert ate_rmse(q, p, align=False) > 1.0

    def test_noise_measured(self):
        p = make_traj()
        q = p.copy()
        q[:, :3, 3] += np.random.RandomState(1).normal(0, 0.1, (len(p), 3))
        e = ate_rmse(q, p)
        assert 0.03 < e < 0.3

    def test_umeyama_recovers_rotation(self):
        rng = np.random.RandomState(2)
        pts = rng.uniform(-5, 5, (50, 3))
        R_gt = np.asarray(lie.so3_exp(jnp.asarray([0.3, -0.2, 0.5], jnp.float32)), np.float64)
        t_gt = np.array([1.0, 2.0, 3.0])
        moved = (R_gt @ pts.T).T + t_gt
        R, t, s = umeyama_alignment(pts, moved)
        np.testing.assert_allclose(R, R_gt, atol=1e-6)
        np.testing.assert_allclose(t, t_gt, atol=1e-6)

    def test_rpe(self):
        p = make_traj()
        t_err, r_err = rpe(p, p)
        assert t_err < 1e-9 and r_err < 1e-6


class TestKittiSegmentErrors:
    def test_perfect_zero(self):
        from stereo_semantic_vo_tpu.eval.ate import kitti_segment_errors

        # straight 1 m/frame trajectory, 900 frames -> covers all lengths
        n = 900
        poses = np.tile(np.eye(4), (n, 1, 1))
        poses[:, 2, 3] = np.arange(n, dtype=float)
        t_err, r_err = kitti_segment_errors(poses, poses)
        assert t_err == 0.0 and r_err == 0.0

    def test_scale_drift_measured(self):
        from stereo_semantic_vo_tpu.eval.ate import kitti_segment_errors

        n = 900
        gt = np.tile(np.eye(4), (n, 1, 1))
        gt[:, 2, 3] = np.arange(n, dtype=float)
        est = gt.copy()
        est[:, 2, 3] *= 1.02  # 2% scale drift
        t_err, r_err = kitti_segment_errors(est, gt)
        assert abs(t_err - 2.0) < 0.1
        assert r_err < 1e-9

    def test_short_trajectory_nan(self):
        from stereo_semantic_vo_tpu.eval.ate import kitti_segment_errors

        poses = np.tile(np.eye(4), (10, 1, 1))
        t_err, r_err = kitti_segment_errors(poses, poses)
        assert np.isnan(t_err)
