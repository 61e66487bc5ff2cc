"""Distributed Schur BA on the virtual 8-device CPU mesh: must agree with
the single-device solver (SURVEY.md §4: multi-device fakes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stereo_semantic_vo_tpu.core import Camera, CameraConfig, lie
from stereo_semantic_vo_tpu.core.config import BAConfig
from stereo_semantic_vo_tpu.ops import local_ba
from stereo_semantic_vo_tpu.parallel import mesh as mesh_utils
from stereo_semantic_vo_tpu.parallel.sharded_ba import make_sharded_local_ba
from tests.test_local_ba import make_ba_problem

CAM = Camera.from_config(CameraConfig())


@pytest.fixture(scope="module")
def problem():
    F, L = 4, 160  # 160 divides 8
    # 0.3 px observation noise -> nonzero cost floor so converged costs are
    # comparable across reduction orders
    poses_gt, X_gt, obs, mask = make_ba_problem(
        jax.random.PRNGKey(10), F=F, L=L, noise_px=0.3
    )
    key = jax.random.PRNGKey(11)
    dpose = 0.02 * jax.random.normal(key, (F, 6)).at[0].set(0.0)
    poses0 = jax.vmap(lambda d, T: lie.se3_exp(d) @ T)(dpose, poses_gt)
    X0 = X_gt + 0.15 * jax.random.normal(jax.random.fold_in(key, 1), X_gt.shape)
    return poses_gt, poses0, X0, obs, mask


class TestShardedBA:
    def test_matches_single_device(self, problem):
        poses_gt, poses0, X0, obs, mask = problem
        L = X0.shape[0]
        pv = jnp.ones(L, bool)
        cfg = BAConfig(local_iterations=8)

        ref = local_ba.local_ba(poses0, X0, obs, mask, pv, CAM, cfg)

        m = mesh_utils.make_mesh(8)
        run = make_sharded_local_ba(m, CAM, cfg)
        res = run(poses0, X0, obs, mask, pv)

        # LM accept/reject boundaries amplify float-reduction-order noise, so
        # compare converged optima, not bitwise trajectories: same cost, same
        # poses; landmark agreement judged by the median (weakly-constrained
        # far points can slide along their rays at equal cost)
        np.testing.assert_allclose(np.asarray(res.cost), np.asarray(ref.cost), rtol=1e-3)
        np.testing.assert_allclose(np.asarray(res.poses), np.asarray(ref.poses), atol=5e-3)
        pt_diff = np.linalg.norm(np.asarray(res.points) - np.asarray(ref.points), axis=1)
        assert np.median(pt_diff) < 0.05  # ~1e-3 relative at the 8-50 m depths used

    def test_converges_to_gt(self, problem):
        poses_gt, poses0, X0, obs, mask = problem
        pv = jnp.ones(X0.shape[0], bool)
        m = mesh_utils.make_mesh(8)
        run = make_sharded_local_ba(m, CAM, BAConfig(local_iterations=10))
        res = run(poses0, X0, obs, mask, pv)
        for f in range(1, 4):
            dT = np.asarray(res.poses[f] @ lie.T_inv(poses_gt[f]))
            assert np.linalg.norm(dT[:3, 3]) < 0.03

    def test_two_device_mesh(self, problem):
        poses_gt, poses0, X0, obs, mask = problem
        pv = jnp.ones(X0.shape[0], bool)
        m = mesh_utils.make_mesh(2)
        run = make_sharded_local_ba(m, CAM, BAConfig(local_iterations=4))
        res = run(poses0, X0, obs, mask, pv)
        ref = local_ba.local_ba(poses0, X0, obs, mask, pv, CAM, BAConfig(local_iterations=4))
        np.testing.assert_allclose(np.asarray(res.cost), np.asarray(ref.cost), rtol=1e-3)


class TestShardedStereoEdges:
    def test_matches_single_device_with_stereo_edges(self, problem):
        """The distributed solver must agree with ops/local_ba when both use
        the u_R stereo edge (round-4 parity: the single-device path gained
        stereo edges for window BA; the sharded path shards them over
        landmarks like every other obs tensor)."""
        poses_gt, poses0, X0, obs, mask = problem
        F, L = obs.shape[:2]
        pv = jnp.ones(L, bool)
        cfg = BAConfig(local_iterations=8)
        # synthesize consistent stereo observations from the GT geometry:
        # u_R = u - bf/z at the ground-truth poses (plus the same obs noise
        # statistics the uv observations carry)
        pc = jnp.einsum("fij,lj->fli", poses_gt[:, :3, :3], X0) + poses_gt[:, None, :3, 3]
        z = jnp.maximum(pc[..., 2], 1e-3)
        obs_ur = obs[..., 0] - CAM.bf / z
        obs_rm = mask & (z > 0.5)

        ref = local_ba.local_ba(
            poses0, X0, obs, mask, pv, CAM, cfg, obs_ur=obs_ur, obs_r_mask=obs_rm
        )
        m = mesh_utils.make_mesh(8)
        run = make_sharded_local_ba(m, CAM, cfg, stereo_edges=True)
        res = run(poses0, X0, obs, mask, pv, obs_ur, obs_rm)

        assert np.isfinite(float(res.cost))
        assert abs(float(res.cost) - float(ref.cost)) <= 0.02 * max(
            float(ref.cost), 1.0
        )
        pose_d = np.max(np.abs(np.asarray(res.poses) - np.asarray(ref.poses)))
        assert pose_d < 5e-3, pose_d
