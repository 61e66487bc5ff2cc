import jax
import jax.numpy as jnp
import numpy as np

from stereo_semantic_vo_tpu.core import Camera, CameraConfig, lie
from stereo_semantic_vo_tpu.core.config import BAConfig
from stereo_semantic_vo_tpu.ops import local_ba

CAM = Camera.from_config(CameraConfig())


def make_ba_problem(key, F=4, L=120, noise_px=0.0):
    ks = jax.random.split(key, 6)
    X = jnp.stack(
        [
            jax.random.uniform(ks[0], (L,), minval=-15.0, maxval=15.0),
            jax.random.uniform(ks[1], (L,), minval=-4.0, maxval=4.0),
            jax.random.uniform(ks[2], (L,), minval=8.0, maxval=50.0),
        ],
        axis=-1,
    )
    # camera translating forward with slight rotation
    poses = []
    for f in range(F):
        xi = jnp.array([0.1 * f, 0.01 * f, -0.8 * f, 0.0, 0.02 * f, 0.0])
        poses.append(lie.se3_exp(xi))
    poses = jnp.stack(poses)
    pc = jnp.einsum("fij,lj->fli", poses[:, :3, :3], X) + poses[:, None, :3, 3]
    z = pc[..., 2]
    u = CAM.fx * pc[..., 0] / z + CAM.cx
    v = CAM.fy * pc[..., 1] / z + CAM.cy
    obs = jnp.stack([u, v], axis=-1)
    if noise_px > 0:
        obs = obs + noise_px * jax.random.normal(ks[3], obs.shape)
    mask = (z > 0.5) & (u > -200) & (u < 1500) & (v > -200) & (v < 600)
    return poses, X, obs, mask


class TestLocalBA:
    def test_recovers_perturbed_geometry(self):
        poses_gt, X_gt, obs, mask = make_ba_problem(jax.random.PRNGKey(0))
        key = jax.random.PRNGKey(1)
        dpose = 0.02 * jax.random.normal(key, (4, 6)).at[0].set(0.0)
        poses0 = jax.vmap(lambda d, T: lie.se3_exp(d) @ T)(dpose, poses_gt)
        X0 = X_gt + 0.2 * jax.random.normal(jax.random.fold_in(key, 1), X_gt.shape)
        cfg = BAConfig(local_iterations=10)
        res = local_ba.local_ba(
            poses0, X0, obs, mask, jnp.ones(X_gt.shape[0], bool), CAM, cfg
        )
        cost0 = local_ba._residual_and_jacobians(
            poses0, X0, obs, mask, CAM, cfg.huber_delta
        )[4]
        assert float(res.cost) < 1e-2 * float(cost0)
        for f in range(1, 4):
            dT = np.asarray(res.poses[f] @ lie.T_inv(poses_gt[f]))
            assert np.linalg.norm(dT[:3, 3]) < 0.02
            ang = np.arccos(np.clip((np.trace(dT[:3, :3]) - 1) / 2, -1, 1))
            assert ang < 2e-3

    def test_gauge_first_pose_fixed(self):
        poses_gt, X_gt, obs, mask = make_ba_problem(jax.random.PRNGKey(2))
        X0 = X_gt + 0.1 * jax.random.normal(jax.random.PRNGKey(3), X_gt.shape)
        res = local_ba.local_ba(
            poses_gt, X0, obs, mask, jnp.ones(X_gt.shape[0], bool), CAM,
            BAConfig(local_iterations=5),
        )
        dT = np.asarray(res.poses[0] @ lie.T_inv(poses_gt[0]))
        assert np.linalg.norm(dT[:3, 3]) < 1e-4

    def test_schur_equals_dense_solve(self):
        """The Schur-complement reduction must reproduce the full dense
        normal-equation solve exactly (SURVEY.md §7 'Distributed Schur BA
        correctness')."""
        F, L = 3, 30
        poses_gt, X_gt, obs, mask = make_ba_problem(jax.random.PRNGKey(4), F=F, L=L)
        X0 = X_gt + 0.05 * jax.random.normal(jax.random.PRNGKey(5), X_gt.shape)
        lam = jnp.float32(1e-3)
        pv = jnp.ones(L, bool)
        eq = local_ba.build_normal_equations(
            poses_gt, X0, obs, mask, CAM, BAConfig().huber_delta
        )
        dx_c, dx_p = local_ba.schur_solve(eq, lam, pv, fix_first_pose=True)

        # dense assembly
        n = F * 6 + L * 3
        H = np.zeros((n, n))
        g = np.zeros(n)
        Hcc = np.asarray(local_ba._damp(eq.Hcc, lam))
        Hpp = np.asarray(local_ba._damp(eq.Hpp, lam))
        Hcp = np.asarray(eq.Hcp)
        for f in range(F):
            H[f * 6 : f * 6 + 6, f * 6 : f * 6 + 6] = Hcc[f]
            g[f * 6 : f * 6 + 6] = np.asarray(eq.gc[f])
        for l in range(L):
            o = F * 6 + l * 3
            H[o : o + 3, o : o + 3] = Hpp[l]
            g[o : o + 3] = np.asarray(eq.gp[l])
            for f in range(F):
                H[f * 6 : f * 6 + 6, o : o + 3] = Hcp[f, l]
                H[o : o + 3, f * 6 : f * 6 + 6] = Hcp[f, l].T
        H[:6, :6] += np.eye(6) * local_ba._GAUGE_PRIOR
        dx = -np.linalg.solve(H, g)
        # tolerances reflect float32 normal-equation conditioning (fx^2 ~ 5e5
        # entries); the structural agreement is what is under test
        np.testing.assert_allclose(dx_c, dx[: F * 6].reshape(F, 6), atol=1e-4)
        np.testing.assert_allclose(dx_p, dx[F * 6 :].reshape(L, 3), atol=2e-3)

    def test_invalid_points_untouched(self):
        poses_gt, X_gt, obs, mask = make_ba_problem(jax.random.PRNGKey(6))
        pv = jnp.arange(X_gt.shape[0]) < 60
        X0 = X_gt + 0.1
        res = local_ba.local_ba(
            poses_gt, X0, obs, mask, pv, CAM, BAConfig(local_iterations=3)
        )
        # invalid landmarks receive zero update
        np.testing.assert_allclose(res.points[~pv], X0[~pv], atol=1e-6)
