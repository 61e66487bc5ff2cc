import jax
import jax.numpy as jnp
import numpy as np

from stereo_semantic_vo_tpu.core import Camera, CameraConfig, lie
from stereo_semantic_vo_tpu.core.config import BAConfig, PnPConfig
from stereo_semantic_vo_tpu.ops import ba as ba_ops
from stereo_semantic_vo_tpu.ops import pnp as pnp_ops

CAM = Camera.from_config(CameraConfig())


def make_scene(key, n=200, noise_px=0.0, outlier_frac=0.0, twist_scale=0.3):
    """Random world points in front of a random camera; returns GT pose + obs."""
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    X = jnp.stack(
        [
            jax.random.uniform(k1, (n,), minval=-10.0, maxval=10.0),
            jax.random.uniform(k2, (n,), minval=-3.0, maxval=3.0),
            jax.random.uniform(k3, (n,), minval=5.0, maxval=40.0),
        ],
        axis=-1,
    )
    xi = jax.random.uniform(k4, (6,), minval=-1.0, maxval=1.0) * jnp.array(
        [1.0, 1.0, 1.0, 1.0, 1.0, 1.0]
    ) * twist_scale
    T_cw = lie.se3_exp(xi)
    r, z = ba_ops.reprojection_residuals(T_cw, X, jnp.zeros((n, 2)), CAM)
    uv = r  # residual vs zeros == projection
    if noise_px > 0:
        uv = uv + noise_px * jax.random.normal(k5, uv.shape)
    valid = z > 0.1
    if outlier_frac > 0:
        ko = jax.random.split(k5, 2)[1]
        out_mask = jax.random.uniform(ko, (n,)) < outlier_frac
        uv = jnp.where(out_mask[:, None], uv + 120.0, uv)
    return T_cw, X, uv, valid


def pose_error(T_est, T_gt):
    dT = np.asarray(T_est @ lie.T_inv(T_gt))
    rot_err = np.linalg.norm(np.asarray(lie.so3_log(jnp.asarray(dT[:3, :3]))))
    t_err = np.linalg.norm(dT[:3, 3])
    return rot_err, t_err


class TestMotionOnlyBA:
    def test_converges_from_perturbed_pose(self):
        T_gt, X, uv, valid = make_scene(jax.random.PRNGKey(0))
        T0 = lie.se3_exp(jnp.array([0.2, -0.1, 0.15, 0.03, -0.02, 0.04])) @ T_gt
        res = ba_ops.motion_only_ba(T0, X, uv, valid, CAM, BAConfig())
        rot, t = pose_error(res.T_cw, T_gt)
        assert rot < 1e-3 and t < 1e-2
        assert int(res.inlier_mask.sum()) > 0.9 * int(valid.sum())

    def test_huber_resists_outliers(self):
        T_gt, X, uv, valid = make_scene(jax.random.PRNGKey(1), outlier_frac=0.2)
        T0 = lie.se3_exp(jnp.array([0.05, 0.05, -0.05, 0.01, 0.01, -0.01])) @ T_gt
        res = ba_ops.motion_only_ba(T0, X, uv, valid, CAM, BAConfig())
        rot, t = pose_error(res.T_cw, T_gt)
        assert rot < 5e-3 and t < 5e-2

    def test_already_optimal_stays(self):
        T_gt, X, uv, valid = make_scene(jax.random.PRNGKey(2))
        res = ba_ops.motion_only_ba(T_gt, X, uv, valid, CAM, BAConfig())
        rot, t = pose_error(res.T_cw, T_gt)
        assert rot < 1e-5 and t < 1e-4

    def test_jit(self):
        T_gt, X, uv, valid = make_scene(jax.random.PRNGKey(3))
        f = jax.jit(lambda T, x, u, v: ba_ops.motion_only_ba(T, x, u, v, CAM, BAConfig()))
        res = f(T_gt, X, uv, valid)
        assert res.T_cw.shape == (4, 4)


class TestRansacPnP:
    def test_clean_recovery(self):
        T_gt, X, uv, valid = make_scene(jax.random.PRNGKey(4))
        res = pnp_ops.ransac_pnp(X, uv, valid, CAM, PnPConfig())
        assert bool(res.ok)
        rot, t = pose_error(res.T_cw, T_gt)
        assert rot < 1e-2 and t < 0.1

    def test_with_outliers_and_noise(self):
        T_gt, X, uv, valid = make_scene(
            jax.random.PRNGKey(5), noise_px=0.5, outlier_frac=0.3
        )
        res = pnp_ops.ransac_pnp(X, uv, valid, CAM, PnPConfig())
        assert bool(res.ok)
        rot, t = pose_error(res.T_cw, T_gt)
        assert rot < 2e-2 and t < 0.2
        # outliers should be excluded
        assert int(res.n_inliers) < int(valid.sum())

    def test_deterministic(self):
        T_gt, X, uv, valid = make_scene(jax.random.PRNGKey(6), noise_px=0.3)
        r1 = pnp_ops.ransac_pnp(X, uv, valid, CAM, PnPConfig())
        r2 = pnp_ops.ransac_pnp(X, uv, valid, CAM, PnPConfig())
        np.testing.assert_array_equal(r1.T_cw, r2.T_cw)

    def test_degenerate_few_points(self):
        T_gt, X, uv, valid = make_scene(jax.random.PRNGKey(7))
        few = valid & (jnp.arange(X.shape[0]) < 4)  # < min_inliers
        res = pnp_ops.ransac_pnp(X, uv, few, CAM, PnPConfig())
        assert not bool(res.ok)

    def test_identity_pose_scene(self):
        n = 100
        k = jax.random.PRNGKey(8)
        X = jnp.stack(
            [
                jax.random.uniform(k, (n,), minval=-5.0, maxval=5.0),
                jax.random.uniform(jax.random.fold_in(k, 1), (n,), minval=-2.0, maxval=2.0),
                jax.random.uniform(jax.random.fold_in(k, 2), (n,), minval=4.0, maxval=30.0),
            ],
            axis=-1,
        )
        r, z = ba_ops.reprojection_residuals(jnp.eye(4), X, jnp.zeros((n, 2)), CAM)
        res = pnp_ops.ransac_pnp(X, r, z > 0, CAM, PnPConfig())
        rot, t = pose_error(res.T_cw, jnp.eye(4))
        assert rot < 1e-2 and t < 0.05
