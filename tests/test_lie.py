import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stereo_semantic_vo_tpu.core import lie

jax.config.update("jax_enable_x64", False)


def random_rotation(key):
    phi = jax.random.normal(key, (3,))
    return lie.so3_exp(phi)


class TestSO3:
    def test_exp_identity(self):
        R = lie.so3_exp(jnp.zeros(3))
        np.testing.assert_allclose(R, jnp.eye(3), atol=1e-6)

    def test_exp_log_roundtrip(self):
        keys = jax.random.split(jax.random.PRNGKey(0), 32)
        phis = jax.vmap(lambda k: jax.random.uniform(k, (3,), minval=-1.5, maxval=1.5))(keys)
        Rs = lie.so3_exp(phis)
        back = lie.so3_log(Rs)
        np.testing.assert_allclose(back, phis, atol=1e-4)

    def test_orthonormal(self):
        R = random_rotation(jax.random.PRNGKey(1))
        np.testing.assert_allclose(R @ R.T, jnp.eye(3), atol=1e-5)
        assert abs(float(jnp.linalg.det(R)) - 1.0) < 1e-5

    def test_small_angle(self):
        phi = jnp.array([1e-9, -1e-9, 1e-9])
        R = lie.so3_exp(phi)
        np.testing.assert_allclose(R, jnp.eye(3) + lie.hat(phi), atol=1e-7)

    def test_log_near_pi(self):
        axis = jnp.array([0.0, 0.0, 1.0])
        phi = axis * (np.pi - 1e-3)
        R = lie.so3_exp(phi)
        back = lie.so3_log(R)
        np.testing.assert_allclose(back, phi, atol=1e-2)


class TestSE3:
    def test_exp_log_roundtrip(self):
        keys = jax.random.split(jax.random.PRNGKey(2), 16)
        xis = jax.vmap(lambda k: jax.random.uniform(k, (6,), minval=-1.0, maxval=1.0))(keys)
        Ts = lie.se3_exp(xis)
        back = lie.se3_log(Ts)
        np.testing.assert_allclose(back, xis, atol=1e-4)

    def test_inverse(self):
        T = lie.se3_exp(jnp.array([0.1, -0.4, 2.0, 0.3, -0.2, 0.5]))
        np.testing.assert_allclose(T @ lie.T_inv(T), jnp.eye(4), atol=1e-5)

    def test_transform_points(self):
        T = lie.se3_exp(jnp.array([1.0, 2.0, 3.0, 0.0, 0.0, 0.0]))
        pts = jnp.array([[0.0, 0.0, 0.0], [1.0, 1.0, 1.0]])
        out = lie.transform_points(T, pts)
        np.testing.assert_allclose(out[0], jnp.array([1.0, 2.0, 3.0]), atol=1e-6)

    def test_compose_matches_twist_sum_for_commuting(self):
        xi = jnp.array([0.0, 0.0, 0.0, 0.0, 0.0, 0.3])
        T1 = lie.se3_exp(xi)
        T2 = lie.se3_exp(2 * xi)
        np.testing.assert_allclose(T1 @ T1, T2, atol=1e-5)


class TestQuaternion:
    @pytest.mark.parametrize("seed", range(8))
    def test_roundtrip(self, seed):
        R = random_rotation(jax.random.PRNGKey(seed))
        q = lie.rotation_to_quaternion(R)
        R2 = lie.quaternion_to_rotation(q)
        np.testing.assert_allclose(R2, R, atol=1e-5)
        np.testing.assert_allclose(jnp.linalg.norm(q), 1.0, atol=1e-6)

    def test_identity(self):
        q = lie.rotation_to_quaternion(jnp.eye(3))
        np.testing.assert_allclose(q, jnp.array([0.0, 0.0, 0.0, 1.0]), atol=1e-6)

    def test_near_pi_rotation(self):
        R = lie.so3_exp(jnp.array([np.pi - 1e-4, 0.0, 0.0]))
        q = lie.rotation_to_quaternion(R)
        R2 = lie.quaternion_to_rotation(q)
        np.testing.assert_allclose(R2, R, atol=1e-4)


class TestCamera:
    def test_project_backproject(self):
        from stereo_semantic_vo_tpu.core import Camera, CameraConfig, backproject, project

        cam = Camera.from_config(CameraConfig())
        pts = jnp.array([[1.0, -2.0, 10.0], [0.5, 0.2, 5.0]])
        uv, z = project(cam, pts)
        back = backproject(cam, uv, z)
        np.testing.assert_allclose(back, pts, atol=1e-4)

    def test_disparity_depth(self):
        from stereo_semantic_vo_tpu.core import Camera, CameraConfig, disparity_to_depth

        cfg = CameraConfig()
        cam = Camera.from_config(cfg)
        d = jnp.array([10.0, 0.0, -1.0, 1.0])
        z = disparity_to_depth(cam, d)
        np.testing.assert_allclose(z[0], cfg.bf / 10.0, rtol=1e-6)
        assert z[1] == 0.0 and z[2] == 0.0
        np.testing.assert_allclose(z[3], cfg.bf, rtol=1e-6)
