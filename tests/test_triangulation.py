import jax
import jax.numpy as jnp
import numpy as np

from stereo_semantic_vo_tpu.core import Camera, CameraConfig, lie
from stereo_semantic_vo_tpu.ops.triangulation import triangulate, triangulate_batch

CAM = Camera.from_config(CameraConfig())


def project(T_cw, X):
    pc = T_cw[:3, :3] @ X + T_cw[:3, 3]
    return jnp.stack([CAM.fx * pc[0] / pc[2] + CAM.cx, CAM.fy * pc[1] / pc[2] + CAM.cy])


class TestTriangulation:
    def test_exact_recovery(self):
        X = jnp.array([2.0, -1.0, 15.0])
        poses = jnp.stack(
            [
                jnp.eye(4),
                lie.se3_exp(jnp.array([0.5, 0.0, 0.0, 0.0, 0.02, 0.0])),
                lie.se3_exp(jnp.array([1.0, 0.1, -0.3, 0.0, 0.04, 0.0])),
            ]
        )
        uv = jnp.stack([project(p, X) for p in poses])
        Xt, valid = triangulate(poses, uv, jnp.ones(3, bool), CAM)
        assert bool(valid)
        np.testing.assert_allclose(Xt, X, atol=1e-3)

    def test_masked_views_ignored(self):
        X = jnp.array([-3.0, 0.5, 20.0])
        poses = jnp.stack([jnp.eye(4), lie.se3_exp(jnp.array([0.8, 0, 0, 0, 0, 0])), jnp.eye(4)])
        uv = jnp.stack([project(poses[0], X), project(poses[1], X), jnp.array([9999.0, 9999.0])])
        Xt, valid = triangulate(poses, uv, jnp.array([True, True, False]), CAM)
        assert bool(valid)
        np.testing.assert_allclose(Xt, X, atol=1e-3)

    def test_single_view_invalid(self):
        X = jnp.array([0.0, 0.0, 10.0])
        poses = jnp.stack([jnp.eye(4), jnp.eye(4)])
        uv = jnp.stack([project(poses[0], X), jnp.zeros(2)])
        _, valid = triangulate(poses, uv, jnp.array([True, False]), CAM)
        assert not bool(valid)

    def test_batch(self):
        key = jax.random.PRNGKey(0)
        L = 50
        X = jnp.stack(
            [
                jax.random.uniform(key, (L,), minval=-10, maxval=10),
                jax.random.uniform(jax.random.fold_in(key, 1), (L,), minval=-3, maxval=3),
                jax.random.uniform(jax.random.fold_in(key, 2), (L,), minval=8, maxval=40),
            ],
            axis=-1,
        )
        poses = jnp.stack([jnp.eye(4), lie.se3_exp(jnp.array([0.6, 0, 0, 0, 0.01, 0]))])
        uv = jnp.stack([jnp.stack([project(p, x) for x in X]) for p in poses])
        mask = jnp.ones((2, L), bool)
        Xt, valid = triangulate_batch(poses, uv, mask, CAM)
        assert bool(valid.all())
        np.testing.assert_allclose(Xt, X, atol=5e-2)
