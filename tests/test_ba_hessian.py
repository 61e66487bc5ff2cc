"""Fused Pallas BA-Hessian build vs the XLA einsum build.

The normal equations must match to float tolerance so the two backends are
interchangeable (BAConfig.hessian_backend); the full LM loop must converge
to the same pose either way.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from stereo_semantic_vo_tpu.core import Camera, CameraConfig, lie
from stereo_semantic_vo_tpu.core.config import BAConfig
from stereo_semantic_vo_tpu.kernels.ba_hessian import motion_hessian_gradient
from stereo_semantic_vo_tpu.ops import ba as ba_ops

CAM = Camera.from_config(CameraConfig())


def _problem(seed=0, K=512, noise=0.4):
    rng = np.random.RandomState(seed)
    X = np.stack(
        [rng.uniform(-20, 20, K), rng.uniform(-5, 5, K), rng.uniform(5, 60, K)],
        axis=-1,
    ).astype(np.float32)
    T_true = np.asarray(
        lie.se3_exp(jnp.asarray([0.3, -0.1, 0.5, 0.02, -0.03, 0.01], jnp.float32))
    )
    pc = X @ T_true[:3, :3].T + T_true[:3, 3]
    u = float(CAM.fx) * pc[:, 0] / pc[:, 2] + float(CAM.cx)
    v = float(CAM.fy) * pc[:, 1] / pc[:, 2] + float(CAM.cy)
    uv = np.stack([u, v], axis=-1).astype(np.float32)
    uv += rng.normal(0, noise, uv.shape).astype(np.float32)
    mask = (pc[:, 2] > 0.5) & (rng.rand(K) > 0.1)
    return jnp.asarray(X), jnp.asarray(uv), jnp.asarray(mask), jnp.asarray(T_true)


class TestMotionHessian:
    def test_matches_xla_build(self):
        X, uv, mask, T_true = _problem()
        cfg = BAConfig()
        T0 = jnp.asarray(lie.se3_exp(jnp.asarray([0.05, 0.0, -0.04, 0.004, 0.0, -0.003]))) @ T_true

        # XLA reference build (the einsum path in ops/ba.py's step)
        m = mask.astype(jnp.float32)
        r, z = ba_ops.reprojection_residuals(T0, X, uv, CAM)
        w_geom = m * (z > 0.05)
        r2 = jnp.sum(r * r, axis=-1)
        w = w_geom * ba_ops.huber_weights(r2, cfg.huber_delta)
        J = ba_ops._pose_jacobian(T0, X, CAM)
        Jw = J * w[:, None, None]
        H_ref = jnp.einsum("kif,kig->fg", Jw, J)
        g_ref = jnp.einsum("kif,ki->f", Jw, r)
        d = cfg.huber_delta
        rho = jnp.where(r2 <= d * d, r2, 2.0 * d * jnp.sqrt(jnp.maximum(r2, 1e-12)) - d * d)
        cost_ref = jnp.sum(w_geom * rho)

        H, g, cost = motion_hessian_gradient(
            T0, X.T, uv.T, m[None], CAM, float(cfg.huber_delta)
        )
        # near-zero H entries are catastrophic cancellations of ~1e6-scale
        # terms (the XLA einsum itself is asymmetric there at f32), so the
        # absolute tolerance scales with the matrix magnitude
        atol_H = 1e-6 * float(np.abs(np.asarray(H_ref)).max())
        atol_g = 1e-6 * float(np.abs(np.asarray(g_ref)).max())
        np.testing.assert_allclose(np.asarray(H), np.asarray(H_ref), rtol=2e-5, atol=atol_H)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=2e-5, atol=atol_g)
        np.testing.assert_allclose(float(cost), float(cost_ref), rtol=1e-5)

    def test_local_blocks_match_xla_build(self):
        from stereo_semantic_vo_tpu.kernels.ba_hessian import local_ba_blocks
        from stereo_semantic_vo_tpu.ops.local_ba import build_normal_equations

        rng = np.random.RandomState(1)
        F, L = 4, 512
        X = np.stack(
            [rng.uniform(-15, 15, L), rng.uniform(-4, 4, L), rng.uniform(8, 50, L)],
            axis=-1,
        ).astype(np.float32)
        poses = np.stack([np.eye(4, dtype=np.float32)] * F)
        for f in range(F):
            poses[f][0, 3] = -0.8 * f
        pc = np.einsum("fij,lj->fli", poses[:, :3, :3], X) + poses[:, None, :3, 3]
        u = float(CAM.fx) * pc[..., 0] / pc[..., 2] + float(CAM.cx)
        v = float(CAM.fy) * pc[..., 1] / pc[..., 2] + float(CAM.cy)
        obs = np.stack([u, v], axis=-1).astype(np.float32)
        obs += rng.normal(0, 1.5, obs.shape).astype(np.float32)
        mask = (pc[..., 2] > 0.5) & (rng.rand(F, L) > 0.2)
        delta = float(BAConfig().huber_delta)

        eq = build_normal_equations(
            jnp.asarray(poses), jnp.asarray(X), jnp.asarray(obs),
            jnp.asarray(mask), CAM, delta,
        )
        Hcc, Hcp, Hpp, gc, gp, cost = local_ba_blocks(
            jnp.asarray(poses), jnp.asarray(X).T,
            jnp.swapaxes(jnp.asarray(obs), 1, 2),
            jnp.asarray(mask).astype(jnp.float32), CAM, delta,
        )
        for name, a, b in [
            ("Hcc", Hcc, eq.Hcc), ("Hcp", Hcp, eq.Hcp), ("Hpp", Hpp, eq.Hpp),
            ("gc", gc, eq.gc), ("gp", gp, eq.gp),
        ]:
            a, b = np.asarray(a), np.asarray(b)
            # f32 op-order noise scales with the magnitude of the summed
            # terms (up to ~1e5 each over 512-term reductions), not the
            # (possibly cancelled) result
            atol = 1e-4 * max(float(np.abs(b).max()), 1.0)
            np.testing.assert_allclose(a, b, rtol=3e-5, atol=atol, err_msg=name)
        np.testing.assert_allclose(float(cost), float(eq.cost), rtol=1e-5)

    def test_local_blocks_match_xla_build_stereo_edges_f8(self):
        """Stereo residual row + 8-pose window (the production window-BA
        shape): the fused build must match the XLA einsum build — this was
        the silent pallas->xla downgrade path before round 5."""
        from stereo_semantic_vo_tpu.kernels.ba_hessian import local_ba_blocks
        from stereo_semantic_vo_tpu.ops.local_ba import build_normal_equations

        rng = np.random.RandomState(2)
        F, L = 8, 512
        X = np.stack(
            [rng.uniform(-15, 15, L), rng.uniform(-4, 4, L), rng.uniform(8, 50, L)],
            axis=-1,
        ).astype(np.float32)
        poses = np.stack([np.eye(4, dtype=np.float32)] * F)
        for f in range(F):
            poses[f][0, 3] = -0.8 * f
            poses[f][2, 3] = 0.3 * f
        pc = np.einsum("fij,lj->fli", poses[:, :3, :3], X) + poses[:, None, :3, 3]
        u = float(CAM.fx) * pc[..., 0] / pc[..., 2] + float(CAM.cx)
        v = float(CAM.fy) * pc[..., 1] / pc[..., 2] + float(CAM.cy)
        obs = np.stack([u, v], axis=-1).astype(np.float32)
        obs += rng.normal(0, 1.5, obs.shape).astype(np.float32)
        mask = (pc[..., 2] > 0.5) & (rng.rand(F, L) > 0.2)
        ur = (u - float(CAM.bf) / pc[..., 2] + rng.normal(0, 0.8, u.shape)).astype(
            np.float32
        )
        rmask = mask & (rng.rand(F, L) > 0.3)
        delta = float(BAConfig().huber_delta)

        eq = build_normal_equations(
            jnp.asarray(poses), jnp.asarray(X), jnp.asarray(obs),
            jnp.asarray(mask), CAM, delta,
            obs_ur=jnp.asarray(ur), obs_r_mask=jnp.asarray(rmask),
        )
        urmT = jnp.stack(
            [jnp.asarray(ur), jnp.asarray(rmask).astype(jnp.float32)], axis=1
        )
        Hcc, Hcp, Hpp, gc, gp, cost = local_ba_blocks(
            jnp.asarray(poses), jnp.asarray(X).T,
            jnp.swapaxes(jnp.asarray(obs), 1, 2),
            jnp.asarray(mask).astype(jnp.float32), CAM, delta, urmT=urmT,
        )
        for name, a, b in [
            ("Hcc", Hcc, eq.Hcc), ("Hcp", Hcp, eq.Hcp), ("Hpp", Hpp, eq.Hpp),
            ("gc", gc, eq.gc), ("gp", gp, eq.gp),
        ]:
            a, b = np.asarray(a), np.asarray(b)
            atol = 1e-4 * max(float(np.abs(b).max()), 1.0)
            np.testing.assert_allclose(a, b, rtol=3e-5, atol=atol, err_msg=name)
        np.testing.assert_allclose(float(cost), float(eq.cost), rtol=1e-5)

    def test_local_ba_converges_with_pallas_build(self):
        from stereo_semantic_vo_tpu.ops.local_ba import local_ba

        rng = np.random.RandomState(7)
        F, L = 4, 512
        X = np.stack(
            [rng.uniform(-15, 15, L), rng.uniform(-4, 4, L), rng.uniform(8, 50, L)],
            axis=-1,
        ).astype(np.float32)
        poses = np.stack([np.eye(4, dtype=np.float32)] * F)
        for f in range(F):
            poses[f][0, 3] = -0.8 * f
        pc = np.einsum("fij,lj->fli", poses[:, :3, :3], X) + poses[:, None, :3, 3]
        u = float(CAM.fx) * pc[..., 0] / pc[..., 2] + float(CAM.cx)
        v = float(CAM.fy) * pc[..., 1] / pc[..., 2] + float(CAM.cy)
        obs = np.stack([u, v], axis=-1).astype(np.float32)
        mask = pc[..., 2] > 0.5
        X0 = (X + rng.normal(0, 0.15, X.shape)).astype(np.float32)
        pts = {}
        for backend in ("xla", "pallas"):
            cfg = dataclasses.replace(
                BAConfig(), local_iterations=8, local_hessian_backend=backend
            )
            res = local_ba(
                jnp.asarray(poses), jnp.asarray(X0), jnp.asarray(obs),
                jnp.asarray(mask), jnp.ones(L, bool), CAM, cfg,
            )
            pts[backend] = np.asarray(res.points)
            err = np.abs(pts[backend] - X).max()
            assert err < 0.05, f"{backend}: landmark error {err}"
        np.testing.assert_allclose(pts["pallas"], pts["xla"], atol=5e-3)

    def test_full_ba_same_pose_both_backends(self):
        X, uv, mask, T_true = _problem(seed=3)
        T0 = jnp.asarray(
            lie.se3_exp(jnp.asarray([0.08, -0.02, -0.06, 0.006, -0.002, 0.004]))
        ) @ T_true
        res = {}
        for backend in ("xla", "pallas"):
            cfg = dataclasses.replace(BAConfig(), hessian_backend=backend)
            r = ba_ops.motion_only_ba(T0, X, uv, mask, CAM, cfg)
            res[backend] = np.asarray(r.T_cw)
            # converged near the true pose
            np.testing.assert_allclose(res[backend], np.asarray(T_true), atol=5e-3)
        np.testing.assert_allclose(res["pallas"], res["xla"], atol=1e-4)
