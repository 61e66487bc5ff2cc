"""Two-view triangulation (batched DLT).

The reference creates landmarks exclusively from stereo depth
(frame::UnprojectStereo, frame.cc:166-180); this op adds the multi-view
initializer the local BA window benefits from — far points whose stereo
disparity is unreliable (< ~1 px) can be triangulated across temporal
baselines instead.

Midpoint-free homogeneous DLT: for observations (uv_i, T_cw_i), solve the
4-vector nullspace of the stacked [u_i * P_i[2] - P_i[0]; v_i * P_i[2] -
P_i[1]] rows via the same shifted inverse iteration used by PnP.  vmaps over
landmarks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from stereo_semantic_vo_tpu.core.camera import Camera
from stereo_semantic_vo_tpu.ops.pnp import smallest_eigvec
from stereo_semantic_vo_tpu.core.precision import f32_geometry


@f32_geometry
def triangulate(
    T_cw: jax.Array,     # (F, 4, 4) camera poses
    uv: jax.Array,       # (F, 2) pixel observations of ONE landmark
    obs_mask: jax.Array,  # (F,) which frames observe it
    cam: Camera,
) -> tuple[jax.Array, jax.Array]:
    """-> ((3,) world point, () bool valid: >= 2 views and positive depths)."""
    # normalized projection matrices P = [R | t] (3, 4) per frame
    P = T_cw[:, :3, :]
    xn = (uv[:, 0] - cam.cx) / cam.fx
    yn = (uv[:, 1] - cam.cy) / cam.fy
    w = obs_mask.astype(jnp.float32)[:, None]
    rows_u = (xn[:, None] * P[:, 2, :] - P[:, 0, :]) * w   # (F, 4)
    rows_v = (yn[:, None] * P[:, 2, :] - P[:, 1, :]) * w
    A = jnp.concatenate([rows_u, rows_v], axis=0)          # (2F, 4)
    M = A.T @ A
    X_h = smallest_eigvec(M)
    X = X_h[:3] / jnp.where(jnp.abs(X_h[3]) > 1e-9, X_h[3], 1e-9)
    # cheirality: positive depth in every observing view
    pc = jnp.einsum("fij,j->fi", T_cw[:, :3, :3], X) + T_cw[:, :3, 3]
    depth_ok = jnp.all(jnp.where(obs_mask, pc[:, 2] > 0.05, True))
    valid = (jnp.sum(obs_mask) >= 2) & depth_ok & (jnp.abs(X_h[3]) > 1e-9)
    return X, valid


@f32_geometry
def triangulate_batch(T_cw, uv, obs_mask, cam: Camera):
    """uv (F, L, 2), obs_mask (F, L) -> ((L, 3) points, (L,) valid)."""
    return jax.vmap(
        lambda u, m: triangulate(T_cw, u, m, cam), in_axes=(1, 1)
    )(uv, obs_mask)
