"""Windowed local bundle adjustment over the tracker's sliding map.

The reference stops at motion-only BA (src/Optimizer.cc); this module is the
config-3 extension (BASELINE.json): joint refinement of the last W frame
poses and the landmarks they observe, built from the tracker's per-frame
observation bindings (TrackOutputs.kp_uv / obs_uid) and solved by the
Schur-complement LM of ops/local_ba.py — or its landmark-sharded
multi-device variant (parallel/sharded_ba.py) when a mesh is supplied.

Observation tensors are fixed-shape (W, M, 2) with M = the map's ring
capacity; landmarks are keyed by the stable uid so the same physical point
links observations across frames despite the ring buffer's per-frame copies.
The uid join runs entirely on device as one jitted equality-matrix build
(an (M, K) one-hot contraction per window frame — the g2o BlockSolver's
sparse bookkeeping replaced by dense masked tensor algebra,
Thirdparty/g2o/g2o/core/block_solver.hpp): no Python loop ever touches a
keypoint.  After refinement, landmark positions are scattered back into
*every* ring copy of each uid and the newest pose replaces state.T_cw.
"""

from __future__ import annotations

import functools
from collections import deque
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from stereo_semantic_vo_tpu.core.camera import Camera
from stereo_semantic_vo_tpu.core.config import VOConfig
from stereo_semantic_vo_tpu.engine.state import VOState
from stereo_semantic_vo_tpu.ops import local_ba as local_ba_ops
from stereo_semantic_vo_tpu.core.precision import f32_geometry


class ObsTensors(NamedTuple):
    obs_uv: jax.Array       # (W, M, 2) pixel observations
    obs_mask: jax.Array     # (W, M) bool
    point_valid: jax.Array  # (M,) bool — primary, live, seen >= 2 frames
    primary_idx: jax.Array  # (M,) int32 — slot of each uid's primary copy
    has_primary: jax.Array  # (M,) bool
    n_obs: jax.Array        # () int32 total observations


@functools.partial(jax.jit, static_argnames=("W", "K"))
@f32_geometry
def build_observations(
    map_uid: jax.Array,     # (M,)
    map_valid: jax.Array,   # (M,)
    map_bad: jax.Array,     # (M,)
    frame_idx: jax.Array,   # ()
    win_uid: jax.Array,     # (W, K) per-frame keypoint uid bindings
    win_uv: jax.Array,      # (W, K, 2)
    win_valid: jax.Array,   # (W, K)
    W: int,
    K: int,
) -> ObsTensors:
    """Device-side uid join: ring slots x window keypoints -> obs tensors.

    A matched landmark is *copied* into the current frame's ring region every
    frame (engine/tracker.py map maintenance), so one uid can live in several
    slots.  The newest region's copy is elected primary (ties by slot index);
    only primaries receive observations, so each physical point contributes
    its residuals exactly once to the normal equations.
    """
    M = map_uid.shape[0]
    slot = jnp.arange(M)
    live = map_valid & ~map_bad & (map_uid >= 0)

    # recency of each ring region: the last frame that wrote region r is the
    # largest t' <= frame_idx with t' mod W == r
    region = slot // K
    rank = frame_idx - jnp.mod(frame_idx - region, W)

    # elect the primary copy per uid: max (rank, slot) among equal-uid slots
    eq = (map_uid[:, None] == map_uid[None, :]) & live[:, None] & live[None, :]
    code = rank * M + slot
    best = jnp.max(jnp.where(eq, code[None, :], -1), axis=1)
    primary = live & (code == best)
    # per-slot pointer to its primary copy (for the write-back broadcast)
    pri_hit = eq & primary[None, :]
    has_primary = jnp.any(pri_hit, axis=1)
    primary_idx = jnp.argmax(pri_hit, axis=1).astype(jnp.int32)

    def per_frame(uid_f, uv_f, valid_f):
        # (M, K) one-hot: does window keypoint k bind this slot's uid?
        E = (map_uid[:, None] == uid_f[None, :]) & valid_f[None, :] & primary[:, None]
        cnt = jnp.sum(E, axis=1)
        uv = (E.astype(uv_f.dtype) @ uv_f) / jnp.maximum(cnt, 1)[:, None]
        return cnt > 0, uv

    obs_mask, obs_uv = jax.vmap(per_frame)(win_uid, win_uv, win_valid)

    seen = jnp.sum(obs_mask, axis=0)
    point_valid = primary & (seen >= 2)  # < 2 views constrain nothing
    obs_mask = obs_mask & point_valid[None, :]
    return ObsTensors(
        obs_uv=obs_uv,
        obs_mask=obs_mask,
        point_valid=point_valid,
        primary_idx=primary_idx,
        has_primary=has_primary,
        n_obs=jnp.sum(obs_mask),
    )


@jax.jit
def _write_back(map_Xw, refined_points, point_valid, primary_idx, has_primary):
    """Broadcast each refined primary position to every ring copy of its uid."""
    take = has_primary & point_valid[primary_idx]
    return jnp.where(take[:, None], refined_points[primary_idx], map_Xw)


class WindowBA:
    def __init__(self, cfg: VOConfig, mesh=None):
        self.cfg = cfg
        self.cam = Camera.from_config(cfg.camera)
        self.window: deque[dict[str, jax.Array]] = deque(maxlen=cfg.window.window_frames)
        self._sharded = None
        if mesh is not None:
            from stereo_semantic_vo_tpu.parallel.sharded_ba import make_sharded_local_ba

            self._sharded = make_sharded_local_ba(mesh, self.cam, cfg.ba)

    def push(self, out: Any) -> None:
        """Record one frame's tracking output (device arrays, no host copy)."""
        self.window.append(
            {
                "T_cw": jnp.asarray(out.T_cw),
                "uv": jnp.asarray(out.kp_uv),
                "uid": jnp.asarray(out.obs_uid),
                "valid": jnp.asarray(out.obs_valid),
            }
        )

    def ready(self) -> bool:
        return len(self.window) == self.window.maxlen

    def refine(self, state: VOState) -> tuple[VOState, dict[str, float]]:
        """Run window BA and fold results back into the tracker state."""
        W = len(self.window)
        K = self.window[0]["uid"].shape[0]
        poses = jnp.stack([f["T_cw"] for f in self.window]).astype(jnp.float32)
        win_uid = jnp.stack([f["uid"] for f in self.window])
        win_uv = jnp.stack([f["uv"] for f in self.window])
        win_valid = jnp.stack([f["valid"] for f in self.window])

        obs = build_observations(
            state.map_uid, state.map_valid, state.map_bad, state.frame_idx,
            win_uid, win_uv, win_valid, W, K,
        )
        n_points = int(jnp.sum(obs.point_valid))  # one scalar sync per refine
        if n_points < 8:
            return state, {"n_obs": float(obs.n_obs), "n_points": 0.0, "cost": 0.0}

        args = (poses, state.map_Xw, obs.obs_uv, obs.obs_mask, obs.point_valid)
        if self._sharded is not None:
            res = self._sharded(*args)
        else:
            res = local_ba_ops.local_ba(*args, self.cam, self.cfg.ba)

        new_Xw = _write_back(
            state.map_Xw, res.points, obs.point_valid, obs.primary_idx, obs.has_primary
        )
        new_state = state._replace(map_Xw=new_Xw, T_cw=res.poses[-1])
        # keep our own pose history consistent for the next refine
        for fi in range(W):
            self.window[fi]["T_cw"] = res.poses[fi]
        return new_state, {
            "n_obs": float(obs.n_obs),
            "n_points": float(n_points),
            "cost": float(res.cost),
        }
