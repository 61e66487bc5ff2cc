"""Windowed local bundle adjustment over the tracker's sliding map.

The reference stops at motion-only BA (src/Optimizer.cc); this module is the
config-3 extension (BASELINE.json): joint refinement of the last W frame
poses and the landmarks they observe, built from the tracker's per-frame
observation bindings (TrackOutputs.kp_uv / obs_uid) and solved by the
Schur-complement LM of ops/local_ba.py — or its landmark-sharded
multi-device variant (parallel/sharded_ba.py) when a mesh is supplied.

Observation tensors are fixed-shape (W, L, 2) with L = the window's keypoint
capacity; landmarks are keyed by the stable uid so the same physical point
links observations across frames despite the ring buffer's per-frame copies.
After refinement, landmark positions are scattered back into the tracker
state and the newest pose replaces state.T_cw.
"""

from __future__ import annotations

from collections import deque
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from stereo_semantic_vo_tpu.core.camera import Camera
from stereo_semantic_vo_tpu.core.config import VOConfig
from stereo_semantic_vo_tpu.engine.state import VOState
from stereo_semantic_vo_tpu.ops import local_ba as local_ba_ops


class WindowBA:
    def __init__(self, cfg: VOConfig, mesh=None):
        self.cfg = cfg
        self.cam = Camera.from_config(cfg.camera)
        self.window: deque[dict[str, np.ndarray]] = deque(maxlen=cfg.window.window_frames)
        self._sharded = None
        if mesh is not None:
            from stereo_semantic_vo_tpu.parallel.sharded_ba import make_sharded_local_ba

            self._sharded = make_sharded_local_ba(mesh, self.cam, cfg.ba)

    def push(self, out: Any) -> None:
        """Record one frame's tracking output (host numpy copies)."""
        self.window.append(
            {
                "T_cw": np.asarray(out.T_cw),
                "uv": np.asarray(out.kp_uv),
                "uid": np.asarray(out.obs_uid),
                "valid": np.asarray(out.obs_valid),
            }
        )

    def ready(self) -> bool:
        return len(self.window) == self.window.maxlen

    def refine(self, state: VOState) -> tuple[VOState, dict[str, float]]:
        """Run window BA and fold results back into the tracker state."""
        W = len(self.window)
        M = state.map_Xw.shape[0]
        uid_state = np.asarray(state.map_uid)
        valid_state = np.asarray(state.map_valid) & ~np.asarray(state.map_bad)

        # landmark table: uid -> current ring slot (prefer newest copy: later
        # regions overwrite earlier in the dict pass below)
        slot_of_uid: dict[int, int] = {}
        order = np.argsort(np.asarray(state.map_create_id), kind="stable")
        for s in order:
            if valid_state[s] and uid_state[s] >= 0:
                slot_of_uid[int(uid_state[s])] = int(s)

        # observation tensors over current live landmarks (L = M slots)
        obs_uv = np.zeros((W, M, 2), np.float32)
        obs_mask = np.zeros((W, M), bool)
        poses = np.stack([f["T_cw"] for f in self.window]).astype(np.float32)
        n_obs = 0
        for fi, f in enumerate(self.window):
            for k in np.nonzero(f["valid"])[0]:
                slot = slot_of_uid.get(int(f["uid"][k]))
                if slot is None:
                    continue
                obs_uv[fi, slot] = f["uv"][k]
                obs_mask[fi, slot] = True
                n_obs += 1

        # only landmarks seen in >= 2 frames constrain anything
        seen = obs_mask.sum(axis=0)
        point_valid = valid_state & (seen >= 2)
        obs_mask &= point_valid[None, :]

        if point_valid.sum() < 8:
            return state, {"n_obs": float(n_obs), "n_points": 0.0, "cost": 0.0}

        points = jnp.asarray(np.asarray(state.map_Xw))
        args = (
            jnp.asarray(poses),
            points,
            jnp.asarray(obs_uv),
            jnp.asarray(obs_mask),
            jnp.asarray(point_valid),
        )
        if self._sharded is not None:
            res = self._sharded(*args)
        else:
            res = local_ba_ops.local_ba(*args, self.cam, self.cfg.ba)

        # fold back: refined landmarks (valid ones), newest pose
        new_Xw = jnp.where(jnp.asarray(point_valid)[:, None], res.points, state.map_Xw)
        new_state = state._replace(map_Xw=new_Xw, T_cw=res.poses[-1])
        # keep our own pose history consistent for the next refine
        for fi in range(W):
            self.window[fi]["T_cw"] = np.asarray(res.poses[fi])
        return new_state, {
            "n_obs": float(n_obs),
            "n_points": float(point_valid.sum()),
            "cost": float(res.cost),
        }
