"""Per-stage device-time profile of the tracking step.

Methodology (axon tunnel — see docs/PERFORMANCE.md "Measurement notes"):

* any host sync costs a ~26-45 ms tunnel round trip, so each stage is timed
  as an N_ITER ``lax.scan`` inside ONE jitted program with a carry-fed data
  dependence (XLA cannot hoist the body, and per-iteration dispatch is free);
* the server caches results of repeated identical (program, inputs)
  dispatches, so every dispatch carries a novel scalar salt;
* ``block_until_ready``'s round trip is long enough to hide sub-40 ms
  programs entirely, so completion is a scalar VALUE readback
  (``float(...)``) — the response cannot be formed before the value exists;
* per-iteration cost = (median wall - floor) / N_ITER, floor = the same
  readback on a trivial carry-only scan (pure RTT).

Writes benchmarks/stage_profile.json and prints a table.
Run on the TPU: python benchmarks/stage_profile.py
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_ITER = 128
REPS = 5


def _wall(run, *args):
    """run(*args, salt) -> scalar; median wall of REPS salted dispatches,
    each completed by a scalar value readback."""
    import jax.numpy as jnp

    float(run(*args, jnp.float32(-1.0)))  # compile
    ts = []
    for r in range(REPS):
        t0 = time.perf_counter()
        float(run(*args, jnp.float32(r + 1)))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def make_scan_timer():
    import jax
    import jax.numpy as jnp

    @jax.jit
    def trivial(x, salt):
        def step(c, _):
            return c + jnp.float32(1.0), ()

        c, _ = jax.lax.scan(step, jnp.sum(x) * 1e-30 + salt, None, length=N_ITER)
        return c

    floor = _wall(trivial, jnp.zeros((8, 128), jnp.float32))

    def scan_ms(body):
        """body(eps) -> pytree of arrays; per-iteration ms."""

        @jax.jit
        def run(salt):
            def step(eps, _):
                out = body(eps)
                leaves = [x for x in jax.tree.leaves(out) if hasattr(x, "dtype")]
                acc = sum(jnp.sum(l).astype(jnp.float32) for l in leaves)
                return acc * jnp.float32(1e-30) + salt * jnp.float32(1e-20), ()

            eps, _ = jax.lax.scan(step, salt * jnp.float32(1e-6), None, length=N_ITER)
            return eps

        return max(_wall(run) - floor, 0.0) / N_ITER * 1e3

    return scan_ms, floor


def main() -> None:
    import jax
    import jax.numpy as jnp

    from stereo_semantic_vo_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from stereo_semantic_vo_tpu.core.camera import Camera
    from stereo_semantic_vo_tpu.core.config import VOConfig
    from stereo_semantic_vo_tpu.engine.state import init_state
    from stereo_semantic_vo_tpu.engine.tracker import FrameInput, init_step, track_step
    from stereo_semantic_vo_tpu.kernels import hamming
    from stereo_semantic_vo_tpu.ops import ba as ba_ops
    from stereo_semantic_vo_tpu.ops import epipolar as epi_ops
    from stereo_semantic_vo_tpu.ops import orb as orb_ops
    from stereo_semantic_vo_tpu.ops import pnp as pnp_ops
    from stereo_semantic_vo_tpu.ops import stereo as stereo_ops

    cfg = VOConfig.kitti("00")
    cam = Camera.from_config(cfg.camera)
    H, W = cfg.camera.height, cfg.camera.width
    K = cfg.orb.max_keypoints
    M = cfg.window.max_map_points

    rng = np.random.RandomState(0)
    tex = rng.uniform(0, 255, (H, W + 256)).astype(np.float32)
    left = jnp.asarray(tex[:, :W])
    right = jnp.asarray(np.roll(tex[:, :W], -16, axis=1))

    scan_ms, floor = make_scan_timer()
    results: dict[str, float] = {"sync_floor_ms": floor * 1e3}

    kp = jax.jit(functools.partial(orb_ops.extract_orb, cfg=cfg.orb))(left)
    kp_pm1 = hamming.unpack_descriptors_pm1(kp.desc)
    map_pm1 = jnp.concatenate([kp_pm1] * (M // K))
    map_valid = jnp.ones((M,), bool)

    results["orb_extract"] = scan_ms(lambda e: orb_ops.extract_orb(left + e, cfg.orb))
    results[f"sparse_stereo[{cfg.stereo.sparse_mode}]"] = scan_ms(
        lambda e: stereo_ops.sparse_disparity(
            left + e, right + e, kp.uv, kp.valid, cam, cfg.stereo
        )
    )

    def match_body(e):
        q = kp_pm1 + e.astype(jnp.int8)
        d_last = hamming.hamming_distance_matrix_mxu(q, kp_pm1)
        r1 = hamming.masked_best_match(d_last, kp.valid, kp.valid)
        d_map = hamming.hamming_distance_matrix_mxu(q, map_pm1)
        r2 = hamming.masked_best_match(d_map, kp.valid, map_valid)
        return r1 + r2

    results["hamming_match_both"] = scan_ms(match_body)

    uv2 = kp.uv + jnp.asarray([1.0, 0.0])

    def cull_body(e):
        F = epi_ops.fit_fundamental(kp.uv + e, uv2, kp.valid.astype(jnp.float32))
        return (epi_ops.epipolar_distance(F, kp.uv, uv2),)

    results["dynamic_culling_F"] = scan_ms(cull_body)

    Xw = jnp.asarray(
        np.stack(
            [
                rng.uniform(-20, 20, K),
                rng.uniform(-5, 5, K),
                rng.uniform(5, 60, K),
            ],
            axis=-1,
        ),
        jnp.float32,
    )
    u = cam.fx * Xw[:, 0] / Xw[:, 2] + cam.cx
    v = cam.fy * Xw[:, 1] / Xw[:, 2] + cam.cy
    uv_obs = jnp.stack([u, v], axis=-1)
    inmask = (u > 0) & (u < W) & (v > 0) & (v < H)
    key = jax.random.PRNGKey(0)
    eye = jnp.eye(4, dtype=jnp.float32)

    def pnp_body(e):
        r = pnp_ops.ransac_pnp(
            Xw + e, uv_obs, inmask, cam, cfg.pnp, key=key, T_seed=eye
        )
        return (r.T_cw, r.n_inliers)

    results["ransac_pnp"] = scan_ms(pnp_body)

    def ba_body(e):
        r = ba_ops.motion_only_ba(eye, Xw + e, uv_obs, inmask, cam, cfg.ba)
        return (r.T_cw,)

    results["motion_ba_10it"] = scan_ms(ba_body)

    # fused full step, scanned through the state dependence
    state = init_state(cfg)
    nb = cfg.semantic.max_boxes
    frame = FrameInput(
        left=left,
        right=right,
        boxes=jnp.zeros((nb, 4), jnp.float32),
        boxes_valid=jnp.zeros((nb,), bool),
    )
    state, _ = jax.jit(functools.partial(init_step, cfg=cfg))(state, frame)

    @jax.jit
    def full_scan(s0, salt):
        def step(s, _):
            # the perturbation must depend on the CARRY, not just the salt: a
            # salt-only perturbation is loop-invariant, and XLA hoists every
            # frame-derived computation (the whole ORB pyramid) out of the
            # scan — the round-3 artifact briefly published a FULL step
            # smaller than its ORB stage because of exactly this
            eps = (s.T_cw[0, 0] + salt) * jnp.float32(1e-20)
            f = frame._replace(left=frame.left + eps)
            s2, out = track_step(s, f, cfg)
            return s2, out.T_cw

        s2, poses = jax.lax.scan(step, s0, None, length=N_ITER)
        return jnp.sum(poses)

    total = _wall(full_scan, state)
    results["FULL_track_step"] = max(total - floor, 0.0) / N_ITER * 1e3

    ssum = sum(
        v
        for k, v in results.items()
        if k not in ("FULL_track_step", "sync_floor_ms")
    )
    print(f"\n{'stage':34s} {'ms/iter':>8s}")
    for k, v in results.items():
        print(f"{k:34s} {v:8.3f}")
    print(f"{'sum of stages':34s} {ssum:8.3f}")

    out = {"stages_ms": results, "sum_stages_ms": ssum, "backend": jax.default_backend(), "n_iter": N_ITER}
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "stage_profile.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
