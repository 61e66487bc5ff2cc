"""Per-stage device-time profile of the tracking step.

Methodology: the axon tunnel adds ~20 ms of per-dispatch latency, so wall
-clocking one call measures the tunnel, not the op.  Each stage is timed as a
32-iteration ``lax.scan`` inside ONE jitted program with a carry-fed data
dependence (so XLA cannot hoist the body), then per-iteration cost =
(median wall - dispatch overhead) / 32 where the overhead is measured with an
empty scan.  The fused full step is timed the same way (it already scans via
the state dependence).

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


def _wall(fn, *args):
    import jax

    jax.block_until_ready(fn(*args))  # compile
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def scan_time_ms(body, feed, overhead_s):
    """body: (perturb_scalar,) -> arrays; feed: pytree of inputs closed over.
    Returns per-iteration ms with dispatch overhead removed."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run():
        def step(eps, _):
            out = body(eps)
            # fold a near-zero reduction of the output back into the carry so
            # every iteration depends on the previous one (defeats hoisting)
            leaves = [x for x in jax.tree.leaves(out) if hasattr(x, "dtype")]
            acc = sum(jnp.sum(l).astype(jnp.float32) for l in leaves)
            return acc * jnp.float32(1e-30), ()

        eps, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=N_ITER)
        return eps

    total = _wall(run)
    return max(total - overhead_s, 0.0) / N_ITER * 1e3


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

    # dispatch-overhead floor: a near-trivial program that still touches a
    # real input tensor (a literal-only program constant-folds and measures
    # the result cache, not the dispatch path — the axon tunnel here costs
    # ~20-25 ms per dispatch)
    probe = jnp.zeros((8, 128), jnp.float32)

    @jax.jit
    def trivial(x):
        def step(c, _):
            return c + jnp.float32(1.0), ()

        c, _ = jax.lax.scan(step, jnp.sum(x), None, length=N_ITER)
        return c

    overhead = _wall(trivial, probe)
    results: dict[str, float] = {"dispatch_overhead_ms": overhead * 1e3}

    kp = jax.jit(functools.partial(orb_ops.extract_orb, cfg=cfg.orb))(left)
    kp_pm1 = hamming.unpack_descriptors_pm1(kp.desc)
    map_pm1 = jnp.concatenate([kp_pm1] * (M // K))
    map_valid = jnp.ones((M,), bool)

    results["orb_extract"] = scan_time_ms(
        lambda e: orb_ops.extract_orb(left + e, cfg.orb), None, overhead
    )
    results[f"sparse_stereo[{cfg.stereo.sparse_mode}]"] = scan_time_ms(
        lambda e: stereo_ops.sparse_disparity(
            left + e, right + e, kp.uv, kp.valid, cam, cfg.stereo
        ),
        None,
        overhead,
    )

    def match_body(e):
        q = kp_pm1 + e.astype(jnp.int8)
        d_last = hamming.hamming_distance_matrix_mxu(q, kp_pm1)
        r1 = hamming.masked_best_match(d_last, kp.valid, kp.valid)
        d_map = hamming.hamming_distance_matrix_mxu(q, map_pm1)
        r2 = hamming.masked_best_match(d_map, kp.valid, map_valid)
        return r1 + r2

    results["hamming_match_both"] = scan_time_ms(match_body, None, overhead)

    uv2 = kp.uv + jnp.asarray([1.0, 0.0])

    def cull_body(e):
        F = epi_ops.fit_fundamental(kp.uv + e, uv2, kp.valid.astype(jnp.float32))
        return (epi_ops.epipolar_distance(F, kp.uv, uv2),)

    results["dynamic_culling_F"] = scan_time_ms(cull_body, None, overhead)

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

    results["ransac_pnp"] = scan_time_ms(pnp_body, None, overhead)

    def ba_body(e):
        r = ba_ops.motion_only_ba(eye, Xw + e, uv_obs, inmask, cam, cfg.ba)
        return (r.T_cw,)

    results["motion_ba_10it"] = scan_time_ms(ba_body, None, overhead)

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
    def full_scan(s0):
        def step(s, _):
            s2, out = track_step(s, frame, cfg)
            return s2, out.T_cw

        s2, poses = jax.lax.scan(step, s0, None, length=N_ITER)
        return poses

    total = _wall(full_scan, state)
    results["FULL_track_step"] = max(total - overhead, 0.0) / N_ITER * 1e3

    ssum = sum(
        v
        for k, v in results.items()
        if k not in ("FULL_track_step", "dispatch_overhead_ms")
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
