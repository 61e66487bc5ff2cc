"""On-TPU Pallas-vs-XLA microbenchmarks for the north-star kernels.

BASELINE.json names three custom-kernel targets (FAST/ORB scoring, bulk
Hamming matching, BA Hessian build) plus the sparse-stereo strip kernel.
For each we time every available formulation on the real chip and record a
winner; `core/config.py` defaults must match the winners recorded in
benchmarks/results_r3.json / docs/PERFORMANCE.md.

Timing methodology (axon tunnel; see docs/PERFORMANCE.md "Measurement
notes"): the tunnel adds a ~26-43 ms RTT to any host sync, the server caches
results of repeated identical (program, inputs) dispatches, and
``block_until_ready``'s round trip is long enough to HIDE any compute that
finishes inside it (a <40 ms program times the same as an empty one).  So:

  * every measured program wraps the body in an N_ITER `lax.scan` whose
    carry feeds a perturbation into the body (no hoisting, no per-iteration
    dispatch cost);
  * every *dispatch* gets a novel scalar argument (defeats the result
    cache — a repeated identical dispatch returns the cached buffer in ~0 ms
    and measures nothing);
  * completion is timed by a scalar VALUE readback (``float(...)``), never
    ``block_until_ready`` — the readback response cannot be formed before
    the value exists, so wall = RTT + compute;
  * per-iteration cost = (median wall - floor) / N_ITER where the floor is
    a trivial carry-only scan measured the same way (pure RTT).

Run: python benchmarks/kernel_bench.py  (writes benchmarks/kernel_bench.json)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_ITER = 128
REPS = 5


def _median_wall(run, *args):
    """run(*args, salt) -> scalar; times REPS dispatches with novel salts,
    each completed by a scalar value readback (see module docstring)."""
    import jax.numpy as jnp

    float(run(*args, jnp.float32(-1.0)))  # compile
    ts = []
    for r in range(REPS):
        salt = jnp.float32(r + 1)
        t0 = time.perf_counter()
        float(run(*args, salt))
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

    probe = jnp.zeros((8, 128), jnp.float32)
    floor = _median_wall(trivial, probe)

    def scan_once(body, args, n_iter):
        @jax.jit
        def run(*inner):
            *tensors, salt = inner

            def step(eps, _):
                out = body(eps, *tensors)
                leaves = [x for x in jax.tree.leaves(out) if hasattr(x, "dtype")]
                acc = sum(jnp.sum(l).astype(jnp.float32) for l in leaves)
                return acc * jnp.float32(1e-30) + salt * jnp.float32(1e-20), ()

            eps, _ = jax.lax.scan(step, salt * jnp.float32(1e-6), None, length=n_iter)
            return eps

        total = _median_wall(run, *args)
        return max(total - floor, 0.0) / n_iter * 1e3

    def scan_ms(body, *args):
        """body(eps, *args) -> pytree of arrays; returns per-iteration ms.

        Measurements below timer resolution (< ~5 us/iter: the wall is all
        sync floor) are retried with a 16x longer scan so the winner table
        never records a meaningless 0.0 (round-3 verdict, weak #3)."""
        v = scan_once(body, args, N_ITER)
        if v < 0.005:
            v = scan_once(body, args, N_ITER * 16)
        return v

    return scan_ms, floor


def main() -> None:
    import jax
    import jax.numpy as jnp

    from stereo_semantic_vo_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from stereo_semantic_vo_tpu.core.camera import Camera
    from stereo_semantic_vo_tpu.core.config import VOConfig

    cfg = VOConfig.kitti("00")
    cam = Camera.from_config(cfg.camera)
    H, W = cfg.camera.height, cfg.camera.width
    K = cfg.orb.max_keypoints

    scan_ms_raw, floor = make_scan_timer()

    def scan_ms(body, *args):
        """scan_ms that reports a failure string instead of raising, so one
        kernel that fails to compile doesn't kill the whole benchmark."""
        try:
            return scan_ms_raw(body, *args)
        except Exception as ex:
            msg = str(ex).split("\n")[0][:160]
            return f"FAILED: {type(ex).__name__}: {msg}"
    results: dict[str, dict] = {
        "backend": jax.default_backend(),
        "n_iter": N_ITER,
        "sync_floor_ms": floor * 1e3,
        "kernels": {},
    }

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.uniform(0, 255, (H, W)).astype(np.float32))
    right = jnp.asarray(np.roll(np.asarray(img), -16, axis=1))

    # ---- 1. FAST-9/16 scoring (two thresholds, full resolution) ------------
    from stereo_semantic_vo_tpu.kernels.fast_score import fast_scores_pallas
    from stereo_semantic_vo_tpu.ops.orb import _fast_score

    ths = (float(cfg.orb.fast_threshold), float(cfg.orb.fast_min_threshold))
    fast = {
        "xla": scan_ms(lambda e, im: _fast_score(im + e, *ths), img),
        "pallas": scan_ms(lambda e, im: fast_scores_pallas(im + e, ths), img),
    }
    numeric = {k: v for k, v in fast.items() if isinstance(v, float)}
    fast["winner"] = min(numeric, key=numeric.__getitem__)
    results["kernels"]["fast_score_2th_fullres"] = fast

    # ---- 2. Hamming matching, both gates (512q x 512t + 512q x 2048t) ------
    from stereo_semantic_vo_tpu.kernels import hamming
    from stereo_semantic_vo_tpu.kernels.matcher import fused_best_match

    M = cfg.window.max_map_points
    desc_q = jnp.asarray(rng.randint(0, 2**32, (K, 8), dtype=np.uint32))
    desc_t = jnp.asarray(rng.randint(0, 2**32, (M, 8), dtype=np.uint32))
    q_pm1 = hamming.unpack_descriptors_pm1(desc_q)
    t_pm1 = hamming.unpack_descriptors_pm1(desc_t)
    valid_q = jnp.ones((K,), bool)
    valid_t = jnp.ones((M,), bool)

    def ham_popcount(e, dq, dt):
        d1 = hamming.hamming_distance_matrix(dq ^ e.astype(jnp.uint32), dq)
        d2 = hamming.hamming_distance_matrix(dq ^ e.astype(jnp.uint32), dt)
        return (
            hamming.masked_best_match(d1, valid_q, valid_q)
            + hamming.masked_best_match(d2, valid_q, valid_t)
        )

    def ham_mxu(e, pq, pt):
        q = (pq + e.astype(jnp.int8)).astype(jnp.int8)
        d1 = hamming.hamming_distance_matrix_mxu(q, pq)
        d2 = hamming.hamming_distance_matrix_mxu(q, pt)
        return (
            hamming.masked_best_match(d1, valid_q, valid_q)
            + hamming.masked_best_match(d2, valid_q, valid_t)
        )

    def ham_pallas(e, dq, dt):
        q = dq ^ e.astype(jnp.uint32)
        return (
            fused_best_match(dq, q, valid_q, valid_q)
            + fused_best_match(dt, q, valid_t, valid_q)
        )

    ham = {
        "xla_popcount": scan_ms(ham_popcount, desc_q, desc_t),
        "xla_mxu": scan_ms(ham_mxu, q_pm1, t_pm1),
        "pallas": scan_ms(ham_pallas, desc_q, desc_t),
    }
    numeric = {k: v for k, v in ham.items() if isinstance(v, float)}
    ham["winner"] = min(numeric, key=numeric.__getitem__)
    results["kernels"]["hamming_both_gates"] = ham

    # ---- 3. sparse stereo at keypoints (K=512, D=48) ------------------------
    from stereo_semantic_vo_tpu.ops import orb as orb_ops
    from stereo_semantic_vo_tpu.ops import stereo as stereo_ops

    kp = jax.jit(lambda im: orb_ops.extract_orb(im, cfg.orb))(img)
    import dataclasses

    stereo = {}
    for mode in ("volume", "strips", "pallas"):
        scfg = dataclasses.replace(cfg.stereo, sparse_mode=mode)
        try:
            stereo[mode] = scan_ms(
                lambda e, l, r: stereo_ops.sparse_disparity(
                    l + e, r + e, kp.uv, kp.valid, cam, scfg
                ),
                img,
                right,
            )
        except Exception as ex:  # pallas path may not compile on all backends
            stereo[mode] = f"FAILED: {type(ex).__name__}"
    numeric = {k: v for k, v in stereo.items() if isinstance(v, float)}
    stereo["winner"] = min(numeric, key=numeric.__getitem__)
    results["kernels"]["sparse_stereo_K512_D48"] = stereo

    # ---- 4. BA Hessian/gradient build (K=512 obs) ---------------------------
    from stereo_semantic_vo_tpu.ops import ba as ba_ops

    Xw = jnp.asarray(
        np.stack(
            [rng.uniform(-20, 20, K), rng.uniform(-5, 5, K), rng.uniform(5, 60, K)],
            axis=-1,
        ),
        jnp.float32,
    )
    u = cam.fx * Xw[:, 0] / Xw[:, 2] + cam.cx
    v = cam.fy * Xw[:, 1] / Xw[:, 2] + cam.cy
    uv_obs = jnp.stack([u, v], axis=-1)
    inmask = (u > 0) & (u < W) & (v > 0) & (v < H)
    eye = jnp.eye(4, dtype=jnp.float32)

    ba = {}
    for backend in ("xla", "pallas"):
        bcfg = dataclasses.replace(cfg.ba, hessian_backend=backend)
        try:
            ba[backend] = scan_ms(
                lambda e, X: ba_ops.motion_only_ba(
                    eye, X + e, uv_obs, inmask, cam, bcfg
                ).T_cw,
                Xw,
            )
        except Exception as ex:
            ba[backend] = f"FAILED: {type(ex).__name__}"
    numeric = {k: v for k, v in ba.items() if isinstance(v, float)}
    ba["winner"] = min(numeric, key=numeric.__getitem__)
    results["kernels"]["motion_ba_10it_K512"] = ba

    # ---- 5. local-BA normal-equation block build (F=4, L=2048) -------------
    from stereo_semantic_vo_tpu.ops.local_ba import build_normal_equations

    F, L = 4, 2048
    rngl = np.random.RandomState(1)
    Xl = jnp.asarray(
        np.stack(
            [rngl.uniform(-15, 15, L), rngl.uniform(-4, 4, L), rngl.uniform(8, 50, L)],
            axis=-1,
        ),
        jnp.float32,
    )
    posesl = np.stack([np.eye(4, dtype=np.float32)] * F)
    for f in range(F):
        posesl[f][0, 3] = -0.8 * f
    posesl = jnp.asarray(posesl)
    pcl = jnp.einsum("fij,lj->fli", posesl[:, :3, :3], Xl) + posesl[:, None, :3, 3]
    ul = cam.fx * pcl[..., 0] / pcl[..., 2] + cam.cx
    vl = cam.fy * pcl[..., 1] / pcl[..., 2] + cam.cy
    obsl = jnp.stack([ul, vl], axis=-1)
    maskl = pcl[..., 2] > 0.5
    delta = float(cfg.ba.huber_delta)

    build = {}
    for backend in ("xla", "pallas"):
        try:
            build[backend] = scan_ms(
                lambda e, X: build_normal_equations(
                    posesl, X + e, obsl, maskl, cam, delta, backend=backend
                ),
                Xl,
            )
        except Exception as ex:
            build[backend] = f"FAILED: {type(ex).__name__}"
    numeric = {k: v for k, v in build.items() if isinstance(v, float)}
    build["winner"] = min(numeric, key=numeric.__getitem__)
    results["kernels"]["local_ba_block_build_F4_L2048"] = build

    # ---- 6. descriptor patch extraction (K=512, 31x31, smoothed pyramid L0) -
    from stereo_semantic_vo_tpu.ops.orb import _get_patches, _smooth

    img_s = jax.jit(lambda im: _smooth(im, cfg.orb.smooth_width))(img)
    xy = jnp.stack(
        [
            jnp.asarray(rng.randint(20, W - 20, K), jnp.int32),
            jnp.asarray(rng.randint(20, H - 20, K), jnp.int32),
        ],
        axis=-1,
    )
    r_half = cfg.orb.patch_size // 2
    patches = {
        "xla": scan_ms(
            lambda e, im: _get_patches(im + e, xy, r_half, "xla"), img_s
        ),
        "pallas": scan_ms(
            lambda e, im: _get_patches(im + e, xy, r_half, "pallas"), img_s
        ),
    }
    numeric = {k: v for k, v in patches.items() if isinstance(v, float)}
    patches["winner"] = min(numeric, key=numeric.__getitem__)
    results["kernels"]["patch_extract_K512_31x31"] = patches

    # ---- 7. dense disparity, full KITTI frame (the reference's #1 workload:
    # MSA::solve costs 2.41 s/frame of its ~2.43 s total — reference_cost.md)
    from stereo_semantic_vo_tpu.ops.dense_stereo import dense_disparity

    dense = {}
    for refine, tag in ((True, "sgm4+refine"), (False, "sgm4")):
        dcfg = dataclasses.replace(cfg.stereo, refine=refine)
        dense[tag] = scan_ms(
            lambda e, l, r: dense_disparity(l + e, r + e, dcfg).disparity,
            img,
            right,
        )
    numeric = {k: v for k, v in dense.items() if isinstance(v, float)}
    if numeric:
        ref_ms = 2410.0  # measured MSA::solve, benchmarks/reference_cost.md
        dense["vs_reference_msa"] = {
            k: round(ref_ms / v, 1) for k, v in numeric.items()
        }
    results["kernels"]["dense_disparity_1241x376_D48"] = dense

    print(json.dumps(results, indent=2))
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "kernel_bench.json")
    with open(path, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
