"""BA iterations/sec on the real chip — the BASELINE.md metric.

Reference semantics: g2o runs 10 LM iterations of motion-only BA per frame
(/root/reference/src/Optimizer.cc:75-76; each iteration relinearizes every
edge, builds the 6x6 normal equations, and solves).  Measured here:

* motion-only BA (K=512 observations, the production shape) — LM
  iterations/sec on one chip, using the salted-scan timing from
  kernel_bench.py (the axon tunnel makes naive wall-clocking meaningless;
  see docs/PERFORMANCE.md "Measurement notes").
* local/window BA (F=4 poses x L=2048 landmarks, Schur complement) —
  LM iterations/sec, same methodology.

Multi-device scaling (benchmarks/scaling.py) runs separately on the virtual
CPU mesh: that validates the sharded solver's correctness/compilation, but
all 8 virtual devices share one physical CPU so its "efficiency" numbers are
not hardware scaling and are recorded with that caveat.

Run: python benchmarks/ba_throughput.py  (writes benchmarks/results_r3.json)
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kernel_bench import make_scan_timer  # noqa: E402


def main() -> None:
    import jax
    import jax.numpy as jnp

    from stereo_semantic_vo_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    import dataclasses

    from stereo_semantic_vo_tpu.core import Camera, CameraConfig
    from stereo_semantic_vo_tpu.core.config import BAConfig
    from stereo_semantic_vo_tpu.ops import ba as ba_ops
    from stereo_semantic_vo_tpu.ops.local_ba import local_ba

    cam = Camera.from_config(CameraConfig())
    cfg = BAConfig()
    scan_ms, floor = make_scan_timer()

    results: dict = {
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "sync_floor_ms": floor * 1e3,
        "reference_semantics": "g2o motion-only BA, 10 LM iters/frame (Optimizer.cc:75-76)",
    }

    # ---- motion-only BA: K=512 observations, 10 LM iterations ----------------
    K = 512
    rng = np.random.RandomState(0)
    Xw = jnp.asarray(
        np.stack(
            [rng.uniform(-20, 20, K), rng.uniform(-5, 5, K), rng.uniform(5, 60, K)],
            axis=-1,
        ),
        jnp.float32,
    )
    u = cam.fx * Xw[:, 0] / Xw[:, 2] + cam.cx
    v = cam.fy * Xw[:, 1] / Xw[:, 2] + cam.cy
    uv = jnp.stack([u, v], axis=-1) + jnp.asarray(rng.normal(0, 0.4, (K, 2)), jnp.float32)
    mask = jnp.ones((K,), bool)
    eye = jnp.eye(4, dtype=jnp.float32)

    ms_10it = scan_ms(
        lambda e, X: ba_ops.motion_only_ba(eye, X + e, uv, mask, cam, cfg).T_cw, Xw
    )
    results["motion_ba"] = {
        "problem": {"K": K, "lm_iterations": cfg.iterations},
        "ms_per_solve_10it": ms_10it,
        "lm_iters_per_s": cfg.iterations / (ms_10it * 1e-3),
    }

    # ---- local/window BA: F=4 x L=2048, Schur complement ---------------------
    F, L = 4, 2048
    rngl = np.random.RandomState(1)
    Xl = np.stack(
        [rngl.uniform(-15, 15, L), rngl.uniform(-4, 4, L), rngl.uniform(8, 50, L)],
        axis=-1,
    ).astype(np.float32)
    poses = np.stack([np.eye(4, dtype=np.float32)] * F)
    for f in range(F):
        poses[f][0, 3] = -0.8 * f
    pc = np.einsum("fij,lj->fli", poses[:, :3, :3], Xl) + poses[:, None, :3, 3]
    ul = float(cam.fx) * pc[..., 0] / pc[..., 2] + float(cam.cx)
    vl = float(cam.fy) * pc[..., 1] / pc[..., 2] + float(cam.cy)
    obs = jnp.asarray(
        np.stack([ul, vl], -1) + rngl.normal(0, 0.3, (F, L, 2)), jnp.float32
    )
    maskl = jnp.asarray(pc[..., 2] > 0.5)
    Xl0 = jnp.asarray(Xl + rngl.normal(0, 0.2, Xl.shape).astype(np.float32))
    posesj = jnp.asarray(poses)
    pv = jnp.ones((L,), bool)

    local = {"problem": {"F": F, "L": L, "lm_iterations": cfg.local_iterations}}
    for backend in ("xla", "pallas"):
        bcfg = dataclasses.replace(cfg, local_hessian_backend=backend)
        ms = scan_ms(
            lambda e, X: local_ba(posesj, X + e, obs, maskl, pv, cam, bcfg).poses, Xl0
        )
        local[backend] = {
            "ms_per_solve": ms,
            "lm_iters_per_s": cfg.local_iterations / (ms * 1e-3),
        }
    numeric = {k: v["ms_per_solve"] for k, v in local.items() if isinstance(v, dict) and "ms_per_solve" in v}
    local["winner"] = min(numeric, key=numeric.__getitem__)
    results["local_ba_schur"] = local

    print(json.dumps(results, indent=2))
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results_r3.json")
    with open(path, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
