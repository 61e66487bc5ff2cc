"""Scaling evidence for the landmark-sharded BA (round-3 verdict, missing #7).

One real chip is available, so true multi-chip efficiency cannot be
*measured* here.  What can be produced — and is, into
benchmarks/scaling_evidence.json — is the full evidence trail a later
multi-chip run would confirm:

1. **Compiled-HLO collective audit.** The 8-device program is compiled and
   every cross-device collective inside the LM loop is extracted with its
   shape.  This checks the docstring claim (parallel/sharded_ba.py:19-21)
   that communication per iteration is O(F^2*36 + F*6 + 1) floats,
   *independent of landmark count*, against what XLA actually emitted.

2. **Weak-scaling sweep on the virtual mesh.** L/device held at 2048 for
   D = 1..8.  On a shared-host CPU mesh wall-clock scaling is meaningless
   (all "devices" share the same cores — the round-3 verdict's point), so
   what is recorded is that the *collective traffic stays flat* while the
   sharded compute grows, plus per-D wall times clearly labeled as
   shared-host numbers.

3. **Projected multi-chip efficiency model.** Using the measured
   single-chip per-iteration compute time (real TPU when available) and the
   audited per-iteration collective bytes over v5e ICI (~45 GB/s effective
   per link, ~1 us launch): efficiency = t_compute / (t_compute + t_comm).
   Clearly labeled a model.

Run:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python benchmarks/scaling_evidence.py
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

F = 4
L_PER_DEV = 2048
ITERS = 20


def problem(L: int, seed: int = 0):
    import jax.numpy as jnp

    from stereo_semantic_vo_tpu.core import Camera, CameraConfig

    cam = Camera.from_config(CameraConfig())
    rng = np.random.RandomState(seed)
    X = np.stack(
        [rng.uniform(-15, 15, L), rng.uniform(-4, 4, L), rng.uniform(8, 50, L)],
        axis=-1,
    ).astype(np.float32)
    poses = np.stack([np.eye(4, dtype=np.float32)] * F)
    for f in range(F):
        poses[f][0, 3] = -0.8 * f
    pc = np.einsum("fij,lj->fli", poses[:, :3, :3], X) + poses[:, None, :3, 3]
    u = float(cam.fx) * pc[..., 0] / pc[..., 2] + float(cam.cx)
    v = float(cam.fy) * pc[..., 1] / pc[..., 2] + float(cam.cy)
    obs = (np.stack([u, v], axis=-1) + rng.normal(0, 0.3, pc.shape[:2] + (2,))).astype(
        np.float32
    )
    mask = pc[..., 2] > 0.5
    X0 = (X + rng.normal(0, 0.2, X.shape)).astype(np.float32)
    return cam, (
        jnp.asarray(poses),
        jnp.asarray(X0),
        jnp.asarray(obs),
        jnp.asarray(mask),
        jnp.ones((L,), bool),
    )


def audit_collectives(compiled_text: str) -> list[dict]:
    """Pull every cross-replica collective op + its result shape from HLO."""
    out = []
    for m in re.finditer(
        r"(\w[\w.\-]*) = (\([^)]*\)|[a-z0-9\[\],{}]+) (all-reduce|all-gather|"
        r"reduce-scatter|collective-permute|all-to-all)\(", compiled_text
    ):
        shape = m.group(2)
        bytes_ = 0
        for t in re.finditer(r"(f32|s32|u32|pred|bf16|f64)\[([0-9,]*)\]", shape):
            dt = {"f32": 4, "s32": 4, "u32": 4, "pred": 1, "bf16": 2, "f64": 8}[
                t.group(1)
            ]
            dims = [int(x) for x in t.group(2).split(",") if x] or [1]
            bytes_ += dt * int(np.prod(dims))
        out.append({"op": m.group(3), "shape": shape, "bytes": bytes_})
    return out


def main() -> None:
    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    global jnp
    import jax.numpy as jnp

    from stereo_semantic_vo_tpu.core.config import BAConfig
    from stereo_semantic_vo_tpu.parallel import mesh as mesh_utils
    from stereo_semantic_vo_tpu.parallel.sharded_ba import make_sharded_local_ba

    cfg = BAConfig(local_iterations=ITERS)
    n_avail = len(jax.devices())
    results: dict = {
        "backend": jax.default_backend(),
        "n_devices_visible": n_avail,
        "F": F,
        "L_per_device": L_PER_DEV,
        "lm_iterations": ITERS,
    }

    # ---- 1+2: weak scaling + HLO audit per mesh size -----------------------
    weak = {}
    for D in [d for d in (1, 2, 4, 8) if d <= n_avail]:
        L = L_PER_DEV * D
        m = mesh_utils.make_mesh(D)
        cam, args = problem(L)
        run = make_sharded_local_ba(m, cam, cfg)
        lowered = jax.jit(run).lower(*args)
        compiled = lowered.compile()
        colls = audit_collectives(compiled.as_text())
        per_iter_bytes = sum(c["bytes"] for c in colls)
        res = run(*args)
        jax.block_until_ready(res.cost)
        t0 = time.perf_counter()
        for _ in range(3):
            res = run(*args)
        jax.block_until_ready(res.cost)
        wall = (time.perf_counter() - t0) / 3
        weak[str(D)] = {
            "L": L,
            "wall_s_sharedhost": wall,
            "iters_per_s_sharedhost": ITERS / wall,
            "n_collectives_in_program": len(colls),
            "collective_shapes": sorted({c["shape"] for c in colls}),
            "collective_bytes_per_program_iteration": per_iter_bytes,
        }
    results["weak_scaling"] = weak
    # the docstring claim: per-iteration comm is F^2*36*4 bytes of S blocks
    # + F*6*4 of rhs + scalars, landmark-independent
    claim = F * F * 36 * 4 + F * 6 * 4 + 8
    results["claimed_bytes_per_iteration"] = claim
    if len(weak) >= 2:
        bs = [w["collective_bytes_per_program_iteration"] for w in weak.values()]
        results["collective_bytes_landmark_independent"] = len(set(bs)) == 1

    # ---- 3: projected multi-chip efficiency model --------------------------
    d1 = weak.get("1")
    if d1 is not None:
        t_comp = d1["wall_s_sharedhost"] / ITERS
        ici_bw = 45e9          # v5e effective per-link all-reduce bandwidth
        launch = 2e-6          # per-collective launch latency
        n_coll = d1["n_collectives_in_program"]
        per_iter = d1["collective_bytes_per_program_iteration"]
        t_comm = per_iter / ici_bw + launch * max(n_coll / ITERS, 2)
        results["projected_multichip_model"] = {
            "NOTE": "MODEL, not a measurement — single-chip compute time + "
                    "audited collective bytes over nominal v5e ICI",
            "t_compute_per_iter_s": t_comp,
            "t_comm_per_iter_s": t_comm,
            "projected_efficiency": t_comp / (t_comp + t_comm),
        }

    print(json.dumps(results, indent=2))
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "scaling_evidence.json"
    )
    with open(path, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
