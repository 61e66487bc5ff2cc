"""Pallas kernels: fused bundle-adjustment normal-equation builds.

The reference's BA relinearizes every edge and accumulates Jacobian blocks
into the normal equations each LM iteration (g2o: analytic 2x6 blocks in
types_six_dof_expmap.cpp:266-288, accumulation in
Thirdparty/g2o/g2o/core/block_solver.hpp).  The XLA formulation
(ops/ba.py / ops/local_ba.py) materializes the (K, 2, 6) Jacobian tensor in
HBM and contracts it with einsums; these kernels fuse residual + IRLS weight
+ Jacobian + block accumulation into one VMEM pass so the J tensor never
exists anywhere.

Two builds:

* ``motion_hessian_gradient`` — the motion-only BA inner loop
  (src/Optimizer.cc:15-86 semantics): K observations of fixed landmarks from
  one pose -> (6, 6) Gauss-Newton Hessian + (6,) gradient + robust cost.
  Data layout: landmarks on VPU lanes (inputs pre-transposed to (3, K) /
  (2, K)), all per-observation quantities are (1, K) lane vectors, and the
  28 unique H/g entries are lane reductions — no (K, 2, 6) tensor.

* ``local_ba_blocks`` — the local-BA block build
  (ops/local_ba.build_normal_equations): F poses x L landmarks ->
  Hcc (F,6,6), Hcp (F,L,6,3), Hpp (L,3,3), gc (F,6), gp (L,3), cost.
  Grid over landmark blocks; per-landmark outputs (Hpp/gp/Hcp) are written
  as component-major lane tensors ((9, L) etc.), pose-block outputs are
  accumulated across grid steps into a single revisited block.

Both match the XLA builds to float tolerance (tests/test_ba_hessian.py);
pick the production backend with BAConfig.hessian_backend — the winner on
the real chip is recorded in benchmarks/kernel_bench.json.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pose_rows(T_ref):
    """Read the 3x4 [R|t] scalars of a (4, 4) pose ref."""
    R = [[T_ref[i, j] for j in range(3)] for i in range(3)]
    t = [T_ref[i, 3] for i in range(3)]
    return R, t


def _project_terms(R, t, xw, yw, zw, fx, fy, cx, cy):
    """Camera-frame point + projection helpers for lane-vector landmarks."""
    px = R[0][0] * xw + R[0][1] * yw + R[0][2] * zw + t[0]
    py = R[1][0] * xw + R[1][1] * yw + R[1][2] * zw + t[1]
    pz = R[2][0] * xw + R[2][1] * yw + R[2][2] * zw + t[2]
    zs = jnp.where(jnp.abs(pz) > 1e-6, pz, 1e-6)
    iz = 1.0 / zs
    iz2 = iz * iz
    u = fx * px * iz + cx
    v = fy * py * iz + cy
    return px, py, pz, iz, iz2, u, v


def _irls(r2, mask_pos, delta):
    """Huber IRLS weight and robust cost contribution (matches ops/ba.py)."""
    r = jnp.sqrt(jnp.maximum(r2, 1e-12))
    w_h = jnp.where(r <= delta, 1.0, delta / r)
    rho = jnp.where(r2 <= delta * delta, r2, 2.0 * delta * r - delta * delta)
    return mask_pos * w_h, mask_pos * rho


def _motion_kernel(delta: float):
    def kernel(P_ref, Xt_ref, uvt_ref, m_ref, out_ref):
        # P: rows 0-3 = T_cw, row 4 = [fx, fy, cx, cy]
        R, t = _pose_rows(P_ref)
        fx, fy, cx, cy = P_ref[4, 0], P_ref[4, 1], P_ref[4, 2], P_ref[4, 3]
        xw = Xt_ref[0:1, :]
        yw = Xt_ref[1:2, :]
        zw = Xt_ref[2:3, :]
        px, py, pz, iz, iz2, u, v = _project_terms(
            R, t, xw, yw, zw, fx, fy, cx, cy
        )
        ru = u - uvt_ref[0:1, :]
        rv = v - uvt_ref[1:2, :]
        mask_pos = m_ref[0:1, :] * (pz > 0.05)
        w, rho = _irls(ru * ru + rv * rv, mask_pos, delta)

        zero = jnp.zeros_like(pz)
        # analytic d(residual)/d(twist xi = [rho, phi]) for T <- exp(xi) T
        # (the g2o 2x6 block, types_six_dof_expmap.cpp:266-288)
        Ju = [fx * iz, zero, -fx * px * iz2,
              -fx * px * py * iz2, fx * (1.0 + px * px * iz2), -fx * py * iz]
        Jv = [zero, fy * iz, -fy * py * iz2,
              -fy * (1.0 + py * py * iz2), fy * px * py * iz2, fy * px * iz]

        # 21 unique H entries + 6 g entries + cost as (1, 1) keepdims
        # reductions, assembled into the (8, 8) output with vector ops only
        # (scalar stores to VMEM are not lowerable)
        zero11 = jnp.zeros((1, 1), jnp.float32)
        cells = [[zero11] * 8 for _ in range(8)]
        for a in range(6):
            for b in range(a, 6):
                s = jnp.sum(w * (Ju[a] * Ju[b] + Jv[a] * Jv[b]), keepdims=True)
                cells[a][b] = s
                if b != a:
                    cells[b][a] = s
            cells[a][6] = jnp.sum(w * (Ju[a] * ru + Jv[a] * rv), keepdims=True)
        cells[6][0] = jnp.sum(rho, keepdims=True)
        rows = [jnp.concatenate(c, axis=1) for c in cells]
        out_ref[:] = jnp.concatenate(rows, axis=0)

    return kernel


@functools.partial(jax.jit, static_argnames=("delta",))
def motion_hessian_gradient(
    T_cw: jax.Array,
    Xt: jax.Array,
    uvt: jax.Array,
    maskf: jax.Array,
    cam,
    delta: float,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Fused H/g/cost build for motion-only BA.

    T_cw (4,4); Xt (3,K) world points transposed; uvt (2,K); maskf (1,K)
    float {0,1}; cam a core.camera.Camera.  Returns (H (6,6), g (6,), cost ()).
    """
    P = jnp.zeros((8, 8), jnp.float32)
    P = P.at[:4, :4].set(T_cw)
    P = P.at[4, :4].set(jnp.stack([cam.fx, cam.fy, cam.cx, cam.cy]))
    out = pl.pallas_call(
        _motion_kernel(delta),
        out_shape=jax.ShapeDtypeStruct((8, 8), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=jax.default_backend() == "cpu",
    )(P, Xt, uvt, maskf)
    return out[:6, :6], out[:6, 6], out[6, 0]


# ---------------------------------------------------------------------------
# Local BA: F poses x L landmarks block build (g2o block_solver analogue)
# ---------------------------------------------------------------------------

LB_BLOCK = 512  # landmarks per grid step


def _local_kernel(F: int, delta: float, stereo: bool):
    def kernel(*refs):
        if stereo:
            P_ref, Xt_ref, obsT_ref, m_ref, urm_ref, pl_ref, pose_ref = refs
        else:
            P_ref, Xt_ref, obsT_ref, m_ref, pl_ref, pose_ref = refs
            urm_ref = None
        i = pl.program_id(0)
        xw = Xt_ref[0:1, :]
        yw = Xt_ref[1:2, :]
        zw = Xt_ref[2:3, :]
        # intrinsics ride in pose-buffer row F (one past the poses)
        fx, fy, cx, cy = P_ref[F, 0, 0], P_ref[F, 0, 1], P_ref[F, 0, 2], P_ref[F, 0, 3]
        bf = P_ref[F, 1, 0]

        zero11 = jnp.zeros((1, 1), jnp.float32)
        Lb = xw.shape[1]
        zrow = jnp.zeros((1, Lb), jnp.float32)
        Hpp = [[zrow] * 3 for _ in range(3)]
        gp = [zrow] * 3
        hcp_rows = []       # 18 rows per frame, frame-major
        all_cells = []      # per-frame 8x8 cell grids ((1,1) entries)
        cost = zero11

        for f in range(F):
            R = [[P_ref[f, a, b] for b in range(3)] for a in range(3)]
            t = [P_ref[f, a, 3] for a in range(3)]
            px, py, pz, iz, iz2, u, v = _project_terms(
                R, t, xw, yw, zw, fx, fy, cx, cy
            )
            ru = u - obsT_ref[f, 0:1, :]
            rv = v - obsT_ref[f, 1:2, :]
            mask_pos = m_ref[f : f + 1, :] * (pz > 0.05)
            if stereo:
                # third residual row u_R = u - bf/z (the g2o
                # EdgeStereoSE3ProjectXYZ analogue, ops/local_ba docstring),
                # masked per observation by the stereo-validity weight
                wr = urm_ref[f, 1:2, :]
                rs = (u - bf * iz - urm_ref[f, 0:1, :]) * wr
                r2 = ru * ru + rv * rv + rs * rs
            else:
                r2 = ru * ru + rv * rv
            w, rho = _irls(r2, mask_pos, delta)
            cost = cost + jnp.sum(rho, keepdims=True)

            zerov = jnp.zeros_like(pz)
            Ju = [fx * iz, zerov, -fx * px * iz2,
                  -fx * px * py * iz2, fx * (1.0 + px * px * iz2), -fx * py * iz]
            Jv = [zerov, fy * iz, -fy * py * iz2,
                  -fy * (1.0 + py * py * iz2), fy * px * py * iz2, fy * px * iz]
            # Jp = duv_dpc @ R (landmark Jacobian)
            Jpu = [fx * iz * R[0][b] - fx * px * iz2 * R[2][b] for b in range(3)]
            Jpv = [fy * iz * R[1][b] - fy * py * iz2 * R[2][b] for b in range(3)]
            if stereo:
                # d(u_R)/dpc adds bf*iz2 * dz/dpc; through the twist chain
                # dz/dxi = [0, 0, 1, py, -px, 0], through R it is R[2][b]
                b2 = bf * iz2
                Js = [Ju[0] * wr, Ju[1] * wr, (Ju[2] + b2) * wr,
                      (Ju[3] + b2 * py) * wr, (Ju[4] - b2 * px) * wr,
                      Ju[5] * wr]
                Jps = [(Jpu[b] + b2 * R[2][b]) * wr for b in range(3)]

            for a in range(3):
                for b in range(3):
                    Hpp[a][b] = Hpp[a][b] + w * (Jpu[a] * Jpu[b] + Jpv[a] * Jpv[b])
                    if stereo:
                        Hpp[a][b] = Hpp[a][b] + w * Jps[a] * Jps[b]
                gp[a] = gp[a] + w * (Jpu[a] * ru + Jpv[a] * rv)
                if stereo:
                    gp[a] = gp[a] + w * Jps[a] * rs
            for a in range(6):
                for b in range(3):
                    acc = w * (Ju[a] * Jpu[b] + Jv[a] * Jpv[b])
                    if stereo:
                        acc = acc + w * Js[a] * Jps[b]
                    hcp_rows.append(acc)

            cells = [[zero11] * 8 for _ in range(8)]
            for a in range(6):
                for b in range(a, 6):
                    hc = w * (Ju[a] * Ju[b] + Jv[a] * Jv[b])
                    if stereo:
                        hc = hc + w * Js[a] * Js[b]
                    s = jnp.sum(hc, keepdims=True)
                    cells[a][b] = s
                    if b != a:
                        cells[b][a] = s
                gcv = w * (Ju[a] * ru + Jv[a] * rv)
                if stereo:
                    gcv = gcv + w * Js[a] * rs
                cells[a][6] = jnp.sum(gcv, keepdims=True)
            all_cells.append(cells)

        per_l = [Hpp[a][b] for a in range(3) for b in range(3)] + gp + hcp_rows
        pl_ref[:] = jnp.concatenate(per_l, axis=0)

        # the block's robust-cost total rides in frame 0's (6, 0) cell —
        # written at concat time (a traced .at[].add inside the kernel would
        # lower to scatter-add, which Mosaic does not implement)
        all_cells[0][6][0] = cost
        contrib = jnp.stack([
            jnp.concatenate([jnp.concatenate(c, axis=1) for c in cells], axis=0)
            for cells in all_cells
        ])  # (F, 8, 8)

        @pl.when(i == 0)
        def _():
            pose_ref[:] = contrib

        @pl.when(i > 0)
        def _():
            pose_ref[:] = pose_ref[:] + contrib

    return kernel


@functools.partial(jax.jit, static_argnames=("delta",))
def local_ba_blocks(
    poses: jax.Array,
    Xt: jax.Array,
    obsT: jax.Array,
    maskf: jax.Array,
    cam,
    delta: float,
    urmT: jax.Array | None = None,
):
    """Fused normal-equation block build for local BA.

    poses (F,4,4); Xt (3,L); obsT (F,2,L); maskf (F,L) float {0,1};
    cam a Camera.  ``urmT`` (F,2,L), if given, adds the stereo residual row
    per observation: row 0 = right-image u observation, row 1 = stereo
    validity weight {0,1} (matches ops/local_ba's obs_ur/obs_r_mask
    semantics, so the production window-BA path — which always carries
    stereo edges — keeps this fused build).  Returns (Hcc (F,6,6),
    Hcp (F,L,6,3), Hpp (L,3,3), gc (F,6), gp (L,3), cost ()) — matching
    ops/local_ba.build_normal_equations.
    """
    F = poses.shape[0]
    L = Xt.shape[1]
    assert L % LB_BLOCK == 0, "landmark count must be a multiple of LB_BLOCK"
    stereo = urmT is not None
    # intrinsics ride in pose-buffer row F (fx/fy/cx/cy at [F,0,:4], bf at
    # [F,1,0]); the buffer is padded to a sublane multiple
    n_rows = -(-(F + 1) // 8) * 8
    P = jnp.zeros((n_rows, 4, 4), jnp.float32).at[:F].set(poses)
    P = P.at[F, 0, :4].set(jnp.stack([cam.fx, cam.fy, cam.cx, cam.cy]))
    P = P.at[F, 1, 0].set(cam.bf)
    n_pl = 12 + 18 * F
    in_specs = [
        pl.BlockSpec((n_rows, 4, 4), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((3, LB_BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((F, 2, LB_BLOCK), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((F, LB_BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM),
    ]
    operands = [P, Xt, obsT, maskf]
    if stereo:
        in_specs.append(
            pl.BlockSpec((F, 2, LB_BLOCK), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
        )
        operands.append(urmT)
    pl_out, pose_out = pl.pallas_call(
        _local_kernel(F, delta, stereo),
        out_shape=(
            jax.ShapeDtypeStruct((n_pl, L), jnp.float32),
            jax.ShapeDtypeStruct((F, 8, 8), jnp.float32),
        ),
        grid=(L // LB_BLOCK,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((n_pl, LB_BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((F, 8, 8), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ),
        interpret=jax.default_backend() == "cpu",
    )(*operands)

    Hpp = pl_out[:9].T.reshape(L, 3, 3)
    gp = pl_out[9:12].T
    Hcp = pl_out[12:].reshape(F, 6, 3, L).transpose(0, 3, 1, 2)
    Hcc = pose_out[:, :6, :6]
    gc = pose_out[:, :6, 6]
    cost = pose_out[0, 6, 0]
    return Hcc, Hcp, Hpp, gc, gp, cost
