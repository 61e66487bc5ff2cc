"""Pallas kernel: FAST-9/16 corner scoring (both thresholds in one pass).

One of the north-star kernels (BASELINE.md): the XLA formulation in
ops/orb.py materializes a (16, H, W) ring stack per threshold classify pass;
this kernel streams (8, 128) output tiles with a 3-px halo, keeps the whole
ring test in VMEM, and emits the iniThFAST *and* minThFAST responses from a
single ring read (the reference's two-threshold detect, ORBextractor
semantics per KITTI00-02.yaml:38-42).

Layout: grid over (row-band, lane-block) tiles of the padded image.  Each
program DMAs a (24, 384) halo block — 8-row / 128-lane aligned origins, so
Mosaic's DMA tiling constraints are satisfied by construction (the lesson
from kernels/sparse_stereo.py's arbitrary-origin strips) — computes the ring
test over the whole block with static in-VMEM shifts (jnp.roll wraparound
only touches halo rows/lanes, never the center tile), and writes the center.

Bit-exact vs ops/orb._fast_score (tests/test_fast_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stereo_semantic_vo_tpu.ops.orb import _ARC, _CIRCLE

TILE_H = 8
TILE_W = 128
HALO_H = 8    # one sublane tile of halo on each side (ring radius 3 <= 8)
HALO_W = 128  # one lane tile of halo on each side
BUF_H = TILE_H + 2 * HALO_H
BUF_W = TILE_W + 2 * HALO_W


def _kernel(thresholds: tuple[float, ...]):
    weights = (np.uint32(1) << np.arange(16)).astype(np.uint32)

    def kernel(img_ref, *rest):
        out_refs = rest[: len(thresholds)]
        buf, sem = rest[len(thresholds) :]
        i = pl.program_id(0)
        j = pl.program_id(1)
        cp = pltpu.make_async_copy(
            img_ref.at[pl.ds(i * TILE_H, BUF_H), pl.ds(j * TILE_W, BUF_W)],
            buf,
            sem,
        )
        cp.start()
        cp.wait()

        center = buf[:]
        # ring samples via static rolls: wraparound only corrupts the outer
        # halo, never the (8, 128) center this program writes
        diffs = [
            pltpu.roll(
                pltpu.roll(center, (-int(dy)) % BUF_H, 0), (-int(dx)) % BUF_W, 1
            )
            - center
            for dy, dx in _CIRCLE
        ]

        def arc_any(bits):
            m = jnp.zeros(center.shape, jnp.uint32)
            for b, w in zip(bits, weights):
                m = m | jnp.where(b, jnp.uint32(w), jnp.uint32(0))
            m2 = m | (m << 16)
            run = m2
            for k in range(1, _ARC):
                run = run & (m2 >> k)
            return (run & jnp.uint32(0xFFFF)) != 0

        for t_idx, threshold in enumerate(thresholds):
            t = jnp.float32(threshold)
            brighter = [d > t for d in diffs]
            darker = [d < -t for d in diffs]
            is_corner = arc_any(brighter) | arc_any(darker)
            sb = sum(jnp.where(b, d - t, 0.0) for b, d in zip(brighter, diffs))
            sd = sum(jnp.where(k, -d - t, 0.0) for k, d in zip(darker, diffs))
            score = jnp.where(is_corner, jnp.maximum(sb, sd), 0.0)
            out_refs[t_idx][:] = score[
                HALO_H : HALO_H + TILE_H, HALO_W : HALO_W + TILE_W
            ]

    return kernel


@functools.partial(jax.jit, static_argnames=("thresholds",))
def fast_scores_pallas(img: jax.Array, thresholds: tuple[float, ...]) -> list[jax.Array]:
    """FAST-9/16 response maps for each threshold.  img: (H, W) float32.

    Returns [(H, W) float32 score per threshold], 0 where not a corner —
    same contract as ops/orb._fast_score.
    """
    H, W = img.shape
    nh = -(-H // TILE_H)
    nw = -(-W // TILE_W)
    # pad so every (24, 384) halo read at origin (i*8, j*128) is in-bounds;
    # halo pixels are zeros, matching jnp.roll-free border handling closely
    # enough because the caller masks a >=3 px border anyway
    padded = jnp.zeros((nh * TILE_H + 2 * HALO_H, nw * TILE_W + 2 * HALO_W), img.dtype)
    padded = jax.lax.dynamic_update_slice(padded, img, (HALO_H, HALO_W))

    kernel = _kernel(thresholds)
    outs = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((nh * TILE_H, nw * TILE_W), jnp.float32)
            for _ in thresholds
        ],
        grid=(nh, nw),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec(
                (TILE_H, TILE_W), lambda i, j: (i, j), memory_space=pltpu.VMEM
            )
            for _ in thresholds
        ],
        scratch_shapes=[
            pltpu.VMEM((BUF_H, BUF_W), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=jax.default_backend() == "cpu",
    )(padded)
    return [o[:H, :W] for o in outs]
