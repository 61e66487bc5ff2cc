"""Pallas kernel: per-keypoint stereo matching costs.

The sparse-stereo op needs a (K, D) cost tensor — each keypoint's truncated
color+gradient matching cost against D disparity candidates (ops/stereo.py).
The XLA formulations either gather per-keypoint strips (gather-heavy) or
compute D whole-image cost maps (~8 ms of the tracking step on v5e for work
whose useful output is 512x64 floats).  This kernel reads *only* the strips
it needs, straight from HBM into VMEM, and arranges the math so the
disparity axis lies along VPU lanes:

  cost(kp, s) = sum_{y, wx} [ wc * min(|L[y, wx] - R[y, wx + s]|, tc)
                            + wg * min(|GL[y, wx] - GR[y, wx + s]|, tg) ]

For a block of 8 keypoints the inner update is an (8, D) tile op — one VPU
tile per (y, wx) term, 49 terms per block.  Strip origins arrive as
scalar-prefetch operands so the per-keypoint DMAs can be issued before the
body runs (pltpu.PrefetchScalarGridSpec).

Disparity mapping matches ops/stereo.py "strips" mode: strip lane s
corresponds to disparity d = D - 1 - s; the caller flips and masks.

STATUS: experimental.  Bit-exact vs the XLA "strips" path under the Pallas
interpreter (tests/test_stereo_pallas.py), but the compiled Mosaic path
currently rejects the unaligned per-keypoint DMAs ("slice shape along
dimension 0 must be aligned to tiling (8), but is 7") — keypoint strips have
arbitrary origins, and v5e DMA slicing wants sublane(8)/lane(128)-aligned
extents when the source lands in VMEM.  The planned fix is a row-block
redesign: grid over 8-row image bands with keypoints bucketed per band via
scalar prefetch, so every DMA is (8, 128)-aligned.  Until then the tracker
defaults to the "volume" XLA formulation (see StereoConfig.sparse_mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

KP_BLOCK = 8


def _kernel_factory(D: int, r: int, wc, wg, tc, tg, H: int, W: int):
    P = 2 * r + 1
    Ws = D + 2 * r

    def kernel(y0_ref, xl0_ref, xr0_ref, left_ref, right_ref, gl_ref, gr_ref,
               out_ref, lbuf, rbuf, glbuf, grbuf, sems):
        blk = pl.program_id(0)

        # DMA the 8 keypoints' strips: left patch cols [xl0, xl0+P),
        # right strip cols [xr0, xr0+Ws), rows [y0, y0+P)
        for i in range(KP_BLOCK):
            k = blk * KP_BLOCK + i
            y0 = y0_ref[k]
            xl = xl0_ref[k]
            xr = xr0_ref[k]
            pltpu.make_async_copy(
                left_ref.at[pl.ds(y0, P), pl.ds(xl, P)], lbuf.at[i], sems.at[i, 0]
            ).start()
            pltpu.make_async_copy(
                gl_ref.at[pl.ds(y0, P), pl.ds(xl, P)], glbuf.at[i], sems.at[i, 1]
            ).start()
            pltpu.make_async_copy(
                right_ref.at[pl.ds(y0, P), pl.ds(xr, Ws)], rbuf.at[i], sems.at[i, 2]
            ).start()
            pltpu.make_async_copy(
                gr_ref.at[pl.ds(y0, P), pl.ds(xr, Ws)], grbuf.at[i], sems.at[i, 3]
            ).start()
        for i in range(KP_BLOCK):
            k = blk * KP_BLOCK + i
            y0 = y0_ref[k]
            xl = xl0_ref[k]
            xr = xr0_ref[k]
            pltpu.make_async_copy(
                left_ref.at[pl.ds(y0, P), pl.ds(xl, P)], lbuf.at[i], sems.at[i, 0]
            ).wait()
            pltpu.make_async_copy(
                gl_ref.at[pl.ds(y0, P), pl.ds(xl, P)], glbuf.at[i], sems.at[i, 1]
            ).wait()
            pltpu.make_async_copy(
                right_ref.at[pl.ds(y0, P), pl.ds(xr, Ws)], rbuf.at[i], sems.at[i, 2]
            ).wait()
            pltpu.make_async_copy(
                gr_ref.at[pl.ds(y0, P), pl.ds(xr, Ws)], grbuf.at[i], sems.at[i, 3]
            ).wait()

        # accumulate (KP_BLOCK, D) costs; lanes = strip offset s
        acc = jnp.zeros((KP_BLOCK, D), jnp.float32)
        for y in range(P):
            for wx in range(P):
                lv = lbuf[:, y, wx][:, None]          # (8, 1)
                gv = glbuf[:, y, wx][:, None]
                rs = rbuf[:, y, wx : wx + D]          # (8, D)
                gs = grbuf[:, y, wx : wx + D]
                ci = jnp.minimum(jnp.abs(lv - rs), tc)
                cg = jnp.minimum(jnp.abs(gv - gs), tg)
                acc = acc + wc * ci + wg * cg
        out_ref[:] = acc

    return kernel, P, Ws


@functools.partial(jax.jit, static_argnames=("D", "r", "wc", "wg", "tc", "tg"))
def keypoint_stereo_costs(
    left: jax.Array,
    right: jax.Array,
    gl: jax.Array,
    gr: jax.Array,
    y0: jax.Array,
    xl0: jax.Array,
    xr0: jax.Array,
    D: int,
    r: int,
    wc: float,
    wg: float,
    tc: float,
    tg: float,
) -> jax.Array:
    """(K,) strip origins -> (K, D) costs at strip offsets (s = D-1-d).

    y0/xl0/xr0 must be pre-clamped to keep all strips in-bounds.
    """
    K = y0.shape[0]
    assert K % KP_BLOCK == 0, "keypoint count must be a multiple of KP_BLOCK"
    H, W = left.shape
    kernel, P, Ws = _kernel_factory(D, r, wc, wg, tc, tg, H, W)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(K // KP_BLOCK,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (KP_BLOCK, D), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((KP_BLOCK, P, P), jnp.float32),
            pltpu.VMEM((KP_BLOCK, P, Ws), jnp.float32),
            pltpu.VMEM((KP_BLOCK, P, P), jnp.float32),
            pltpu.VMEM((KP_BLOCK, P, Ws), jnp.float32),
            pltpu.SemaphoreType.DMA((KP_BLOCK, 4)),
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((K, D), jnp.float32),
        grid_spec=grid_spec,
        interpret=jax.default_backend() == "cpu",
    )(y0.astype(jnp.int32), xl0.astype(jnp.int32), xr0.astype(jnp.int32),
      left, right, gl, gr)
