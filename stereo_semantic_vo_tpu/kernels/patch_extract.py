"""Pallas kernel: batched square-patch extraction at keypoint centers.

The ORB describe path needs a (2r+1)^2 patch around every keypoint
(ops/orb._patches; reference analogue: the per-keypoint IC_Angle /
computeOrbDescriptor patch walks inside cv::ORB, frame.cc:75-79).  The XLA
formulations are all scalar-core bound on TPU: the vmapped dynamic_slice
path serializes K slice ops — 0.792 ms at K=512/31x31 vs this kernel's
0.039 ms (20x; benchmarks/kernel_bench.json "patch_extract_K512_31x31",
measured at HEAD on v5e).  This kernel streams aligned tiles with
double-buffered DMA exactly like kernels/sparse_stereo.py and realigns in
VMEM with hardware dynamic-rotates.

Output layout: (K, 8, 128)-tiled slabs, patch at [k, :P, :P] with P = 2r+1
<= 32, rest undefined padding.  Consumers fold the slab stride into their
static weight matrices (ops/orb._upright_onehots / _orientation weights
built at slab indices), so the padding is never touched and nothing is ever
re-sliced or re-laid-out.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

KP_BLOCK = 8
RAW_H = 40    # aligned rows fetched per keypoint: 7 (origin slack) + 31 <= 40
RAW_W = 256   # aligned lanes fetched per keypoint: 127 (slack) + 31 <= 256
SLAB_H = 32   # output rows per keypoint (patch rows <= 31)
LANES = 128   # output lanes per keypoint (patch cols <= 31)


def _kernel(y0_ref, x0_ref, img_ref, out_ref, raw, sems):
    b = pl.program_id(0)
    nb = pl.num_programs(0)

    def copies(block, slot):
        out = []
        for i in range(KP_BLOCK):
            k = block * KP_BLOCK + i
            by = (y0_ref[k] // 8) * 8
            bx = (x0_ref[k] // LANES) * LANES
            out.append(pltpu.make_async_copy(
                img_ref.at[pl.ds(by, RAW_H), pl.ds(bx, RAW_W)],
                raw.at[slot, i], sems.at[slot, i]))
        return out

    @pl.when(b == 0)
    def _():
        for c in copies(0, 0):
            c.start()

    @pl.when(b + 1 < nb)
    def _():
        for c in copies(b + 1, (b + 1) % 2):
            c.start()

    slot = b % 2
    for c in copies(b, slot):
        c.wait()

    for i in range(KP_BLOCK):
        k = b * KP_BLOCK + i
        oy = y0_ref[k] - (y0_ref[k] // 8) * 8
        ox = x0_ref[k] - (x0_ref[k] // LANES) * LANES
        t = pltpu.roll(raw[slot, i], RAW_H - oy, 0)   # row j <- raw[j + oy]
        t = pltpu.roll(t, RAW_W - ox, 1)              # lane c <- raw[c + ox]
        out_ref[i] = t[:SLAB_H, :LANES]


@functools.partial(jax.jit, static_argnames=("r",))
def extract_patches(img: jax.Array, y0: jax.Array, x0: jax.Array, r: int) -> jax.Array:
    """(K,) patch origins (top-left, pre-clamped to stay in-image) ->
    (K, SLAB_H, LANES) slabs with the (2r+1)^2 patch at [:, :P, :P].

    img: (H, W) float32.  P = 2r+1 must be <= 31 (SLAB_H leaves one row of
    roll slack; LANES covers any origin misalignment).
    """
    P = 2 * r + 1
    assert P <= 31, "patch too large for the slab layout"
    K = y0.shape[0]
    Kp = ((K + KP_BLOCK - 1) // KP_BLOCK) * KP_BLOCK
    if Kp != K:  # pad to a whole block; extra slots read origin (0, 0)
        y0 = jnp.pad(y0, (0, Kp - K))
        x0 = jnp.pad(x0, (0, Kp - K))
    H, W = img.shape

    # wrapped margins so every aligned (RAW_H, RAW_W) tile is in-bounds
    Hpad = 8 * ((H - 1) // 8) + RAW_H
    Wpad = LANES * ((W - 1) // LANES) + RAW_W
    ip = jnp.pad(img, ((0, Hpad - H), (0, Wpad - W)), mode="wrap")

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(Kp // KP_BLOCK,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (KP_BLOCK, SLAB_H, LANES), lambda i, *_: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, KP_BLOCK, RAW_H, RAW_W), jnp.float32),
            pltpu.SemaphoreType.DMA((2, KP_BLOCK)),
        ],
    )
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((Kp, SLAB_H, LANES), jnp.float32),
        grid_spec=grid_spec,
        interpret=jax.default_backend() == "cpu",
    )(y0.astype(jnp.int32), x0.astype(jnp.int32), ip)
    return out[:K]
