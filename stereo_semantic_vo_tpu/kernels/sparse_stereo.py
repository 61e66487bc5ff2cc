"""Pallas kernel: per-keypoint stereo matching costs (Mosaic-aligned).

The sparse-stereo op needs a (K, D) cost tensor — each keypoint's truncated
color+gradient matching cost against D disparity candidates (ops/stereo.py,
replacing the reference's dense-solve-then-sample order, frame.cc:82-164 ->
Thirdparty/MB/MSA.cpp:1132).  The XLA formulations either gather per-keypoint
strips (gather-bound) or compute D whole-image cost maps (~1.4 ms on v5e for
work whose useful output is 512x48 floats).  This kernel reads only aligned
tiles covering the strips, so HBM traffic drops ~30x.

Design (round-3 redesign; the round-1/2 version DMA'd exact-extent strips at
arbitrary origins, which Mosaic rejects — DMA slices must be sublane(8)/
lane(128) aligned):

* The caller pads the images with a 128-column wrapped left margin (and
  wrapped right/bottom margins), so every keypoint's strip sits inside an
  8-row x 128-lane ALIGNED (16, 256) tile: rows 8*floor(y0/8), lanes
  128*floor((x0-1)/128).  All DMAs are tile-aligned by construction.
* Grid over blocks of KP_BLOCK=8 keypoints, DOUBLE-BUFFERED: block b+1's
  tiles stream in while block b computes (scratch slot = b % 2).
* In-VMEM realignment: each keypoint's (8, 128) window (one col of slack on
  the left for the gradient) is copied from its raw tile with a dynamic
  in-VMEM slice — allowed at arbitrary offsets, unlike DMA.
* x-gradients are computed in-kernel from the realigned windows (the wrap
  padding makes them bit-identical to ops/stereo._xgrad's jnp.roll at image
  edges), halving the DMA traffic vs shipping precomputed gradient planes.
* Accumulation keeps the disparity axis on VPU lanes: for each of the 7
  window columns wx, one lane-roll of the right window lines disparity
  candidates up against the left column, and a masked sublane reduction sums
  the 7 window rows — (8 kp, 128) tile ops only, no sub-tile shapes.

Strip lane s corresponds to disparity d = D - 1 - s (the caller flips and
masks, ops/stereo.py "pallas" mode).  Matches the XLA "strips" formulation
bit-for-bit in tests/test_stereo_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

KP_BLOCK = 8
RAW_H = 16    # aligned tile rows fetched per keypoint (window needs <= 15)
RAW_W = 256   # aligned tile lanes fetched per keypoint (window needs <= 129+54)
LANES = 128   # realigned window width


def _kernel_factory(D: int, r: int, wc, wg, tc, tg):
    P = 2 * r + 1

    def origins(y0_ref, xl0_ref, xr0_ref, k):
        y0 = y0_ref[k]
        xl = xl0_ref[k]
        xr = xr0_ref[k]
        by = (y0 // 8) * 8
        bl = ((xl - 1) // LANES) * LANES
        br = ((xr - 1) // LANES) * LANES
        return y0, xl, xr, by, bl, br

    def kernel(y0_ref, xl0_ref, xr0_ref, left_ref, right_ref, out_ref,
               lraw, rraw, lsc, rsc, sems):
        b = pl.program_id(0)
        nb = pl.num_programs(0)

        def copies(block, slot):
            out = []
            for i in range(KP_BLOCK):
                k = block * KP_BLOCK + i
                _, _, _, by, bl, br = origins(y0_ref, xl0_ref, xr0_ref, k)
                out.append(pltpu.make_async_copy(
                    left_ref.at[pl.ds(by, RAW_H), pl.ds(bl, RAW_W)],
                    lraw.at[slot, i], sems.at[slot, i, 0]))
                out.append(pltpu.make_async_copy(
                    right_ref.at[pl.ds(by, RAW_H), pl.ds(br, RAW_W)],
                    rraw.at[slot, i], sems.at[slot, i, 1]))
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

        # realign: window origin (y0, x0-1) -> offset (0, 0).  Mosaic only
        # vector-loads at tile-aligned offsets, so the arbitrary offset is
        # removed with two dynamic rotates (hardware dynamic_rotate) and a
        # static slice instead of a dynamic one.
        for i in range(KP_BLOCK):
            k = b * KP_BLOCK + i
            y0, xl, xr, by, bl, br = origins(y0_ref, xl0_ref, xr0_ref, k)
            oy = y0 - by

            def realign(raw, ox):
                t = pltpu.roll(raw, RAW_H - oy, 0)   # row j <- raw[j + oy]
                t = pltpu.roll(t, RAW_W - ox, 1)     # lane c <- raw[c + ox]
                return t[:8, :LANES]

            lsc[i] = realign(lraw[slot, i], xl - 1 - bl)
            rsc[i] = realign(rraw[slot, i], xr - 1 - br)

        L = lsc[:]   # (KPB, 8, 128); lane c = image col x0 - 1 + c
        R = rsc[:]
        # x-gradient, lane-local: (img[c+1] - img[c-1]) * 0.5.  Lane 0 and
        # lane 127 wrap garbage; used lanes are 1..P (left) / 1..P+D (right).
        # pltpu.roll wants non-negative shifts: -d == LANES-d (mod LANES).
        GL = (pltpu.roll(L, LANES - 1, 2) - pltpu.roll(L, 1, 2)) * 0.5
        GR = (pltpu.roll(R, LANES - 1, 2) - pltpu.roll(R, 1, 2)) * 0.5

        # rows: window uses rows 0..P-1 of the realigned slice; row P..7 off
        row = jax.lax.broadcasted_iota(jnp.int32, (KP_BLOCK, 8, 1), 1)
        rmask = (row < P).astype(jnp.float32)

        acc = jnp.zeros((KP_BLOCK, LANES), jnp.float32)
        for wx in range(P):
            # lane wx+1 of L against lanes wx+1+s of R for all strip
            # offsets s at once: one lane-roll of R by wx+1
            lv = L[:, :, wx + 1][..., None]          # (KPB, 8, 1)
            gv = GL[:, :, wx + 1][..., None]
            rs = pltpu.roll(R, LANES - (wx + 1), 2)   # lane s = R[wx+1+s]
            gs = pltpu.roll(GR, LANES - (wx + 1), 2)
            ci = jnp.minimum(jnp.abs(lv - rs), tc)
            cg = jnp.minimum(jnp.abs(gv - gs), tg)
            acc = acc + jnp.sum((wc * ci + wg * cg) * rmask, axis=1)
        out_ref[:] = acc

    return kernel, P


@functools.partial(jax.jit, static_argnames=("D", "r", "wc", "wg", "tc", "tg"))
def keypoint_stereo_costs(
    left: jax.Array,
    right: jax.Array,
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

    left/right: (H, W) float32.  y0/xl0/xr0 must be pre-clamped so strips
    stay inside the image (ops/stereo.py does this).  Gradients are derived
    in-kernel; thanks to the wrapped padding they equal ops/stereo._xgrad
    (jnp.roll semantics) everywhere, including image borders.
    """
    K = y0.shape[0]
    assert K % KP_BLOCK == 0, "keypoint count must be a multiple of KP_BLOCK"
    H, W = left.shape
    kernel, P = _kernel_factory(D, r, wc, wg, tc, tg)

    # padded geometry: 128 wrapped columns on the left (so the aligned tile
    # origin 128*floor((x0+128-1)/128) is never negative), wrapped right and
    # bottom margins so every (16, 256) tile is in-bounds
    Hpad = 8 * ((H - P) // 8) + RAW_H
    Wpad = LANES * ((W - P + LANES) // LANES) + LANES + RAW_W
    pad_spec = ((0, Hpad - H), (LANES, Wpad - LANES - W))
    lp = jnp.pad(left, pad_spec, mode="wrap")
    rp = jnp.pad(right, pad_spec, mode="wrap")

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(K // KP_BLOCK,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (KP_BLOCK, LANES), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, KP_BLOCK, RAW_H, RAW_W), jnp.float32),
            pltpu.VMEM((2, KP_BLOCK, RAW_H, RAW_W), jnp.float32),
            pltpu.VMEM((KP_BLOCK, 8, LANES), jnp.float32),
            pltpu.VMEM((KP_BLOCK, 8, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2, KP_BLOCK, 2)),
        ],
    )
    acc = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((K, LANES), jnp.float32),
        grid_spec=grid_spec,
        interpret=jax.default_backend() == "cpu",
    )(
        y0.astype(jnp.int32),
        (xl0 + LANES).astype(jnp.int32),
        (xr0 + LANES).astype(jnp.int32),
        lp,
        rp,
    )
    return acc[:, :D]
