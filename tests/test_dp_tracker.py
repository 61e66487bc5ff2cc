"""Data-parallel tracker on the 8-device CPU mesh: 8 independent streams must
evolve exactly like 8 single-stream trackers."""

import jax
import jax.numpy as jnp
import numpy as np

from stereo_semantic_vo_tpu.engine.state import init_state
from stereo_semantic_vo_tpu.engine.tracker import FrameInput, init_step, track_step
from stereo_semantic_vo_tpu.parallel import mesh as mesh_utils
from stereo_semantic_vo_tpu.parallel.dp_tracker import batched_init_state, make_dp_tracker
from stereo_semantic_vo_tpu.parallel.mesh import DATA_AXIS
from tests.test_tracker import CFG, empty_boxes, render


def batch_frames(frames):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *frames)


class TestDPTracker:
    def test_matches_single_stream(self):
        B = 8
        m = mesh_utils.make_mesh(B, axis=DATA_AXIS)
        step = make_dp_tracker(m, CFG)
        states = batched_init_state(CFG, B)
        boxes, bv = empty_boxes()

        # all streams get the same synthetic sequence (easy exact check)
        single = init_state(CFG)
        for t in range(3):
            left, right = render(t)
            fr = FrameInput(left=left, right=right, boxes=boxes, boxes_valid=bv)
            states, outs = step(states, batch_frames([fr] * B))
            if t == 0:
                single, sout = init_step(single, fr, CFG)
            else:
                single, sout = track_step(single, fr, CFG)

        # every stream agrees with the single-device tracker
        for b in range(B):
            np.testing.assert_allclose(
                np.asarray(outs.T_cw[b]), np.asarray(sout.T_cw), atol=1e-5
            )
        np.testing.assert_array_equal(
            np.asarray(states.frame_idx), np.full(B, int(single.frame_idx))
        )

    def test_staggered_starts(self):
        B = 2
        m = mesh_utils.make_mesh(B, axis=DATA_AXIS)
        step = make_dp_tracker(m, CFG)
        states = batched_init_state(CFG, B)
        # stream 1 starts one frame late: frame_idx stays -1 until its init
        boxes, bv = empty_boxes()
        l0, r0 = render(0)
        fr0 = FrameInput(left=l0, right=r0, boxes=boxes, boxes_valid=bv)
        states, _ = step(states, batch_frames([fr0, fr0]))
        assert np.asarray(states.frame_idx).tolist() == [0, 0]
        l1, r1 = render(1)
        fr1 = FrameInput(left=l1, right=r1, boxes=boxes, boxes_valid=bv)
        states, outs = step(states, batch_frames([fr1, fr1]))
        assert np.asarray(states.frame_idx).tolist() == [1, 1]
        assert bool(outs.pnp_ok[0]) and bool(outs.pnp_ok[1])
