"""Tracking-lost recovery: blank out frames mid-sequence so PnP fails, then
verify the pipeline reseeds the map and keeps tracking afterwards."""

import numpy as np

from stereo_semantic_vo_tpu.engine.pipeline import VOPipeline
from tests.test_tracker import CFG, H, W, render


def frames_with_blackout(n, blackout=(2, 3, 4)):
    for t in range(n):
        if t in blackout:
            left = right = np.zeros((H, W), np.float32)
        else:
            l, r = render(t)
            left, right = np.asarray(l), np.asarray(r)
        yield t, left, right, None, None, t * 0.1


class TestRecovery:
    def test_reseed_after_lost(self):
        pipe = VOPipeline(CFG, out_dir=None, write_trajectory=False, reinit_after_lost=2)
        for item in frames_with_blackout(8):
            t, left, right, _, _, ts = item
            pipe.process_frame(left, right, None, None, ts)
        pipe.flush()
        assert pipe.n_reinits >= 1
        # after recovery the last frames track again
        assert bool(pipe.outputs[-1].pnp_ok)
        assert int(pipe.outputs[-1].n_matches_last) > 20

    def test_no_reseed_when_disabled(self):
        pipe = VOPipeline(CFG, out_dir=None, write_trajectory=False, reinit_after_lost=0)
        for item in frames_with_blackout(7):
            t, left, right, _, _, ts = item
            pipe.process_frame(left, right, None, None, ts)
        pipe.flush()
        assert pipe.n_reinits == 0
