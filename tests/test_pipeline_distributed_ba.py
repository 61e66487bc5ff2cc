"""Config-5 integration (BASELINE.json): the full tracking pipeline with the
landmark-sharded distributed Schur BA refining the window on an 8-device mesh."""

import numpy as np

from stereo_semantic_vo_tpu.engine.pipeline import VOPipeline
from stereo_semantic_vo_tpu.parallel import mesh as mesh_utils
from tests.test_tracker import CFG, TX_STEP, render


def frames(n):
    for t in range(n):
        l, r = render(t)
        yield t, np.asarray(l), np.asarray(r), None, None, t * 0.1


class TestPipelineWithDistributedBA:
    def test_full_pipeline_sharded_ba(self):
        m = mesh_utils.make_mesh(8)
        pipe = VOPipeline(
            CFG, out_dir=None, write_trajectory=False,
            local_ba_every=2, ba_mesh=m,
        )
        pipe.run(frames(6), prefetch=False)
        # distributed refinement ran and tracking stayed accurate
        assert pipe.window_ba is not None and pipe.window_ba._sharded is not None
        pos = pipe.writer.positions()
        assert len(pipe.outputs) == 6
        last = np.asarray(pipe.outputs[-1].T_wc)[:3, 3]
        gt = np.array([5 * TX_STEP, 0.0, 0.0])
        assert np.linalg.norm(last - gt) < 0.08
