from stereo_semantic_vo_tpu.core.config import (  # noqa: F401
    BAConfig,
    CameraConfig,
    MatcherConfig,
    ORBConfig,
    PnPConfig,
    SemanticConfig,
    StereoConfig,
    VOConfig,
    WindowConfig,
)
from stereo_semantic_vo_tpu.core.camera import (  # noqa: F401
    Camera,
    backproject,
    disparity_to_depth,
    project,
    right_keypoint_x,
)
from stereo_semantic_vo_tpu.core import lie  # noqa: F401
