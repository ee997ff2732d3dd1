from geneface_tpu.inference.landmark_postprocess import (  # noqa: F401
    clamp_lm3d_regions,
    close_mouth_when_silent,
    ema_smooth_lm3d,
    gaussian_smooth_lm3d,
    get_win_conds,
    inject_blinks,
    lle_project_lm3d,
)
from geneface_tpu.inference.audio2motion_infer import Audio2MotionInfer  # noqa: F401
from geneface_tpu.inference.audio2pose_infer import Audio2PoseInfer  # noqa: F401
from geneface_tpu.inference.nerf_infer import (  # noqa: F401
    ADNeRFInfer,
    LM3dNeRFInfer,
)
from geneface_tpu.inference.postnet_infer import PostnetInfer  # noqa: F401
from geneface_tpu.inference.radnerf_infer import RADNeRFInfer, save_mp4  # noqa: F401
