from .pose_score import (
    error_translation,
    error_orientation,
    speed_score,
    speed_score_batched,
    ROT_THRESH_DEG,
    POS_THRESH,
)

__all__ = [
    "error_translation",
    "error_orientation",
    "speed_score",
    "speed_score_batched",
    "ROT_THRESH_DEG",
    "POS_THRESH",
]
