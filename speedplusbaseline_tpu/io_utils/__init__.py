from .assets import (
    load_tango_3d_keypoints,
    load_camera_intrinsics,
    load_attitude_classes,
    default_assets_dir,
)
from .meters import AverageMeter, report_progress, setup_logger
from .summary import SummaryWriter
from .checkpoint import save_checkpoint, load_checkpoint, checkpoint_exists

__all__ = [
    "load_tango_3d_keypoints",
    "load_camera_intrinsics",
    "load_attitude_classes",
    "default_assets_dir",
    "AverageMeter",
    "report_progress",
    "setup_logger",
    "SummaryWriter",
    "save_checkpoint",
    "load_checkpoint",
    "checkpoint_exists",
]
