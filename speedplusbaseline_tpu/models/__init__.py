from .krn import KeypointRegressionNet
from .spn import SpacecraftPoseNet, softmax_cross_entropy_with_logits
from .revgrad import RevGrad, grad_reverse
from .ghiasi import Ghiasi
from .build import get_model

__all__ = [
    "KeypointRegressionNet",
    "SpacecraftPoseNet",
    "softmax_cross_entropy_with_logits",
    "RevGrad",
    "grad_reverse",
    "Ghiasi",
    "get_model",
]
