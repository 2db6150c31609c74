from .transforms import random_crop, resize_crop
from .csv_dataset import KRNDataset, SPNDataset, build_dataset
from .loader import DataLoader, make_dataloader
from .synthetic import generate_attitude_classes, generate_fake_speedplus

__all__ = [
    "random_crop",
    "resize_crop",
    "KRNDataset",
    "SPNDataset",
    "build_dataset",
    "DataLoader",
    "make_dataloader",
    "generate_attitude_classes",
    "generate_fake_speedplus",
]
