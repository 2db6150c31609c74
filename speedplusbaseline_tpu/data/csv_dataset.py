"""CSV-row datasets — reference Park2019KRNDataset.py / SPNDataset.py.

CSV schema (reference preprocess.py:104-114):
  imagepath, xmin, xmax, ymin, ymax, q0..q3, t1..t3, then
    KRN: kx1, ky1, ..., kxK, kyK           (pixel coords)
    SPN: class_1..class_n, weight_1..weight_n

CSV path selection logic matches Park2019KRNDataset.py:52-66:
  train + source  -> {train_domain}/splits_{model}/{train_csv}   (labeled)
  train + !source -> {test_domain}/splits_{model}/{test_csv}     (unlabeled, DANN)
  eval            -> {test_domain}/splits_{model}/{test_csv}

Samples return numpy dicts; decode is PIL/cv2 on the host, the RoI crop comes
from data/transforms.py, and everything downstream (augs, model) is on-device.
Per-sample RNG is a Philox stream keyed by (seed, epoch, index) so any worker
arrangement reproduces the same augmentations.
"""
from __future__ import annotations

import logging
import os.path as osp
from typing import Dict, Optional

import numpy as np
import pandas as pd

from .transforms import crop_params, random_crop, resize_crop

logger = logging.getLogger(__name__)


def _imread(path: str) -> np.ndarray:
    """Decode an image to RGB uint8 (H, W, 3)."""
    try:
        import cv2

        img = cv2.imread(path, cv2.IMREAD_COLOR)
        if img is None:
            raise IOError(f"failed to decode {path}")
        return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    except ImportError:  # pragma: no cover
        from PIL import Image

        return np.asarray(Image.open(path).convert("RGB"))


class _CSVDataset:
    def __init__(self, cfg, is_train: bool, is_source: bool):
        self.is_train = is_train
        self.root = osp.join(cfg.dataroot, cfg.dataname)
        self.input_shape = tuple(cfg.input_shape)
        self.seed = cfg.seed

        # Native decode core: fuses JPEG decode (DCT-domain downscaled) +
        # crop + bilinear resize in one C call — the host-side hot path.
        self.use_native = bool(getattr(cfg, "use_native_loader", False))
        if self.use_native:
            from ..native import native_available

            if not native_available():
                logger.warning("native loader requested but not built "
                               "(make -C speedplusbaseline_tpu/native); "
                               "falling back to cv2/PIL")
                self.use_native = False

        if is_train and is_source:
            domain = cfg.train_domain
            csvfile = osp.join(self.root, domain,
                               "splits_" + cfg.model_name, cfg.train_csv)
        else:
            domain = cfg.test_domain
            csvfile = osp.join(self.root, domain,
                               "splits_" + cfg.model_name, cfg.test_csv)
        logger.info("%s from %s", "Training" if is_train else "Testing", csvfile)
        self.csv = pd.read_csv(csvfile, header=None)

        # Pre-decoded RoI cache (data/cache.py): swap the 1920x1200 frame for
        # a small cached crop and work in its coordinate frame.
        self.cache = None
        cache_dir = getattr(cfg, "cache_dir", "")
        if cache_dir:
            from .cache import load_manifest

            self.cache = load_manifest(cache_dir, cfg.dataname, domain)
            if self.cache is None:
                logger.warning(
                    "--cache_dir set but no manifest for domain %s under %s "
                    "(build with scripts/cache_dataset.py); decoding full "
                    "frames", domain, cache_dir)
            else:
                logger.info("RoI cache: %d images (%s/%s)", len(self.cache),
                            cache_dir, domain)

    def __len__(self):
        return len(self.csv)

    def rng_for(self, epoch: int, index: int) -> np.random.Generator:
        return np.random.Generator(
            np.random.Philox(key=np.uint64([(self.seed << 20) + epoch, index]))
        )

    def _row_common(self, index: int):
        row = self.csv.iloc[index]
        rel = str(row[0]).strip()
        imgpath = osp.join(self.root, rel)
        bbox = np.array(row[1:5], dtype=np.float32)
        entry = self.cache.get(rel) if self.cache is not None else None
        if entry is not None:
            imgpath = entry[0]
        return row, imgpath, bbox, entry


class KRNDataset(_CSVDataset):
    def __init__(self, cfg, is_train=True, is_source=True, load_labels=True):
        super().__init__(cfg, is_train, is_source)
        self.load_labels = load_labels
        self.num_keypts = cfg.num_keypoints
        if is_train and is_source:
            assert load_labels
        if is_train and not is_source:
            assert not load_labels  # DANN target stream is unlabeled

    def __getitem__(self, index: int, epoch: int = 0) -> Dict[str, np.ndarray]:
        row, imgpath, bbox, centry = self._row_common(index)

        if self.is_train and self.load_labels:
            keypts = np.array(row[12:12 + 2 * self.num_keypts], dtype=np.float32)
            keypts = np.reshape(keypts, (self.num_keypts, 2)).T  # (2, K)
        else:
            keypts = np.zeros((2, self.num_keypts), dtype=np.float32)

        if centry is not None:
            from .cache import to_cache_coords

            bbox, keypts = to_cache_coords(centry, bbox, keypts)

        rng = self.rng_for(epoch, index)
        if self.use_native:
            from ..native import decode_crop_resize, image_size

            w, h = image_size(imgpath)
            cxmin, cxmax, cymin, cymax = crop_params(rng, bbox, w, h,
                                                     self.is_train)
            crop = decode_crop_resize(
                imgpath, (cxmin, cymin, cxmax - cxmin, cymax - cymin),
                self.input_shape)
            bbox = np.array([cxmin, cxmax, cymin, cymax], dtype=np.float32)
            keypts = keypts.copy()
            keypts[0] = (keypts[0] - cxmin) / max(cxmax - cxmin, 1)
            keypts[1] = (keypts[1] - cymin) / max(cymax - cymin, 1)
        else:
            image = _imread(imgpath)
            crop, bbox, keypts = random_crop(
                rng, image, bbox, keypts, self.input_shape, self.is_train)

        if self.is_train:
            if self.load_labels:
                return {"image": crop, "keypts": keypts}
            return {"image": crop}
        if centry is not None:
            # The pose pipeline denormalizes keypoints with the crop box in
            # ORIGINAL camera pixels (inference.py:63-78); map it back.
            from .cache import to_original_coords

            bbox = to_original_coords(centry, bbox)
        q_gt = np.array(row[5:9], dtype=np.float32)
        t_gt = np.array(row[9:12], dtype=np.float32)
        return {"image": crop, "bbox": bbox, "q_gt": q_gt, "t_gt": t_gt}


class SPNDataset(_CSVDataset):
    def __init__(self, cfg, is_train=True, is_source=True):
        super().__init__(cfg, is_train, is_source)
        self.num_classes = cfg.num_classes
        self.num_neighbors = cfg.num_neighbors

    def __getitem__(self, index: int, epoch: int = 0) -> Dict[str, np.ndarray]:
        row, imgpath, bbox, centry = self._row_common(index)
        # ResizeCrop returns the ORIGINAL csv bbox (transforms.py:166-190);
        # with the cache, cropping happens in cache coords but the returned
        # bbox stays the original (compute_position_spn consumes it).
        orig_bbox = np.asarray(bbox, dtype=np.float32)
        if centry is not None:
            from .cache import to_cache_coords

            bbox, _ = to_cache_coords(centry, bbox)
        if self.use_native:
            from ..native import decode_crop_resize, image_size

            w, h = image_size(imgpath)
            cxmin = max(0, int(bbox[0]))
            cxmax = min(w, int(bbox[1]))
            cymin = max(0, int(bbox[2]))
            cymax = min(h, int(bbox[3]))
            crop = decode_crop_resize(
                imgpath, (cxmin, cymin, cxmax - cxmin, cymax - cymin),
                self.input_shape)
            bbox = orig_bbox
        else:
            image = _imread(imgpath)
            crop, _ = resize_crop(image, bbox, self.input_shape)
            bbox = orig_bbox

        if self.is_train:
            att_classes = np.array(
                row[12:12 + self.num_neighbors], dtype=np.int32)
            att_weights = np.array(
                row[12 + self.num_neighbors:12 + 2 * self.num_neighbors],
                dtype=np.float32)
            # n-hot targets over num_classes dims (SPNDataset.py:83-94)
            y_classes = np.zeros(self.num_classes, dtype=np.float32)
            y_classes[att_classes] = 1.0 / self.num_neighbors
            y_weights = np.zeros(self.num_classes, dtype=np.float32)
            y_weights[att_classes] = att_weights
            return {"image": crop, "y_classes": y_classes, "y_weights": y_weights}
        q_gt = np.array(row[5:9], dtype=np.float32)
        t_gt = np.array(row[9:12], dtype=np.float32)
        return {"image": crop, "bbox": bbox, "q_gt": q_gt, "t_gt": t_gt}


def build_dataset(cfg, is_train=True, is_source=True, load_labels=True):
    """Dataset factory (reference src/datasets/build.py:34-43)."""
    if cfg.model_name == "krn":
        return KRNDataset(cfg, is_train, is_source, load_labels)
    if cfg.model_name == "spn":
        return SPNDataset(cfg, is_train, is_source)
    raise ValueError(f"unknown model_name: {cfg.model_name}")
