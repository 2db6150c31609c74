"""Data pipeline tests: fake dataset -> preprocess -> datasets -> loader."""
import os

import numpy as np
import pytest

from speedplusbaseline_tpu.config import default_cfg
from speedplusbaseline_tpu.data import (
    KRNDataset,
    SPNDataset,
    generate_fake_speedplus,
    make_dataloader,
)
from speedplusbaseline_tpu.data.preprocess import get_quat_bins, json2csv
from speedplusbaseline_tpu.data.transforms import random_crop, resize_crop
from speedplusbaseline_tpu.io_utils.assets import load_attitude_classes


@pytest.fixture(scope="module")
def fake_root(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("speed"))
    generate_fake_speedplus(tmp, num_train=12, num_test=6)
    for model in ("krn", "spn"):
        for domain, split in (("synthetic", "train"), ("lightbox", "test")):
            csv = f"splits_{model}/{'train' if split == 'train' else 'lightbox'}.csv"
            json2csv(tmp, "speedplus", domain, f"{split}.json", csv,
                     model_name=model)
    return tmp


def make_cfg(fake_root, **kw):
    base = dict(dataroot=fake_root, batch_size=4, num_workers=2,
                input_shape=(64, 64), test_csv="lightbox.csv")
    base.update(kw)
    return default_cfg(**base)


class TestDomainGap:
    """The fake dataset carries a real source/target domain gap
    (data/synthetic.py DOMAIN_STYLES), mirroring SPEED+'s synthetic vs HIL
    imagery (reference README.md:8) — the substrate for the DANN
    adaptation demo."""

    def test_marker_shapes_differ(self):
        from speedplusbaseline_tpu.data.synthetic import _render

        rs = np.random.RandomState(0)
        uv = np.array([[60.0], [60.0]])
        blobs = _render(128, 128, uv, rs, style="blobs").astype(np.int32)
        rings = _render(128, 128, uv, rs, style="rings").astype(np.int32)
        # Gaussian blob: brightest at the keypoint. Ring: annulus brighter
        # than its own center (the marker CENTER is still the label).
        assert blobs[60, 60].max() > blobs[60, 64].max()
        assert rings[60, 64].max() > rings[60, 60].max()
        # Background statistics differ (bright striped vs dim noise).
        assert rings.mean() > blobs.mean() + 20

    def test_blobs_bright_is_a_photometric_only_gap(self):
        """blobs_bright = source marker SHAPE in the target's photometric
        environment — the split scripts/styleaug_ab_run.py scores on."""
        from speedplusbaseline_tpu.data.synthetic import _render

        rs = np.random.RandomState(0)
        uv = np.array([[60.0], [60.0]])
        blobs = _render(128, 128, uv, rs, style="blobs").astype(np.int32)
        bb = _render(128, 128, uv, rs, style="blobs_bright").astype(np.int32)
        # Marker structure matches the SOURCE style (peak at the keypoint,
        # not an annulus)...
        assert bb[60, 60].max() > bb[60, 64].max()
        # ...but the photometric environment matches the TARGET style.
        assert bb.mean() > blobs.mean() + 20

    def test_generated_domains_carry_the_gap(self, fake_root):
        from PIL import Image

        root = os.path.join(fake_root, "speedplus")

        def mean_of(domain):
            d = os.path.join(root, domain, "images")
            f = sorted(os.listdir(d))[0]
            return np.asarray(Image.open(os.path.join(d, f))).mean()

        assert mean_of("lightbox") > mean_of("synthetic") + 20


class TestAttitudeClassGeneration:
    """FPS-sampled attitude bins (data/synthetic.py) — the reduced-class
    stand-in for the reference's attitudeClasses.mat used by the SPN
    convergence harness (BASELINE.md round-4 SPN diagnosis)."""

    def test_bins_are_unit_scalar_first_and_cover(self):
        from speedplusbaseline_tpu.data import generate_attitude_classes

        bins = generate_attitude_classes(64, seed=3)
        assert bins.shape == (64, 4) and bins.dtype == np.float32
        np.testing.assert_allclose(np.linalg.norm(bins, axis=1), 1.0,
                                   atol=1e-5)
        assert (bins[:, 0] >= 0).all()  # q/-q identified, scalar-first
        # FPS coverage: every random attitude has a bin within the uniform
        # covering bound for SO(3) (64 random bins would routinely miss).
        rs = np.random.RandomState(0)
        q = rs.randn(2000, 4)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        nearest = 2 * np.degrees(np.arccos(np.clip(
            np.abs(q @ bins.T.astype(np.float64)).max(axis=1), -1, 1)))
        assert np.median(nearest) < 40.0 and nearest.max() < 75.0

    def test_deterministic(self):
        from speedplusbaseline_tpu.data import generate_attitude_classes

        a = generate_attitude_classes(16, seed=1)
        b = generate_attitude_classes(16, seed=1)
        np.testing.assert_array_equal(a, b)


class TestPreprocess:
    def test_fake_targets_fully_in_frame(self, fake_root):
        """Every generated pose must project all keypoints inside the frame
        (margin 8 px): a truncated target leaves blobs unrendered, which is
        unlearnable label noise — one such image caused a catastrophic
        172-deg EPnP outlier in the round-3 convergence run. The generator
        now resamples poses until the projection fits."""
        import json as _json

        from speedplusbaseline_tpu.geometry.projection import project_keypoints
        from speedplusbaseline_tpu.io_utils.assets import load_tango_3d_keypoints

        root = os.path.join(fake_root, "speedplus")
        cam = _json.load(open(os.path.join(root, "camera.json")))
        K = np.array(cam["cameraMatrix"])
        D = np.array(cam["distCoeffs"])
        k3d = load_tango_3d_keypoints()
        w, h = 2 * K[0, 2], 2 * K[1, 2]
        for split in ("train", "test"):
            for rec in _json.load(open(os.path.join(root, "synthetic",
                                                    f"{split}.json"))):
                uv = np.asarray(project_keypoints(
                    np.array(rec["q_vbs2tango_true"]),
                    np.array(rec["r_Vo2To_vbs_true"]), K, D, k3d))
                assert uv[0].min() >= 8 and uv[0].max() <= w - 8, rec
                assert uv[1].min() >= 8 and uv[1].max() <= h - 8, rec

    def test_csv_schema_krn(self, fake_root):
        import pandas as pd

        csv = pd.read_csv(os.path.join(
            fake_root, "speedplus/synthetic/splits_krn/train.csv"), header=None)
        assert csv.shape[1] == 1 + 4 + 4 + 3 + 22  # path,bbox,q,t,keypts
        bbox = csv.iloc[0, 1:5].to_numpy(dtype=float)
        assert bbox[0] < bbox[1] and bbox[2] < bbox[3]
        # bbox must equal min/max of the keypoint columns
        kx = csv.iloc[0, 12::2].to_numpy(dtype=float)
        ky = csv.iloc[0, 13::2].to_numpy(dtype=float)
        np.testing.assert_allclose([kx.min(), kx.max(), ky.min(), ky.max()],
                                   bbox, rtol=1e-5)

    def test_csv_schema_spn(self, fake_root):
        import pandas as pd

        csv = pd.read_csv(os.path.join(
            fake_root, "speedplus/synthetic/splits_spn/train.csv"), header=None)
        assert csv.shape[1] == 1 + 4 + 4 + 3 + 5 + 5  # + classes + weights
        classes = csv.iloc[0, 12:17].to_numpy(dtype=int)
        weights = csv.iloc[0, 17:22].to_numpy(dtype=float)
        assert (classes >= 0).all() and (classes < 5000).all()
        assert abs(weights.sum() - 1.0) < 1e-6
        assert weights[0] >= weights[-1]  # sorted by angular distance

    def test_quat_bins_properties(self, rng):
        q_class = load_attitude_classes()
        q = rng.randn(4)
        q /= np.linalg.norm(q)
        classes, weights = get_quat_bins(q, q_class.astype(np.float64), 5)
        assert len(set(classes.tolist())) == 5
        assert abs(weights.sum() - 1.0) < 1e-9
        # nearest class must be the global argmin of angular distance
        dots = np.abs(q_class @ q)
        angles = 2 * np.arccos(np.minimum(dots, 1.0))
        assert classes[0] == np.argmin(angles)


class TestTransforms:
    def test_random_crop_train_contains_bbox_center(self, rng):
        gen = np.random.Generator(np.random.Philox(key=np.uint64([1, 2])))
        img = (rng.rand(100, 120, 3) * 255).astype(np.uint8)
        bbox = [30, 70, 20, 60]
        kp = np.array([[40.0, 50.0], [30.0, 40.0]])  # (2, 2) two keypoints
        crop, new_bbox, kp_n = random_crop(gen, img, bbox, kp, (32, 32), True)
        # uint8 crop: the H2D copy ships bytes, [0,1] normalization is
        # on-device (engine/steps.py _images_to_float)
        assert crop.shape == (32, 32, 3) and crop.dtype == np.uint8
        # keypoints renormalized consistently with the returned crop box
        np.testing.assert_allclose(
            kp_n[0], (kp[0] - new_bbox[0]) / (new_bbox[1] - new_bbox[0]), atol=1e-5)

    def test_random_crop_eval_deterministic(self, rng):
        img = (rng.rand(100, 120, 3) * 255).astype(np.uint8)
        bbox = [30, 70, 20, 60]
        kp = np.zeros((2, 11))
        gen1 = np.random.Generator(np.random.Philox(key=np.uint64([1, 2])))
        gen2 = np.random.Generator(np.random.Philox(key=np.uint64([3, 4])))
        c1, b1, _ = random_crop(gen1, img, bbox, kp, (32, 32), False)
        c2, b2, _ = random_crop(gen2, img, bbox, kp, (32, 32), False)
        np.testing.assert_array_equal(c1, c2)  # test mode: fixed 1.2x, no RNG
        np.testing.assert_array_equal(b1, b2)

    def test_resize_crop_returns_original_bbox(self, rng):
        img = (rng.rand(100, 120, 3) * 255).astype(np.uint8)
        bbox = [-5.0, 200.0, 10.0, 90.0]  # exceeds frame on purpose
        crop, out_bbox = resize_crop(img, bbox, (48, 48))
        np.testing.assert_array_equal(out_bbox, np.asarray(bbox, np.float32))
        assert crop.shape == (48, 48, 3)


class TestDatasets:
    def test_krn_train_sample(self, fake_root):
        cfg = make_cfg(fake_root)
        ds = KRNDataset(cfg, is_train=True, is_source=True)
        s = ds.__getitem__(0, epoch=0)
        assert s["image"].shape == (64, 64, 3)
        assert s["keypts"].shape == (2, 11)
        # Most keypoints should be inside the (enlarged) crop
        inside = ((s["keypts"] >= -0.05) & (s["keypts"] <= 1.05)).mean()
        assert inside > 0.9

    def test_krn_eval_sample(self, fake_root):
        cfg = make_cfg(fake_root)
        ds = KRNDataset(cfg, is_train=False, is_source=False)
        s = ds.__getitem__(0, epoch=0)
        assert set(s) == {"image", "bbox", "q_gt", "t_gt"}
        assert abs(np.linalg.norm(s["q_gt"]) - 1.0) < 1e-5

    def test_krn_unlabeled_target(self, fake_root):
        cfg = make_cfg(fake_root)
        ds = KRNDataset(cfg, is_train=True, is_source=False, load_labels=False)
        s = ds.__getitem__(0, epoch=0)
        assert set(s) == {"image"}

    def test_spn_train_sample(self, fake_root):
        cfg = make_cfg(fake_root, model_name="spn")
        ds = SPNDataset(cfg, is_train=True, is_source=True)
        s = ds.__getitem__(0, epoch=0)
        assert s["y_classes"].shape == (5000,)
        assert abs(s["y_classes"].sum() - 1.0) < 1e-5  # 5 * (1/5)
        assert abs(s["y_weights"].sum() - 1.0) < 1e-5

    def test_determinism_across_workers(self, fake_root):
        """Same (epoch, index) must produce identical augmented samples
        regardless of arrival order — the reference's worker-seed concern
        (transforms.py:31-36)."""
        cfg = make_cfg(fake_root)
        ds = KRNDataset(cfg, is_train=True, is_source=True)
        a = ds.__getitem__(3, epoch=5)
        b = ds.__getitem__(3, epoch=5)
        np.testing.assert_array_equal(a["image"], b["image"])
        c = ds.__getitem__(3, epoch=6)
        assert np.abs(a["image"] - c["image"]).max() > 0  # epoch changes aug


class TestLoader:
    def test_batching_and_drop_last(self, fake_root):
        cfg = make_cfg(fake_root, batch_size=5)
        loader = make_dataloader(cfg, is_train=True)
        batches = list(loader)
        assert len(batches) == 12 // 5
        assert batches[0]["image"].shape == (5, 64, 64, 3)

    def test_shuffle_changes_with_epoch(self, fake_root):
        cfg = make_cfg(fake_root, batch_size=4)
        loader = make_dataloader(cfg, is_train=True)
        loader.set_epoch(0)
        e0 = [np.asarray(b["image"]).sum() for b in loader]
        loader.set_epoch(1)
        e1 = [np.asarray(b["image"]).sum() for b in loader]
        assert not np.allclose(e0, e1)

    def test_eval_loader_no_shuffle(self, fake_root):
        cfg = make_cfg(fake_root)
        loader = make_dataloader(cfg, is_train=False)
        a = [np.asarray(b["q_gt"]) for b in loader]
        b = [np.asarray(x["q_gt"]) for x in loader]
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)


class TestNativeDatasetPath:
    def test_native_dataset_close_to_python_path(self, fake_root):
        """cfg.use_native_loader: same crop boxes (same RNG stream), nearly
        identical pixels (decode/resample rounding)."""
        from speedplusbaseline_tpu.native import native_available

        if not native_available():
            pytest.skip("native loader not built")
        cfg_py = make_cfg(fake_root)
        cfg_nat = make_cfg(fake_root, use_native_loader=True)
        ds_py = KRNDataset(cfg_py, is_train=True, is_source=True)
        ds_nat = KRNDataset(cfg_nat, is_train=True, is_source=True)
        a = ds_py.__getitem__(1, epoch=2)
        b = ds_nat.__getitem__(1, epoch=2)
        np.testing.assert_allclose(a["keypts"], b["keypts"], atol=1e-5)
        diff = np.abs(a["image"].astype(np.float32)
                      - b["image"].astype(np.float32)) / 255.0
        assert diff.mean() < 0.02


class TestNativeLoader:
    def test_native_matches_python_path(self, fake_root):
        from speedplusbaseline_tpu.native import (
            decode_crop_resize,
            image_size,
            native_available,
        )

        if not native_available():
            pytest.skip("native loader not built")
        img_dir = os.path.join(fake_root, "speedplus/synthetic/images")
        path = os.path.join(img_dir, sorted(os.listdir(img_dir))[0])
        w, h = image_size(path)
        assert (w, h) == (320, 200)
        out = decode_crop_resize(path, (10, 10, 100, 80), (64, 64))
        assert out.shape == (64, 64, 3)

        import cv2

        full = cv2.cvtColor(cv2.imread(path), cv2.COLOR_BGR2RGB)
        ref = cv2.resize(full[10:90, 10:110], (64, 64),
                         interpolation=cv2.INTER_LINEAR)
        diff = np.abs(out.astype(np.float32) - ref.astype(np.float32)) / 255.0
        assert diff.mean() < 0.02  # decode/resample tolerance


class TestRoICache:
    """Pre-decoded RoI cache (data/cache.py + scripts/cache_dataset.py):
    cached crops must be visually equivalent to the full-frame path, with
    keypoints/bboxes exact in their respective frames and the returned eval
    bbox back in ORIGINAL camera pixels."""

    @pytest.fixture(scope="class")
    def cache_root(self, fake_root, tmp_path_factory):
        from speedplusbaseline_tpu.data.cache import build_cache

        cache_dir = str(tmp_path_factory.mktemp("roicache"))
        for domain, csv in (("synthetic", "splits_krn/train.csv"),
                            ("lightbox", "splits_krn/lightbox.csv")):
            build_cache(fake_root, "speedplus", domain,
                        [os.path.join(fake_root, "speedplus", domain, csv)],
                        cache_dir, cache_size=128)
        return cache_dir

    def test_train_sample_matches_fullframe(self, fake_root, cache_root):
        ds0 = KRNDataset(make_cfg(fake_root), is_train=True, is_source=True)
        ds1 = KRNDataset(make_cfg(fake_root, cache_dir=cache_root),
                         is_train=True, is_source=True)
        assert ds1.cache is not None and len(ds1.cache) == len(ds1)
        for idx in (0, 3):
            a = ds0.__getitem__(idx, epoch=1)
            b = ds1.__getitem__(idx, epoch=1)
            # identical normalized keypoints (linear coordinate change is
            # exact; only resampling differs), visually-equal crops
            np.testing.assert_allclose(a["keypts"], b["keypts"], atol=2e-2)
            diff = np.abs(a["image"].astype(np.float32)
                          - b["image"].astype(np.float32)) / 255.0
            assert diff.mean() < 0.03

    def test_eval_bbox_in_original_pixels(self, fake_root, cache_root):
        ds0 = KRNDataset(make_cfg(fake_root), is_train=False, is_source=False)
        ds1 = KRNDataset(make_cfg(fake_root, cache_dir=cache_root),
                         is_train=False, is_source=False)
        a = ds0.__getitem__(0)
        b = ds1.__getitem__(0)
        # eval crop is deterministic -> same crop box, original-pixel frame
        np.testing.assert_allclose(a["bbox"], b["bbox"], atol=1.5)
        np.testing.assert_allclose(a["q_gt"], b["q_gt"])
        diff = np.abs(a["image"].astype(np.float32)
                      - b["image"].astype(np.float32)) / 255.0
        assert diff.mean() < 0.03

    def test_missing_manifest_falls_back(self, fake_root, tmp_path):
        ds = KRNDataset(make_cfg(fake_root, cache_dir=str(tmp_path)),
                        is_train=True, is_source=True)
        assert ds.cache is None
        s = ds.__getitem__(0, epoch=0)
        assert s["image"].shape == (64, 64, 3)
