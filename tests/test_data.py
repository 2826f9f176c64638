"""Data layer: mask generation, augmentation, datasets (synthetic files),
loader batching."""
import csv

import numpy as np
import pytest
from PIL import Image

from pbe_tpu.data.augment import augment_exemplar, clip_preprocess
from pbe_tpu.data.loader import DataLoader
from pbe_tpu.data.masks import (
    arbitrary_blob_mask,
    bbox_mask,
    bezier_curve,
    crop_square_around_mask,
    mask_bbox,
    training_mask,
)
from pbe_tpu.data.openimages import OpenImagesDataset
from pbe_tpu.data.quadruple import QuadrupleDataset
from pbe_tpu.data.test_bench import COCOEEDataset


def test_bezier_endpoints_and_midpoint():
    pts = np.asarray([[0.0, 0.0], [1.0, 2.0], [2.0, 0.0]])
    curve = bezier_curve(pts, n=5)
    np.testing.assert_allclose(curve[0], pts[0])
    np.testing.assert_allclose(curve[-1], pts[-1])
    # quadratic Bézier at t=.5: .25 p0 + .5 p1 + .25 p2
    np.testing.assert_allclose(curve[2], [1.0, 1.0])


def test_bbox_mask():
    m = bbox_mask(16, 16, (4, 2, 8, 10))
    assert m.shape == (16, 16, 1)
    assert m[5, 5, 0] == 1.0 and m[1, 1, 0] == 0.0
    assert m.sum() == (8 - 4) * (10 - 2)


def test_blob_mask_covers_bbox_center_and_is_binary():
    rng = np.random.default_rng(0)
    covered = 0
    for i in range(10):
        m = arbitrary_blob_mask(64, 64, (20, 20, 44, 44), np.random.default_rng(i))
        assert set(np.unique(m)).issubset({0.0, 1.0})
        covered += m[32, 32, 0]
    assert covered >= 8  # center covered in almost every draw


def test_training_mask_mixes_shapes():
    kinds = set()
    for i in range(20):
        m = training_mask(32, 32, (8, 8, 24, 24), np.random.default_rng(i), 0.5)
        area = m.sum()
        kinds.add(area == 16 * 16)  # exact bbox area vs blob
    assert kinds == {True, False}


def test_mask_bbox_and_square_crop():
    m = bbox_mask(64, 64, (10, 20, 30, 40))
    assert mask_bbox(m) == (10, 20, 30, 40)
    img = np.random.default_rng(0).standard_normal((64, 64, 3)).astype(np.float32)
    a, b, c = crop_square_around_mask(img, img.copy(), m, np.random.default_rng(1))
    assert a.shape[0] == a.shape[1]
    assert a.shape[:2] == c.shape[:2]
    assert c.sum() == m.sum()  # whole mask inside the crop


def test_crop_side_tracks_object_bbox():
    # 60x50 object in a 512^2 image: the 10-40%-padded square crop must have
    # side = 60*(1.1..1.4) -> [66, 84], NOT degenerate to min(h, w) = 512.
    m = bbox_mask(512, 512, (100, 200, 160, 250))
    img = np.zeros((512, 512, 3), np.float32)
    for i in range(10):
        a, _, c = crop_square_around_mask(img, img.copy(), m, np.random.default_rng(i))
        assert 66 <= a.shape[0] <= 84, a.shape
        assert c.sum() == m.sum()  # entire mask retained


def test_openimages_crop_is_object_centered(openimages_dir):
    # With the fixture's 60x50 bbox in a 96x128 image the padded crop side is
    # 66-84 (< min(h, w) = 96), so the edit region must occupy a large
    # fraction of the cropped frame — it cannot if the crop degenerates to
    # the full max-square.
    ds = OpenImagesDataset(str(openimages_dir), state="train", image_size=64)
    fracs = [(1.0 - ds[i]["mask"]).mean() for i in range(3)]
    assert max(fracs) > 0.35, fracs


def test_augment_exemplar_shape_and_determinism():
    img = Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (50, 70, 3), np.uint8)
    )
    a = augment_exemplar(img, np.random.default_rng(5))
    b = augment_exemplar(img, np.random.default_rng(5))
    assert a.shape == (224, 224, 3) and a.dtype == np.float32
    np.testing.assert_array_equal(a, b)
    c = clip_preprocess(img)
    assert c.shape == (224, 224, 3)


@pytest.fixture
def openimages_dir(tmp_path):
    g = np.random.default_rng(0)
    for sub in ("images/train", "bbox/train"):
        (tmp_path / sub).mkdir(parents=True)
    for i in range(3):
        arr = g.integers(0, 255, (96, 128, 3), np.uint8)
        Image.fromarray(arr).save(tmp_path / "images/train" / f"im{i}.jpg")
        (tmp_path / "bbox/train" / f"im{i}.txt").write_text("20 20 80 70\n10 5 120 90\n")
    return tmp_path


def test_openimages_dataset(openimages_dir):
    ds = OpenImagesDataset(str(openimages_dir), state="train", image_size=64)
    assert len(ds) == 3
    ex = ds[0]
    assert ex["image"].shape == (64, 64, 3)
    assert ex["inpaint_image"].shape == (64, 64, 3)
    assert ex["mask"].shape == (64, 64, 1)
    assert ex["ref"].shape == (224, 224, 3)
    # mask semantics: 1 = keep; source is zero where mask == 0
    np.testing.assert_array_equal(
        ex["inpaint_image"] * (1 - ex["mask"]), np.zeros_like(ex["inpaint_image"])
    )
    assert 0 < ex["mask"].mean() < 1  # some region is edited
    # deterministic per index
    np.testing.assert_array_equal(ds[1]["image"], ds[1]["image"])


def test_quadruple_dataset(tmp_path):
    g = np.random.default_rng(0)
    paths = {}
    for name, mode in (("tgt", "RGB"), ("src", "RGB"), ("ref", "RGB")):
        p = tmp_path / f"{name}.png"
        Image.fromarray(g.integers(0, 255, (64, 64, 3), np.uint8), "RGB").save(p)
        paths[name] = str(p)
    m = np.full((64, 64), 255, np.uint8)
    m[16:48, 16:48] = 0  # black = edit region, white = keep
    p = tmp_path / "mask.png"
    Image.fromarray(m, "L").save(p)
    paths["mask"] = str(p)
    csv_path = tmp_path / "data.csv"
    with open(csv_path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["tgt", "src", "mask", "ref"])
        w.writeheader()
        w.writerow(paths)
        w.writerow(paths)
    ds = QuadrupleDataset(str(csv_path), image_size=32)
    assert len(ds) == 2
    ex = ds[0]
    assert ex["image"].shape == (32, 32, 3)
    np.testing.assert_array_equal(
        ex["inpaint_image"] * (1 - ex["mask"]), np.zeros_like(ex["inpaint_image"])
    )


def test_cocoee_dataset(tmp_path):
    ids = np.asarray([7, 42])
    np.save(tmp_path / "id_list.npy", ids)
    g = np.random.default_rng(0)
    for sub in ("GT_3500", "Ref_3500", "Mask_bbox_3500"):
        (tmp_path / sub).mkdir()
    for i in ids:
        Image.fromarray(g.integers(0, 255, (64, 64, 3), np.uint8)).save(
            tmp_path / "GT_3500" / f"{i:012d}_GT.png"
        )
        Image.fromarray(g.integers(0, 255, (48, 48, 3), np.uint8)).save(
            tmp_path / "Ref_3500" / f"{i:012d}_ref.png"
        )
        m = np.zeros((64, 64), np.uint8)
        m[10:30, 10:30] = 255  # white = edit region
        Image.fromarray(m, "L").save(tmp_path / "Mask_bbox_3500" / f"{i:012d}_mask.png")
    ds = COCOEEDataset(str(tmp_path))
    assert len(ds) == 2
    ex = ds[0]
    assert ex["id"] == "000000000007"
    assert ex["ref"].shape == (224, 224, 3)
    assert ex["mask"][15, 15, 0] == 0.0 and ex["mask"][40, 40, 0] == 1.0
    np.testing.assert_allclose(ex["inpaint_image"], ex["image"] * ex["mask"])


def test_dataloader_batches(openimages_dir):
    ds = OpenImagesDataset(str(openimages_dir), state="train", image_size=32)
    dl = DataLoader(ds, batch_size=2, shuffle=True, num_workers=2)
    batches = list(dl)
    assert len(batches) == len(dl) == 1  # 3 examples, drop_last
    b = batches[0]
    assert b["image"].shape == (2, 32, 32, 3)
    assert b["ref"].shape == (2, 224, 224, 3)


def test_openimages_uint8_mode_matches_float(openimages_dir):
    """uint8=True must be the float pipeline in a cheaper wire format:
    host-unpacking it reproduces the float-mode sample exactly (same rng
    stream, same crop, same mask, same exemplar)."""
    from pbe_tpu.data.transforms import unpack_uint8_batch

    ds_f = OpenImagesDataset(str(openimages_dir), state="train", image_size=64)
    ds_u = OpenImagesDataset(str(openimages_dir), state="train", image_size=64,
                             uint8=True)
    for i in range(len(ds_f)):
        exf = ds_f[i]
        exu = ds_u[i]
        assert set(exu) == {"image", "mask", "ref"}
        assert all(v.dtype == np.uint8 for v in exu.values())
        assert exu["mask"].shape == (64, 64, 1)
        un = unpack_uint8_batch(dict(exu))
        np.testing.assert_array_equal(un["image"], exf["image"])
        np.testing.assert_array_equal(un["mask"], exf["mask"])
        np.testing.assert_array_equal(un["inpaint_image"], exf["inpaint_image"])
        np.testing.assert_array_equal(un["ref"], exf["ref"])


def test_geometry_raster_matches_training_mask():
    """rasterize_geometry at full res must agree with the classic raster
    (bbox arm bit-exact; blob arm up to polygon-edge pixels)."""
    from pbe_tpu.data.masks import (
        mask_geometry,
        rasterize_geometry,
        training_mask,
    )

    h, w = 96, 128
    bbox = (20.0, 20.0, 80.0, 70.0)
    for seed in range(6):
        g1 = np.random.default_rng(seed)
        g2 = np.random.default_rng(seed)
        m = training_mask(h, w, bbox, g1, 0.5)
        geom = mask_geometry(h, w, bbox, g2, 0.5)
        r = (rasterize_geometry(geom, h, w) > 127).astype(np.float32)[..., None]
        if geom[0] == "bbox":
            np.testing.assert_array_equal(r, m)
        else:
            # edge-pixel tolerance: disagreement confined to a thin band
            assert np.abs(r - m).mean() < 0.02, (seed, np.abs(r - m).mean())
