"""Legacy SD datasets (ldm/data/{imagenet,lsun,base}.py equivalents)."""
from __future__ import annotations

import os

import numpy as np
import pytest
from PIL import Image

from pbe_tpu.data.legacy import (
    ImageNetSRTrain,
    ImageNetSRValidation,
    ImageNetTrain,
    ImageNetValidation,
    LSUNBase,
    Txt2ImgIterableBaseDataset,
)


def _write_imagenet_tree(root, n_synsets=2, per_synset=2, hw=(40, 56)):
    rng = np.random.default_rng(0)
    rels = []
    for s in range(n_synsets):
        syn = f"n{s:08d}"
        os.makedirs(os.path.join(root, syn), exist_ok=True)
        for j in range(per_synset):
            rel = f"{syn}/img_{j}.JPEG"
            arr = rng.integers(0, 255, (*hw, 3), np.uint8)
            Image.fromarray(arr).save(os.path.join(root, rel))
            rels.append(rel)
    with open(os.path.join(root, "synset_human.txt"), "w") as f:
        f.write("n00000000 tench, Tinca tinca\nn00000001 goldfish\n")
    return rels


def test_imagenet_train_and_validation(tmp_path):
    root = str(tmp_path / "inet")
    os.makedirs(root)
    _write_imagenet_tree(root)

    ds = ImageNetTrain(data_root=root, size=32,
                       rng=np.random.default_rng(3))
    assert len(ds) == 4
    ex = ds[0]
    assert ex["image"].shape == (32, 32, 3)
    assert ex["image"].dtype == np.float32
    assert -1.0 <= ex["image"].min() and ex["image"].max() <= 1.0
    assert ex["class_label"] == 0 and ex["synsets"] == "n00000000"
    assert ex["human_label"] == "tench, Tinca tinca"

    val = ImageNetValidation(data_root=root, size=32)
    v0a, v0b = val[0]["image"], val[0]["image"]
    np.testing.assert_array_equal(v0a, v0b)  # center crop is deterministic

    with pytest.raises(FileNotFoundError):
        ImageNetValidation(data_root=str(tmp_path / "missing"))


def test_imagenet_filelist_pins_order(tmp_path):
    root = str(tmp_path / "inet")
    os.makedirs(root)
    rels = _write_imagenet_tree(root)
    with open(os.path.join(root, "filelist.txt"), "w") as f:
        f.write("\n".join(reversed(rels)))
    ds = ImageNetValidation(data_root=root, size=16)
    assert ds.relpaths == list(reversed(rels))


def test_imagenet_sr(tmp_path):
    root = str(tmp_path / "inet")
    os.makedirs(root)
    _write_imagenet_tree(root, hw=(80, 96))

    tr = ImageNetSRTrain(data_root=root, size=32, degradation="pil_bicubic",
                         downscale_f=4, rng=np.random.default_rng(0))
    ex = tr[1]
    assert ex["image"].shape == (32, 32, 3)
    assert ex["LR_image"].shape == (8, 8, 3)
    assert ex["image"].dtype == ex["LR_image"].dtype == np.float32

    va = ImageNetSRValidation(data_root=root, size=32,
                              degradation="cv_area", random_crop=False,
                              min_crop_f=1.0, max_crop_f=1.0)
    a, b = va[0]["image"], va[0]["image"]
    np.testing.assert_array_equal(a, b)

    with pytest.raises(ImportError):
        ImageNetSRTrain(data_root=root, size=32, degradation="bsrgan")


def test_lsun_base(tmp_path):
    root = tmp_path / "lsun"
    os.makedirs(root)
    names = []
    rng = np.random.default_rng(0)
    for i in range(3):
        name = f"img_{i}.png"
        Image.fromarray(rng.integers(0, 255, (50, 70, 3), np.uint8)).save(
            root / name)
        names.append(name)
    txt = tmp_path / "list.txt"
    txt.write_text("\n".join(names))

    ds = LSUNBase(txt_file=str(txt), data_root=str(root), size=24, flip_p=0.0)
    assert len(ds) == 3
    ex = ds[2]
    assert ex["image"].shape == (24, 24, 3)
    assert ex["relative_file_path_"] == "img_2.png"
    np.testing.assert_array_equal(ex["image"], ds[2]["image"])  # flip_p=0

    flipped = LSUNBase(txt_file=str(txt), data_root=str(root), size=24,
                       flip_p=1.0)
    np.testing.assert_allclose(flipped[2]["image"],
                               ex["image"][:, ::-1], atol=1e-6)


def test_txt2img_iterable_interface():
    class Impl(Txt2ImgIterableBaseDataset):
        def __iter__(self):
            return iter([{"caption": "x"}] * self.num_records)

    ds = Impl(num_records=5, valid_ids=[1, 2], size=64)
    assert len(ds) == 5 and ds.sample_ids == [1, 2]
    assert sum(1 for _ in ds) == 5


def test_yaml_targets_build(tmp_path):
    from pbe_tpu.config import instantiate_from_config

    root = str(tmp_path / "inet")
    os.makedirs(root)
    _write_imagenet_tree(root)
    obj = instantiate_from_config({
        "target": "ldm.data.imagenet.ImageNetValidation",
        "params": {"data_root": root, "size": 16},
    })
    assert isinstance(obj, ImageNetValidation)
