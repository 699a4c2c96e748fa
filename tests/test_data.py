"""Data pipeline: target maps, augmentation, shard IO round trips."""
import numpy as np
import pytest

from findtextcenternet_tpu.data import (
    ShardWriter, iter_tar_samples, make_target_maps, process_sample,
    transform_crop,
)
from findtextcenternet_tpu.data.augment import (
    colorize_double, colorize_mono, colorize_single,
)


def test_center_map_peak_at_box_center():
    pos = np.array([[100.0, 60.0, 40.0, 40.0]], np.float32)
    codes = np.array([[0x3042, 3]], np.int32)
    keysize, idmap, minsize = make_target_maps(pos, codes, (48, 48))
    # peak at (cx/4, cy/4) = (25, 15)
    y, x = np.unravel_index(np.argmax(keysize[..., 0]), keysize[..., 0].shape)
    assert (y, x) == (15, 25)
    assert keysize[15, 25, 0] == pytest.approx(1.0)
    assert minsize == 40.0
    # box size channels carry log(size/1024)+3 at the center
    expect = np.log(40 / 1024) + 3
    assert keysize[15, 25, 1] == pytest.approx(expect, rel=1e-5)
    # id map painted at center
    assert idmap[15, 25, 0] == 0x3042
    assert idmap[15, 25, 1] == 3


def test_target_maps_out_of_bounds_box_ignored():
    pos = np.array([[-50.0, 10.0, 20.0, 20.0]], np.float32)
    codes = np.array([[65, 0]], np.int32)
    keysize, idmap, minsize = make_target_maps(pos, codes, (48, 48))
    assert keysize[..., 0].max() == 0.0
    assert minsize == 0.0


def test_transform_crop_shapes(rng):
    h, w = 900, 700
    image = np.zeros((h, w), np.uint8)
    image[100:140, 200:240] = 255
    textline = np.zeros((h // 2, w // 2), np.uint8)
    sepline = np.zeros((h // 2, w // 2), np.uint8)
    pos = np.array([[220.0, 120.0, 40.0, 40.0]], np.float32)
    codes = np.array([[0x3042, 1]], np.int32)
    img, labelmap, idmap, minsize = transform_crop(
        image, textline, sepline, pos, codes, rng)
    assert img.shape == (768, 768)
    assert labelmap.shape == (192, 192, 5)
    assert idmap.shape == (192, 192, 2)
    assert img.dtype == np.float32
    assert 0 <= img.min() and img.max() <= 1.0


def test_colorizers_contrast(rng):
    im = np.zeros((32, 32), np.float32)
    im[8:24, 8:24] = 1.0
    for fn in (colorize_mono, colorize_single, colorize_double):
        out = fn(im, rng)
        assert out.shape == (32, 32, 3)
        fg = out[16, 16]
        bg = out[0, 0]
        # at least one channel separated by ~0.5 (contrast rule)
        assert np.abs(fg - bg).max() > 0.4, fn.__name__


def test_process_sample_blank(rng):
    s = {"image": np.zeros((800, 800), np.uint8),
         "textline": np.zeros((400, 400), np.uint8),
         "sepline": np.zeros((400, 400), np.uint8),
         "position": np.zeros((0, 4), np.float32),
         "code_list": np.zeros((0, 2), np.int32)}
    out = process_sample(s, rng, blank_prob=1.0)
    assert out["image"].shape == (768, 768, 3)
    assert out["labelmap"].sum() == 0


def test_shard_roundtrip(tmp_path, rng):
    pattern = str(tmp_path / "shard%05d.tar")
    samples = []
    for i in range(5):
        samples.append({
            "__key__": f"k{i:04d}",
            "image.png": rng.integers(0, 255, (64, 48), np.uint8
                                      ).astype(np.uint8),
            "position.npy": rng.standard_normal((3, 4)).astype(np.float32),
            "code_list.npy": rng.integers(0, 100, (3, 2)).astype(np.int32),
            "txt": f"sample {i}",
        })
    with ShardWriter(pattern, samples_per_shard=2) as w:
        for s in samples:
            w.write(s)
        paths = list(w.paths)
    assert len(paths) == 3

    back = []
    for p in paths:
        back.extend(iter_tar_samples(p))
    assert len(back) == 5
    assert back[0]["__key__"] == "k0000"
    np.testing.assert_array_equal(back[2]["position.npy"],
                                  samples[2]["position.npy"])
    np.testing.assert_array_equal(back[4]["image.png"],
                                  samples[4]["image.png"])
    assert back[1]["txt"] == "sample 1"


def test_random_salt_and_distortion(rng):
    from findtextcenternet_tpu.data.augment import (
        random_distortion, random_salt,
    )
    im = np.full((64, 64), 0.5, np.float32)
    out = random_salt(im, 20.0, rng, prob=0.5)
    assert out.shape == im.shape
    # salt inserts 0s (pepper) and 1s (salt)
    assert (out == 0).any() or (out == 1).any()
    rgb = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
    out2 = random_distortion(rgb, 20.0, rng)
    assert out2.shape == rgb.shape
    assert out2.min() >= 0 and out2.max() <= 1


def test_loader_survives_corrupt_shard(tmp_path):
    """Fault injection: a corrupt tar among good shards is skipped with an
    error record; batches keep flowing (reference behavior: the
    downloader/readers swallow-and-retry, SURVEY.md §5)."""
    from findtextcenternet_tpu.data.loader import DetectorLoader
    from findtextcenternet_tpu.data.shards import ShardWriter

    good = str(tmp_path / "good_%05d.tar")
    rng = np.random.default_rng(0)
    with ShardWriter(good, 4) as w:
        for i in range(4):
            w.write({
                "__key__": f"{i:08d}",
                "txt": "ab",
                "image.png": rng.integers(0, 255, (64, 64),
                                          dtype=np.uint8),
                "textline.png": np.zeros((32, 32), np.uint8),
                "sepline.png": np.zeros((32, 32), np.uint8),
                "position.npy": np.array([[20, 20, 10, 10],
                                          [40, 40, 10, 10]], np.float32),
                "code_list.npy": np.array([[65, 0], [66, 0]], np.int32),
            })
        shards = list(w.paths)
    bad = tmp_path / "bad.tar"
    bad.write_bytes(b"this is not a tar archive")

    loader = DetectorLoader([str(bad)] + shards, batch_size=2,
                            num_workers=1, seed=0, out_hw=(64, 64))
    it = iter(loader)
    batch = next(it)
    assert batch["image"].shape[0] == 2
    loader._stop()
