"""Native C++ image loader tests: decode parity with PIL, preprocess parity
with the PIL pipeline, batch threading determinism, error paths."""

import os

import numpy as np
import pytest

from fp8_quantization_tpu.eval import data, native_data

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402

pytestmark = pytest.mark.skipif(
    not native_data.available(),
    reason="native image loader unavailable (g++/libjpeg/libpng)",
)


def _make_images(tmp_path, n=6, cls_count=2, size_range=(80, 260), seed=0):
    """Synthetic ImageNet-layout val dir with mixed JPEG/PNG."""
    rng = np.random.default_rng(seed)
    val = tmp_path / "val"
    paths = []
    for i in range(n):
        cls = val / str(i % cls_count)
        cls.mkdir(parents=True, exist_ok=True)
        w = int(rng.integers(*size_range))
        h = int(rng.integers(*size_range))
        # smooth gradient + noise: JPEG-friendly content
        yy, xx = np.mgrid[0:h, 0:w]
        arr = np.stack([
            (xx * 255 / max(w - 1, 1)),
            (yy * 255 / max(h - 1, 1)),
            rng.uniform(0, 255, (h, w)),
        ], axis=-1).astype(np.uint8)
        img = Image.fromarray(arr)
        if i % 2 == 0:
            p = cls / f"img_{i}.jpg"
            img.save(p, quality=95)
        else:
            p = cls / f"img_{i}.png"
            img.save(p)
        paths.append(str(p))
    return paths


def test_decode_matches_pil(tmp_path):
    """libjpeg/libpng decode must equal PIL's (same underlying codecs)."""
    for p in _make_images(tmp_path, n=4):
        rgb, w, h = native_data.decode_file(p)
        ref = np.asarray(Image.open(p).convert("RGB"))
        assert (h, w, 3) == ref.shape
        np.testing.assert_array_equal(rgb, ref)


def test_preprocess_close_to_pil_pipeline(tmp_path):
    """Native preprocess ~= PIL pipeline: same resize semantics (triangle
    filter), same crop and normalization. PIL quantizes differently inside
    its fixed-point resampler, so allow a small per-pixel tolerance."""
    paths = _make_images(tmp_path, n=4)
    batch = native_data.preprocess_files(paths, image_size=64)
    assert batch.shape == (4, 64, 64, 3)
    for i, p in enumerate(paths):
        with Image.open(p) as img:
            ref = data.preprocess_val(img, image_size=64)
        # tolerance: 2/255 pre-normalization, scaled by the largest 1/std
        tol = 2.0 / 255.0 / min(data.IMAGENET_STD)
        diff = np.abs(batch[i] - ref)
        assert diff.max() <= tol, (p, diff.max())
        assert diff.mean() <= tol / 4


def test_batch_threading_deterministic(tmp_path):
    paths = _make_images(tmp_path, n=6)
    a = native_data.preprocess_files(paths, image_size=48, num_threads=1)
    b = native_data.preprocess_files(paths, image_size=48, num_threads=4)
    np.testing.assert_array_equal(a, b)


def test_val_batches_native(tmp_path):
    _make_images(tmp_path, n=5, cls_count=2)
    batches = list(native_data.imagenet_val_batches_native(
        str(tmp_path), batch_size=2, image_size=32))
    assert [b[0].shape[0] for b in batches] == [2, 2, 1]
    labels = np.concatenate([b[1] for b in batches])
    # integer class dirs remap directly (imagenet_dataloaders.py:110-130)
    assert set(labels.tolist()) <= {0, 1}


def test_error_paths(tmp_path):
    with pytest.raises(IOError):
        native_data.decode_file(str(tmp_path / "missing.jpg"))
    junk = tmp_path / "junk.jpg"
    junk.write_bytes(b"not an image")
    with pytest.raises(IOError):
        native_data.preprocess_files([str(junk)], image_size=32)
