"""Image-folder training data pipeline (training/folder.py + native reader).

The reference has no data loader at all (it only loads checkpoints,
ref src/PCA.py:40); this is the beyond-parity real-data path.  Oracles:
the numpy `area_resample` mirror is validated against naive block means,
and the native C++ decode+resample is validated against the numpy mirror
on PIL-decoded pixels.
"""

import os

import numpy as np
import pytest

from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.training.folder import (
    ImageFolder,
    _axis_matrix,
    area_resample,
    load_image,
)
from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.utils import (
    native_io,
)


def _write_png(path, arr):
    from PIL import Image

    Image.fromarray(arr).save(path)


def _rand_img(rng, h, w):
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


# ---------------------------------------------------------------- resample


def test_axis_matrix_rows_sum_to_one():
    for s, t in [(7, 3), (16, 16), (5, 8), (100, 33)]:
        m = _axis_matrix(s, t)
        assert m.shape == (t, s)
        np.testing.assert_allclose(m.sum(axis=1), 1.0, atol=1e-12)


def test_area_resample_identity_and_block_mean():
    rng = np.random.default_rng(0)
    img = _rand_img(rng, 12, 12)
    # same size: exact passthrough
    np.testing.assert_array_equal(area_resample(img, 12), img)
    # integer 2x downscale: each output pixel is the 2x2 block mean
    out = area_resample(img, 6)
    blocks = img.reshape(6, 2, 6, 2, 3).astype(np.float64).mean(axis=(1, 3))
    np.testing.assert_array_equal(out, np.floor(blocks + 0.5).astype(np.uint8))


def test_area_resample_center_crop_non_square():
    rng = np.random.default_rng(1)
    img = _rand_img(rng, 20, 14)  # crop rows 3..17
    out = area_resample(img, 14)
    np.testing.assert_array_equal(out, img[3:17, :, :])


def test_area_resample_constant_is_constant_upscale_and_down():
    img = np.full((10, 10, 3), 77, dtype=np.uint8)
    for t in (4, 7, 10, 23):
        assert (area_resample(img, t) == 77).all()


# ---------------------------------------------------------------- native


needs_native = pytest.mark.skipif(
    not native_io.read_available(), reason="native read path not built"
)


@needs_native
def test_native_load_matches_numpy_mirror(tmp_path):
    rng = np.random.default_rng(2)
    for h, w, t in [(37, 53, 16), (16, 16, 16), (9, 9, 20), (64, 48, 24)]:
        img = _rand_img(rng, h, w)
        p = str(tmp_path / f"im_{h}x{w}.png")
        _write_png(p, img)
        got = native_io.load_png_rgb(p, t)
        want = area_resample(img, t)
        assert got.shape == (t, t, 3)
        diff = np.abs(got.astype(np.int32) - want.astype(np.int32))
        assert diff.max() <= 1, f"{h}x{w}->{t}: max diff {diff.max()}"


@needs_native
def test_native_load_normalizes_color_types(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(3)
    img = _rand_img(rng, 10, 10)
    # grayscale input -> replicated RGB channels
    gray = img[:, :, 0]
    pg = str(tmp_path / "gray.png")
    Image.fromarray(gray, mode="L").save(pg)
    got = native_io.load_png_rgb(pg, 10)
    np.testing.assert_array_equal(got, np.stack([gray] * 3, axis=-1))
    # RGBA input -> alpha stripped
    rgba = np.concatenate([img, np.full((10, 10, 1), 200, np.uint8)], axis=-1)
    pa = str(tmp_path / "rgba.png")
    Image.fromarray(rgba, mode="RGBA").save(pa)
    np.testing.assert_array_equal(native_io.load_png_rgb(pa, 10), img)


@needs_native
def test_native_batch_threads_match_serial(tmp_path):
    rng = np.random.default_rng(4)
    paths, imgs = [], []
    for i in range(7):
        img = _rand_img(rng, 18 + i, 25 - i)
        p = str(tmp_path / f"b{i}.png")
        _write_png(p, img)
        paths.append(p)
        imgs.append(img)
    batch = native_io.load_png_rgb_batch(paths, 12, n_threads=4)
    assert batch.shape == (7, 12, 12, 3)
    for i, p in enumerate(paths):
        np.testing.assert_array_equal(batch[i], native_io.load_png_rgb(p, 12))


@needs_native
def test_native_load_missing_file_raises(tmp_path):
    with pytest.raises(IOError):
        native_io.load_png_rgb(str(tmp_path / "nope.png"), 8)


needs_native_image = pytest.mark.skipif(
    not native_io.image_read_available(),
    reason="native image (PNG+JPEG) read path not built",
)


@needs_native_image
def test_native_jpeg_matches_pil_exactly(tmp_path):
    """Native JPEG decode == PIL decode pixel-for-pixel: both are libjpeg
    with the default IDCT, so the decoded planes are identical and only
    the shared crop/resample (|diff| <= 1 vs numpy) remains."""
    from PIL import Image

    rng = np.random.default_rng(5)
    for h, w, t, q in [(33, 47, 16, 95), (24, 24, 24, 60), (50, 31, 12, 80)]:
        img = _rand_img(rng, h, w)
        p = str(tmp_path / f"j_{h}x{w}_{q}.jpg")
        Image.fromarray(img).save(p, quality=q)
        got = native_io.load_image_rgb(p, t)
        with Image.open(p) as im:
            dec = np.asarray(im.convert("RGB"), dtype=np.uint8)
        want = area_resample(dec, t)
        diff = np.abs(got.astype(np.int32) - want.astype(np.int32))
        assert diff.max() <= 1, f"{h}x{w} q{q} -> {t}: max diff {diff.max()}"


@needs_native_image
def test_native_image_sniffs_format_not_extension(tmp_path):
    """Dispatch is by magic bytes: a PNG payload under a .jpg name decodes
    through the PNG path (and vice versa)."""
    from PIL import Image

    rng = np.random.default_rng(6)
    img = _rand_img(rng, 14, 14)
    p_png_as_jpg = str(tmp_path / "really_png.jpg")
    Image.fromarray(img).save(p_png_as_jpg, format="PNG")
    np.testing.assert_array_equal(
        native_io.load_image_rgb(p_png_as_jpg, 14), img
    )
    p_jpg_as_png = str(tmp_path / "really_jpeg.png")
    Image.fromarray(img).save(p_jpg_as_png, format="JPEG", quality=95)
    got = native_io.load_image_rgb(p_jpg_as_png, 14)
    with Image.open(p_jpg_as_png) as im:
        want = np.asarray(im.convert("RGB"), dtype=np.uint8)
    np.testing.assert_array_equal(got, want)


@needs_native_image
def test_native_jpeg_grayscale_and_batch(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(7)
    gray = _rand_img(rng, 12, 12)[:, :, 0]
    pg = str(tmp_path / "g.jpg")
    Image.fromarray(gray, mode="L").save(pg, quality=92)
    got = native_io.load_image_rgb(pg, 12)
    with Image.open(pg) as im:
        want = np.asarray(im.convert("RGB"), dtype=np.uint8)
    np.testing.assert_array_equal(got, want)

    paths, want_each = [], []
    for i in range(5):
        img = _rand_img(rng, 20 + i, 17 + i)
        p = str(tmp_path / (f"m{i}.jpg" if i % 2 else f"m{i}.png"))
        Image.fromarray(img).save(p, quality=90)
        paths.append(p)
    batch = native_io.load_image_rgb_batch(paths, 10, n_threads=3)
    assert batch.shape == (5, 10, 10, 3)
    for i, p in enumerate(paths):
        np.testing.assert_array_equal(batch[i], native_io.load_image_rgb(p, 10))


@needs_native_image
def test_native_image_rejects_unknown_format(tmp_path):
    p = str(tmp_path / "junk.jpg")
    with open(p, "wb") as f:
        f.write(b"not an image at all")
    with pytest.raises(IOError):
        native_io.load_image_rgb(p, 8)


@needs_native_image
def test_folder_mixed_png_jpeg_uses_native_batch(tmp_path):
    """A mixed png+jpg folder takes the one-crossing native batch path and
    matches per-file native decodes."""
    from PIL import Image

    rng = np.random.default_rng(8)
    root = tmp_path / "mixed"
    root.mkdir()
    for i in range(4):
        img = _rand_img(rng, 19, 23)
        name = f"x{i}.jpg" if i % 2 else f"x{i}.png"
        Image.fromarray(img).save(str(root / name), quality=90)
    ds = ImageFolder(str(root), 12)
    assert ds.native_decode and ds._all_native and not ds._all_png
    got = ds.load_batch([0, 1, 2, 3], n_threads=2)
    assert got.shape == (4, 12, 12, 3) and got.dtype == np.float32
    for i, f in enumerate(ds.files):
        want = native_io.load_image_rgb(f, 12).astype(np.float32) / 127.5 - 1.0
        np.testing.assert_array_equal(got[i], want)


# ---------------------------------------------------------------- dataset


def _make_folder(tmp_path, n=6, size=(11, 9)):
    rng = np.random.default_rng(5)
    root = tmp_path / "data"
    (root / "sub").mkdir(parents=True)
    for i in range(n):
        d = root / ("sub" if i % 2 else "")
        _write_png(str(d / f"img{i}.png"), _rand_img(rng, *size))
    return str(root)


def test_folder_discovery_and_load(tmp_path):
    root = _make_folder(tmp_path)
    ds = ImageFolder(root, img_size=8)
    assert len(ds) == 6
    assert ds.files == sorted(ds.files)
    b = ds.load_batch([0, 3, 5])
    assert b.shape == (3, 8, 8, 3) and b.dtype == np.float32
    assert b.min() >= -1.0 and b.max() <= 1.0
    # load_batch agrees with the single-image loader
    one = load_image(ds.files[3], 8).astype(np.float32) / 127.5 - 1.0
    np.testing.assert_allclose(b[1], one)


def test_folder_empty_raises(tmp_path):
    (tmp_path / "empty").mkdir()
    with pytest.raises(FileNotFoundError):
        ImageFolder(str(tmp_path / "empty"), img_size=8)


def test_schedule_deterministic_epoch_exact_cover(tmp_path):
    root = _make_folder(tmp_path, n=6)
    ds = ImageFolder(root, img_size=8)
    s1 = list(ds.schedule(seed=7, batch=4, steps=5))
    s2 = list(ds.schedule(seed=7, batch=4, steps=5))
    for a, b in zip(s1, s2):
        np.testing.assert_array_equal(a, b)
    # different seed -> different stream
    s3 = list(ds.schedule(seed=8, batch=4, steps=5))
    assert any((a != b).any() for a, b in zip(s1, s3))
    # first 3 batches = 12 draws = exactly 2 epochs of 6: each index twice
    flat = np.concatenate(s1[:3])
    counts = np.bincount(flat, minlength=6)
    np.testing.assert_array_equal(counts, np.full(6, 2))


def test_batches_prefetch_matches_direct(tmp_path):
    root = _make_folder(tmp_path)
    ds = ImageFolder(root, img_size=8)
    got = list(ds.batches(seed=3, batch=4, steps=4, prefetch=2))
    want = [ds.load_batch(idx) for idx in ds.schedule(seed=3, batch=4, steps=4)]
    assert len(got) == 4
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)


def test_pil_jpeg_path(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(6)
    img = _rand_img(rng, 15, 13)
    p = str(tmp_path / "a.jpg")
    Image.fromarray(img).save(p, quality=95)
    out = load_image(p, 8)
    assert out.shape == (8, 8, 3) and out.dtype == np.uint8


def test_train_cli_folder_e2e(tmp_path):
    """cli.train --data_dir end-to-end at smoke scale: the external-data
    scan path compiles, consumes prefetched real batches, and exports a
    loadable checkpoint."""
    from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.cli import (
        train as train_cli,
    )

    root = _make_folder(tmp_path, n=5, size=(20, 18))
    out = str(tmp_path / "folder_ema.npz")
    rc = train_cli.main([
        "--img_size", "16", "--style_dim", "32", "--n_mlp", "2",
        "--channel_max", "32", "--steps", "3", "--batch", "4",
        "--chunk", "2", "--data_dir", root, "--out", out,
        "--compile_cache", "",
    ])
    assert rc == 0
    assert os.path.exists(out)
    import numpy as _np

    sd = dict(_np.load(out))
    assert any(k.startswith("style") for k in sd)
