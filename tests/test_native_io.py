"""Native C++ libpng writer (native/io.cpp via utils/native_io.py).

Builds the shared object if the toolchain is present (skips otherwise),
then round-trips PNGs through the native encoder and PIL's decoder ---
the same boundary store_results crosses (utils/image.py prefers the
native writer and falls back to PIL; ref layout src/utils.py:85-125).
"""

import os
import shutil
import subprocess

import numpy as np
import pytest

from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.utils import (
    native_io,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module", autouse=True)
def built_lib():
    if not native_io.available():
        if shutil.which("g++") is None or shutil.which("make") is None:
            pytest.skip("no native toolchain and library not prebuilt")
        rc = subprocess.run(
            ["make", "-C", os.path.join(REPO, "native")],
            capture_output=True, text=True,
        )
        if rc.returncode != 0:
            pytest.skip(f"native build failed (no libpng dev?): {rc.stderr[-400:]}")
        # reset the memoized load so the freshly built .so is picked up
        native_io._TRIED = False
        native_io._LIB = None
    if not native_io.available():
        pytest.skip("library built but not loadable")


def test_write_png_roundtrip_rgb(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(0)
    arr = rng.integers(0, 256, size=(33, 17, 3), dtype=np.uint8)
    p = str(tmp_path / "rgb.png")
    native_io.write_png(p, arr)
    back = np.asarray(Image.open(p))
    np.testing.assert_array_equal(back, arr)


def test_write_png_roundtrip_gray(tmp_path):
    from PIL import Image

    arr = np.arange(16 * 9, dtype=np.uint8).reshape(16, 9)
    p = str(tmp_path / "gray.png")
    native_io.write_png(p, arr)
    back = np.asarray(Image.open(p))
    np.testing.assert_array_equal(back, arr)


def test_write_png_bad_path_raises():
    arr = np.zeros((4, 4, 3), dtype=np.uint8)
    with pytest.raises(IOError):
        native_io.write_png("/nonexistent-dir/x/y.png", arr)


def test_store_results_uses_native_writer(tmp_path):
    """utils.image.store_results routes through the native encoder when
    available; the artifacts must decode identically either way."""
    from PIL import Image

    from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.utils.image import (
        store_results,
    )

    rng = np.random.default_rng(1)
    imgs = rng.integers(0, 256, size=(2, 8, 8, 3), dtype=np.uint8)
    store_results(str(tmp_path), 0, imgs, imgs, imgs, imgs)
    for sub in ("original", "watermarked", "watermark_pos", "watermark_neg"):
        back = np.asarray(Image.open(tmp_path / sub / "000001.png"))
        np.testing.assert_array_equal(back, imgs[1])
