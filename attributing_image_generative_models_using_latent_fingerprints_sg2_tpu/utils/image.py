"""Image post-processing and result storage.

Equivalents of ``make_image`` and ``store_results``
(/root/reference/src/utils.py:61-125).  Layout is NHWC throughout (no
permute needed --- the reference's NCHW->NHWC transpose happens on the
GPU->CPU boundary; here images are already channels-last).

PNG encoding prefers the native C++ writer (utils/native_io.py, libpng)
and falls back to PIL.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def unpack_phases(packed: np.ndarray) -> np.ndarray:
    """Host-side depth-to-space for phase-packed model output.

    [B, H, W, 4*C] (phase-major: packed channel (p*2+q)*C + c holds fine
    pixel (2y+p, 2x+q, c) --- models.stylegan2._depth_to_space2's layout)
    -> [B, 2H, 2W, C].  Pure numpy reshape/transpose; used by consumers
    of ``enable_packed_output`` synthesis, where the device skips the
    final layout shuffle and the host (or the PNG writer's row loop)
    interleaves instead."""
    arr = np.asarray(packed)
    b, h, w, c4 = arr.shape
    if c4 % 4:
        raise ValueError(f"packed channel dim must be divisible by 4, got {c4}")
    c = c4 // 4
    y = arr.reshape(b, h, w, 2, 2, c)
    y = np.transpose(y, (0, 1, 3, 2, 4, 5))
    return np.ascontiguousarray(y.reshape(b, 2 * h, 2 * w, c))


def make_image(imgs: jax.Array, get_device_array: bool = False):
    """[-1,1] float NHWC -> uint8 NHWC (host numpy unless asked otherwise).

    Ref src/utils.py:61-83: clamp -> +1 -> /2 -> *255 -> round -> uint8.
    """
    x = jnp.clip(imgs, -1.0, 1.0)
    x = jnp.round((x + 1.0) * (255.0 / 2.0)).astype(jnp.uint8)
    if get_device_array:
        return x
    return np.asarray(x)


def _save_png(arr: np.ndarray, path: str) -> None:
    from . import native_io

    if native_io.available():
        native_io.write_png(path, arr)
        return
    from PIL import Image

    Image.fromarray(arr).save(path)


def encode_png(arr: np.ndarray) -> bytes:
    """uint8 HWC -> PNG bytes, in memory (serving hot path).

    PIL encodes straight into a BytesIO; only if PIL is absent does this
    fall back to the native disk writer through a temp file."""
    try:
        import io as _io

        from PIL import Image

        buf = _io.BytesIO()
        Image.fromarray(arr).save(buf, format="PNG")
        return buf.getvalue()
    except ImportError:
        import os as _os
        import tempfile as _tempfile

        fd, path = _tempfile.mkstemp(suffix=".png")
        _os.close(fd)
        try:
            _save_png(arr, path)
            with open(path, "rb") as f:
                return f.read()
        finally:
            _os.unlink(path)


def store_results(
    save_dir: str,
    index: int,
    original_image_w0: Optional[np.ndarray] = None,
    original_image_wx: Optional[np.ndarray] = None,
    watermark_pos: Optional[np.ndarray] = None,
    watermark_neg: Optional[np.ndarray] = None,
) -> None:
    """Write per-category PNGs, directory layout per ref src/utils.py:85-125:
    original/ watermarked/ watermark_pos/ watermark_neg/.

    ``index`` is the sample index of batch element 0; element i lands in
    ``{index+i:06d}.png`` (the reference writes one file per sample;
    batched callers like cli/attribute.py pass whole chunks)."""
    cats = {
        "original/": original_image_w0,
        "watermarked/": original_image_wx,
        "watermark_pos/": watermark_pos,
        "watermark_neg/": watermark_neg,
    }
    for sub, batch in cats.items():
        if batch is None:
            continue
        d = os.path.join(save_dir, sub)
        os.makedirs(d, exist_ok=True)
        for i in range(batch.shape[0]):
            _save_png(np.asarray(batch[i]), os.path.join(d, f"{index + i:06d}.png"))


def watermark_images(wx_img_u8: np.ndarray, w0_img_u8: np.ndarray):
    """Positive/negative watermark visualizations (the commented-out recipe
    at ref src/main.py:138-142): clip(wx - w0, 0, 255) and the reverse."""
    pos = np.clip(wx_img_u8.astype(np.int16) - w0_img_u8.astype(np.int16), 0, 255).astype(np.uint8)
    neg = np.clip(w0_img_u8.astype(np.int16) - wx_img_u8.astype(np.int16), 0, 255).astype(np.uint8)
    return pos, neg
