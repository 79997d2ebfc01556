"""Real-image training data: an image-folder pipeline.

The reference has no training subsystem at all (it consumes rosinality
FFHQ checkpoints, ref src/PCA.py:40), so a user bringing their own image
corpus has no path.  This module supplies it: a deterministic folder
dataset that decodes, center-crops and area-resamples images to the
training resolution, with a double-buffered background prefetcher so the
TPU never waits on host decode.

Layout of the work:
  - hot decode loop: native C++ (native/io.cpp `fpio_load_image_rgb_batch`,
    libpng + libjpeg with format sniffing + a thread pool outside the
    GIL), one ctypes crossing per batch;
  - fallback: PIL decode + the numpy mirror of the same separable box
    resample (`area_resample`), used for BMP/WebP and when the .so isn't
    built.  The two paths agree to |diff| <= 1 uint8 step (tested; JPEG
    decode is pixel-identical — both sides are libjpeg).

Determinism: the batch schedule is a pure function of (seed, epoch) —
per-epoch permutations from numpy's PCG64, wrapping across epochs — so a
resumed training run sees the identical image stream.
"""

from __future__ import annotations

import os
import queue
import threading
from typing import Iterator, List, Optional, Sequence

import numpy as np

from ..utils import native_io

IMAGE_EXTENSIONS = (".png", ".jpg", ".jpeg", ".bmp", ".webp")


def area_resample(img: np.ndarray, target: int) -> np.ndarray:
    """Center-crop [H, W, 3] uint8 to square, box-resample to [t, t, 3].

    Numpy mirror of native/io.cpp `crop_resample_rgb8`: output pixel i
    averages the input span [i*s/t, (i+1)*s/t) with fractional edge
    coverage, separably per axis, float64 accumulation, round-half-up.
    Works for both down- and up-sampling.
    """
    h, w = img.shape[:2]
    s = min(h, w)
    y0, x0 = (h - s) // 2, (w - s) // 2
    crop = img[y0 : y0 + s, x0 : x0 + s].astype(np.float64)
    if s == target:
        out = crop
    else:
        m = _axis_matrix(s, target)
        out = np.einsum("ts,shc->thc", m, crop)
        out = np.einsum("ts,hsc->htc", m, out)
    return np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8)


def _axis_matrix(s: int, t: int) -> np.ndarray:
    """[t, s] row-stochastic box-filter taps (fractional edge coverage)."""
    scale = s / t
    m = np.zeros((t, s), dtype=np.float64)
    for i in range(t):
        a, b = i * scale, (i + 1) * scale
        j0, j1 = int(np.floor(a)), min(int(np.ceil(b)), s)
        for j in range(j0, j1):
            m[i, j] = (min(j + 1.0, b) - max(float(j), a)) / scale
    return m


NATIVE_EXTENSIONS = (".png", ".jpg", ".jpeg")


def load_image(path: str, target: int) -> np.ndarray:
    """One image -> [target, target, 3] uint8 (native PNG/JPEG when built)."""
    if path.lower().endswith(NATIVE_EXTENSIONS) and native_io.image_read_available():
        return native_io.load_image_rgb(path, target)
    if path.lower().endswith(".png") and native_io.read_available():
        return native_io.load_png_rgb(path, target)
    return _load_pil(path, target)


def _load_pil(path: str, target: int) -> np.ndarray:
    from PIL import Image

    with Image.open(path) as im:
        arr = np.asarray(im.convert("RGB"), dtype=np.uint8)
    return area_resample(arr, target)


def _to_training_range(batch_u8: np.ndarray) -> np.ndarray:
    """uint8 [0, 255] -> f32 [-1, 1] NHWC (the generator's output range)."""
    return batch_u8.astype(np.float32) / 127.5 - 1.0


class ImageFolder:
    """Deterministic image-folder dataset.

    Files are discovered recursively and sorted, so the index -> file map
    is stable across runs and hosts (multi-host shards by index).
    """

    def __init__(self, root: str, img_size: int,
                 extensions: Sequence[str] = IMAGE_EXTENSIONS):
        self.root = root
        self.img_size = int(img_size)
        exts = tuple(e.lower() for e in extensions)
        files: List[str] = []
        for dirpath, dirnames, filenames in os.walk(root):
            dirnames.sort()
            for f in sorted(filenames):
                if f.lower().endswith(exts):
                    files.append(os.path.join(dirpath, f))
        if not files:
            raise FileNotFoundError(
                f"no images with extensions {exts} under {root!r}")
        self.files = files
        self._all_png = all(f.lower().endswith(".png") for f in files)
        self._all_native = all(
            f.lower().endswith(NATIVE_EXTENSIONS) for f in files
        )

    @property
    def native_decode(self) -> bool:
        """True when batches take the one-ctypes-crossing C++ decode path."""
        return (self._all_native and native_io.image_read_available()) or (
            self._all_png and native_io.read_available()
        )

    def __len__(self) -> int:
        return len(self.files)

    def load_batch(self, indices: Sequence[int], n_threads: int = 0) -> np.ndarray:
        """[len(indices), S, S, 3] f32 in [-1, 1]."""
        paths = [self.files[i] for i in indices]
        if self._all_native and native_io.image_read_available():
            u8 = native_io.load_image_rgb_batch(paths, self.img_size, n_threads)
        elif self._all_png and native_io.read_available():
            u8 = native_io.load_png_rgb_batch(paths, self.img_size, n_threads)
        else:
            u8 = np.stack([load_image(p, self.img_size) for p in paths])
        return _to_training_range(u8)

    def schedule(self, seed: int, batch: int, steps: int,
                 start: int = 0) -> Iterator[np.ndarray]:
        """Deterministic per-step index arrays; new permutation per epoch.

        ``start`` fast-forwards the stream: the yielded arrays are steps
        ``start .. start+steps-1`` of the (seed, batch) schedule — pure
        index math, no decode — so a resumed run (cli/train.py --resume)
        sees the identical image stream it would have seen uninterrupted.
        """
        n = len(self.files)
        consumed = start * batch
        epoch, pos = divmod(consumed, n)
        perm = np.random.default_rng(np.uint64(seed) + np.uint64(epoch)).permutation(n)
        for _ in range(steps):
            idx = np.empty(batch, dtype=np.int64)
            filled = 0
            while filled < batch:
                take = min(batch - filled, n - pos)
                idx[filled : filled + take] = perm[pos : pos + take]
                filled += take
                pos += take
                if pos == n:
                    epoch += 1
                    pos = 0
                    perm = np.random.default_rng(
                        np.uint64(seed) + np.uint64(epoch)).permutation(n)
            yield idx

    def batches(self, seed: int, batch: int, steps: int,
                prefetch: int = 2, n_threads: int = 0,
                start: int = 0) -> Iterator[np.ndarray]:
        """Prefetched stream of [batch, S, S, 3] f32 training batches.

        A background thread decodes up to ``prefetch`` batches ahead (the
        native path already fans decode across C++ threads), so the
        accelerator step overlaps host IO.  Exceptions propagate to the
        consumer at the failing batch.
        """
        q: "queue.Queue" = queue.Queue(maxsize=max(1, prefetch))
        stop = threading.Event()

        def producer():
            try:
                for idx in self.schedule(seed, batch, steps, start=start):
                    if stop.is_set():
                        return
                    q.put(self.load_batch(idx, n_threads))
                q.put(None)  # end of stream
            except BaseException as e:  # surfaced at the consumer
                q.put(e)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
            # drain so a blocked producer can observe `stop` and exit
            while t.is_alive():
                try:
                    q.get_nowait()
                except queue.Empty:
                    t.join(timeout=0.1)
