"""Image I/O for frame sequences.

Host-side replacement for the reference's skimage/tifffile readers
(blind_denoising.py:170-201,232-238) and the C ``iio`` library's float reader
(tvl1flow/main.c:44-51). Uses PIL/imageio (pure host); the optional C++ codec in
``native/`` accelerates PGM/.flo paths.

Conventions matching the reference:
- ``read_gray`` returns float64 luma in [0, 255] for uint8 images, matching
  ``skimage.io.imread(..., as_gray=True)`` (rec. 601 luma weights 0.2125/0.7154/0.721e-1).
- ``%`` C-format path templates ("frame%03d.png") select frames (blind_denoising.py:171).
- tiff files are read/written as float32 without rescaling (blind_denoising.py:192-193,234).
"""

from __future__ import annotations

import os

import numpy as np

try:  # PIL is the primary backend
    from PIL import Image

    _HAVE_PIL = True
except Exception:  # pragma: no cover
    _HAVE_PIL = False

_GRAY_W = np.array([0.2125, 0.7154, 0.0721], dtype=np.float64)

TIFF_EXTS = (".tif", ".tiff")


def is_tiff(path):
    return os.fspath(path).lower().endswith(TIFF_EXTS)


def read_image(path):
    """Read an image file -> numpy array (H, W) or (H, W, C), native dtype."""
    path = os.fspath(path)
    if not _HAVE_PIL:  # pragma: no cover
        import imageio.v2 as iio

        return np.asarray(iio.imread(path))
    img = Image.open(path)
    arr = np.asarray(img)
    return arr


def read_gray(path):
    """Read an image as grayscale float64.

    uint8 inputs stay in [0, 255]; RGB collapses with rec.601 luma weights, matching
    ``skimage.io.imread(path, as_gray=True)`` up to the [0,1] scaling that the caller
    applies (blind_denoising.py:180 divides by 255 afterwards, so we return [0,255]
    and let callers normalize — same as skimage, which returns [0,1] floats; we
    return [0,1] for uint8 inputs to match skimage exactly).
    """
    arr = read_image(path)
    was_int = np.issubdtype(arr.dtype, np.integer)
    if arr.ndim == 3:
        if arr.shape[-1] == 4:
            arr = arr[..., :3]
        arr = arr.astype(np.float64) @ _GRAY_W
    else:
        arr = arr.astype(np.float64)
    if was_int:
        arr = arr / 255.0
    return arr


def read_frame(path_tmpl, index):
    """Read frame ``index`` from a C-format path template.

    Mirrors the reference frame loading (blind_denoising.py:170-201): tiff files are
    read raw (assumed pre-scaled), everything else as grayscale in [0,1] scaled back
    to [0,255] so the caller's ``/255`` normalization matches skimage semantics.

    Returns float64 (H, W) in [0, 255] for non-tiff; raw values for tiff.
    """
    path = path_tmpl % index if "%" in path_tmpl else path_tmpl
    if is_tiff(path):
        return np.asarray(read_image(path), dtype=np.float64)
    return read_gray(path) * 255.0


def write_gray(path, img):
    """Write a grayscale image.

    Matches reference output semantics (blind_denoising.py:232-238): tiff gets raw
    float32 (caller already scaled by 255); other formats get uint8 after the caller
    clipped to [0,255].
    """
    path = os.fspath(path)
    img = np.asarray(img)
    if is_tiff(path):
        _write_tiff_float(path, img.astype(np.float32))
        return
    img = np.clip(img, 0, 255).astype(np.uint8)
    if not _HAVE_PIL:  # pragma: no cover
        import imageio.v2 as iio

        iio.imwrite(path, img)
        return
    Image.fromarray(img).save(path)


def _write_tiff_float(path, img):
    if _HAVE_PIL:
        Image.fromarray(img.astype(np.float32)).save(path)
    else:  # pragma: no cover
        import imageio.v2 as iio

        iio.imwrite(path, img.astype(np.float32))


def write_pgm(path, img, maxval=255):
    """Write a binary PGM (P5) grayscale image — handy as a C-oracle interchange."""
    img = np.clip(np.asarray(img), 0, maxval).astype(np.uint8)
    with open(path, "wb") as f:
        f.write(b"P5\n%d %d\n%d\n" % (img.shape[1], img.shape[0], maxval))
        f.write(img.tobytes())


def read_pgm(path):
    """Read a binary PGM (P5) grayscale image -> uint8 (H, W)."""
    with open(path, "rb") as f:
        data = f.read()
    if not data.startswith(b"P5"):
        raise ValueError("not a binary PGM")
    # parse header: magic, width, height, maxval, single whitespace, raster
    parts = []
    idx = 2
    while len(parts) < 3:
        while idx < len(data) and data[idx : idx + 1].isspace():
            idx += 1
        if data[idx : idx + 1] == b"#":
            while data[idx : idx + 1] != b"\n":
                idx += 1
            continue
        start = idx
        while idx < len(data) and not data[idx : idx + 1].isspace():
            idx += 1
        parts.append(int(data[start:idx]))
    idx += 1  # single whitespace after maxval
    w, h, _maxval = parts
    return np.frombuffer(data, np.uint8, count=w * h, offset=idx).reshape(h, w)
