"""I/O round-trip tests: .flo byte layout (oracle: readFlowFile.py:16-31), PGM,
grayscale image read/write."""

import struct

import numpy as np
import pytest

from frame2frame_tpu.io import (
    read_flo,
    read_frame,
    read_gray,
    read_pgm,
    write_flo,
    write_gray,
    write_pgm,
)


def test_flo_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    flow = rng.normal(size=(7, 5, 2)).astype(np.float32)
    path = tmp_path / "t.flo"
    write_flo(path, flow)
    out = read_flo(path)
    np.testing.assert_array_equal(out, flow)


def test_flo_byte_layout(tmp_path):
    """Byte-for-byte layout per readFlowFile.py: magic, w, h, interleaved data."""
    flow = np.arange(2 * 3 * 2, dtype=np.float32).reshape(2, 3, 2)
    path = tmp_path / "t.flo"
    write_flo(path, flow)
    raw = path.read_bytes()
    magic, w, h = struct.unpack("<fii", raw[:12])
    assert magic == np.float32(202021.25)
    assert (w, h) == (3, 2)
    data = np.frombuffer(raw[12:], np.float32)
    # row-major interleaved (u, v) pairs
    np.testing.assert_array_equal(data.reshape(2, 3, 2), flow)


def test_flo_reader_matches_reference_parse(tmp_path):
    """Hand-build a file the way the reference reader expects and parse it."""
    h, w = 4, 6
    data = np.random.default_rng(1).normal(size=(h, w, 2)).astype(np.float32)
    path = tmp_path / "ref.flo"
    with open(path, "wb") as f:
        np.float32(202021.25).tofile(f)
        np.int32(w).tofile(f)
        np.int32(h).tofile(f)
        data.tofile(f)
    out = read_flo(path)
    np.testing.assert_array_equal(out, data)


def test_flo_bad_magic(tmp_path):
    path = tmp_path / "bad.flo"
    path.write_bytes(b"\x00" * 16)
    with pytest.raises(ValueError):
        read_flo(path)


def test_pgm_roundtrip(tmp_path):
    img = ((np.arange(30).reshape(5, 6) * 7) % 256).astype(np.uint8)
    path = tmp_path / "t.pgm"
    write_pgm(path, img)
    out = read_pgm(path)
    np.testing.assert_array_equal(out, img)


def test_png_gray_roundtrip(tmp_path):
    img = np.random.default_rng(2).integers(0, 256, size=(16, 12)).astype(np.uint8)
    path = tmp_path / "t.png"
    write_gray(path, img)
    out = read_gray(path)  # [0,1] floats for uint8 input (skimage as_gray)
    np.testing.assert_allclose(out * 255.0, img, atol=1e-6)


def test_read_frame_template(tmp_path):
    img = np.full((8, 8), 100, np.uint8)
    write_gray(tmp_path / "f003.png", img)
    out = read_frame(str(tmp_path / "f%03d.png"), 3)
    np.testing.assert_allclose(out, 100.0, atol=1e-6)


def test_tiff_float_roundtrip(tmp_path):
    img = np.random.default_rng(3).normal(size=(9, 11)).astype(np.float32) * 100
    path = tmp_path / "t.tiff"
    write_gray(path, img)  # tiff path stores raw float32
    from frame2frame_tpu.io import read_image

    out = np.asarray(read_image(path))
    np.testing.assert_allclose(out, img, rtol=1e-6)
