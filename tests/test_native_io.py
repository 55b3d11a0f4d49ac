"""Native C++ I/O runtime tests: .flo codec round-trip vs the Python reader,
PNG decode parity, and the prefetch ring delivering frames+flows in order."""

import numpy as np
import pytest

from frame2frame_tpu.io import flo as pyflo
from frame2frame_tpu.io import native
from frame2frame_tpu.io.image import write_gray

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native libf2fio not built")


def test_native_flo_roundtrip(tmp_path):
    flow = np.random.default_rng(0).normal(size=(9, 7, 2)).astype(np.float32)
    p = tmp_path / "t.flo"
    native.write_flo(p, flow)
    np.testing.assert_array_equal(native.read_flo(p), flow)
    # cross-parity with the Python codec
    np.testing.assert_array_equal(pyflo.read_flo(p), flow)
    p2 = tmp_path / "t2.flo"
    pyflo.write_flo(p2, flow)
    np.testing.assert_array_equal(native.read_flo(p2), flow)


def test_native_png_decode(tmp_path):
    img = np.random.default_rng(1).integers(0, 256, (12, 17)).astype(np.uint8)
    p = tmp_path / "t.png"
    write_gray(p, img)
    got = native.read_gray(p)
    np.testing.assert_allclose(got, img.astype(np.float32), atol=1e-4)


def test_prefetcher_order_and_flow(tmp_path):
    rng = np.random.default_rng(2)
    n = 6
    frame_paths, flow_paths = [], []
    frames, flows = [], []
    for i in range(n):
        img = rng.integers(0, 256, (8, 10)).astype(np.uint8)
        fp = tmp_path / f"f{i:03d}.png"
        write_gray(fp, img)
        frames.append(img)
        frame_paths.append(fp)
        if i > 0:
            fl = rng.normal(size=(8, 10, 2)).astype(np.float32)
            lp = tmp_path / f"f{i:03d}.flo"
            pyflo.write_flo(lp, fl)
            flows.append(fl)
            flow_paths.append(lp)
        else:
            flows.append(None)
            flow_paths.append(None)

    pf = native.NativePrefetcher(frame_paths, flow_paths, capacity=3, nthreads=2)
    for i in range(n):
        frame, flow = pf.get(i)
        np.testing.assert_allclose(frame, frames[i].astype(np.float32), atol=1e-4)
        if i == 0:
            assert flow is None
        else:
            np.testing.assert_array_equal(flow, flows[i])
    pf.close()


def test_prefetcher_missing_file(tmp_path):
    pf = native.NativePrefetcher([tmp_path / "nope.png"], capacity=1)
    with pytest.raises(IOError):
        pf.get(0)
    pf.close()
