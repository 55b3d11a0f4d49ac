"""TV-L1 solver vs golden .flo outputs of the reference C binary.

Goldens in tests/golden/ were produced by compiling the reference
``tvl1flow`` (tvl1flow/main.c) and running it on the checked-in synthetic pair:

    tvl1flow i0.png i1.png flow_default.flo 4 0.25 0.15 0.3 100 0 0.5 5 0.01 0
    tvl1flow i0.png i1.png flow_denoise.flo 4 0.25 0.2  0.3 100 2 0.5 5 0.01 0

(the second uses the denoising-pipeline parameters from tvl1flow.sh:10-18).
The solver is expected to match within tight float32 tolerance — this is
BASELINE.json config 2's "flow-fidelity check vs .flo outputs".
"""

from pathlib import Path

import numpy as np
import pytest

from frame2frame_tpu.flow.tvl1 import make_tvl1_solver
from frame2frame_tpu.io.flo import read_flo
from frame2frame_tpu.io.image import read_gray

GOLDEN = Path(__file__).parent / "golden"


@pytest.fixture(scope="module")
def pair():
    I0 = np.asarray(read_gray(GOLDEN / "i0.png"), np.float32)
    I1 = np.asarray(read_gray(GOLDEN / "i1.png"), np.float32)
    return I0, I1


@pytest.mark.parametrize(
    "golden,params",
    [
        ("flow_default.flo", dict(lambda_=0.15, fscale=0)),
        ("flow_denoise.flo", dict(lambda_=0.2, fscale=2)),
    ],
)
def test_tvl1_matches_c_binary(pair, golden, params):
    I0, I1 = pair
    ref = read_flo(GOLDEN / golden)
    ny, nx = I0.shape
    solver = make_tvl1_solver(nx, ny, **params)
    flow = np.asarray(solver(I0, I1))
    err = np.abs(flow - ref)
    # measured parity on these goldens: mean ~1.2-1.6e-6 px, max ~7e-5 px —
    # the bounds pin the README/BASELINE "golden parity" claim with margin
    assert err.mean() < 1e-5, f"mean abs err {err.mean()}"
    assert err.max() < 5e-4, f"max abs err {err.max()}"
    # flow magnitudes agree overall (the pair contains a (-1, +1) px shift)
    np.testing.assert_allclose(flow.mean((0, 1)), ref.mean((0, 1)), atol=5e-3)


def test_tvl1_recovers_known_shift(pair):
    """i1 is i0's scene shifted by (+1 y, -1 x): flow(i0->i1) ~ (u=+1, v=-1)."""
    I0, I1 = pair
    ny, nx = I0.shape
    solver = make_tvl1_solver(nx, ny, lambda_=0.2, fscale=0)
    flow = np.asarray(solver(I0, I1))
    inner = flow[10:-10, 10:-10]
    assert abs(np.median(inner[..., 0]) - 1.0) < 0.35
    assert abs(np.median(inner[..., 1]) + 1.0) < 0.35


def test_pallas_inner_bit_identical(pair):
    """The VMEM-resident Pallas inner loop must match the XLA while_loop
    bit-for-bit (same ops, same order)."""
    import numpy as np

    I0, I1 = pair
    small0 = I0[:48, :64]
    small1 = I1[:48, :64]
    sx = make_tvl1_solver(64, 48, max_iters=30, inner_impl="xla")
    sp = make_tvl1_solver(64, 48, max_iters=30, inner_impl="pallas")
    np.testing.assert_array_equal(np.asarray(sx(small0, small1)),
                                  np.asarray(sp(small0, small1)))
