"""Validate compute_strred against skvideo.measure.strred when available.

This environment has no network egress and no skvideo, and the sp5Filters
coefficient tables (matlabPyrTools) are not re-derivable, so the external
oracle cannot run here. On any host with ``pip install scikit-video``, this
script compares both compute_strred band methods to skvideo on synthetic
fixtures and writes the deltas to strred_oracle.json — check that file in to
pin true oracle values.

Usage: python scripts/validate_strred.py [out.json]
"""

import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def fixtures():
    from scipy.ndimage import gaussian_filter

    rng = np.random.default_rng(0)
    base = gaussian_filter(rng.random((288, 352)), 3.0)
    base = (base - base.min()) / (base.max() - base.min()) * 255
    clean = np.stack([np.roll(base, t, axis=1) for t in range(5)])[..., None]
    cases = {}
    for sigma in (5, 15, 30, 50):
        cases[f"awgn{sigma}"] = (clean,
                                 clean + rng.normal(0, sigma, clean.shape))
    blur = np.stack([gaussian_filter(c[..., 0], 2.0) for c in clean])[..., None]
    cases["blur2"] = (clean, blur)
    return cases


def main(out_path="strred_oracle.json"):
    from frame2frame_tpu.utils.metrics import compute_strred

    try:
        from skvideo.measure import strred as sk_strred
    except ImportError:
        print("skvideo not installed — run on a host with scikit-video to "
              "produce the oracle file; recording ours-only values.")
        sk_strred = None

    results = {}
    for name, (clean, dis) in fixtures().items():
        row = {
            "ours_spyr": float(np.mean(compute_strred(clean, dis))),
            "ours_analytic": float(np.mean(compute_strred(clean, dis,
                                                          method="analytic"))),
        }
        if sk_strred is not None:
            _, strred_val, _ = sk_strred(clean.astype(np.float32),
                                         dis.astype(np.float32))
            row["skvideo"] = float(strred_val)
            row["ratio_spyr"] = row["ours_spyr"] / max(row["skvideo"], 1e-12)
        results[name] = row
        print(name, row)

    Path(out_path).write_text(json.dumps(results, indent=2))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main(*sys.argv[1:2])
