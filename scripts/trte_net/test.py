"""Offline FastDVDnet evaluation launcher — the reference's scripts/trte_net/
test.py equivalent: runs frame2frame_tpu.eval.test.run per config with cached
results (reference scripts/trte_net/test.py:16,32-47)."""

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))


def main():
    from frame2frame_tpu import cache
    from frame2frame_tpu.eval import test

    exps, uuids = cache.train_stages.run(
        REPO / "exps/trte_net/test.cfg", cache_dir=".cache_f2f/trte_net_te"
    )
    print(f"Running {len(exps)} experiments")
    records = cache.run_exps(
        exps, test.run, uuids=uuids,
        cache_dir=".cache_f2f", proj_name="trte_net_te",
    )
    import numpy as np

    for rec in records:
        res = rec.get("results", {})
        psnrs = res.get("psnrs", [])
        if psnrs:
            print(rec["uuid"], "psnr:", float(np.mean(np.concatenate(
                [np.atleast_1d(p) for p in psnrs]))))
    return records


if __name__ == "__main__":
    main()
