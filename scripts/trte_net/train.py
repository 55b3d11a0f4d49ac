"""Offline FastDVDnet training launcher — the reference's scripts/trte_net/train.py
equivalent: expand the staged config grid, dispatch each experiment through the
trainer with uuid-keyed caching/skip-done (cache_io.run_exps semantics,
reference scripts/trte_net/train.py:25-45)."""

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))


def main():
    from frame2frame_tpu import cache
    from frame2frame_tpu.train import trainer

    exps, uuids = cache.train_stages.run(
        REPO / "exps/trte_net/train.cfg", cache_dir=".cache_f2f/trte_net"
    )
    print(f"Running {len(exps)} experiments")
    records = cache.run_exps(
        exps, trainer.run, uuids=uuids,
        cache_dir=".cache_f2f", proj_name="trte_net",
    )
    df = cache.records_to_frame(records)
    cols = [c for c in ("sigma", "val_psnr", "val_ssim", "uuid") if c in df]
    print(df[cols] if cols else df)
    return records


if __name__ == "__main__":
    main()
