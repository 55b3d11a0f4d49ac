"""Offline DnCNN training launcher — the reference's scripts/trte_dncnn/train.py
equivalent: expand the staged config grid, dispatch each experiment through the
trainer with uuid-keyed caching/skip-done (cache_io.run_exps semantics,
reference scripts/trte_dncnn/train.py:25-45)."""

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))


def main(enable_dispatch=None, use_wandb=False):
    """CLI: --dispatch slurm|process farms one job per config (reference
    surface: cache_io.run_exps(..., enable_dispatch="slurm", use_wandb=True),
    scripts/trte_dncnn/train.py:42-45)."""
    from frame2frame_tpu import cache
    from frame2frame_tpu.train import trainer

    exps, uuids = cache.train_stages.run(
        REPO / "exps/trte_dncnn/train.cfg", cache_dir=".cache_f2f/trte_dncnn"
    )
    print(f"Running {len(exps)} experiments")
    records = cache.run_exps(
        exps, trainer.run, uuids=uuids,
        cache_dir=".cache_f2f", enable_dispatch=enable_dispatch,
        use_wandb=use_wandb, proj_name="trte_dncnn",
    )
    df = cache.records_to_frame(records)
    cols = [c for c in ("sigma", "val_psnr", "val_ssim", "uuid") if c in df]
    print(df[cols] if cols else df)
    return records


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--dispatch", default=None, choices=["slurm", "process"])
    ap.add_argument("--wandb", action="store_true")
    args = ap.parse_args()
    main(enable_dispatch=args.dispatch, use_wandb=args.wandb)
