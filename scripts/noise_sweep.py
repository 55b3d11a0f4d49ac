"""Model-blind noise sweep (BASELINE.json config 3): AWGN sigma in {10,25,50},
Poisson-Gaussian, and JPEG artifacts on synthetic sequences, evaluated through
the full pipeline (pretrain per noise level -> streaming blind denoising with
on-device flow), reporting denoised vs noisy PSNR per condition.

Usage: python scripts/noise_sweep.py [--fast]
"""

import argparse
import sys
import tempfile
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def make_sequence(noise, workdir, nframes=5, h=64, w=64, seed=7):
    from frame2frame_tpu.data.datasets import synthetic_video
    from frame2frame_tpu.data.noise import add_jpeg_artifacts
    from frame2frame_tpu.io.image import write_gray

    rng = np.random.default_rng(seed)
    vid = synthetic_video(seed, nframes=nframes, h=h, w=w)[..., 0]
    if noise["kind"] == "g":
        noisy = vid + rng.normal(0, noise["sigma"], vid.shape)
    elif noise["kind"] == "pg":
        lam = np.clip(vid / 255.0, 0, 1) * noise["rate"]
        noisy = rng.poisson(lam) / noise["rate"] * 255.0 + rng.normal(
            0, noise.get("sigma", 0), vid.shape)
    elif noise["kind"] == "jpeg":
        noisy = add_jpeg_artifacts(vid, quality=noise["quality"])
    else:
        raise ValueError(noise)
    noisy = np.clip(noisy, 0, 255)
    for t in range(nframes):
        write_gray(workdir / f"clean{t + 1:03d}.png", vid[t])
        write_gray(workdir / f"noisy{t + 1:03d}.png", noisy[t])
    return nframes, float(np.std(noisy - vid))


def run_condition(noise, fast=False):
    from frame2frame_tpu.config import Config
    from frame2frame_tpu.io.image import read_frame
    from frame2frame_tpu.train import trainer
    from frame2frame_tpu.utils.metrics import psnr

    with tempfile.TemporaryDirectory() as td:
        td = Path(td)
        n, resid_std = make_sequence(noise, td)

        # pretrain a small denoiser at the measured residual level
        # (model-blind: the online stage adapts to the real noise statistics).
        # Low-noise conditions need a higher-fidelity net (the denoiser's
        # quality ceiling must exceed the noisy input's PSNR), so they get
        # more capacity and longer pretraining.
        sigma_eq = max(resid_std, 5.0)
        low_noise = sigma_eq < 12
        cfg = Config(net_name="dncnn", channels=1,
                     num_of_layers=7 if low_noise else 5, seed=0,
                     dname="synthetic", nvideos=6 if low_noise else 3,
                     nframes_data=3,
                     isize_data=(48, 48), ntype="g", sigma=sigma_eq,
                     crit_name="sup",
                     nepochs=10 if fast else (50 if low_noise else 30),
                     lr_init=1e-3, scheduler_name="cosa", flow=False,
                     checkpoint_dir=str(td / "ckpt"), log_csv=False)
        out = trainer.run(cfg)

        import sys as _sys

        argv = ["x", "--input", str(td / "noisy%03d.png"),
                "--ref", str(td / "clean%03d.png"),
                "--output", str(td / "out%03d.png"),
                "--first", "1", "--last", str(n), "--iter", "10",
                "--layers", str(cfg.num_of_layers), "--compute_flow",
                "--network", out["checkpoint"],
                "--output_psnr", str(td / "psnr.txt"),
                "--output_network", str(td / "final.msgpack")]
        old = _sys.argv
        _sys.argv = argv
        try:
            from frame2frame_tpu.cli.blind_denoising import main

            r = main()
        finally:
            _sys.argv = old

        noisy_psnrs = [
            psnr(np.asarray(read_frame(str(td / "clean%03d.png"), i)) / 255,
                 np.asarray(read_frame(str(td / "noisy%03d.png"), i)) / 255)
            for i in range(2, n + 1)
        ]
        return float(np.mean(noisy_psnrs)), float(np.mean(r["psnr"]))


CONDITIONS = [
    {"name": "awgn-10", "kind": "g", "sigma": 10},
    {"name": "awgn-25", "kind": "g", "sigma": 25},
    {"name": "awgn-50", "kind": "g", "sigma": 50},
    {"name": "pg-30", "kind": "pg", "rate": 30, "sigma": 5},
    {"name": "jpeg-q20", "kind": "jpeg", "quality": 20, "sigma": 15},
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fast", action="store_true")
    args = ap.parse_args()

    print(f"{'condition':10s} {'noisy':>7s} {'deno':>7s} {'gain':>6s}")
    rows = []
    for cond in CONDITIONS:
        noisy, deno = run_condition(cond, fast=args.fast)
        rows.append((cond["name"], noisy, deno))
        print(f"{cond['name']:10s} {noisy:7.2f} {deno:7.2f} {deno - noisy:+6.2f}")
    return rows


if __name__ == "__main__":
    main()
