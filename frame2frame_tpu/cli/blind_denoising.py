"""CLI for model-blind video denoising — argument-compatible with the reference
``blind_denoising.py`` (reference blind_denoising.py:262-290).

Additional flags beyond the reference surface:
- ``--compute_flow``: solve TV-L1 on-device in-pipeline instead of reading
  precomputed .flo files (BASELINE.json north-star capability);
- ``--channels/--layers``: network shape (reference hard-codes 1ch/17 layers at
  blind_denoising.py:144).

Usage:
    python -m frame2frame_tpu.cli.blind_denoising \
        --input noisy/%03d.png --flow flows/%03d.flo --ref clean/%03d.png \
        --output out/%03d.png --first 1 --last 300 --iter 20
"""

from __future__ import annotations

import argparse
import sys

import jax


def build_parser():
    parser = argparse.ArgumentParser(description="Blind_denoising_grayscale (TPU)")
    parser.add_argument("--input", type=str, default="",
                        help="path to input frames (C type)")
    parser.add_argument("--ref", type=str, default="",
                        help="path to reference frames (C type) for PSNR")
    parser.add_argument("--flow", type=str, default="",
                        help="path to optical flow (C type .flo); empty => on-device TV-L1")
    parser.add_argument("--output", type=str, default="./%03d.png",
                        help="path to output image (C type)")
    parser.add_argument("--output_psnr", type=str, default="plot_psnr.txt")
    parser.add_argument("--output_network", type=str, default="final.msgpack")
    parser.add_argument("--first", type=int, default=1)
    parser.add_argument("--last", type=int, default=300)
    parser.add_argument("--iter", type=int, default=20,
                        help="fine-tune iterations per frame")
    parser.add_argument("--network", type=str, default="",
                        help=".pth or .msgpack checkpoint (empty => random init)")
    parser.add_argument("--lr", type=float, default=5e-5)
    parser.add_argument("--weight_decay", type=float, default=1e-5)
    parser.add_argument("--channels", type=int, default=1)
    parser.add_argument("--layers", type=int, default=17)
    parser.add_argument("--compute_flow", action="store_true")
    parser.add_argument("--remat", type=int, default=-1,
                        help="checkpoint every N layers during fine-tune "
                        "(-1 = auto: 4 for frames >= ~1MP, else off)")
    parser.add_argument("--profile", type=str, default="",
                        help="capture a jax.profiler device trace into this "
                        "directory (view in TensorBoard/Perfetto) and write "
                        "a pprof HBM profile next to it")
    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)

    print("\n### Model-blind Video Denoising Via Frame-to-frame Training (TPU) ###")
    print("> Parameters:")
    for p, v in vars(args).items():
        print(f"\t{p}: {v}")
    print()

    from ..io.image import read_frame
    from ..models.dncnn import init_dncnn, load_torch_checkpoint
    from ..train.online import run_blind_denoising

    remat = args.remat
    if remat < 0:  # auto: big frames need activation checkpointing
        probe = read_frame(args.input, args.first)
        remat = 2 if probe.shape[0] * probe.shape[1] >= 1_000_000 else 0

    model, variables = init_dncnn(
        jax.random.PRNGKey(0), channels=args.channels, num_layers=args.layers,
        residual=False, remat_every=remat,
    )
    if not args.network:
        # the reference always starts from a pretrained net
        # (blind_denoising.py:287-288, dncnn/logs/DnCNN-S-25); online
        # fine-tuning from random init usually diverges
        print("warning: no --network checkpoint given — starting from random "
              "init; expect poor/divergent PSNR (pretrain via "
              "scripts/trte_dncnn/train.py or pass a DnCNN .pth)",
              file=sys.stderr)
    if args.network:
        if args.network.endswith((".pth", ".pt")):
            variables = load_torch_checkpoint(args.network, num_layers=args.layers)
        else:
            from ..models.serialization import load_variables

            variables = load_variables(args.network, like=variables)

    from ..utils.profiling import trace_if, write_memory_profile

    with trace_if(args.profile):
        results = run_blind_denoising(
            model,
            variables,
            input_tmpl=args.input,
            flow_tmpl=args.flow or None,
            ref_tmpl=args.ref or None,
            output_tmpl=args.output,
            output_psnr=args.output_psnr,
            output_network=args.output_network,
            first=args.first,
            last=args.last,
            iters=args.iter,
            lr=args.lr,
            weight_decay=args.weight_decay,
            compute_flow=args.compute_flow or not args.flow,
            progress=True,
        )
    if args.profile:
        write_memory_profile(args.profile.rstrip("/") + "/device_mem.pprof")
    return results


if __name__ == "__main__":
    main()
