"""End-to-end quality integration test: pretrain a small DnCNN (supervised,
synthetic data), then run the full blind-denoising CLI path — on-device TV-L1
flow + online frame2frame fine-tuning — and require the denoised PSNR to beat
both the noisy input and the pretrained net's supervised PSNR, reproducing the
reference paper's model-blind adaptation effect (BASELINE.json config 1 in
miniature)."""

import numpy as np
import pytest

from frame2frame_tpu.config import Config


@pytest.mark.parametrize("seed", [0])
def test_blind_denoising_improves_psnr(tmp_path, seed):
    from frame2frame_tpu.data.datasets import synthetic_video
    from frame2frame_tpu.io.image import read_frame, write_gray
    from frame2frame_tpu.train import trainer
    from frame2frame_tpu.utils.metrics import psnr

    # 1. supervised pretrain at sigma=25 (the recipe replacing the reference's
    #    DnCNN-S-25 checkpoint dependency, SURVEY.md §2.3)
    cfg = Config(net_name="dncnn", channels=1, num_of_layers=5, seed=seed,
                 dname="synthetic", nvideos=4, nframes_data=3,
                 isize_data=(48, 48), ntype="g", sigma=25, crit_name="sup",
                 nepochs=30, lr_init=1e-3, scheduler_name="cosa", flow=False,
                 checkpoint_dir=str(tmp_path / "ckpt"), residual=True)
    out = trainer.run(cfg)
    pre_psnr = out["val_psnr"]

    # 2. noisy test sequence
    rng = np.random.default_rng(99)
    vid = synthetic_video(99, nframes=5, h=64, w=64)
    for t in range(5):
        clean = vid[t, ..., 0]
        write_gray(tmp_path / f"clean{t + 1:03d}.png", clean)
        write_gray(tmp_path / f"noisy{t + 1:03d}.png",
                   np.clip(clean + rng.normal(0, 25, clean.shape), 0, 255))

    # 3. the full CLI path with in-pipeline flow
    import sys

    argv = ["x", "--input", str(tmp_path / "noisy%03d.png"),
            "--ref", str(tmp_path / "clean%03d.png"),
            "--output", str(tmp_path / "out%03d.png"),
            "--first", "1", "--last", "5", "--iter", "10", "--layers", "5",
            "--compute_flow", "--network", out["checkpoint"],
            "--output_psnr", str(tmp_path / "psnr.txt"),
            "--output_network", str(tmp_path / "final.msgpack")]
    old = sys.argv
    sys.argv = argv
    try:
        from frame2frame_tpu.cli.blind_denoising import main

        r = main()
    finally:
        sys.argv = old

    noisy_psnrs = [
        psnr(np.asarray(read_frame(str(tmp_path / "clean%03d.png"), i)) / 255,
             np.asarray(read_frame(str(tmp_path / "noisy%03d.png"), i)) / 255)
        for i in range(2, 6)
    ]
    deno = float(np.mean(r["psnr"]))
    noisy = float(np.mean(noisy_psnrs))
    # denoised beats noisy clearly, and online adaptation beats the
    # supervised-pretrained starting point
    assert deno > noisy + 2.0, (deno, noisy)
    assert deno > pre_psnr + 0.5, (deno, pre_psnr)
    # psnr file written with one line per processed frame
    lines = (tmp_path / "psnr.txt").read_text().strip().splitlines()
    assert len(lines) == 4


def test_committed_checkpoint_artifact_denoises():
    """Integrity of the committed full-scale artifact
    (results/dncnn17_s25/checkpoint.msgpack, round-4 accuracy deliverable):
    the 17-layer sigma=25 checkpoint must load through the serialization
    layer and, in eval mode, denoise an unseen sigma=25 frame well above the
    noisy input — guarding against a stale/corrupt artifact drifting from
    the code (recipe provenance: results/dncnn17_s25/recipe.json)."""
    from pathlib import Path

    import jax
    import jax.numpy as jnp

    from frame2frame_tpu.data.datasets import synthetic_video
    from frame2frame_tpu.models.dncnn import init_dncnn
    from frame2frame_tpu.models.serialization import load_variables
    from frame2frame_tpu.utils.metrics import psnr

    ckpt = Path(__file__).resolve().parents[1] / "results" / "dncnn17_s25" \
        / "checkpoint.msgpack"
    if not ckpt.exists():
        pytest.skip("committed checkpoint artifact not present")

    model, init_vars = init_dncnn(jax.random.PRNGKey(0), channels=1,
                                  num_layers=17, residual=True)
    variables = load_variables(ckpt, like=init_vars)

    # unseen sequence/seed vs both the training data and the trajectory run
    clean = synthetic_video(1234, nframes=1, h=96, w=96, channels=1,
                            texture="mixed")[0, ..., 0] / 255.0
    rng = np.random.default_rng(1235)
    noisy = np.clip(clean + rng.normal(0, 25 / 255.0, clean.shape), 0,
                    1).astype(np.float32)
    deno = model.apply({"params": variables["params"],
                        "batch_stats": variables["batch_stats"]},
                       jnp.asarray(noisy)[None, ..., None], train=False)
    deno = np.asarray(deno)[0, ..., 0]

    p_noisy = psnr(clean, noisy)
    p_deno = psnr(clean, deno)
    # recipe.json records val_psnr 28.57 dB on held-out data; require a
    # clear denoising margin here without pinning the exact value
    assert p_deno > p_noisy + 4.0, (p_deno, p_noisy)
    assert p_deno > 26.0, p_deno
