"""Per-video test-time instance adaptation study — the reference's
scripts/instances_adapt.py equivalent (instances_adapt.py:307-516): load a
video, split frames into adapt/eval sets, fine-tune a pretrained denoiser with
a configurable self-supervised loss (f2f / f2f_plus / stnls / sup / none), then
evaluate on the held-out frames, sweeping a config grid through the cached
experiment runner.

The reference's hard-coded raw Canon burst loader (instances_adapt.py:91-158)
is generalized: any dataset from the registry works (``dname`` +
``vid_name``), including raw packed 4-channel videos loaded from .npy files.
"""

import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def split_vids(noisy, clean, ntrain):
    """Frame split: first ntrain frames adapt, the rest evaluate
    (instances_adapt.py:169-175)."""
    return ((noisy[:, :ntrain], clean[:, :ntrain]),
            (noisy[:, ntrain:], clean[:, ntrain:]))


def get_videos(cfg):
    """Load (noisy, clean) videos (B=1, T, H, W, C) in [0, 1]."""
    from frame2frame_tpu.config import optional
    from frame2frame_tpu.data import sets

    raw_path = optional(cfg, "raw_path", None)
    if raw_path:  # packed raw bursts stored as .npy (T, H, W, 4)
        arr = np.load(raw_path).astype(np.float32)
        noisy = arr[None] / arr.max()
        return noisy, noisy.copy()
    data, _ = sets.load(cfg)
    sample = data.te[optional(cfg, "vid_index", 0)]
    return (sample["noisy"][None] / 255.0, sample["clean"][None] / 255.0)


def run_training(cfg, state, noisy, clean):
    """Adapt with the configured loss (instances_adapt.py:195-236): BN frozen
    in eval during adaptation (:200-206), Adam + cosine schedule (:184-193)."""
    from frame2frame_tpu import get_loss_fxn

    loss_fxn = get_loss_fxn(cfg, cfg.get("loss_type", "f2f"))
    if callable(loss_fxn) and not hasattr(loss_fxn, "loss_fxn"):
        return loss_fxn(state, noisy, clean)
    return loss_fxn(state, noisy, clean)


def run_testing(cfg, state, noisy, clean):
    """Chunked eval forward + metrics (instances_adapt.py:239-305)."""
    import jax.numpy as jnp

    from frame2frame_tpu.eval.chunks import chunk, extract_chunks_config
    from frame2frame_tpu.utils.metrics import compute_psnrs, compute_ssims

    def fwd(vid, fl=None):
        B, T = vid.shape[:2]
        out = state.eval_apply(vid.reshape((B * T,) + vid.shape[2:]))
        return out.reshape(vid.shape[:2] + out.shape[1:])

    fwd_fxn = chunk(extract_chunks_config(cfg), fwd)
    deno = np.asarray(jnp.clip(fwd_fxn(noisy), 0.0, 1.0))
    return {
        "psnrs": compute_psnrs(deno, np.asarray(clean), div=1.0).tolist(),
        "ssims": compute_ssims(deno, np.asarray(clean), div=1.0).tolist(),
    }


def run(cfg):
    """One experiment (instances_adapt.py:307-344)."""
    import jax

    from frame2frame_tpu.config import Config, optional
    from frame2frame_tpu.models import load_model
    from frame2frame_tpu.train.schedules import make_optimizer
    from frame2frame_tpu.train.state import TrainState
    from frame2frame_tpu.utils.misc import set_seed

    cfg = Config(cfg)
    set_seed(optional(cfg, "seed", 123))

    noisy, clean = get_videos(cfg)
    ntrain = optional(cfg, "ntrain_frames", max(noisy.shape[1] // 2, 3))
    (tr_n, tr_c), (te_n, te_c) = split_vids(noisy, clean, ntrain)

    ms = load_model(cfg)
    ocfg = Config(cfg)
    ocfg.scheduler_name = "cosa"
    ocfg.nepochs = optional(cfg, "adapt_nepochs", 1)
    ocfg.lr_init = optional(cfg, "adapt_lr", 1e-4)
    tx, _ = make_optimizer(ocfg)
    state = TrainState.create(ms.model, ms.variables, tx, residual=True)

    if cfg.get("loss_type", "f2f") != "none":
        state, info = run_training(cfg, state, tr_n, tr_c)
    else:
        info = Config(loss=[], lr=[])

    results = run_testing(cfg, state, te_n, te_c)
    results["adapt_loss"] = list(map(float, info.get("loss", [])))
    return results


def collect_grids():
    """The sweep grids (instances_adapt.py:388-434)."""
    base = {
        "net_name": "dncnn", "channels": 1, "num_of_layers": 9,
        "dname": "synthetic", "nvideos": 1, "nframes_data": 8,
        "isize_data": [96, 96], "ntype": "g", "sigma": 25,
        "adapt_isize": "64_64", "adapt_nepochs": 1, "nbatch_sample": 1,
        "spatial_chunk_size": 256, "spatial_chunk_overlap": 0.1,
        "temporal_chunk_size": 3,
    }
    grids = [{"loss_type": ["f2f", "sup", "none"]}]
    return base, grids


def main():
    from frame2frame_tpu import cache

    base, grids = collect_grids()
    exps = cache.load_edata(base, grids)
    records = cache.run_exps(exps, run, proj_name="instances_adapt")
    for rec in records:
        res = rec.get("results", {})
        psnrs = res.get("psnrs", [])
        tag = rec["cfg"].get("loss_type", "?")
        if psnrs:
            print(f"{tag:8s} psnr={np.mean(psnrs):.2f}")
    return records


if __name__ == "__main__":
    main()
