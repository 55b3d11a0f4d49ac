"""Model evaluation pipeline — the reference's ``frame2frame.test.run(cfg)``
(lib/frame2frame/test.py:74-306): per-video flow, optional x8 self-ensemble,
chunked inference, burn-in, optional internal adaptation, timed/memory-metered
denoising, the B2U masked-ensemble second pass, video saving, and
PSNR/SSIM/ST-RRED metrics — with per-stage timers mirroring the reference's
result columns (test.py:109-117).
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config, extract_pairs, optional
from ..data import filter_subseq, sets, slice_sample
from ..flow import api as flow_api
from ..io.video import save_video
from ..losses.b2u import B2ULoss
from ..models import load_model
from ..utils.mem import GpuMemer, MemIt
from ..utils.metrics import compute_psnrs, compute_ssims, compute_strred
from ..utils.misc import set_seed
from ..utils.timer import ExpTimer, TimeIt
from .aug import test_x8
from .chunks import chunk, extract_chunks_config


def test_pairs():
    """Config keys + defaults mirroring test.py:36-47."""
    return {
        "device": "tpu", "seed": 123,
        "frame_start": 0, "frame_end": -1, "dset": "val",
        "aug_test": False, "longest_space_chunk": False,
        "flow": False, "burn_in": False, "arch_name": "default",
        "saved_dir": "./output/saved_examples/", "uuid": "uuid_def",
        "flow_sigma": -1, "internal_adapt_nsteps": 0,
        "internal_adapt_nepochs": 0, "internal_adapt_nframes": 5,
        "nframes": 0, "read_flows": False,
        "save_deno": True, "bench_bwd": False, "append_noise_map": False,
        "crit_name": "warp", "vid_name": "vid00", "sigma": 25,
        "profile_dir": "",  # capture a jax.profiler device trace here
    }


def run(cfg):
    """Evaluate per config; returns a results Config of per-video lists."""
    cfg = Config(cfg)
    tcfg = extract_pairs(cfg, test_pairs())
    if tcfg.frame_end == -1 and tcfg.nframes > 0:
        tcfg.frame_end = tcfg.frame_start + tcfg.nframes - 1

    set_seed(tcfg.seed)
    imax = 255.0
    from ..utils.profiling import trace_if

    results = Config()
    for k in ("psnrs", "ssims", "strred", "psnrs_pp", "ssims_pp", "strred_pp",
              "strred_method", "noisy_psnrs", "deno_fns", "vid_frames",
              "vid_name"):
        results[k] = []
    time_fields = ["flow", "deno", "deno_pp", "adapt", "fwd_grad", "bwd"]
    for f in time_fields:
        results[f"timer_{f}"] = []
    for f in ["deno", "deno_pp", "adapt", "fwd_grad", "bwd"]:
        results[f"{f}_mem_res"] = []
        results[f"{f}_mem_alloc"] = []

    ms = load_model(cfg)
    state_apply = ms.apply

    data, loaders = sets.load(cfg)
    dset = data[tcfg.dset]
    indices = filter_subseq(dset, tcfg.vid_name, tcfg.frame_start, tcfg.frame_end)

    burn_in = tcfg.burn_in
    import contextlib
    prof = contextlib.ExitStack()
    prof.enter_context(trace_if(tcfg.profile_dir))
    try:
        for index in indices:
            timer = ExpTimer()
            memer = GpuMemer()

            sample = slice_sample(dset[index], tcfg.frame_start, tcfg.frame_end)
            noisy = jnp.asarray(sample["noisy"])[None]  # (1, T, H, W, C), [0,255]
            clean = jnp.asarray(sample["clean"])[None]
            vid_frames = np.asarray(sample["fnums"])

            # resample noise for flow input (test.py:151-154)
            if tcfg.flow_sigma >= 0:
                key = jax.random.PRNGKey(tcfg.seed)
                noisy_f = clean + tcfg.flow_sigma * jax.random.normal(
                    key, clean.shape, clean.dtype)
            else:
                noisy_f = noisy

            with TimeIt(timer, "flow"):
                if tcfg.read_flows and "fflow" in sample:
                    flows = Config(fflow=jnp.asarray(sample["fflow"])[None],
                                   bflow=jnp.asarray(sample["bflow"])[None])
                else:
                    flows = flow_api.run_flows(noisy_f, tcfg.flow)

            # forward fn: model (+ optional x8 ensemble) (+ chunking);
            # video models (FastDVDnet) consume (B, T, H, W, C) directly,
            # frame models (DnCNN) flatten time into batch
            def model_fwd(vid, fl=None):
                if ms.get("video_model", False):
                    return state_apply(vid)
                B, T = vid.shape[:2]
                out = state_apply(vid.reshape((B * T,) + vid.shape[2:]))
                return out.reshape(vid.shape[:2] + out.shape[1:])

            if tcfg.aug_test:
                def aug_fwd(vid, fl=None):
                    return test_x8(model_fwd, vid, fl)
                base_fwd = aug_fwd
            else:
                base_fwd = model_fwd

            chunk_cfg = extract_chunks_config(cfg)
            if tcfg.longest_space_chunk and chunk_cfg.spatial_chunk_size:
                # stretch the spatial chunk to the longest frame side
                # (set_longest_spatial_chunk, reference test.py:172-174)
                chunk_cfg.spatial_chunk_size = max(noisy.shape[-3], noisy.shape[-2])
            fwd_fxn = chunk(chunk_cfg, base_fwd)

            # burn-in once (test.py:180-186)
            if burn_in:
                small = noisy[:, :, :128, :128, :] / imax
                jax.block_until_ready(fwd_fxn(small))
                burn_in = False

            # internal adaptation (test.py:189-203)
            adapt_info = None
            run_adapt = tcfg.internal_adapt_nsteps > 0 and tcfg.internal_adapt_nepochs > 0
            with MemIt(memer, "adapt"):
                with TimeIt(timer, "adapt"):
                    if run_adapt:
                        from .. import get_loss_fxn
                        from ..train.schedules import make_optimizer
                        from ..train.state import TrainState

                        acfg = Config(cfg)
                        acfg.adapt_nepochs = tcfg.internal_adapt_nepochs
                        acfg.adapt_nsteps = tcfg.internal_adapt_nsteps
                        loss_fxn = get_loss_fxn(acfg, optional(cfg, "loss_type", "f2f"))
                        tx, _ = make_optimizer(Config(cfg, scheduler_name="cosa",
                                                      nepochs=tcfg.internal_adapt_nepochs))
                        st = TrainState.create(ms.model, ms.variables, tx,
                                               residual=True)
                        # adapt window: first internal_adapt_nframes frames
                        # (config-driven; the reference hardcodes the first 5,
                        # test.py:195-196)
                        nf_a = max(int(tcfg.internal_adapt_nframes), 1)
                        st, adapt_info = loss_fxn(st, noisy[:, :nf_a] / imax,
                                                  clean[:, :nf_a] / imax)

                        def model_fwd(vid, fl=None, _st=st):
                            B, T = vid.shape[:2]
                            out = _st.eval_apply(
                                vid.reshape((B * T,) + vid.shape[2:]))
                            return out.reshape(vid.shape[:2] + out.shape[1:])

                        fwd_fxn = chunk(chunk_cfg, model_fwd)

            # optional sigma noise-map channel (test.py:207-211)
            noisy_input = noisy
            if tcfg.append_noise_map:
                B, T, H, W, C = noisy.shape
                nm = jnp.full((B, T, H, W, 1), float(tcfg.sigma), noisy.dtype)
                noisy_input = jnp.concatenate([noisy, nm], axis=-1)

            # denoise (test.py:214-219)
            with MemIt(memer, "deno"):
                with TimeIt(timer, "deno"):
                    deno = fwd_fxn(noisy_input / imax, flows)
                    deno = jnp.clip(deno, 0.0, 1.0) * imax
                    deno = jax.device_get(deno)

            # B2U masked-ensemble second pass (test.py:222-229, run_ub2_test :49-71)
            with MemIt(memer, "deno_pp"):
                with TimeIt(timer, "deno_pp"):
                    if tcfg.crit_name == "b2u":
                        b2u = B2ULoss.for_test()
                        pp_cfg = Config(chunk_cfg)
                        pp_cfg.temporal_chunk_size = 1
                        pp_cfg.spatial_chunk_size = 512
                        pp_cfg.spatial_chunk_overlap = 0.1

                        def b2u_fwd(vid, fl=None):
                            def flat_apply(x):
                                return state_apply(x)
                            return b2u.test(flat_apply, vid)

                        deno_pp = chunk(pp_cfg, b2u_fwd)(noisy_input / imax, flows)
                        deno_pp = jax.device_get(jnp.clip(deno_pp, 0, 1) * imax)
                    else:
                        deno_pp = deno.copy()

            # save denoised video (test.py:237-242)
            out_dir = Path(tcfg.saved_dir) / str(tcfg.arch_name) / str(tcfg.uuid)
            if tcfg.save_deno:
                deno_fns = save_video(deno, out_dir, "deno")
            else:
                deno_fns = [""] * deno.shape[0]

            # metrics (test.py:245-252)
            noisy_np, clean_np = np.asarray(noisy), np.asarray(clean)
            results.psnrs.append(compute_psnrs(clean_np, deno, div=imax))
            results.ssims.append(compute_ssims(clean_np, deno, div=imax))
            results.strred.append(compute_strred(clean_np, deno, div=imax))
            results.psnrs_pp.append(compute_psnrs(clean_np, deno_pp, div=imax))
            results.ssims_pp.append(compute_ssims(clean_np, deno_pp, div=imax))
            results.strred_pp.append(compute_strred(clean_np, deno_pp, div=imax))
            # tag the band method: the spyr/analytic implementations differ
            # ~4x in absolute scale (utils/metrics.compute_strred docstring),
            # so cross-run aggregation must never mix them silently
            results.strred_method.append(["spyr"])
            results.noisy_psnrs.append(compute_psnrs(noisy_np, clean_np, div=imax))
            results.deno_fns.append(deno_fns)
            results.vid_frames.append(vid_frames)
            results.vid_name.append([tcfg.vid_name])

            # backward benchmark (test.py:273-275,308-328)
            if tcfg.bench_bwd:
                measure_bwd(ms, fwd_fxn, flows, noisy / imax, clean / imax,
                            timer, memer)

            for name, (mem_res, mem_alloc) in memer.items():
                results[f"{name}_mem_res"].append([mem_res])
                results[f"{name}_mem_alloc"].append([mem_alloc])
            for name, t in timer.items():
                results.setdefault(name, []).append(t)

    finally:
        prof.close()
    return results


def measure_bwd(ms, fwd_fxn, flows, noisy, clean, timer, memer):
    """Forward+backward timing (test.py:308-328)."""
    with MemIt(memer, "fwd_grad"):
        with TimeIt(timer, "fwd_grad"):
            deno = fwd_fxn(noisy, flows)
            deno = jax.device_get(deno)

    def loss_fn(params):
        variables = {"params": params,
                     "batch_stats": ms.variables.get("batch_stats", {})}
        B, T = noisy.shape[:2]
        out = ms.model.apply(variables,
                             noisy.reshape((B * T,) + noisy.shape[2:]),
                             train=False)
        return jnp.mean((out.reshape(clean.shape) - clean) ** 2)

    with MemIt(memer, "bwd"):
        with TimeIt(timer, "bwd"):
            grads = jax.grad(loss_fn)(ms.variables["params"])
            jax.device_get(jax.tree.leaves(grads)[0])
