"""Online per-frame fine-tuning ("frame2frame" blind denoising) — the reference
CLI's hot loop (blind_denoising.py:187-256) as one jitted on-device program.

TPU-native redesign of the reference pipeline:
- the 20-iteration fine-tune loop (blind_denoising.py:216-222) is a ``lax.scan``
  over Adam updates compiled once; warp + occlusion masking happen on device
  (no scipy round-trip) and are hoisted out of the loop (the warped target and
  mask depend only on prev/flow, which are loop-invariant — the reference
  recomputed them every iteration);
- Adam (lr=5e-5, betas=(0.9,0.999), eps=1e-8, L2 weight_decay=1e-5, i.e. torch
  Adam semantics: decay added to the gradient before the moments) with state
  persisting across all frames (blind_denoising.py:158-165);
- BatchNorm runs in training mode inside the scan (running stats threaded
  through the carry), matching model.train() at blind_denoising.py:212;
- the final denoise runs in eval mode (blind_denoising.py:229-230);
- frame/flow I/O is double-buffered against device compute by a host prefetch
  thread (the "streaming pipeline" BASELINE.json config 5).
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import lax

from ..ops.warp import bilinear_warp_with_mask, occlusion_mask


def torch_adam(lr, weight_decay=0.0, b1=0.9, b2=0.999, eps=1e-8):
    """torch.optim.Adam with L2 weight_decay (decay folded into the gradient
    before the moment updates) as a FLAT single-buffer transformation.

    Same math as the optax chain add_decayed_weights -> scale_by_adam ->
    scale(-lr) it replaces, but the moments live in ONE raveled vector and
    the whole update is a handful of fused elementwise kernels over it.
    Measured history (round 5, 540p online step): a standalone probe that
    timed the step WITHOUT the optimizer attributed 4.15 ms/iter to the
    per-leaf chain (49 DnCNN leaves x ~8 tiny moment/bias ops each), but
    the production A/B measured the flat form NEUTRAL (33.8 vs 33.7
    ms/iter on the same probe harness) — XLA was already fusing the
    per-leaf update into the scan body better than kernel-count arithmetic
    predicted, and standalone-probe totals carry a per-call readback
    constant that bench-derived numbers (29.4 ms/iter) don't. Kept because
    it is bit-identical (CPU A/B vs the old chain), strictly fewer emitted
    ops, and simpler state to shard/serialize. Elementwise math is
    unchanged per parameter, so the torch-oracle parity tests
    (tests/test_online_parity.py) see the same trajectory.
    opt_state: {"count": int32, "m": (N,) f32, "v": (N,) f32}.
    """
    from jax.flatten_util import ravel_pytree

    def init(params):
        flat, _ = ravel_pytree(params)
        z = jnp.zeros_like(flat)
        return {"count": jnp.zeros((), jnp.int32), "m": z, "v": z}

    def update(grads, state, params=None):
        g, unravel = ravel_pytree(grads)
        if weight_decay:
            p, _ = ravel_pytree(params)
            g = g + weight_decay * p
        count = state["count"] + 1
        m = b1 * state["m"] + (1 - b1) * g
        v = b2 * state["v"] + (1 - b2) * (g * g)
        c = count.astype(m.dtype)
        mhat = m / (1 - b1 ** c)
        vhat = v / (1 - b2 ** c)
        u = (-lr) * (mhat / (jnp.sqrt(vhat) + eps))
        return unravel(u), {"count": count, "m": m, "v": v}

    return optax.GradientTransformation(init, update)


def make_denoise(model, residual_model=False, spatial_mesh=None, conv=None):
    """Build ``denoise(variables, x, train) -> deno[, new_batch_stats]`` for a
    single (H, W, C) frame, routing through the fused Pallas layer pipeline
    (ops/fused_stack.py) when the model/backend/geometry allow it.

    This is the single denoise path shared by the online fine-tune step and
    the inference-only (serving) path; ``residual_model`` says whether the
    model returns the denoised image directly (harness convention) or the
    noise (submodule convention, blind_denoising.py:218 subtracts);
    ``conv`` selects the fused conv formulation (fused_stack.conv_mode —
    the F2F_CONV env var stays available as a probe override)."""

    def _use_fused(x):
        # the fused Pallas pipeline (ops/fused_stack.py) carries the
        # training-mode fine-tune on TPU; CPU keeps the XLA graph (interpret
        # mode would be slower, and the parity tests pin the XLA path).
        # F2F_FUSED=force selects it regardless of backend (interpret-mode
        # tests of the sharded engine).
        if getattr(model, "conv_impl", None) != "fused":
            return False
        force = os.environ.get("F2F_FUSED") == "force"
        if not force and (jax.default_backend() != "tpu"
                          or os.environ.get("F2F_FUSED") == "0"):
            return False
        from ..models.fused_apply import can_fuse

        shape = (1,) + x.shape
        if spatial_mesh is not None:
            # VMEM feasibility is per-shard: check the local tile geometry
            from ..models.fused_apply import default_tile_h
            from ..ops.fused_spatial import pad_h

            H, W = x.shape[0], x.shape[1]
            D = spatial_mesh.shape["space"]
            Hp = pad_h(H, D, default_tile_h(W // 2))
            shape = (1, Hp // D) + x.shape[1:]
        return can_fuse(model, shape, conv=conv)

    def denoise(variables, x, train, eval_impl=None):
        if _use_fused(x):
            from ..models.fused_apply import (
                fused_eval_apply, fused_eval_apply_spatial,
                fused_train_apply, fused_train_apply_spatial)

            if train:
                if spatial_mesh is not None:
                    y, new_bs = fused_train_apply_spatial(
                        model, variables["params"], variables["batch_stats"],
                        x[None], spatial_mesh, conv=conv)
                else:
                    y, new_bs = fused_train_apply(
                        model, variables["params"], variables["batch_stats"],
                        x[None], conv=conv)
                return (y[0] if residual_model else x - y[0]), new_bs
            if spatial_mesh is not None:
                y = fused_eval_apply_spatial(
                    model, variables["params"], variables["batch_stats"],
                    x[None], spatial_mesh, conv=conv, eval_impl=eval_impl)
            else:
                y = fused_eval_apply(model, variables["params"],
                                     variables["batch_stats"], x[None],
                                     conv=conv, eval_impl=eval_impl)
            return y[0] if residual_model else x - y[0]
        out = model.apply(variables, x[None], train=train,
                          mutable=["batch_stats"] if train else False)
        if train:
            y, updates = out
            return (y[0] if residual_model else x - y[0]), updates["batch_stats"]
        return out[0] if residual_model else x - out[0]

    return denoise


def make_online_step(model, tx, iters=20, residual_model=False, unroll=None,
                     spatial_mesh=None, conv=None):
    """Build the jitted per-frame program.

    step(params, batch_stats, opt_state, cur, prev, flow) ->
        (params, batch_stats, opt_state, deno, losses)

    cur/prev: (H, W, C) in [0, 1]; flow: (H, W, 2) mapping cur -> prev coords.
    ``residual_model`` says whether the model returns the denoised image
    directly (harness convention) or the noise (submodule convention,
    blind_denoising.py:218 subtracts).

    ``unroll``: whether to fully unroll the fine-tune scan. Default: unroll on
    CPU (XLA:CPU runs convolutions inside While bodies single-threaded, ~40x
    slower than the unrolled form), keep the rolled scan on TPU (fast While,
    much smaller compile).

    ``spatial_mesh``: a Mesh with a ``space`` axis — the frame is H-split
    across it and the fused engine runs its shard_map'd variant
    (ops/fused_spatial.py); see parallel/spatial.make_spatial_online_step.
    """
    if unroll is None:
        unroll = jax.default_backend() == "cpu"
    denoise = make_denoise(model, residual_model=residual_model,
                           spatial_mesh=spatial_mesh, conv=conv)

    @jax.jit
    def step(params, batch_stats, opt_state, cur, prev, flow):
        warped, mask = bilinear_warp_with_mask(prev, flow)
        mask = occlusion_mask(flow, mask)
        target = mask * warped

        from .flat_step import eligible, run_flat_scan

        if eligible(model, cur.shape, conv, residual_model, spatial_mesh):
            # round-5 flat-layout step: the whole iteration (ends + loss
            # included) stays in the packed flat layout; per-frame constants
            # are hoisted out of the scan (train/flat_step.py). Identical
            # math to the body below — f32 summation order only; reverts
            # with F2F_FLATSTEP=0.
            params, batch_stats, opt_state, losses = run_flat_scan(
                model, tx, iters, conv, params, batch_stats, opt_state,
                cur, mask, target, unroll=unroll)
            deno = denoise({"params": params, "batch_stats": batch_stats},
                           cur, train=False)
            return params, batch_stats, opt_state, deno, losses

        def body(carry, _):
            params, batch_stats, opt_state = carry

            def loss_fn(p):
                deno, new_bs = denoise({"params": p, "batch_stats": batch_stats},
                                       cur, train=True)
                # summed L1 (nn.L1Loss(size_average=False), blind_denoising.py:47)
                # computed on (H, W*C) 2D views: 1-channel (H, W, 1) arrays get
                # degenerate (1, 128)/(2, 128) TPU tilings that cost ~2 ms per
                # reduction; the 2D view restores (8, 128) tiles
                H, W, C = deno.shape
                d2 = deno.reshape(H, W * C)
                loss = jnp.sum(jnp.abs(mask.reshape(H, W * C) * d2
                                       - target.reshape(H, W * C)))
                return loss, new_bs

            (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, new_bs, opt_state), loss

        (params, batch_stats, opt_state), losses = lax.scan(
            body, (params, batch_stats, opt_state), None, length=iters,
            unroll=iters if unroll else 1,
        )
        deno = denoise({"params": params, "batch_stats": batch_stats}, cur,
                       train=False)
        return params, batch_stats, opt_state, deno, losses

    return step


class AsyncFlowSolver:
    """TV-L1 solved on the host CPU backend in a background thread.

    The TPU executes one program at a time, so an on-device flow solve can
    never overlap the fine-tune — it adds its full cost to every frame
    (~91 ms amortized at 540p, round-2 decomposition). Solving flow on the
    CPU backend in a worker thread makes per-frame wall-clock
    ~ max(finetune_tpu, flow_cpu) instead of the sum; the result is shipped
    to the TPU with an async device_put so the transfer also overlaps.
    The reference decoupled flow from fine-tuning the same way — offline
    precompute by the C binary (tvl1flow.sh:10-18).

    Measured on this host: 190 ms/flow at 540p on one CPU core vs the
    ~710 ms/frame TPU fine-tune — fully hidden with a small lookahead.
    """

    def __init__(self, W, H, params, lookahead=3):
        self._cpu = jax.devices("cpu")[0]
        self._tpu = jax.devices()[0]
        with jax.default_device(self._cpu):
            from ..flow.tvl1 import make_tvl1_solver

            self._solve = make_tvl1_solver(W, H, **params)
        self._pool = ThreadPoolExecutor(max_workers=1)
        self._futs = {}
        self.lookahead = lookahead
        # per-solve wall times (seconds), appended by the worker thread —
        # benchmarks read this to report the flow leg's own p50/p95
        # independently of how much of it hid under the TPU step
        self.solve_times = []

    def _work(self, cur_np, prev_np):
        import time

        t0 = time.perf_counter()
        with jax.default_device(self._cpu):
            cur = jnp.asarray(cur_np[..., 0] * 255.0)
            prev = jnp.asarray(prev_np[..., 0] * 255.0)
            fl = np.asarray(self._solve(cur, prev))
        self.solve_times.append(time.perf_counter() - t0)
        # async H2D: the transfer rides under the TPU compute in flight
        return jax.device_put(fl, self._tpu)

    def prefetch(self, i, cur_np, prev_np):
        """Schedule flow i (cur -> prev coords) if not already in flight."""
        if i not in self._futs:
            self._futs[i] = self._pool.submit(self._work, cur_np, prev_np)

    def get(self, i):
        return self._futs.pop(i).result()

    def close(self):
        self._pool.shutdown(wait=False)


def _want_async_flow(mode="auto"):
    """CPU-thread flow overlap: on by default when the compute backend is a
    TPU and a CPU backend exists (F2F_ASYNC_FLOW=0 or mode disables it)."""
    if os.environ.get("F2F_ASYNC_FLOW") == "0" or mode in (False, "off", "tpu"):
        return False
    if mode in (True, "cpu"):
        return True
    if jax.default_backend() != "tpu":
        return False
    try:
        return len(jax.devices("cpu")) > 0
    except RuntimeError:
        return False


class OnlineDenoiser:
    """Stateful frame-by-frame denoiser: persistent params/optimizer across the
    stream, one fused device program per frame."""

    def __init__(self, model, variables, lr=5e-5, weight_decay=1e-5, iters=20,
                 residual_model=False, conv_formulation=None,
                 batch_route="stacked", eval_impl=None):
        """``conv_formulation``: fused conv form ("odd"/"even"/"hybrid",
        fused_stack.conv_mode; None = default, F2F_CONV env overrides).
        ``batch_route``: default ``denoise_batch`` route ("stacked" or
        "perframe"; F2F_BATCH env overrides). ``eval_impl``: serving eval
        kernel chain ("affine"/"act", fused_apply._eval_impl; F2F_EVAL env
        overrides — resolved per call as a static jit argument, so probes
        may flip the env mid-process). Formulation and route are baked into
        the engine's jitted programs — construct a new engine to change
        them."""
        if jax.default_backend() == "tpu":
            # the fused Pallas pipeline takes minutes to compile cold; the
            # persistent cache makes warm process start-up near-instant
            from ..utils.compile_cache import enable_compile_cache

            enable_compile_cache()
        self.model = model
        self.params = variables["params"]
        self.batch_stats = variables.get("batch_stats", {})
        self.tx = torch_adam(lr, weight_decay)
        self.opt_state = self.tx.init(self.params)
        self.iters = iters
        self.conv_formulation = conv_formulation
        self.batch_route = batch_route
        self._step = make_online_step(model, self.tx, iters=iters,
                                      residual_model=residual_model,
                                      conv=conv_formulation)
        _deno = make_denoise(model, residual_model=residual_model,
                             conv=conv_formulation)
        # eval_impl is a STATIC jit arg resolved per call (env override or
        # the constructor default): flipping F2F_EVAL mid-process retraces
        # instead of silently reusing the first implementation's executable
        self.eval_impl = eval_impl
        self._denoise_eval = jax.jit(
            lambda variables, x, impl: _deno(variables, x, train=False,
                                             eval_impl=impl),
            static_argnums=2)
        self._residual_model = residual_model
        self._denoise_batch = None  # built lazily on first denoise_batch

    def process_frame(self, cur, prev, flow):
        """Fine-tune on (cur, prev, flow) and return (deno, losses)."""
        cur = jnp.asarray(cur)
        prev = jnp.asarray(prev)
        flow = jnp.asarray(flow)
        (self.params, self.batch_stats, self.opt_state, deno, losses) = self._step(
            self.params, self.batch_stats, self.opt_state, cur, prev, flow
        )
        return deno, losses

    def _eval_impl_now(self):
        """Resolve the serving eval impl into a fully-qualified static token
        ("affine" / "act-f32" / "act-bf16"): delegates validation to the one
        resolver (fused_apply._eval_impl) and PINS the act chain dtype into
        the token so a F2F_EVAL_DTYPE flip retraces too."""
        from ..models.fused_apply import _eval_chain_dtype, _eval_impl

        tok = os.environ.get("F2F_EVAL") or self.eval_impl or "affine"
        if _eval_impl(tok) == "affine":
            return "affine"
        return ("act-f32" if _eval_chain_dtype(tok) == jnp.float32
                else "act-bf16")

    def denoise_only(self, cur):
        """Inference-only eval-mode denoise of one frame with the current
        (fine-tuned) parameters — the serving path: no fine-tune iterations,
        no flow (blind_denoising.py:229-230 run standalone)."""
        return self._denoise_eval(self.variables, jnp.asarray(cur),
                                  self._eval_impl_now())

    def denoise_batch(self, frames, route=None):
        """Inference-only denoise of a BATCH of frames (B, H, W, C).

        Eval-mode BN makes frames independent, so two routes exist
        (``route``; None = the engine's ``batch_route``; the F2F_BATCH env
        var overrides both for probes):

        - "stacked" (default): the whole batch through ONE fused kernel
          chain per layer (models/fused_apply.fused_eval_apply_batch, exact
          frame isolation via the in-kernel stack mask);
        - "perframe": slice the batch and dispatch the single-frame chain
          per frame.

        Measured (v5e, 540p, B=8, batch handed as one device array):
        stacked 36 fps vs per-frame 29 fps — slicing the batch and
        restacking the outputs costs more than the stack mask's extra
        per-element VPU work. A caller that already holds separate frames
        should loop ``denoise_only`` instead (80 fps: no slice/restack,
        launches hidden by JAX async dispatch).

        The stacked route falls back to per-frame when the stacked flat
        layout would exceed the HBM feasibility guard
        (models/fused_apply.can_fuse_batch) — big (B, H, W) batches degrade
        to the chunked route instead of OOMing."""
        frames = jnp.asarray(frames)
        route = os.environ.get("F2F_BATCH") or route or self.batch_route
        assert route in ("stacked", "perframe"), route
        if route == "stacked":
            from ..models.fused_apply import can_fuse_batch

            if not can_fuse_batch(self.model, tuple(frames.shape),
                                  eval_impl=self._eval_impl_now()):
                route = "perframe"
        if route == "perframe":
            impl = self._eval_impl_now()
            return jnp.stack([self._denoise_eval(self.variables, f, impl)
                              for f in frames])
        if self._denoise_batch is None:
            from ..models.fused_apply import can_fuse

            conv = self.conv_formulation

            def _batched(variables, x, impl):
                use_fused = (
                    getattr(self.model, "conv_impl", None) == "fused"
                    and (jax.default_backend() == "tpu"
                         or os.environ.get("F2F_FUSED") == "force")
                    and os.environ.get("F2F_FUSED") != "0"
                    and can_fuse(self.model, (1,) + tuple(x.shape[1:]),
                                 conv=conv))
                if use_fused:
                    from ..models.fused_apply import fused_eval_apply_batch

                    y = fused_eval_apply_batch(
                        self.model, variables["params"],
                        variables["batch_stats"], x, conv=conv,
                        eval_impl=impl)
                else:
                    y = self.model.apply(variables, x, train=False)
                return y if self._residual_model else x - y

            self._denoise_batch = jax.jit(_batched, static_argnums=2)
        return self._denoise_batch(self.variables, frames,
                                   self._eval_impl_now())

    @property
    def variables(self):
        return {"params": self.params, "batch_stats": self.batch_stats}


def run_blind_denoising(
    model,
    variables,
    input_tmpl,
    flow_tmpl=None,
    ref_tmpl=None,
    output_tmpl=None,
    output_psnr=None,
    output_network=None,
    first=1,
    last=300,
    iters=20,
    lr=5e-5,
    weight_decay=1e-5,
    residual_model=False,
    compute_flow=False,
    flow_params=None,
    progress=False,
    flow_batch=8,
    flow_backend="auto",
):
    """Streaming blind denoising over a frame sequence — the full reference CLI
    semantics (blind_denoising.py:125-259) with prefetch double-buffering.

    When ``compute_flow`` is True (or no ``flow_tmpl`` given), TV-L1 flow is
    solved on-device in-pipeline instead of reading .flo files — the
    "flow moves in-pipeline" capability of BASELINE.json's north star.
    ``flow_batch``: lookahead window of frame pairs solved in ONE vmapped
    TV-L1 call. The solver is latency-bound (small-pyramid while_loop), so
    batching amortizes it: measured 265 -> 89 ms/flow at 540p with K=8. The
    reference precomputed ALL flows offline for the same reason
    (tvl1flow.sh:10-18).

    Returns a dict with per-frame psnrs and losses.
    """
    from ..io.flo import read_flo
    from ..io.image import is_tiff, read_frame, write_gray
    from ..utils.metrics import psnr as psnr_fn

    deno_engine = OnlineDenoiser(model, variables, lr=lr,
                                 weight_decay=weight_decay, iters=iters,
                                 residual_model=residual_model)

    tvl1_solver = None
    async_flow = None
    if compute_flow or flow_tmpl is None:
        from ..flow.tvl1 import (
            DENOISING_PARAMS,
            make_batched_tvl1,
            make_tvl1_solver,
        )

        probe = read_frame(input_tmpl, first)
        H, W = probe.shape[:2]
        kw = dict(DENOISING_PARAMS)
        kw.update(flow_params or {})
        if _want_async_flow(flow_backend):
            # CPU background thread: flow overlaps TPU fine-tune entirely
            async_flow = AsyncFlowSolver(W, H, kw)
            tvl1_solver = True  # sentinel: flows are computed, not read
        else:
            flow_batch = max(1, min(flow_batch, last - first))
            if flow_batch > 1:
                tvl1_solver = make_batched_tvl1(W, H, **kw)
            else:
                tvl1_solver = make_tvl1_solver(W, H, **kw)

    def load_inputs(i, need_flow=True):
        """Host-side read of frame i (+ flow i if precomputed).

        Flows exist only for frames first+1..last (blind_denoising.py:206);
        the first frame is loaded without one.
        """
        frame = read_frame(input_tmpl, i)  # [0,255] float (raw for tiff)
        arr = np.asarray(frame, dtype=np.float32)
        if arr.ndim == 2:
            arr = arr[..., None]
        # the reference normalizes every unbatched frame by 255, tiff included
        # (blind_denoising.py:177-180,198-201)
        arr = arr / 255.0
        flow = None
        if need_flow and tvl1_solver is None:
            flow = read_flo(flow_tmpl % i).astype(np.float32)
        return arr, flow

    # prefetch backend: native C++ decode-ahead ring when available and the
    # inputs are png/pgm (native/f2fio.cpp), else a Python thread pool
    native_pf = None
    if not is_tiff(input_tmpl % first if "%" in input_tmpl else input_tmpl):
        try:
            from ..io import native as native_io

            if native_io.available():
                frame_paths = [input_tmpl % i if "%" in input_tmpl else input_tmpl
                               for i in range(first, last + 1)]
                flow_paths = [None] + [
                    (flow_tmpl % i) if (tvl1_solver is None) else None
                    for i in range(first + 1, last + 1)
                ]
                native_pf = native_io.NativePrefetcher(
                    frame_paths, flow_paths, capacity=4, nthreads=2)
        except Exception:
            native_pf = None

    def load_native(i, need_flow=True):
        frame, flow = native_pf.get(i - first)
        arr = (frame[..., None] / 255.0).astype(np.float32)
        return arr, (flow.astype(np.float32) if (flow is not None and need_flow)
                     else None)

    loader = load_native if native_pf is not None else load_inputs

    results = {"psnr": [], "loss": [], "frames": []}
    pool = ThreadPoolExecutor(max_workers=2)
    if async_flow is not None:
        K = async_flow.lookahead
    else:
        K = flow_batch if tvl1_solver is not None else 1

    # lookahead frame loading: keep up to K+1 frames in flight so a whole
    # flow window's inputs are on device when the batched solve fires
    futures, frames_dev = {}, {}

    def ensure(j):
        if first <= j <= last and j not in futures and j not in frames_dev:
            futures[j] = pool.submit(loader, j, j > first)

    def frame_dev(j):
        if j not in frames_dev:
            arr, fl = futures.pop(j).result()
            frames_dev[j] = (jnp.asarray(arr), fl, arr)
        return frames_dev[j]

    flow_cache = {}

    def flow_for(i):
        """bflow of frame i (cur -> prev coords, tvl1flow.sh naming)."""
        if tvl1_solver is None:
            return jnp.asarray(frame_dev(i)[1])
        if async_flow is not None:
            # keep the CPU worker ``lookahead`` flows ahead; the TPU never
            # waits once the worker is warm
            hi = min(i + async_flow.lookahead, last)
            for j in range(i, hi + 1):
                ensure(j)
                async_flow.prefetch(j, frame_dev(j)[2], frame_dev(j - 1)[2])
            return async_flow.get(i)
        if i not in flow_cache:
            hi = min(i + K - 1, last)
            idx = list(range(i, hi + 1))
            if K > 1:
                # pad the tail window to the compiled batch size
                pad = idx + [idx[-1]] * (K - len(idx))
                I1 = jnp.stack([frame_dev(j)[0][..., 0] for j in pad]) * 255.0
                I0 = jnp.stack([frame_dev(j - 1)[0][..., 0] for j in pad]) * 255.0
                flows = tvl1_solver(I1, I0)
                for k, j in enumerate(idx):
                    flow_cache[j] = flows[k]
            else:
                c, p = frame_dev(i)[0], frame_dev(i - 1)[0]
                flow_cache[i] = tvl1_solver(c[..., 0] * 255.0, p[..., 0] * 255.0)
        return flow_cache.pop(i)

    for j in range(first, min(first + K, last) + 1):
        ensure(j)

    psnr_lines = []
    for i in range(first + 1, last + 1):
        for j in range(i + 1, min(i + K, last) + 1):
            ensure(j)
        cur_dev = frame_dev(i)[0]
        prev_dev = frame_dev(i - 1)[0]
        flow_dev = flow_for(i)
        frames_dev.pop(i - 1, None)  # evict consumed frames

        deno, losses = deno_engine.process_frame(cur_dev, prev_dev, flow_dev)
        deno_np = np.asarray(deno)
        results["loss"].append(np.asarray(losses))
        results["frames"].append(i)

        if output_tmpl:
            out_path = output_tmpl % i
            if is_tiff(out_path):
                write_gray(out_path, 255.0 * deno_np.squeeze())
            else:
                write_gray(out_path, 255.0 * np.clip(deno_np.squeeze(), 0.0, 1.0))

        if ref_tmpl:
            ref = np.asarray(read_frame(ref_tmpl, i), dtype=np.float64) / 255.0
            quant = psnr_fn(ref, deno_np)
            results["psnr"].append(quant)
            psnr_lines.append(str(quant) + "\n")
            if progress:
                print(i, quant)

        # next frame trains against the current *noisy* frame (still cached in
        # frames_dev[i]; evicted once consumed as i-1)

    pool.shutdown(wait=False)
    if async_flow is not None:
        async_flow.close()
    if native_pf is not None:
        native_pf.close()

    if output_psnr and psnr_lines:
        with open(output_psnr, "w") as f:
            f.writelines(psnr_lines)
    if output_network:
        from ..models.serialization import save_train_state

        save_train_state(output_network, deno_engine.params,
                         deno_engine.opt_state, deno_engine.batch_stats)
    return results
