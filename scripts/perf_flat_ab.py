"""A/B of the flat-layout whole-iteration step vs the established body.

Times the REAL jitted per-frame program (train/online.make_online_step,
which routes to train/flat_step.py unless F2F_FLATSTEP=0) at scan lengths
20 and 60 and differences — the slope method of scripts/perf_slope.py
(standalone totals carry a per-call axon-readback constant; per-iter claims
must come from slopes or from bench.py). Workload shape:
/root/reference/blind_denoising.py:216-222 (540p DnCNN-17)."""
import os
import sys
import time

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))
import numpy as np
import jax
import jax.numpy as jnp

from frame2frame_tpu.models.dncnn import init_dncnn
from frame2frame_tpu.train.online import make_online_step, torch_adam
from frame2frame_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()
H, W = 540, 960
model, variables = init_dncnn(jax.random.PRNGKey(0), channels=1,
                              num_layers=17)
params = variables["params"]
bstats = variables["batch_stats"]
tx = torch_adam(5e-5, 1e-5)
opt_state = tx.init(params)
rng = np.random.default_rng(0)
cur = jnp.asarray(rng.random((H, W, 1)), jnp.float32)
prev = jnp.asarray(rng.random((H, W, 1)), jnp.float32)
flow = jnp.asarray(rng.normal(0, 1, (H, W, 2)), jnp.float32)


def sync(o):
    # block_until_ready is not a reliable barrier on the axon tunnel; force
    # an actual element readback like scripts/perf_slope.py does
    float(np.asarray(jax.tree.leaves(o)[0]).ravel()[0])


def timeit(fn, *args):
    sync(fn(*args))
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        o = fn(*args)
        sync(o)
        best = min(best, time.perf_counter() - t0)
    return best


for name, flat in (("old", "0"), ("flat", "1")):
    os.environ["F2F_FLATSTEP"] = flat
    ts = {}
    for iters in (20, 60):
        step = make_online_step(model, tx, iters=iters)
        ts[iters] = timeit(step, params, bstats, opt_state, cur, prev, flow)
        print(f"{name} iters={iters}: {ts[iters]*1000:.1f} ms", flush=True)
    slope = (ts[60] - ts[20]) / 40
    const = ts[20] - 20 * slope
    print(f"{name} SLOPE: {slope*1000:.3f} ms/iter; per-call constant "
          f"{const*1000:.1f} ms", flush=True)
