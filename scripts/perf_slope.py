"""True per-iteration step cost via the slope method.

Standalone probes of the 540p online step read ~34 ms/iter where the bench
derives ~29.4: each timed call pays a per-call constant (axon-tunnel
readback of the output forced by the timing barrier, dispatch ramp). This
probe times the same jitted production-shaped step body at scan lengths 20
and 60 and differences: slope = (t60 - t20) / 40 is the true ms/iter,
t20 - 20*slope is the per-call constant. Use this (or bench.py itself)
for any per-iter claim; do not trust standalone totals.

Workload shape: /root/reference/blind_denoising.py:216-222 (540p DnCNN-17
fine-tune iterations). See BASELINE.md "Round-5 execution engine".
"""
import sys, time
sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
from frame2frame_tpu.models.dncnn import init_dncnn
from frame2frame_tpu.models.fused_apply import fused_train_apply
from frame2frame_tpu.train.online import torch_adam
from frame2frame_tpu.ops.warp import bilinear_warp_with_mask, occlusion_mask
from frame2frame_tpu.utils.compile_cache import enable_compile_cache
import optax

enable_compile_cache()
H, W = 540, 960
model, variables = init_dncnn(jax.random.PRNGKey(0), channels=1, num_layers=17)
params = variables["params"]
bstats = variables["batch_stats"]
rng = np.random.default_rng(0)
x = jnp.asarray(rng.random((H, W, 1)), jnp.float32)
prev = jnp.asarray(rng.random((H, W, 1)), jnp.float32)
flow = jnp.asarray(rng.normal(0, 1, (H, W, 2)), jnp.float32)
warped, mask = bilinear_warp_with_mask(prev, flow)
mask = occlusion_mask(flow, mask)
target = mask * warped

def loss_d(p):
    out, new_bs = fused_train_apply(model, p, bstats, x[None])
    d2 = out[0].reshape(H, W)
    return jnp.sum(jnp.abs(mask.reshape(H, W) * d2 - target.reshape(H, W)))

grad_d = jax.grad(loss_d)
tx = torch_adam(5e-5, 1e-5)
opt_state = tx.init(params)

def make(length):
    @jax.jit
    def run(p, os0):
        def body(carry, _):
            p, os_ = carry
            g = grad_d(p)
            updates, os_ = tx.update(g, os_, p)
            p = optax.apply_updates(p, updates)
            return (p, os_), None
        (p, os_), _ = lax.scan(body, (p, os0), None, length=length)
        return p
    return run

def timeit(fn, *args):
    o = fn(*args)
    float(np.asarray(jax.tree.leaves(o)[0]).ravel()[0])
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        o = fn(*args)
        float(np.asarray(jax.tree.leaves(o)[0]).ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return best

t20 = timeit(make(20), params, opt_state)
print(f"len=20 total: {t20*1000:.1f} ms ({t20*50:.2f} ms/iter naive)", flush=True)
t60 = timeit(make(60), params, opt_state)
print(f"len=60 total: {t60*1000:.1f} ms ({t60*1000/60:.2f} ms/iter naive)", flush=True)
slope = (t60 - t20) / 40
const = t20 - 20 * slope
print(f"SLOPE: {slope*1000:.2f} ms/iter true; per-call constant {const*1000:.1f} ms", flush=True)
