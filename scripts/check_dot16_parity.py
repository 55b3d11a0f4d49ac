"""Re-verifiable hardware check: bf16 dot operands (`F2F_DOT_BF16`) produce
BIT-IDENTICAL fused-pipeline outputs to the f32-operand path on TPU.

The claim (BASELINE.md round-4 item 2, `fused_stack.dot_bf16` docstring):
Mosaic already feeds the MXU bf16-truncated operands for f32 slabs at JAX's
default dot precision, so the explicit astype is purely a perf knob. That
was established by a one-time hardware A/B; this script re-runs the A/B so
the claim stays checkable as Mosaic/JAX versions move (round-4 advisor item:
CPU CI cannot exercise it — interpret mode computes real f32 dots).

Usage: python scripts/check_dot16_parity.py   (TPU; exits nonzero on drift)
"""

import os
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def run_stack(dot16, H=192, W=256, L=4, seed=0):
    """Fused mid-stack fwd+bwd with F2F_DOT_BF16 pinned; returns flat outputs."""
    os.environ["F2F_DOT_BF16"] = "1" if dot16 else "0"
    import jax
    import jax.numpy as jnp

    from frame2frame_tpu.ops import fused_stack as fs

    rng = np.random.default_rng(seed)
    ws = jnp.asarray(rng.normal(0, 0.05, (L, 3, 3, 64, 64)), jnp.float32)
    gammas = jnp.asarray(rng.normal(1, 0.05, (L, 64)), jnp.float32)
    betas = jnp.asarray(rng.normal(0, 0.05, (L, 64)), jnp.float32)
    a1 = jnp.asarray(np.abs(rng.normal(0, 1, (1, H, W // 2, 128))),
                     jnp.float32)
    th = fs.default_tile_h(W // 2)

    def f(ws, gammas, betas, a1):
        out, means, vars_ = fs.fused_mid_stack(ws, gammas, betas, a1, H, th)
        return jnp.sum(out * out), (out, means, vars_)

    (loss, (out, means, vars_)), grads = jax.jit(
        jax.value_and_grad(f, argnums=(0, 1, 2, 3), has_aux=True))(
            ws, gammas, betas, a1)
    jax.block_until_ready(grads)
    return [np.asarray(x) for x in
            (out, means, vars_, *grads, np.float64(loss))]


def main():
    import jax

    if jax.default_backend() != "tpu":
        print("SKIP: requires TPU (interpret mode computes real f32 dots; "
              "the bit-identity claim is TPU-MXU-specific)")
        return 0
    a = run_stack(dot16=False)
    b = run_stack(dot16=True)
    worst = 0.0
    for x, y in zip(a, b):
        worst = max(worst, float(np.max(np.abs(x - y))) if x.size else 0.0)
    print(f"dot16 on/off max-abs-diff over fwd out/means/vars + all grads: "
          f"{worst}")
    if worst != 0.0:
        print("FAIL: dot16 is no longer bit-identical — re-measure before "
              "trusting the perf-knob-only claim (fused_stack.dot_bf16)")
        return 1
    print("OK: bit-identical")
    return 0


if __name__ == "__main__":
    sys.exit(main())
