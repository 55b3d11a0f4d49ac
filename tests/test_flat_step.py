"""Flat-layout whole-iteration step (train/flat_step.py) vs the established
fused path (fused_train_apply + image-space L1), interpret mode on CPU.

Both paths use the bf16 activation chain, so differences are f32
summation-order only — losses and gradients must agree tightly. Reference
semantics under test: the loss/optimizer inner loop of
blind_denoising.py:216-222."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from frame2frame_tpu.models.dncnn import init_dncnn
from frame2frame_tpu.models.fused_apply import fused_train_apply

H, W = 16, 32


@pytest.fixture()
def setup(monkeypatch):
    monkeypatch.setenv("F2F_FUSED", "force")
    model, variables = init_dncnn(jax.random.PRNGKey(0), channels=1,
                                  num_layers=5, conv_impl="fused",
                                  spatial=(H, W))
    rng = np.random.default_rng(7)
    cur = jnp.asarray(rng.random((H, W, 1)), jnp.float32)
    mask = jnp.asarray((rng.random((H, W, 1)) > 0.2), jnp.float32)
    target = mask * jnp.asarray(rng.random((H, W, 1)), jnp.float32)
    return model, variables, cur, mask, target


def _old_loss_fn(model, batch_stats, cur, mask, target,
                 store_dtype=jnp.bfloat16):
    """The established per-iteration loss: fused_train_apply (bf16 chain,
    image-space ends) + the image-space summed L1 of make_online_step."""

    def loss_fn(p):
        y, new_bs = fused_train_apply(model, p, batch_stats, cur[None],
                                      store_dtype=store_dtype)
        # residual_model=False convention of make_denoise: deno = x - y
        deno = cur[None] - y if not model.residual else y
        d2 = deno[0].reshape(H, W)
        loss = jnp.sum(jnp.abs(mask.reshape(H, W) * d2
                               - target.reshape(H, W)))
        return loss, new_bs

    return loss_fn


def _flat_loss_fn(model, cur, mask, target, store_dtype=jnp.bfloat16):
    from frame2frame_tpu.ops.fused_stack import Geom, default_tile_h
    from frame2frame_tpu.train.flat_step import flat_net_loss, prep_frame

    nmid = model.num_layers - 2
    W2 = W // 2
    th = default_tile_h(W2)
    data = prep_frame(cur, mask, target, Geom(H, W2, th),
                      store_dtype=store_dtype)

    def loss_fn(p):
        diff = {
            "w_in": p["conv_in"]["kernel"],
            "ws": jnp.stack([p[f"conv_{i}"]["kernel"] for i in range(nmid)]),
            "gammas": jnp.stack([p[f"bn_{i}"]["scale"] for i in range(nmid)]),
            "betas": jnp.stack([p[f"bn_{i}"]["bias"] for i in range(nmid)]),
            "w_out": p["conv_out"]["kernel"],
        }
        loss, means, vars_ = flat_net_loss(diff, data, H, W2, th, None)
        return loss, (means, vars_)

    return loss_fn


def test_flat_loss_matches_fused(setup):
    model, variables, cur, mask, target = setup
    loss_old, _ = _old_loss_fn(model, variables["batch_stats"], cur, mask,
                               target)(variables["params"])
    loss_new, (means, vars_) = _flat_loss_fn(model, cur, mask, target)(
        variables["params"])
    np.testing.assert_allclose(float(loss_new), float(loss_old), rtol=2e-4)
    # batch statistics must match the established path's too
    _, new_bs = fused_train_apply(model, variables["params"],
                                  variables["batch_stats"], cur[None])
    for i in range(model.num_layers - 2):
        m_old = (new_bs[f"bn_{i}"]["mean"]
                 - 0.9 * variables["batch_stats"][f"bn_{i}"]["mean"]) / 0.1
        np.testing.assert_allclose(np.asarray(means[i]), np.asarray(m_old),
                                   rtol=1e-3, atol=1e-5, err_msg=f"bn_{i}")


def test_flat_grads_match_fused_f32_strict(setup):
    """Strict structural check: with an f32 activation chain on BOTH paths
    (no bf16 rounding points anywhere), gradients must match to float
    summation-order tolerance."""
    model, variables, cur, mask, target = setup
    go = jax.grad(lambda p: _old_loss_fn(
        model, variables["batch_stats"], cur, mask, target,
        store_dtype=jnp.float32)(p)[0])(variables["params"])
    gn = jax.grad(lambda p: _flat_loss_fn(
        model, cur, mask, target, store_dtype=jnp.float32)(p)[0])(
        variables["params"])
    flat_o = jax.tree_util.tree_leaves_with_path(go)
    flat_n = dict(jax.tree_util.tree_leaves_with_path(gn))
    for path, r in flat_o:
        f = np.asarray(flat_n[path])
        r = np.asarray(r)
        scale = np.abs(r).max() + 1e-8
        np.testing.assert_allclose(f / scale, r / scale, atol=1e-4,
                                   err_msg=str(path))


def test_flat_grads_match_fused_bf16(setup):
    """Production dtypes: both chains bf16. The paths round at different
    points (the old path's cotangent passes through bf16 inside
    conv3x3_packed_bf16's backward; the flat kernels keep it f32 until the
    slab store), so agreement is bounded by bf16 resolution, not exact."""
    model, variables, cur, mask, target = setup
    go = jax.grad(lambda p: _old_loss_fn(model, variables["batch_stats"],
                                         cur, mask, target)(p)[0])(
        variables["params"])
    gn = jax.grad(lambda p: _flat_loss_fn(model, cur, mask, target)(p)[0])(
        variables["params"])
    flat_o = jax.tree_util.tree_leaves_with_path(go)
    flat_n = dict(jax.tree_util.tree_leaves_with_path(gn))
    for path, r in flat_o:
        f = np.asarray(flat_n[path])
        r = np.asarray(r)
        scale = np.abs(r).max() + 1e-8
        np.testing.assert_allclose(f / scale, r / scale, atol=1e-2,
                                   err_msg=str(path))


def test_online_step_flat_matches_old(setup, monkeypatch):
    """The full jitted per-frame program: flat step vs the established body
    (F2F_FLATSTEP=0) — params, losses and final denoise must agree."""
    from frame2frame_tpu.train.online import OnlineDenoiser

    model, variables, cur, mask, target = setup
    rng = np.random.default_rng(11)
    prev = jnp.asarray(rng.random((H, W, 1)), jnp.float32)
    flow = jnp.asarray(0.5 * rng.standard_normal((H, W, 2)), jnp.float32)

    def run(flat):
        monkeypatch.setenv("F2F_FLATSTEP", "1" if flat else "0")
        eng = OnlineDenoiser(model, jax.tree.map(jnp.copy, variables),
                             iters=3, residual_model=model.residual)
        deno, losses = eng.process_frame(cur, prev, flow)
        return np.asarray(deno), np.asarray(losses), eng.params

    d0, l0, p0 = run(False)
    d1, l1, p1 = run(True)
    # this is a WIRING test (flat path reached through the engine, same
    # trajectory): bit-level structure is pinned by the f32-strict test
    # above; in bf16 the two paths round at different points and the
    # difference compounds through Adam, so tolerances are loose
    np.testing.assert_allclose(l1, l0, rtol=1e-2)
    np.testing.assert_allclose(d1, d0, atol=5e-3)
    for path, r in jax.tree_util.tree_leaves_with_path(p0):
        f = np.asarray(dict(jax.tree_util.tree_leaves_with_path(p1))[path])
        np.testing.assert_allclose(f, np.asarray(r), atol=1e-3,
                                   err_msg=str(path))
