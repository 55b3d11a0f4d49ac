"""Sharded training-step correctness on the virtual 8-device CPU mesh: the
(data, time)-sharded f2f step with ppermute halo exchange must produce the
same loss and parameter update as an unsharded single-device computation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from frame2frame_tpu.models.dncnn import init_dncnn
from frame2frame_tpu.ops.warp import warped_dist_loss
from frame2frame_tpu.parallel.mesh import make_mesh
from frame2frame_tpu.parallel.shard import make_sharded_f2f_step, make_sharded_sup_step
from frame2frame_tpu.train.online import torch_adam

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


@pytest.fixture(scope="module")
def setup():
    model, variables = init_dncnn(jax.random.PRNGKey(0), channels=1,
                                  num_layers=4, residual=True, spatial=(16, 16))
    tx = torch_adam(1e-4, 1e-5)
    rng = np.random.default_rng(0)
    B, T, H, W = 4, 4, 16, 16
    noisy = jnp.asarray(rng.random((B, T, H, W, 1)), jnp.float32)
    bflow = jnp.asarray(rng.normal(0, 0.3, (B, T, H, W, 2)), jnp.float32)
    return model, variables, tx, noisy, bflow


def reference_f2f_step(model, variables, tx, noisy, bflow):
    """Unsharded single-device version of the same math."""
    params = variables["params"]
    bs = variables["batch_stats"]
    opt_state = tx.init(params)
    B, T = noisy.shape[:2]

    def loss_fn(p):
        deno = model.apply({"params": p, "batch_stats": bs}, noisy,
                           train=False)
        losses = jax.vmap(jax.vmap(
            lambda d, n, f: warped_dist_loss(d, n, f, dist_crit="l2")))(
            deno[:, 1:], noisy[:, :-1], bflow[:, 1:])
        return jnp.mean(losses)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    import optax

    updates, _ = tx.update(grads, opt_state, params)
    new_params = optax.apply_updates(params, updates)
    return float(loss), new_params


@pytest.mark.parametrize("mesh_shape", [(4, 2), (2, 4), (4, 1), (1, 4)])
def test_sharded_f2f_matches_unsharded(setup, mesh_shape):
    model, variables, tx, noisy, bflow = setup
    n_data, n_time = mesh_shape
    mesh = make_mesh(n_data=n_data, n_time=n_time)
    # exact parity requires running-average BN (train-mode BN stats are
    # per-shard by design, like data-parallel local BN)
    step = make_sharded_f2f_step(model, mesh, tx, train_bn=False)
    params = variables["params"]
    bs = variables["batch_stats"]
    opt_state = tx.init(params)

    p2, bs2, o2, loss = step(params, bs, opt_state, noisy, bflow)
    ref_loss, ref_params = reference_f2f_step(model, variables, tx, noisy, bflow)

    assert loss == pytest.approx(ref_loss, rel=1e-5)
    for a, b in zip(jax.tree.leaves(p2), jax.tree.leaves(ref_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-7)


def test_sharded_sup_step_runs(setup):
    model, variables, tx, noisy, _ = setup
    mesh = make_mesh(n_data=4, n_time=2)
    step = make_sharded_sup_step(model, mesh, tx)
    params = variables["params"]
    opt_state = tx.init(params)
    p2, bs2, o2, loss = step(params, variables["batch_stats"], opt_state,
                             noisy, noisy)
    assert np.isfinite(float(loss))


def test_sharded_f2f_local_bn_close(setup):
    """Default (per-shard BN) semantics stay close to a global train-BN
    reference (exactness is impossible: DP local-BN computes per-shard
    statistics by design)."""
    model, variables, tx, noisy, bflow = setup
    mesh = make_mesh(n_data=4, n_time=2)
    step = make_sharded_f2f_step(model, mesh, tx, train_bn=True)
    params = variables["params"]
    opt_state = tx.init(params)
    _, _, _, loss = step(params, variables["batch_stats"], opt_state, noisy,
                         bflow)

    def ref_loss_fn(p):
        deno, _ = model.apply({"params": p,
                               "batch_stats": variables["batch_stats"]},
                              noisy, train=True, mutable=["batch_stats"])
        losses = jax.vmap(jax.vmap(
            lambda d, n, f: warped_dist_loss(d, n, f, dist_crit="l2")))(
            deno[:, 1:], noisy[:, :-1], bflow[:, 1:])
        return jnp.mean(losses)

    ref_loss = float(ref_loss_fn(params))
    assert loss == pytest.approx(ref_loss, rel=0.1)
