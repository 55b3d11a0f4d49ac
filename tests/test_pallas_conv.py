"""Pallas 3x3 conv kernels vs lax.conv: forward, dX, dW parity (interpret mode
on CPU; compiled on TPU), and DnCNN equivalence across conv_impl choices."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from frame2frame_tpu.ops.pallas_conv import conv3x3, conv3x3_hybrid, conv3x3_p2


def _ref_conv(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 16, 24, 8)).astype(np.float32))
    w = jnp.asarray((rng.normal(size=(3, 3, 8, 8)) * 0.1).astype(np.float32))
    return x, w


@pytest.mark.parametrize("conv", [conv3x3, conv3x3_hybrid, conv3x3_p2])
def test_fwd_parity(data, conv):
    x, w = data
    np.testing.assert_allclose(np.asarray(conv(x, w)),
                               np.asarray(_ref_conv(x, w)), rtol=1e-5,
                               atol=1e-5)


@pytest.mark.parametrize("conv", [conv3x3, conv3x3_hybrid, conv3x3_p2])
def test_grad_parity(data, conv):
    x, w = data

    def loss(fn, x, w):
        return jnp.sum(jnp.sin(fn(x, w)))

    gx_ref, gw_ref = jax.grad(lambda x, w: loss(_ref_conv, x, w),
                              argnums=(0, 1))(x, w)
    gx, gw = jax.grad(lambda x, w: loss(conv, x, w), argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_ref), rtol=1e-4,
                               atol=1e-4)


def test_rectangular_channels(data):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 8, 12, 1)).astype(np.float32))
    w = jnp.asarray((rng.normal(size=(3, 3, 1, 16)) * 0.1).astype(np.float32))
    np.testing.assert_allclose(np.asarray(conv3x3(x, w)),
                               np.asarray(_ref_conv(x, w)), rtol=1e-5,
                               atol=1e-5)


def test_dncnn_conv_impl_equivalence():
    from frame2frame_tpu.models.dncnn import DnCNN, init_dncnn

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 1)).astype(np.float32))
    model_x, vars_x = init_dncnn(jax.random.PRNGKey(0), channels=1,
                                 num_layers=4, spatial=(16, 16),
                                 conv_impl="xla")
    model_h = DnCNN(channels=1, num_layers=4, conv_impl="hybrid")
    out_x = model_x.apply(vars_x, x, train=False)
    out_h = model_h.apply(vars_x, x, train=False)  # same params, same layout
    np.testing.assert_allclose(np.asarray(out_h), np.asarray(out_x),
                               rtol=1e-5, atol=1e-5)


def test_bf16res_conv_structure(data):
    """bf16-residual conv: dX exact, dW within bf16 rounding of the reference
    (the stored residual is cast; multiply precision is unchanged)."""
    from frame2frame_tpu.ops.pallas_conv import conv3x3_bf16res

    x, w = data
    np.testing.assert_allclose(np.asarray(conv3x3_bf16res(x, w)),
                               np.asarray(_ref_conv(x, w)), rtol=1e-5, atol=1e-5)
    gx_ref = jax.grad(lambda xx: jnp.sum(jnp.sin(_ref_conv(xx, w))))(x)
    gx = jax.grad(lambda xx: jnp.sum(jnp.sin(conv3x3_bf16res(xx, w))))(x)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), rtol=1e-5,
                               atol=1e-6)
    gw_ref = np.asarray(jax.grad(lambda ww: jnp.sum(jnp.sin(_ref_conv(x, ww))))(w))
    gw = np.asarray(jax.grad(lambda ww: jnp.sum(jnp.sin(conv3x3_bf16res(x, ww))))(w))
    # bf16 storage of the residual: dW deviates at the bf16 rounding level,
    # measured against the gradient's scale (near-zero entries have huge
    # relative error by construction)
    assert np.abs(gw - gw_ref).max() < 0.02 * np.abs(gw_ref).max()
