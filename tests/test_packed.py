"""Pair-packed conv layout (ops/packed.py): parity with the plain XLA path.

The packed layout is the TPU execution format for DnCNN (models/dncnn.py);
these tests pin that it computes the SAME math as a standard SAME conv /
BatchNorm network — reference semantics per lib/frame2frame/dncnn/net.py and
torch BatchNorm2d defaults."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from frame2frame_tpu.models.dncnn import DnCNN, init_dncnn
from frame2frame_tpu.ops.packed import (
    conv3x3_packed,
    pack_image,
    pack_kernel,
    unpack_image,
)


def _same_conv(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.mark.parametrize("cin,cout", [(1, 64), (64, 64), (64, 1), (3, 8)])
def test_conv3x3_packed_matches_same_conv(cin, cout):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 10, 14, cin)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.1, jnp.float32)
    ref = _same_conv(x, w)
    got = unpack_image(conv3x3_packed(pack_image(x), w))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((3, 6, 8, 5)), jnp.float32)
    assert jnp.array_equal(unpack_image(pack_image(x)), x)


def test_pack_kernel_gradient_routes_back():
    """dW2 -> dW through the packed-kernel assembly equals the direct conv dW."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 8, 12, 4)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((1, 8, 12, 6)), jnp.float32)
    w0 = jnp.asarray(rng.standard_normal((3, 3, 4, 6)) * 0.1, jnp.float32)

    ref = jax.grad(lambda w: jnp.sum(_same_conv(x, w) * g))(w0)
    got = jax.grad(lambda w: jnp.sum(
        unpack_image(conv3x3_packed(pack_image(x), w)) * g))(w0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("shape,channels", [((16, 20), 1), ((12, 17), 3)])
def test_dncnn_packed_matches_xla(shape, channels):
    """Packed DnCNN == XLA DnCNN: eval fwd, train fwd, grads, stats updates.
    Odd widths exercise the per-call fallback (exact equality)."""
    H, W = shape
    rng = np.random.default_rng(3)
    model_x, variables = init_dncnn(jax.random.PRNGKey(0), channels=channels,
                                    num_layers=7, residual=True,
                                    spatial=(H, W), conv_impl="xla")
    model_p = DnCNN(channels=channels, num_layers=7, residual=True,
                    conv_impl="packed")
    x = jnp.asarray(rng.standard_normal((2, H, W, channels)), jnp.float32)

    ya = model_x.apply(variables, x, train=False)
    yp = model_p.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(yp), np.asarray(ya),
                               rtol=1e-4, atol=1e-5)

    ya, ua = model_x.apply(variables, x, train=True, mutable=["batch_stats"])
    yp, up = model_p.apply(variables, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(yp), np.asarray(ya),
                               rtol=1e-4, atol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(ua), jax.tree_util.tree_leaves(up)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)

    def loss(params, model):
        y = model.apply({"params": params,
                         "batch_stats": variables["batch_stats"]},
                        x, train=True, mutable=["batch_stats"])[0]
        return jnp.sum(jnp.square(y))

    ga = jax.grad(loss)(variables["params"], model_x)
    gp = jax.grad(loss)(variables["params"], model_p)
    for a, b in zip(jax.tree_util.tree_leaves(ga), jax.tree_util.tree_leaves(gp)):
        scale = float(jnp.max(jnp.abs(a))) + 1e-6
        assert float(jnp.max(jnp.abs(a - b))) / scale < 2e-3


def test_dncnn_packed_checkpoint_interop():
    """Params initialized under one impl apply cleanly under the other
    (identical names/shapes) — .pth imports keep working."""
    _, v_packed = init_dncnn(jax.random.PRNGKey(0), channels=1, num_layers=5,
                             conv_impl="packed", spatial=(8, 10))
    _, v_xla = init_dncnn(jax.random.PRNGKey(0), channels=1, num_layers=5,
                          conv_impl="xla", spatial=(8, 10))
    ta = jax.tree_util.tree_structure(v_packed)
    tb = jax.tree_util.tree_structure(v_xla)
    assert ta == tb
    for a, b in zip(jax.tree_util.tree_leaves(v_packed),
                    jax.tree_util.tree_leaves(v_xla)):
        assert a.shape == b.shape and a.dtype == b.dtype


def test_dncnn_packed_remat_exact():
    rng = np.random.default_rng(4)
    _, v = init_dncnn(jax.random.PRNGKey(1), channels=1, num_layers=7,
                      residual=True, spatial=(16, 20))
    m0 = DnCNN(channels=1, num_layers=7, residual=True, conv_impl="packed")
    m1 = DnCNN(channels=1, num_layers=7, residual=True, conv_impl="packed",
               remat_every=2)
    x = jnp.asarray(rng.standard_normal((1, 16, 20, 1)), jnp.float32)
    assert jnp.array_equal(m0.apply(v, x, train=False),
                           m1.apply(v, x, train=False))
