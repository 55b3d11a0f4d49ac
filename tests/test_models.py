"""Model tests: FastDVDnet shapes/behavior, pixel-shuffle parity with torch,
checkpoint serialization round-trip, and the model registry."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from frame2frame_tpu.config import Config


def test_pixel_shuffle_matches_torch():
    torch = pytest.importorskip("torch")
    from frame2frame_tpu.models.fastdvdnet import pixel_shuffle

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 4, 6, 16)).astype(np.float32)  # NHWC
    got = np.asarray(pixel_shuffle(jnp.asarray(x), 2))
    exp = torch.pixel_shuffle(torch.tensor(x).permute(0, 3, 1, 2), 2)
    exp = exp.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, exp, atol=1e-6)


@pytest.fixture(scope="module")
def fdvd():
    from frame2frame_tpu.models.fastdvdnet import init_fastdvdnet

    return init_fastdvdnet(jax.random.PRNGKey(0), channels=1, spatial=(32, 32))


def test_fastdvdnet_video_shape(fdvd):
    model, variables = fdvd
    vid = jnp.asarray(np.random.default_rng(1).random((1, 7, 32, 32, 1)),
                      jnp.float32)
    out = model.apply(variables, vid, train=False)
    assert out.shape == vid.shape
    assert np.isfinite(np.asarray(out)).all()


def test_fastdvdnet_denoises_constant(fdvd):
    """An untrained net is ~linear; check it runs and grads flow."""
    model, variables = fdvd
    vid = jnp.ones((1, 5, 32, 32, 1)) * 0.5

    def loss(p):
        out = model.apply({"params": p, "batch_stats": variables["batch_stats"]},
                          vid, train=True, mutable=["batch_stats"])[0]
        return jnp.mean((out - vid) ** 2)

    g = jax.grad(loss)(variables["params"])
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(g))


def test_registry_dispatch():
    from frame2frame_tpu.models import load_model

    ms = load_model(Config(net_name="dncnn", channels=1, num_of_layers=4,
                           residual=True))
    x = jnp.zeros((2, 16, 16, 1))
    out = ms.apply(x)
    assert out.shape == x.shape

    ms2 = load_model(Config(net_name="fastdvdnet", channels=1))
    vid = jnp.zeros((1, 5, 16, 16, 1))
    out2 = ms2.apply(vid)
    assert out2.shape == vid.shape

    with pytest.raises(ValueError):
        load_model(Config(net_name="nope"))


def test_serialization_roundtrip(tmp_path):
    from frame2frame_tpu.models.dncnn import init_dncnn
    from frame2frame_tpu.models.serialization import (
        load_variables,
        save_variables,
    )

    _, variables = init_dncnn(jax.random.PRNGKey(0), channels=1, num_layers=4)
    p = tmp_path / "ckpt.msgpack"
    save_variables(p, variables)
    restored = load_variables(p, like=variables)
    for a, b in zip(jax.tree.leaves(variables), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pth_checkpoint_import(tmp_path):
    torch = pytest.importorskip("torch")
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from test_online_parity import build_torch_dncnn

    from frame2frame_tpu.models.dncnn import DnCNN, load_torch_checkpoint

    net = build_torch_dncnn(channels=1, num_of_layers=5)
    net.eval()  # flax train=False uses running stats; match modes
    p = tmp_path / "net.pth"
    torch.save(net.state_dict(), p)
    variables = load_torch_checkpoint(p, num_layers=5)
    model = DnCNN(channels=1, num_layers=5)
    x = jnp.asarray(np.random.default_rng(2).random((1, 16, 16, 1)),
                    jnp.float32)
    out = model.apply(variables, x, train=False)
    with torch.no_grad():
        ref = net(torch.tensor(np.asarray(x)).permute(0, 3, 1, 2)).numpy()
    np.testing.assert_allclose(np.asarray(out)[0, ..., 0], ref[0, 0],
                               rtol=1e-4, atol=1e-5)


def test_remat_bit_identical():
    """Gradient-checkpointed DnCNN (remat_every>0) must match the plain model
    bit-for-bit: outputs, grads, and BN stat updates (layout-compatible)."""
    from frame2frame_tpu.models.dncnn import DnCNN, init_dncnn

    model, variables = init_dncnn(jax.random.PRNGKey(0), channels=1, num_layers=7)
    model_r = DnCNN(channels=1, num_layers=7, remat_every=2)
    x = jnp.asarray(np.random.default_rng(3).random((1, 16, 16, 1)), jnp.float32)
    a = model.apply(variables, x, train=False)
    b = model_r.apply(variables, x, train=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def loss(m, p):
        out, _ = m.apply({"params": p, "batch_stats": variables["batch_stats"]},
                         x, train=True, mutable=["batch_stats"])
        return jnp.sum(out**2)

    ga = jax.grad(lambda p: loss(model, p))(variables["params"])
    gb = jax.grad(lambda p: loss(model_r, p))(variables["params"])
    for u, v in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        np.testing.assert_array_equal(np.asarray(u), np.asarray(v))
