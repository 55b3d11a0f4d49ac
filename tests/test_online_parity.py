"""End-to-end numerical parity of the online fine-tune slice against a torch
oracle replicating the reference algorithm (blind_denoising.py:125-256):
same DnCNN weights, same flow, same Adam, same masked-L1 loss — the denoised
outputs and loss trajectories must agree within float32 tolerance.

This is the miniature version of BASELINE.json config 1's "PSNR trajectory
bit-for-bit within float tolerance" oracle.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from frame2frame_tpu.models.dncnn import DnCNN, import_torch_state_dict
from frame2frame_tpu.train.online import OnlineDenoiser

LAYERS = 5  # small depth for test speed; same structure as 17-layer
H = W = 32


def build_torch_dncnn(channels=1, num_of_layers=LAYERS):
    """Torch oracle of the SaoYan DnCNN layout (conv/bn indices as in the
    reference checkpoints)."""
    import torch.nn as nn

    layers = [
        nn.Conv2d(channels, 64, 3, padding=1, bias=False),
        nn.ReLU(inplace=True),
    ]
    for _ in range(num_of_layers - 2):
        layers += [
            nn.Conv2d(64, 64, 3, padding=1, bias=False),
            nn.BatchNorm2d(64),
            nn.ReLU(inplace=True),
        ]
    layers.append(nn.Conv2d(64, channels, 3, padding=1, bias=False))
    return nn.Sequential(*layers)


def torch_warped_loss(out, prev, flow):
    """Oracle of WarpedLoss.forward (blind_denoising.py:44-122), CPU torch with
    align_corners=True grid_sample + scipy binary_dilation."""
    import torch.nn.functional as F
    from scipy.ndimage import binary_dilation

    B, C, Hh, Ww = prev.shape
    xx = torch.arange(Ww).view(1, -1).repeat(Hh, 1)
    yy = torch.arange(Hh).view(-1, 1).repeat(1, Ww)
    grid = torch.stack([xx, yy], 0)[None].float()
    vgrid = grid + flow
    vgrid[:, 0] = 2.0 * vgrid[:, 0] / max(Ww - 1, 1) - 1.0
    vgrid[:, 1] = 2.0 * vgrid[:, 1] / max(Hh - 1, 1) - 1.0
    vgrid = vgrid.permute(0, 2, 3, 1)
    warped = F.grid_sample(prev, vgrid, align_corners=True)
    mask = F.grid_sample(torch.ones_like(prev), vgrid, align_corners=True)
    mask = (mask >= 0.9999).float()

    of = flow
    a = torch.zeros_like(warped)
    b = torch.zeros_like(warped)
    a[:, :, :-1, :] = of[0, 0, 1:, :] - of[0, 0, :-1, :]
    b[:, :, :, :-1] = of[0, 1, :, 1:] - of[0, 1, :, :-1]
    occ = (torch.abs(a + b) > 0.75).numpy()
    ball = np.zeros((3, 3))
    ball[1, 0] = ball[0, 1] = ball[1, 1] = ball[2, 1] = ball[1, 2] = 1
    occ[0, 0] = binary_dilation(occ[0, 0], ball)
    occ[:, :, 0, :] = 1
    occ[:, :, -1, :] = 1
    occ[:, :, :, 0] = 1
    occ[:, :, :, -1] = 1
    mask = mask * torch.tensor(1.0 - occ, dtype=torch.float32)
    return torch.sum(torch.abs(mask * out - mask * warped))


def run_torch_reference(net, frames, flows, iters):
    """Oracle of the reference main loop (blind_denoising.py:187-256)."""
    optim = torch.optim.Adam(net.parameters(), lr=5e-5, betas=(0.9, 0.999),
                             eps=1e-8, weight_decay=1e-5, amsgrad=False)
    prev = torch.tensor(frames[0])[None, None]
    denos, losses = [], []
    for t in range(1, len(frames)):
        cur = torch.tensor(frames[t])[None, None]
        flow = torch.tensor(flows[t - 1]).permute(2, 0, 1)[None]
        net.train()
        for _ in range(iters):
            out = cur - net(cur)
            loss = torch_warped_loss(out, prev, flow)
            optim.zero_grad()
            loss.backward()
            optim.step()
            losses.append(float(loss))
        net.eval()
        with torch.no_grad():
            denos.append((cur - net(cur)).numpy()[0, 0])
        prev = cur
    return np.stack(denos), np.asarray(losses)


@pytest.fixture(scope="module")
def setup():
    torch.manual_seed(0)
    rng = np.random.default_rng(0)
    net = build_torch_dncnn()
    # frames: smooth moving texture + noise, values in [0,1]
    base = rng.random((H + 8, W + 8)).astype(np.float32)
    from scipy.ndimage import gaussian_filter

    base = gaussian_filter(base, 2.0).astype(np.float32)
    frames = np.stack(
        [base[2 + t : 2 + t + H, 2 : 2 + W] + 0.05 * rng.standard_normal((H, W)).astype(np.float32)
         for t in range(4)]
    ).astype(np.float32)
    # flow: constant (0, 1) plus a small bump to exercise the occlusion mask
    flows = np.zeros((3, H, W, 2), np.float32)
    flows[..., 1] = 1.0
    flows[:, 10:14, 10:14, 1] = 2.5
    return net, frames, flows


def test_online_loop_matches_torch_reference(setup):
    net, frames, flows = setup
    iters = 5

    state = import_torch_state_dict(net.state_dict(), num_layers=LAYERS)
    model = DnCNN(channels=1, num_layers=LAYERS, residual=False)
    eng = OnlineDenoiser(model, state, lr=5e-5, weight_decay=1e-5, iters=iters)

    denos_ref, losses_ref = run_torch_reference(net, frames, flows, iters)

    denos, losses = [], []
    prev = jnp.asarray(frames[0])[..., None]
    for t in range(1, len(frames)):
        cur = jnp.asarray(frames[t])[..., None]
        deno, ls = eng.process_frame(cur, prev, jnp.asarray(flows[t - 1]))
        denos.append(np.asarray(deno)[..., 0])
        losses.extend(np.asarray(ls))
        prev = cur
    denos = np.stack(denos)
    losses = np.asarray(losses)

    # loss trajectories agree (sums over HxW of float32 ops)
    np.testing.assert_allclose(losses, losses_ref, rtol=2e-3, atol=2e-3)
    # final denoised frames agree pixelwise
    np.testing.assert_allclose(denos, denos_ref, rtol=1e-3, atol=2e-4)


def test_dncnn_forward_matches_torch(setup):
    net, frames, _ = setup
    net.eval()
    x = torch.tensor(frames[0])[None, None]
    with torch.no_grad():
        noise_ref = net(x).numpy()[0, 0]
    state = import_torch_state_dict(net.state_dict(), num_layers=LAYERS)
    model = DnCNN(channels=1, num_layers=LAYERS, residual=False)
    noise = model.apply(state, jnp.asarray(frames[0])[None, ..., None], train=False)
    np.testing.assert_allclose(np.asarray(noise)[0, ..., 0], noise_ref,
                               rtol=1e-4, atol=1e-5)


def test_online_step_compile_budget():
    """The fused 20-iteration online step must trace+lower in seconds at
    (reduced) realistic spatial size — regression guard against Python-
    unrolled growth in the model or step (the TPU path uses a rolled scan;
    CPU unrolls, so pin the TPU-style rolled variant explicitly)."""
    import time

    import jax
    import jax.numpy as jnp

    from frame2frame_tpu.models.dncnn import init_dncnn
    from frame2frame_tpu.train.online import make_online_step, torch_adam

    model, variables = init_dncnn(jax.random.PRNGKey(0), channels=1,
                                  num_layers=17, spatial=(64, 64))
    tx = torch_adam(5e-5, 1e-5)
    step = make_online_step(model, tx, iters=20, unroll=False)

    H, W = 256, 384
    params = variables["params"]
    bs = variables["batch_stats"]
    opt = tx.init(params)
    args = (params, bs, opt,
            jax.ShapeDtypeStruct((H, W, 1), jnp.float32),
            jax.ShapeDtypeStruct((H, W, 1), jnp.float32),
            jax.ShapeDtypeStruct((H, W, 2), jnp.float32))
    t0 = time.time()
    step.lower(*args)
    dt = time.time() - t0
    assert dt < 60.0, f"online step traced+lowered in {dt:.1f}s"


def test_denoise_only_matches_step_eval_denoise():
    """The serving path (OnlineDenoiser.denoise_only) must be the same
    eval-mode denoise the online step ends with (blind_denoising.py:229-230):
    after process_frame, denoise_only(cur) reproduces its deno bit-exactly."""
    from frame2frame_tpu.models.dncnn import init_dncnn

    model, variables = init_dncnn(jax.random.PRNGKey(3), channels=1,
                                  num_layers=5)
    eng = OnlineDenoiser(model, variables, iters=2)
    rng = np.random.default_rng(7)
    cur = jnp.asarray(rng.random((32, 48, 1)), jnp.float32)
    prev = jnp.asarray(rng.random((32, 48, 1)), jnp.float32)
    deno, _ = eng.process_frame(cur, prev, jnp.zeros((32, 48, 2)))
    again = eng.denoise_only(cur)
    np.testing.assert_array_equal(np.asarray(deno), np.asarray(again))
