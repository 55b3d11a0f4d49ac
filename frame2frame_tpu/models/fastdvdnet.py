"""FastDVDnet video denoiser in flax (NHWC).

The reference package imports a ``fastdvdnet`` module that is missing from the
tree (lib/frame2frame/__init__.py:26-27,36-37); this reconstructs it from the
published architecture (Tassano, Delon, Veit, "FastDVDnet: Towards Real-Time
Deep Video Denoising Without Flow Estimation", CVPR 2020): a two-stage cascade
of modified U-Nets. Stage 1 denoises three overlapping frame triplets with
shared weights; stage 2 fuses the three intermediate results into the denoised
center frame. Each block is residual (predicts noise of its center frame) and
takes a per-pixel noise-level map.

All convs are 3x3 stride-1/2 with BatchNorm+ReLU; upsampling is PixelShuffle,
implemented channel-order-compatible with torch ``pixel_shuffle``.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


def pixel_shuffle(x, r):
    """NHWC pixel shuffle matching torch channel order:
    in[..., c*r*r + i*r + j] -> out[..., h*r+i, w*r+j, c]."""
    B, H, W, C = x.shape
    c = C // (r * r)
    x = x.reshape(B, H, W, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # B H i W j c
    return x.reshape(B, H * r, W * r, c)


class CvBlock(nn.Module):
    """(Conv3x3 + BN + ReLU) x2."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        for i in range(2):
            x = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False,
                        dtype=self.dtype, name=f"conv{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype, name=f"bn{i}")(x)
            x = nn.relu(x)
        return x


class InputCvBlock(nn.Module):
    """Grouped conv over (frame, noise-map) stacks, then projection."""

    num_in_frames: int
    features: int
    interm: int = 30
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Conv(self.num_in_frames * self.interm, (3, 3), padding="SAME",
                    feature_group_count=self.num_in_frames, use_bias=False,
                    dtype=self.dtype, name="conv_group")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn0")(x)
        x = nn.relu(x)
        x = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="conv_proj")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn1")(x)
        return nn.relu(x)


class DownBlock(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        # explicit torch-style pad 1: with stride 2, XLA's "SAME" pads
        # asymmetrically ((0,1)) while torch Conv2d(padding=1) pads both
        # sides — windows would shift one pixel
        x = nn.Conv(self.features, (3, 3), strides=(2, 2),
                    padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=self.dtype, name="down")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn")(x)
        x = nn.relu(x)
        return CvBlock(self.features, dtype=self.dtype, name="cv")(x, train)


class UpBlock(nn.Module):
    features: int  # output features after pixel shuffle
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        x = CvBlock(x.shape[-1], dtype=self.dtype, name="cv")(x, train)
        x = nn.Conv(self.features * 4, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="up")(x)
        return pixel_shuffle(x, 2)


class OutputCvBlock(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        f = x.shape[-1]
        x = nn.Conv(f, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="conv0")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn")(x)
        x = nn.relu(x)
        return nn.Conv(self.channels, (3, 3), padding="SAME", use_bias=False,
                       dtype=self.dtype, name="conv1")(x)


class DenBlock(nn.Module):
    """One modified U-Net stage: 3 frames + noise map -> denoised center frame."""

    channels: int = 3
    chs: tuple = (32, 64, 128)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, in0, in1, in2, noise_map, train=False):
        c0, c1, c2 = self.chs
        x = jnp.concatenate(
            [in0, noise_map, in1, noise_map, in2, noise_map], axis=-1
        )
        x0 = InputCvBlock(3, c0, dtype=self.dtype, name="inc")(x, train)
        x1 = DownBlock(c1, dtype=self.dtype, name="down0")(x0, train)
        x2 = DownBlock(c2, dtype=self.dtype, name="down1")(x1, train)
        x2 = UpBlock(c1, dtype=self.dtype, name="up2")(x2, train)
        x1 = UpBlock(c0, dtype=self.dtype, name="up1")(x1 + x2, train)
        noise = OutputCvBlock(self.channels, dtype=self.dtype, name="outc")(
            x0 + x1, train
        )
        return in1 - noise


class FastDVDnet(nn.Module):
    """Two-stage cascade over 5 frames -> denoised center frame.

    Input: (B, 5, H, W, C) video window + (B, H, W, 1) noise map (sigma in the
    same scale as the pixels). Returns (B, H, W, C).
    """

    channels: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, frames, noise_map=None, train=False):
        if frames.ndim == 4:  # (B,H,W,5*C) packed -> unpack
            B, H, W, TC = frames.shape
            frames = frames.reshape(B, H, W, 5, TC // 5).transpose(0, 3, 1, 2, 4)
        B, T, H, W, C = frames.shape
        assert T == 5, f"FastDVDnet takes 5-frame windows, got {T}"
        if noise_map is None:
            noise_map = jnp.zeros((B, H, W, 1), frames.dtype)

        temp1 = DenBlock(self.channels, dtype=self.dtype, name="temp1")
        f = [frames[:, t] for t in range(5)]
        x20 = temp1(f[0], f[1], f[2], noise_map, train)
        x21 = temp1(f[1], f[2], f[3], noise_map, train)
        x22 = temp1(f[2], f[3], f[4], noise_map, train)
        return DenBlock(self.channels, dtype=self.dtype, name="temp2")(
            x20, x21, x22, noise_map, train
        )


class FastDVDnetVideo(nn.Module):
    """Whole-video wrapper: denoises every frame using clamped 5-frame windows
    (standard FastDVDnet inference), (B, T, H, W, C) -> (B, T, H, W, C)."""

    channels: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, vid, noise_map=None, train=False, sigma=None):
        B, T, H, W, C = vid.shape
        net = FastDVDnet(self.channels, dtype=self.dtype, name="net")
        if noise_map is None and sigma is not None:
            noise_map = jnp.full((B, H, W, 1), sigma, vid.dtype)
        outs = []
        for t in range(T):
            idx = [min(max(t + d, 0), T - 1) for d in (-2, -1, 0, 1, 2)]
            window = jnp.stack([vid[:, i] for i in idx], axis=1)
            outs.append(net(window, noise_map, train))
        return jnp.stack(outs, axis=1)


def import_fastdvdnet_state_dict(state_dict, video_wrapper=True):
    """Convert an official FastDVDnet torch ``state_dict`` (Tassano et al.,
    github fastdvdnet model.pth; key layout ``temp{1,2}.<block>.convblock.N.*``)
    to flax variables for :class:`FastDVDnet` / :class:`FastDVDnetVideo`.

    Accepts torch tensors or numpy arrays; strips DataParallel ``module.``
    prefixes. Torch convs are OIHW -> flax HWIO (grouped convs keep
    I = in_ch/groups, matching ``feature_group_count``).
    """
    import numpy as np

    def to_np(v):
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        return np.array(v)

    sd = {}
    for k, v in state_dict.items():
        if k.startswith("module."):
            k = k[len("module."):]
        sd[k] = to_np(v)

    def conv(key):
        return jnp.asarray(sd[key + ".weight"].transpose(2, 3, 1, 0))

    def bn(key):
        p = {"scale": jnp.asarray(sd[key + ".weight"]),
             "bias": jnp.asarray(sd[key + ".bias"])}
        s = {"mean": jnp.asarray(sd[key + ".running_mean"]),
             "var": jnp.asarray(sd[key + ".running_var"])}
        return p, s

    params, stats = {}, {}

    def put(path, p, s=None):
        d = params
        for part in path[:-1]:
            d = d.setdefault(part, {})
        d[path[-1]] = p
        if s is not None:
            d = stats
            for part in path[:-1]:
                d = d.setdefault(part, {})
            d[path[-1]] = s

    def cvblock(dst, src):
        """flax CvBlock <- torch CvBlock (convblock indices 0,1,3,4)."""
        for i, (ci, bi) in enumerate(((0, 1), (3, 4))):
            put(dst + (f"conv{i}",), {"kernel": conv(f"{src}.convblock.{ci}")})
            p, s = bn(f"{src}.convblock.{bi}")
            put(dst + (f"bn{i}",), p, s)

    for t in ("temp1", "temp2"):
        # InputCvBlock: grouped conv, BN, proj conv, BN (indices 0,1,3,4)
        put((t, "inc", "conv_group"), {"kernel": conv(f"{t}.inc.convblock.0")})
        p, s = bn(f"{t}.inc.convblock.1"); put((t, "inc", "bn0"), p, s)
        put((t, "inc", "conv_proj"), {"kernel": conv(f"{t}.inc.convblock.3")})
        p, s = bn(f"{t}.inc.convblock.4"); put((t, "inc", "bn1"), p, s)
        # DownBlocks: stride-2 conv, BN, nested CvBlock at index 3
        for flax_name, tname in (("down0", "downc0"), ("down1", "downc1")):
            put((t, flax_name, "down"),
                {"kernel": conv(f"{t}.{tname}.convblock.0")})
            p, s = bn(f"{t}.{tname}.convblock.1")
            put((t, flax_name, "bn"), p, s)
            cvblock((t, flax_name, "cv"), f"{t}.{tname}.convblock.3")
        # UpBlocks: nested CvBlock at index 0, then conv at index 1
        for flax_name, tname in (("up2", "upc2"), ("up1", "upc1")):
            cvblock((t, flax_name, "cv"), f"{t}.{tname}.convblock.0")
            put((t, flax_name, "up"),
                {"kernel": conv(f"{t}.{tname}.convblock.1")})
        # OutputCvBlock: conv, BN, conv (indices 0,1,3)
        put((t, "outc", "conv0"), {"kernel": conv(f"{t}.outc.convblock.0")})
        p, s = bn(f"{t}.outc.convblock.1"); put((t, "outc", "bn"), p, s)
        put((t, "outc", "conv1"), {"kernel": conv(f"{t}.outc.convblock.3")})

    if video_wrapper:
        params = {"net": params}
        stats = {"net": stats}
    return {"params": params, "batch_stats": stats}


def init_fastdvdnet(key, channels=3, dtype=jnp.float32, spatial=(64, 64)):
    model = FastDVDnetVideo(channels=channels, dtype=dtype)
    x = jnp.zeros((1, 5, spatial[0], spatial[1], channels), dtype)
    variables = model.init(key, x, train=False)
    return model, variables
