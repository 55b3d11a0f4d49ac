"""DnCNN denoiser in flax (NHWC, TPU-native layout).

Architecture per the reference (lib/frame2frame/dncnn/net.py:6-39 and the
SaoYan/DnCNN-PyTorch submodule used by blind_denoising.py:25,144): Conv3x3(64,
no bias) + ReLU, (L-2) x [Conv3x3(64, no bias) + BatchNorm + ReLU], Conv3x3(C,
no bias).

Two output conventions exist in the reference and both are supported:
- ``residual=False``: returns the predicted **noise** (submodule convention; the
  caller subtracts, blind_denoising.py:218);
- ``residual=True``: returns the denoised image ``x - noise`` (harness
  convention, dncnn/net.py:31).

Video inputs (B, T, H, W, C) are flattened to (B*T, H, W, C) and restored,
mirroring dncnn/net.py:25-36.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class PackedConv3x3(nn.Module):
    """3x3 SAME conv executed in the pair-packed 128-lane layout
    (ops/packed.py). Parameters are stored in the ORIGINAL (3, 3, Cin, Cout)
    HWIO layout under "kernel", so checkpoints interoperate with every other
    conv implementation; the packed kernel is assembled on the fly.

    ``compute_dtype``: optional bfloat16 for the conv operands (halves HBM
    streaming; ~1% gradient deviation at 17 layers — opt-in fast mode).
    """

    features: int
    compute_dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x2):
        cin = x2.shape[-1] // 2
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, cin, self.features), jnp.float32,
        )
        from ..ops.packed import conv3x3_packed, conv3x3_packed_bf16

        if self.compute_dtype == jnp.bfloat16:
            # end-to-end bf16 chain: the caller casts activations once after
            # packing; fwd/dX stay bf16 (half HBM traffic), dW is f32
            return conv3x3_packed_bf16(x2.astype(jnp.bfloat16), kernel)
        return conv3x3_packed(x2, kernel, dtype=self.compute_dtype)


class PackedBatchNorm(nn.Module):
    """BatchNorm over pair-packed activations with nn.BatchNorm-compatible
    parameters and running statistics (per-channel (C,) vectors), matching
    torch BatchNorm2d defaults (eps=1e-5, momentum 0.1 -> flax 0.9)."""

    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x2, use_running_average: bool):
        from ..ops.packed import fold_packed_stats, tile_packed

        C = x2.shape[-1] // 2
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((C,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((C,), jnp.float32))

        if use_running_average:
            m, v = ra_mean.value, ra_var.value
        else:
            axes = tuple(range(x2.ndim - 1))
            # stats always accumulate in f32 (bf16 mean/var would suffer
            # catastrophic cancellation in v = E[x^2] - m^2)
            x2f = x2.astype(jnp.float32)
            m2 = jnp.mean(x2f, axis=axes)
            s2 = jnp.mean(jnp.square(x2f), axis=axes)
            m = fold_packed_stats(m2)
            v = fold_packed_stats(s2) - jnp.square(m)
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1.0 - self.momentum) * m)
                ra_var.value = (self.momentum * ra_var.value
                                + (1.0 - self.momentum) * v)

        inv = jax.lax.rsqrt(v + self.epsilon) * scale
        # cast the per-channel affine to the activation dtype so the bf16
        # chain is not promoted back to f32 mid-network
        return (x2 * tile_packed(inv).astype(x2.dtype)
                + tile_packed(bias - m * inv).astype(x2.dtype))


class Conv3x3(nn.Module):
    """3x3 SAME conv with a selectable compute implementation.

    ``conv_impl``: "xla" (nn.Conv-equivalent), "hybrid" (XLA fwd/dX + Pallas
    dW kernel — fastest measured for the batch-1 online finetune) or "pallas"
    (full Pallas fwd+bwd). Parameter layout matches nn.Conv ("kernel", HWIO)
    so checkpoints interoperate across implementations.
    """

    features: int
    conv_impl: str = "xla"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, x.shape[-1], self.features), jnp.float32,
        )
        from ..ops.pallas_conv import (
            _xla_conv,
            conv3x3,
            conv3x3_bf16res,
            conv3x3_hybrid,
        )

        fn = {"xla": _xla_conv, "hybrid": conv3x3_hybrid,
              "pallas": conv3x3, "bf16res": conv3x3_bf16res}[self.conv_impl]
        return fn(x.astype(jnp.float32), kernel).astype(self.dtype)


class DnCNN(nn.Module):
    channels: int = 1
    num_layers: int = 17
    features: int = 64
    residual: bool = False
    dtype: jnp.dtype = jnp.float32
    # "packed" (default): pair-packed 128-lane layout, ~1.35x faster fwd+bwd
    # at 540p (ops/packed.py); falls back to "xla" per call for odd widths.
    # "fused": packed_bf16 flax graph + the fused Pallas training pipeline
    # (ops/fused_stack.py) for the online fine-tune on TPU.
    # Others: "xla", "hybrid", "pallas", "bf16res", "packed_bf16".
    conv_impl: str = "packed"
    remat_every: int = 0  # >0: checkpoint every N middle layers (1080p finetune)

    @property
    def _packed(self):
        return self.conv_impl in ("packed", "packed_bf16", "fused")

    def _conv(self, features, name, packed):
        if packed:
            cd = (jnp.bfloat16 if self.conv_impl in ("packed_bf16", "fused")
                  else None)
            return PackedConv3x3(features, compute_dtype=cd, name=name)
        if self.conv_impl in ("xla", "packed", "packed_bf16", "fused"):
            # "packed" reaches here only as the odd-width per-call fallback;
            # parameter names/shapes are identical across implementations.
            return nn.Conv(features, (3, 3), padding="SAME", use_bias=False,
                           dtype=self.dtype, name=name)
        return Conv3x3(features, conv_impl=self.conv_impl, dtype=self.dtype,
                       name=name)

    def _mid_layer(self, h, i, train, packed):
        h = self._conv(self.features, f"conv_{i}", packed)(h)
        # torch BatchNorm2d defaults: eps=1e-5, momentum=0.1 (-> flax 0.9)
        if packed:
            h = PackedBatchNorm(name=f"bn_{i}")(h, use_running_average=not train)
        else:
            h = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, name=f"bn_{i}",
            )(h)
        return nn.relu(h)

    @nn.compact
    def __call__(self, x, train: bool = False):
        vid_shape = None
        if x.ndim == 5:  # (B,T,H,W,C) -> (B*T,H,W,C)
            vid_shape = x.shape
            x = x.reshape((-1,) + x.shape[2:])

        # pair packing needs an even width; odd-width calls fall back to the
        # plain XLA path per call (identical parameters either way)
        packed = self._packed and x.shape[2] % 2 == 0
        x_in = x
        if packed:
            from ..ops.packed import pack_image

            x = pack_image(x)

        h = self._conv(self.features, "conv_in", packed)(x)
        h = nn.relu(h)
        nmid = self.num_layers - 2
        if self.remat_every > 0:
            # gradient checkpointing: store activations only at group
            # boundaries, recompute inside the group on the backward pass —
            # trades ~1 extra forward for a remat_every-fold activation-memory
            # cut (needed for the 1080p online finetune, which otherwise
            # exceeds HBM: 17 layers x 1080p x 64ch of saved activations).
            # Lifted remat preserves parameter/bn names, so checkpoints stay
            # layout-compatible with the unrematted model.
            def group(mdl, h, i0, k, pk):
                for i in range(i0, i0 + k):
                    h = mdl._mid_layer(h, i, train, pk)
                return h

            remat_group = nn.remat(group, static_argnums=(2, 3, 4))
            i = 0
            while i < nmid:
                k = min(self.remat_every, nmid - i)
                h = remat_group(self, h, i, k, packed)
                i += k
        else:
            for i in range(nmid):
                h = self._mid_layer(h, i, train, packed)
        noise = self._conv(self.channels, "conv_out", packed)(h)
        if packed:
            from ..ops.packed import unpack_image

            noise = unpack_image(noise).astype(jnp.float32)

        out = x_in - noise if self.residual else noise
        if vid_shape is not None:
            out = out.reshape(vid_shape[:2] + out.shape[1:])
        return out


def init_dncnn(key, channels=1, num_layers=17, residual=False, dtype=jnp.float32,
               spatial=(64, 64), conv_impl="auto", remat_every=0):
    """Initialize a DnCNN; returns (model, variables dict with params+batch_stats).

    conv_impl="auto" resolves to the fused Pallas training pipeline on TPU
    and the pair-packed XLA path elsewhere. NOTE the accuracy mode this
    implies on TPU: the fused pipeline stores bf16 activations between layers
    (validated ~0.21 dB max PSNR deviation vs the f32 chain,
    scripts/validate_fused.py); callers that need strict f32 numerics should
    pass conv_impl="packed" explicitly."""
    if conv_impl == "auto":
        conv_impl = "fused" if jax.default_backend() == "tpu" else "packed"
    model = DnCNN(channels=channels, num_layers=num_layers, residual=residual,
                  dtype=dtype, conv_impl=conv_impl, remat_every=remat_every)
    x = jnp.zeros((1, spatial[0], spatial[1], channels), dtype)
    variables = model.init(key, x, train=False)
    return model, variables


def import_torch_state_dict(state_dict, num_layers=17):
    """Convert a torch DnCNN ``state_dict`` to flax variables.

    Accepts the reference checkpoint layouts: keys like
    ``module.dncnn.{idx}.weight`` (DataParallel wrap, blind_denoising.py:146) or
    ``dncnn.{idx}.weight``; BatchNorm entries carry weight/bias/running_mean/
    running_var. Torch conv weights are OIHW; flax expects HWIO.

    Values may be torch tensors or numpy arrays.
    """
    import numpy as np

    def to_np(v):
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        # copy: torch .numpy() shares memory with the live tensor, and the
        # caller may keep training the torch model afterwards
        return np.array(v)

    # normalize keys: strip leading "module." and "dncnn."
    flat = {}
    for k, v in state_dict.items():
        for prefix in ("module.", "net.", "dncnn."):
            if k.startswith(prefix):
                k = k[len(prefix):]
        # after stripping, keys look like "{seq_idx}.weight" etc.
        flat[k] = to_np(v)

    # sequential indices: conv at 0; then blocks of (conv, bn, relu) at
    # (2+3i, 3+3i); final conv at 2+3*(L-2)
    def conv_hwio(w):
        return np.transpose(w, (2, 3, 1, 0))  # OIHW -> HWIO

    params = {"conv_in": {"kernel": conv_hwio(flat["0.weight"])}}
    batch_stats = {}
    L = num_layers
    for i in range(L - 2):
        ci = 2 + 3 * i
        bi = ci + 1
        params[f"conv_{i}"] = {"kernel": conv_hwio(flat[f"{ci}.weight"])}
        params[f"bn_{i}"] = {
            "scale": flat[f"{bi}.weight"],
            "bias": flat[f"{bi}.bias"],
        }
        batch_stats[f"bn_{i}"] = {
            "mean": flat[f"{bi}.running_mean"],
            "var": flat[f"{bi}.running_var"],
        }
    params["conv_out"] = {"kernel": conv_hwio(flat[f"{2 + 3 * (L - 2)}.weight"])}
    return {"params": params, "batch_stats": batch_stats}


def export_torch_state_dict(variables, num_layers=17):
    """Inverse of ``import_torch_state_dict``: flax variables -> a torch-style
    state dict (numpy values, sequential ``dncnn.{idx}.*`` keys, OIHW conv
    weights) loadable by the reference submodule's DnCNN
    (blind_denoising.py:144-147). Used to hand OUR trained weights to the
    torch CPU oracle for trajectory-deviation checks
    (scripts/accuracy_artifact.py)."""
    import numpy as np

    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    def conv_oihw(w):
        return np.ascontiguousarray(np.transpose(np.asarray(w), (3, 2, 0, 1)))

    sd = {"dncnn.0.weight": conv_oihw(params["conv_in"]["kernel"])}
    L = num_layers
    for i in range(L - 2):
        ci = 2 + 3 * i
        bi = ci + 1
        sd[f"dncnn.{ci}.weight"] = conv_oihw(params[f"conv_{i}"]["kernel"])
        sd[f"dncnn.{bi}.weight"] = np.asarray(params[f"bn_{i}"]["scale"])
        sd[f"dncnn.{bi}.bias"] = np.asarray(params[f"bn_{i}"]["bias"])
        sd[f"dncnn.{bi}.running_mean"] = np.asarray(
            batch_stats[f"bn_{i}"]["mean"])
        sd[f"dncnn.{bi}.running_var"] = np.asarray(
            batch_stats[f"bn_{i}"]["var"])
        sd[f"dncnn.{bi}.num_batches_tracked"] = np.asarray(0)
    sd[f"dncnn.{2 + 3 * (L - 2)}.weight"] = conv_oihw(
        params["conv_out"]["kernel"])
    return sd


def load_torch_checkpoint(path, num_layers=17):
    """Load a torch ``.pth`` DnCNN checkpoint into flax variables (CPU torch)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and not any(hasattr(v, "shape") for v in obj.values()):
        # maybe a wrapper dict with 'state_dict'
        obj = obj.get("state_dict", obj)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    return import_torch_state_dict(obj, num_layers=num_layers)
