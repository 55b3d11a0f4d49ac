"""Model registry and config-driven loading.

Replacement for the reference dispatch (lib/frame2frame/__init__.py:19-39):
``net_name`` selects dncnn or fastdvdnet; ``extract_model_config`` collects the
arch/io pairs (lib/frame2frame/dncnn/io.py:68-80).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from ..config import Config, extract_pairs, optional
from .dncnn import DnCNN, init_dncnn, load_torch_checkpoint
from .fastdvdnet import FastDVDnet, FastDVDnetVideo, init_fastdvdnet

FASTDVD_NAMES = ("fastdvd", "fastdvdnet", "fdvdnet", "fdvd")


def arch_pairs():
    # reference dncnn/io.py:68-70 defaults; conv_impl is ours (TPU execution
    # engine selection — "fused" routes eval through the act/stats-free
    # Pallas serving kernels when geometry allows)
    return {"channels": 3, "num_of_layers": 17, "residual": True, "seed": 0,
            "model_dtype": "float32", "conv_impl": "xla"}


def io_pairs():
    # reference dncnn/io.py:73-80
    return {"pretrained_path": "", "pretrained_root": "", "pretrained_type": "",
            "pretrained_load": False, "net_name": "dncnn"}


def extract_model_config(cfg):
    pairs = dict(arch_pairs())
    pairs.update(io_pairs())
    return extract_pairs(cfg, pairs)


def load_model(cfg):
    """Build (model, variables) from a config.

    Returns a Config with fields: model (flax module), variables (params +
    batch_stats), apply (convenience fn vid->deno in eval mode).
    """
    cfg = extract_model_config(cfg)
    mtype = optional(cfg, "net_name", "dncnn")
    dtype = jnp.dtype(cfg.model_dtype)
    key = jax.random.PRNGKey(cfg.seed)
    if mtype == "dncnn":
        model, variables = init_dncnn(
            key, channels=cfg.channels, num_layers=cfg.num_of_layers,
            residual=cfg.residual, dtype=dtype, conv_impl=cfg.conv_impl,
        )
    elif mtype in FASTDVD_NAMES:
        model, variables = init_fastdvdnet(key, channels=cfg.channels, dtype=dtype)
    else:
        raise ValueError(f"Unknown model type [{mtype}]")

    if cfg.pretrained_load and cfg.pretrained_path:
        variables = load_checkpoint(variables, cfg.pretrained_path,
                                    num_layers=cfg.num_of_layers)

    def apply(vid, train=False, **kw):
        if train:
            return model.apply(variables, vid, train=True,
                               mutable=["batch_stats"], **kw)
        # eval: route through the fused batched serving kernels when the
        # config selected the fused engine and the geometry allows — the
        # harness analogue of OnlineDenoiser.denoise_batch (eval BN uses
        # running stats, so the frame batch is exact)
        if (mtype == "dncnn" and cfg.conv_impl == "fused" and not kw
                and jax.default_backend() == "tpu"
                and os.environ.get("F2F_FUSED") != "0"):
            from .fused_apply import can_fuse_batch, fused_eval_apply_batch

            if can_fuse_batch(model, tuple(vid.shape)):
                return fused_eval_apply_batch(
                    model, variables["params"],
                    variables.get("batch_stats", {}), vid)
        return model.apply(variables, vid, train=False, **kw)

    return Config(model=model, variables=variables, apply=apply, cfg=cfg,
                  video_model=mtype in FASTDVD_NAMES)


def load_checkpoint(variables, path, num_layers=17):
    """Load pretrained weights: .pth (torch interop) or orbax/msgpack native."""
    path = str(path)
    if path.endswith((".pth", ".pt")):
        new = load_torch_checkpoint(path, num_layers=num_layers)
        return {**variables, **new}
    from . import serialization

    return serialization.load_variables(path, like=variables)
