"""frame2frame_tpu — a TPU-native JAX framework for model-blind video denoising,
providing the capabilities of the reference gauenk/frame2frame (CVPR 2019
"Model-Blind Video Denoising via Frame-to-Frame Training" + research harness).

Subpackages:
- io:       .flo / image / video host I/O (readFlowFile.py, iio equivalents)
- ops:      device kernels: warp, occlusion, bicubic, gradients, gaussian,
            pyramid, non-local search
- flow:     TV-L1 optical flow, fully on-device (tvl1flow/ C equivalent)
- models:   DnCNN, FastDVDnet (flax, NHWC)
- losses:   self-supervised loss family (warped/F2F, stnls, nb2nb, b2u, combo,
            sup, n2n)
- train:    online (streaming) fine-tuning, offline trainer, adaptation
- eval:     test pipeline, chunked inference, x8 augmentation
- data:     dataset registry, noise transforms, cropping
- parallel: device-mesh sharding (DP + temporal CP with halo exchange)
- cache:    experiment grids, uuid-keyed result cache, sweep runner
- utils:    metrics (PSNR/SSIM/ST-RRED), timers, memory meters
"""

__version__ = "0.1.0"

from . import config
from .config import Config, cfg_grid, dcat, extract_pairs, optional


def load_model(cfg):
    """Config-driven model construction (reference lib/frame2frame/__init__.py:31-39)."""
    from . import models

    return models.load_model(cfg)


def extract_model_config(cfg):
    from . import models

    return models.extract_model_config(cfg)


def get_loss_fxn(cfg, loss_type=None):
    """Loss registry (the reference's missing ``losses.get_loss_fxn``,
    lib/frame2frame/__init__.py:7, used at scripts/instances_adapt.py:216)."""
    from . import losses

    return losses.get_loss_fxn(cfg, loss_type)
