"""Neighbor2Neighbor self-supervised loss (Huang et al., CVPR 2021).

Functional JAX re-implementation of the reference's torch version
(lib/frame2frame/nb2nb_loss.py): random paired 2x2 subsampling masks (8
neighbor-pair choices per block, nb2nb_loss.py:66-97), subimages via
space-to-depth selection (:100-120), and the regularized loss
``L_rec + Lambda * L_reg`` with a detached full-image denoise
(:24-57, Lambda = epoch/nepochs * epoch_ratio).

The reference's counter-seeded CUDA generator (:122-128) becomes an explicit
JAX PRNG key — fully deterministic and jittable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# the 8 valid adjacent-pair choices inside a 2x2 block (nb2nb_loss.py:76-79);
# positions are row-major block indices: 0=(0,0) 1=(0,1) 2=(1,0) 3=(1,1)
_IDX_PAIRS = jnp.array(
    [[0, 1], [0, 2], [1, 3], [2, 3], [1, 0], [2, 0], [3, 1], [3, 2]],
    dtype=jnp.int32,
)


def generate_mask_pair(key, shape):
    """Per-2x2-block neighbor-pair selection.

    shape: (B, H, W) of the image (H, W even). Returns (sel1, sel2) int32
    arrays of shape (B, H//2, W//2) with values in {0..3} — the block position
    each subimage takes.
    """
    B, H, W = shape
    rd = jax.random.randint(key, (B, H // 2, W // 2), 0, 8)
    pair = _IDX_PAIRS[rd]  # (B, h2, w2, 2)
    return pair[..., 0], pair[..., 1]


def generate_subimages(img, sel):
    """Select one pixel per 2x2 block: img (B, H, W, C), sel (B, H//2, W//2)
    in {0..3} -> (B, H//2, W//2, C)."""
    B, H, W, C = img.shape
    blocks = img.reshape(B, H // 2, 2, W // 2, 2, C).transpose(0, 1, 3, 2, 4, 5)
    blocks = blocks.reshape(B, H // 2, W // 2, 4, C)
    return jnp.take_along_axis(blocks, sel[..., None, None], axis=3)[..., 0, :]


class Nb2NbLoss:
    """compute(apply_fn, noisy, epoch, key) -> (deno, loss).

    apply_fn: differentiable denoiser (B*T, H, W, C) -> denoised image.
    noisy: (B, T, H, W, C) in [0, 1].
    """

    def __init__(self, lambda1=1.0, lambda2=1.0, nepochs=100, epoch_ratio=2.0):
        self.lambda1 = lambda1
        self.lambda2 = lambda2
        self.nepochs = nepochs
        self.epoch_ratio = epoch_ratio
        self.name = "nb2nb"

    def compute(self, apply_fn, noisy, epoch, key):
        B, T, H, W, C = noisy.shape
        flat = noisy.reshape(B * T, H, W, C)
        Lambda = (epoch / (1.0 * self.nepochs)) * self.epoch_ratio

        sel1, sel2 = generate_mask_pair(key, (B * T, H, W))
        noisy_sub1 = generate_subimages(flat, sel1)
        noisy_sub2 = generate_subimages(flat, sel2)

        deno_d = jax.lax.stop_gradient(apply_fn(flat))
        deno_sub1 = generate_subimages(deno_d, sel1)
        deno_sub2 = generate_subimages(deno_d, sel2)
        deno_diff = deno_sub1 - deno_sub2

        deno = apply_fn(noisy_sub1)
        diff = deno - noisy_sub2
        loss1 = jnp.mean(diff**2)
        loss2 = Lambda * jnp.mean((diff - deno_diff) ** 2)
        loss_all = self.lambda1 * loss1 + self.lambda2 * loss2

        return deno_d.reshape(B, T, H, W, C), loss_all
