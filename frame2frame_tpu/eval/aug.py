"""x8 test-time augmentation — replacement for ``dev_basics.aug_test.test_x8``
(reference test.py:17,166-169): average the denoiser over the 8 dihedral
transforms (4 rotations x optional transpose/flip), inverting each transform on
the output. All 8 forwards batch into one model call on TPU.
"""

from __future__ import annotations

import jax.numpy as jnp


def _transform(vid, i):
    """Apply dihedral transform i in 0..7 to (..., H, W, C)."""
    if i & 4:
        vid = jnp.swapaxes(vid, -3, -2)
    k = i & 3
    return jnp.rot90(vid, k=k, axes=(-3, -2))


def _inverse(vid, i):
    k = i & 3
    vid = jnp.rot90(vid, k=-k, axes=(-3, -2))
    if i & 4:
        vid = jnp.swapaxes(vid, -3, -2)
    return vid


def test_x8(fwd_fxn, vid, flows=None):
    """Self-ensemble forward: mean of the 8 transform-conjugated outputs.

    fwd_fxn: (B, T, H, W, C) -> (B, T, H, W, C). Square frames batch all 8
    variants into one call; rectangular frames run the 4 non-transposed
    variants batched plus 4 transposed ones batched.
    """
    B = vid.shape[0]
    H, W = vid.shape[-3], vid.shape[-2]

    def run(indices):
        batch = jnp.concatenate([_transform(vid, i) for i in indices], axis=0)
        try:
            out = fwd_fxn(batch, None)
        except TypeError:
            out = fwd_fxn(batch)
        outs = jnp.split(out, len(indices), axis=0)
        return [_inverse(o, i) for o, i in zip(outs, indices)]

    if H == W:
        outs = run(list(range(8)))
    else:
        # group variants by their (possibly swapped) spatial shape
        outs = run([0, 2, 5, 7]) + run([1, 3, 4, 6])
    return sum(outs) / len(outs)
