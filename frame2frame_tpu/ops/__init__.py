from .gaussian import gaussian_kernel, gaussian_smooth
from .grad import centered_gradient, divergence, forward_gradient
from .interp import bicubic_at, bicubic_warp
from .pyramid import num_scales, pyramid_shapes, zoom_in, zoom_out, zoom_size
from .warp import (
    bilinear_warp_with_mask,
    occlusion_mask,
    warped_dist_loss,
    warped_l1_loss,
)
