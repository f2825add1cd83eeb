"""
neurite_tpu.ops — TPU-native kernels for the hot paths.

This package holds the performance layer promised by the survey (§7.2 step 5):
every op here has a pure-jnp reference implementation elsewhere in the package
(`neurite_tpu.utils`, `neurite_tpu.metrics`) and is validated against it by
parity tests. Dispatch is explicit: callers opt in (the default public API
routes through these automatically where it is always a win).

Modules:
    resize_mm — axis-separable N-D resize as per-axis interpolation matmuls
        (MXU path) or axis takes; replaces the reference's 2^N-corner gather
        chain (`neurite/tf/utils/utils.py:73-220`) for the resize/zoom case.
    warp — optimized general-warp interpolation formulations (cube gather).
    mi_hist — fused soft-quantize + joint-histogram Pallas kernel for the
        soft Mutual Information metric (`neurite/tf/metrics.py:228-282`).
    dice_red — fused Dice numerator/denominator reduction Pallas kernel
        (`neurite/tf/metrics.py:476-482`).
"""

from neurite_tpu.ops.resize_mm import (  # noqa: F401
    interp_matrix,
    resize_separable,
)
from neurite_tpu.ops.warp import (interpn_cube, interpn_onehot,  # noqa: F401
                                  interpn_rows, interpn_shear_onehot,
                                  interpn_window, block_spread_ok,
                                  shear_bound, shear_window_disp)
from neurite_tpu.ops.im2col import conv_im2col  # noqa: F401
from neurite_tpu.ops.zdecomp import conv_z2d  # noqa: F401
from neurite_tpu.ops.mi_hist import mi_histograms  # noqa: F401
from neurite_tpu.ops.dice_red import dice_sums  # noqa: F401
from neurite_tpu.ops.blur import separable_blur3d  # noqa: F401
