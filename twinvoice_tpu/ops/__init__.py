"""Pure-function NN ops in TPU-native NHWC layout.

Every op is ``apply(x, params)``-style with pytree params, jit/vmap/grad-safe,
and static-shaped. Layout conventions:

- activations: ``(N, H, W, C)``
- conv kernels: ``(kH, kW, Cin, Cout)`` (HWIO)
- transpose-conv kernels: ``(kH, kW, Cin, Cout)`` with *torch output semantics*
  (see :func:`twinvoice_tpu.ops.conv.conv_transpose2x2`)
"""

from twinvoice_tpu.ops.conv import (
    conv2d,
    conv1x1,
    conv3x3,
    conv_transpose2x2,
    max_pool2,
    init_conv,
    init_conv_transpose,
)
from twinvoice_tpu.ops.norm import (
    init_batchnorm,
    batchnorm_apply,
    fold_batchnorm_into_conv,
)
from twinvoice_tpu.ops.image import resize_bilinear, resize_nearest, normalize_uint8
