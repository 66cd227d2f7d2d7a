from psld_tpu.ops.upfirdn import (  # noqa: F401
    conv_downsample_2d,
    downsample_2d,
    naive_downsample_2d,
    naive_upsample_2d,
    setup_kernel,
    upfirdn2d,
    upsample_2d,
    upsample_conv_2d,
)
from psld_tpu.ops.fused_act import fused_leaky_relu  # noqa: F401
from psld_tpu.ops.dropout import hw_dropout  # noqa: F401
