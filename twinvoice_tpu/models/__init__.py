from twinvoice_tpu.models.unet import (
    UNetConfig,
    init_unet,
    unet_apply,
    fold_unet,
    unet_apply_folded,
    param_count,
)
