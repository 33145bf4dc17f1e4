from twinvoice_tpu.parallel.spatial import (
    halo_exchange_h,
    conv3x3_spatial,
    spatial_shard_apply,
)
