from twinvoice_tpu.core.mesh import make_mesh, batch_sharding, param_shardings
from twinvoice_tpu.core.precision import Policy
