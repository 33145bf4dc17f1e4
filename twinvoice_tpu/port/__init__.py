from twinvoice_tpu.port.torch_port import (
    port_state_dict,
    load_pth,
    export_state_dict,
)
