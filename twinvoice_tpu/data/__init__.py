from twinvoice_tpu.data.dataset import ArrayDataset, load_invoice_dataset, synthetic_dataset
from twinvoice_tpu.data.labelme import build_dataset_from_labelme, rasterize_labelme
