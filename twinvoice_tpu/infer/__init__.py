from twinvoice_tpu.infer.postprocess import (
    bbox_from_probs,
    masks_and_boxes,
)
from twinvoice_tpu.infer.pipeline import Segmenter
