from twinvoice_tpu.train.losses import dice_loss, focal_loss, invoice_loss
from twinvoice_tpu.train.schedule import cosine_warm_restarts
from twinvoice_tpu.train.metrics import per_class_iou, mean_iou
