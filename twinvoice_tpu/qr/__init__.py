from twinvoice_tpu.qr.parse import (
    parse_header_qr,
    parse_items_qr,
    is_text_qr_payload,
    roc_date_to_iso,
)
from twinvoice_tpu.qr.detect import QrPipeline, detect_qr_regions
