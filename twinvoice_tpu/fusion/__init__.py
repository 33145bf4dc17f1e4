from twinvoice_tpu.fusion.items import (
    sum_items_amount,
    adjust_items_to_total,
    pick_crop,
)
from twinvoice_tpu.fusion.amount import extract_amount
from twinvoice_tpu.fusion.classify import classify_invoice, CATEGORIES
from twinvoice_tpu.fusion.extract import InvoiceExtractor, InvoiceMeta
