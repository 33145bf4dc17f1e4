from twinvoice_tpu.store.base import InvoiceStore
from twinvoice_tpu.store.memory import MemoryStore
