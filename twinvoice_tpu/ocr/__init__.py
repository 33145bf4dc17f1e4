from twinvoice_tpu.ocr.base import OcrEngine, OcrResult
from twinvoice_tpu.ocr.fake import FakeOcrEngine
from twinvoice_tpu.ocr.enhance import enhance_for_ocr, grayscale_for_ocr
