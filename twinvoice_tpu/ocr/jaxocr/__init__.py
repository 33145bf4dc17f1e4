"""JAX CTC text recognizer — the TPU-native local OCR engine.

The reference's local OCR is EasyOCR, a torch CRAFT-detector + CRNN
recognizer loaded as a module global (app_camera.py:73, 817-833). Our
pipeline doesn't need general scene-text detection — the U-Net already
localizes the three fields — so the local engine is a *recognizer*: a
compact convolutional CTC model over the invoice charset (digits, A-Z,
punctuation), trained on synthetically rendered text.

Modules: charset, model (pure-fn CRNN), data (synthetic render + batches),
train (CTC training loop), engine (OcrEngine adapter with greedy decode).
"""

from twinvoice_tpu.ocr.jaxocr.charset import CHARSET, encode_text, decode_ids
from twinvoice_tpu.ocr.jaxocr.engine import JaxOcrEngine
