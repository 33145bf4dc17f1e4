"""twinvoice_tpu — TPU-native Taiwanese e-invoice recognition framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``tingyu-c/TW-invoice-unet-ocr-llm`` (reference mounted at /root/reference):
a receipt photo goes through QR decoding, a 3-class U-Net field segmenter,
multi-engine OCR with priority fusion, category classification, persistence
and a dashboard UI.

Package map (see SURVEY.md §7 for the design blueprint):

- ``core``     — device mesh construction, sharding rules, precision policy
- ``ops``      — pure-fn NN ops (conv / batchnorm / pool / resize) in NHWC,
                 plus ``ops.pallas`` TPU kernels for the fused hot paths
- ``models``   — the config-driven U-Net (init + apply, pytree params)
- ``port``     — torch ``state_dict`` → JAX pytree weight porter
- ``data``     — labelme→mask dataset builder and batched loaders
- ``train``    — dice+focal loss, AdamW + cosine-warm-restarts, DP train step
- ``infer``    — the fused jitted graph: preprocess→U-Net→sigmoid→threshold→bbox
- ``parallel`` — multi-chip sharding helpers (DP / TP / spatial)
- ``qr``       — QR detection/decoding + TW e-invoice payload parsers
- ``ocr``      — OcrEngine protocol: JAX CTC recognizer, HTTP engine, fakes
- ``fusion``   — engine-priority field merge with provenance
- ``store``    — persistence protocol: in-memory fake + supabase client
- ``app``      — Streamlit UI (capture tab + dashboard tab)
"""

__version__ = "0.1.0"

FIELDS = ("invoice_no", "date", "total_amount")
