"""The field-fusion pipeline — the heart of the system (reference
``extract_invoice_meta``, app_camera.py:736-878).

Flow (behavior-compatible, engine-agnostic):

1. optional auto-rotate of landscape photos by QR position (revived dead
   feature, app_camera.py:655-684)
2. QR scan → header parse (invoice_no + ROC date) + TEXT-QR line items
3. U-Net segmentation → per-field crops (always runs: amount needs OCR)
4. each configured OCR engine reads the 3 crops (mode="text" for
   invoice_no/date, mode="amount" for total_amount — app_camera.py:800-811)
5. merge with priority **QR > engines in configured order** and regex
   re-validation; provenance recorded per field (source/date_source/
   amount_source, app_camera.py:749-759)
6. amount always comes from merged OCR (app_camera.py:869-872)
7. optional items-to-total reconciliation (revived, app_camera.py:182-225)

Results are memoized by image content hash (app_camera.py:105-111,741-744),
on the extractor instance rather than UI session state.
"""

from __future__ import annotations

import hashlib
import re
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

from twinvoice_tpu import FIELDS
from twinvoice_tpu.config import FusionConfig
from twinvoice_tpu.fusion.amount import extract_amount
from twinvoice_tpu.fusion.items import adjust_items_to_total
from twinvoice_tpu.qr.parse import parse_header_qr, parse_items_qr
from twinvoice_tpu.utils.errors import FailureLog
from twinvoice_tpu.utils.tracing import trace_span

_INVOICE_NO_RE = re.compile(r"[A-Z]{2}\d{8}")
_OCR_DATE_RE = re.compile(r"(20\d{2})[/-](\d{2})[/-](\d{1,2})")

# per-field OCR modes: rigid-format fields advertise their format so
# engines can constrain decoding (jaxocr runs a pattern-automaton Viterbi
# for "invoice"/"date"); engines that only distinguish amount-vs-text
# treat anything != "amount" as text
_FIELD_MODES = {"invoice_no": "invoice", "date": "date",
                "total_amount": "amount"}


def empty_meta() -> dict:
    return {
        "invoice_no": None,
        "date": None,
        "total_amount": None,
        "source": "unknown",
        "date_source": "unknown",
        "amount_source": "unknown",
        "qr_raw": [],
        # structured failure provenance (absent in the reference, which
        # swallows errors silently — SURVEY.md §5 failure detection)
        "failures": [],
    }


# kept as a structured alias for typing call sites; the pipeline returns the
# reference-shaped plain dict for drop-in compatibility
@dataclass
class InvoiceMeta:
    invoice_no: Optional[str] = None
    date: Optional[str] = None
    total_amount: Optional[str] = None
    source: str = "unknown"
    date_source: str = "unknown"
    amount_source: str = "unknown"
    qr_raw: List[str] = field(default_factory=list)

    @classmethod
    def from_dict(cls, d: dict) -> "InvoiceMeta":
        return cls(**{k: d.get(k, v) for k, v in cls().__dict__.items()})


def image_content_key(pil_img) -> str:
    return hashlib.md5(pil_img.tobytes()).hexdigest()


def clean_invoice_candidate(text: str) -> Optional[str]:
    """Uppercase, strip non-alphanumerics, then find AA######## inside."""
    cleaned = re.sub(r"[^A-Za-z0-9]", "", text.upper())
    m = _INVOICE_NO_RE.search(cleaned)
    return m.group(0) if m else None


def clean_date_candidate(text: str) -> Optional[str]:
    """Find a western yyyy-mm-dd / yyyy/mm/d date inside OCR noise."""
    cleaned = re.sub(r"[^0-9/:-]", "", text)
    m = _OCR_DATE_RE.search(cleaned)
    if not m:
        return None
    y, mm, dd = m.groups()
    return f"{y}-{mm}-{dd.zfill(2)}"


def auto_rotate_by_qr(pil_img, qr_regions_fn=None):
    """Rotate landscape invoices upright using the QR's horizontal position
    (QR sits at the bottom of a TW invoice). Returns the (possibly rotated)
    image. Never rotates when no QR is found or the image is already portrait.
    """
    w, h = pil_img.size
    if w <= h:
        return pil_img
    if qr_regions_fn is None:
        import numpy as np

        from twinvoice_tpu.qr.detect import detect_qr_regions

        qr_regions_fn = lambda img: detect_qr_regions(np.asarray(img.convert("RGB")))
    regions = qr_regions_fn(pil_img)
    if not regions:
        return pil_img
    x1, _, x2, _ = regions[0]
    cx = (x1 + x2) / 2
    if cx < w * 0.4:
        return pil_img.rotate(90, expand=True)
    if cx > w * 0.6:
        return pil_img.rotate(-90, expand=True)
    return pil_img


class InvoiceExtractor:
    """Binds the segmenter, QR pipeline and OCR engines into one callable.

    ``engines``: OCR engines in *priority order below QR* (the reference's
    order is cloud OCR.space above local EasyOCR, app_camera.py:839-866).
    """

    def __init__(
        self,
        segmenter,
        qr_pipeline=None,
        engines: Sequence = (),
        cfg: FusionConfig = FusionConfig(),
    ):
        self.segmenter = segmenter
        self.qr = qr_pipeline
        self.engines = list(engines)
        self.cfg = cfg
        self._cache: Dict[str, Tuple[dict, list, list]] = {}

    def clear_cache(self):
        self._cache.clear()

    def extract(self, pil_img, qr_img=None) -> Tuple[dict, list, list]:
        """Returns (meta dict, items list, raw QR payloads)."""
        key = image_content_key(pil_img)
        if key in self._cache:
            return self._cache[key]

        meta = empty_meta()
        log = FailureLog()

        if self.cfg.auto_rotate:
            with trace_span("fusion.autorotate"):
                pil_img = log.guarded("qr", auto_rotate_by_qr, pil_img, default=pil_img)

        # -- QR ------------------------------------------------------------
        qr_raw: List[str] = []
        if self.cfg.use_qr and self.qr is not None:
            with trace_span("fusion.qr_scan"):
                qr_raw = log.guarded("qr", self.qr.scan, qr_img or pil_img, default=[])
        meta["qr_raw"] = qr_raw
        qr_invoice, qr_date = parse_header_qr(qr_raw)
        items = parse_items_qr(qr_raw)
        if qr_invoice:
            meta["invoice_no"] = qr_invoice
            meta["source"] = "QR"
        if qr_date:
            meta["date"] = qr_date
            meta["date_source"] = "QR"

        # -- segmentation (always: amount requires OCR on its crop) --------
        with trace_span("fusion.segment"):
            _, crops = log.guarded(
                "segment", self.segmenter.segment_pil, pil_img, default=({}, {})
            )

        # -- OCR engines over the 3 field crops ----------------------------
        # readings[field] = [engine0_text, engine1_text, ...] in priority order
        readings: Dict[str, List[str]] = {f: [] for f in FIELDS}
        with trace_span("fusion.ocr"):
            for engine in self.engines:
                field_crops = [crops.get(f) for f in FIELDS]
                modes = [_FIELD_MODES[f] for f in FIELDS]
                if hasattr(engine, "read_batch"):
                    # one device call for all three field crops
                    results = log.guarded(
                        "ocr", engine.read_batch, field_crops, modes=modes,
                        default=[None] * len(FIELDS),
                    )
                    for fieldname, r in zip(FIELDS, results):
                        readings[fieldname].append(r.text if r else "")
                    continue
                for fieldname, crop, mode in zip(FIELDS, field_crops, modes):
                    if crop is None:
                        readings[fieldname].append("")
                        continue
                    result = log.guarded("ocr", engine.read, crop, mode=mode)
                    readings[fieldname].append(result.text if result else "")

        # -- merge: invoice number (QR already won if present) -------------
        if not meta["invoice_no"]:
            for text in readings["invoice_no"]:
                cand = clean_invoice_candidate(text) if text else None
                if cand:
                    meta["invoice_no"] = cand
                    meta["source"] = "merged_ocr"
                    break

        # -- merge: date ---------------------------------------------------
        if not meta["date"]:
            for text in readings["date"]:
                cand = clean_date_candidate(text) if text else None
                if cand:
                    meta["date"] = cand
                    meta["date_source"] = "merged_ocr"
                    break

        # -- full-page fallback: when the segmenter's crops yielded nothing,
        # detect text lines over the whole photo and regex the candidates —
        # the local-stack analogue of leaning on EasyOCR's whole-image
        # readtext robustness (app_camera.py:817-833).
        if self.cfg.full_page_fallback and (
            not meta["invoice_no"] or not meta["date"]
        ):
            eng = next(
                (e for e in self.engines
                 if getattr(e, "name", "") == "jaxocr" and e.available()),
                None,
            )
            if eng is not None:
                from twinvoice_tpu.ocr.jaxocr.detector import read_page

                with trace_span("fusion.full_page"):
                    page = log.guarded("ocr", read_page, pil_img, eng,
                                       default=[])
                texts = [r.text for _, r in page]
                if not meta["invoice_no"]:
                    for t in texts:
                        cand = clean_invoice_candidate(t)
                        if cand:
                            meta["invoice_no"] = cand
                            meta["source"] = "full_page_ocr"
                            break
                if not meta["date"]:
                    for t in texts:
                        cand = clean_date_candidate(t)
                        if cand:
                            meta["date"] = cand
                            meta["date_source"] = "full_page_ocr"
                            break

        # -- amount: always merged OCR ------------------------------------
        meta["total_amount"] = extract_amount(*readings["total_amount"])
        meta["amount_source"] = "merged_ocr"

        # -- revived feature: reconcile items to the recognized total ------
        if self.cfg.adjust_items_to_total and items:
            try:
                total = int(meta["total_amount"])
            except (TypeError, ValueError):
                total = 0
            if total > 0:
                items = adjust_items_to_total(items, total)

        meta["failures"] = log.as_dicts()
        result = (meta, items, qr_raw)
        self._cache[key] = result
        return result

    # -- bulk path -----------------------------------------------------------

    def extract_batch(self, pil_images) -> List[Tuple[dict, list, list]]:
        """Process many invoices with batched device work: one segmenter
        call for all images (when it exposes ``segment_pil_batch``) and one
        recognizer call for all field crops (``read_batch``). QR decoding
        and crop slicing stay per-image on host. Results are cache-coherent
        with :meth:`extract`.
        """
        results: List = [None] * len(pil_images)
        todo = []
        for i, img in enumerate(pil_images):
            key = image_content_key(img)
            if key in self._cache:
                results[i] = self._cache[key]
            else:
                todo.append(i)
        if not todo:
            return results

        imgs = [pil_images[i] for i in todo]
        logs = [FailureLog() for _ in todo]
        if self.cfg.auto_rotate:
            imgs = [
                log.guarded("qr", auto_rotate_by_qr, im, default=im)
                for im, log in zip(imgs, logs)
            ]

        # 1+2. QR scans run in a thread pool OVERLAPPED with the batched
        # segmenter call: the native QR decoder (ctypes) and PIL release the
        # GIL, so the host-side scan work rides under the device call's
        # wall time instead of serializing in front of it (~80% of the r2
        # bulk wall was this serial host work, docs/PERFORMANCE.md).
        scan_qr = self.cfg.use_qr and self.qr is not None
        pool = None
        qr_futs = None
        if scan_qr and self.cfg.host_workers > 1 and len(imgs) > 1:
            from concurrent.futures import ThreadPoolExecutor

            pool = ThreadPoolExecutor(max_workers=self.cfg.host_workers)
            with trace_span("fusion.qr_scan_submit"):
                qr_futs = [
                    pool.submit(log.guarded, "qr", self.qr.scan, im, default=[])
                    for im, log in zip(imgs, logs)
                ]

        try:
            with trace_span("fusion.segment"):
                if hasattr(self.segmenter, "segment_pil_batch"):
                    # return_masks=False: extraction only reads the crops,
                    # and the batch-32 mask tensor is ~25 MB of device→host
                    # transfer we'd fetch just to drop; gray_h2d uploads
                    # luminance (3× fewer bytes up, same masks)
                    kw = {}
                    if getattr(self.cfg, "gray_h2d", False):
                        kw["gray_h2d"] = True
                    if getattr(self.cfg, "h2d_chunks", 1) > 1:
                        kw["h2d_chunks"] = self.cfg.h2d_chunks
                    all_crops = [
                        c for _, c in self.segmenter.segment_pil_batch(
                            imgs, return_masks=False, **kw)
                    ]
                else:
                    all_crops = []
                    for im, log in zip(imgs, logs):
                        _, crops = log.guarded(
                            "segment", self.segmenter.segment_pil, im,
                            default=({}, {})
                        )
                        all_crops.append(crops)

            with trace_span("fusion.qr_scan"):
                if qr_futs is not None:
                    qr_raws = [f.result() for f in qr_futs]
                elif scan_qr:
                    qr_raws = [
                        log.guarded("qr", self.qr.scan, im, default=[])
                        for im, log in zip(imgs, logs)
                    ]
                else:
                    qr_raws = [[] for _ in imgs]
        finally:
            if pool is not None:
                pool.shutdown(wait=False)

        # 3. OCR: one read_batch per engine over every (invoice, field) crop
        n_fields = len(FIELDS)
        flat_crops = [
            crops.get(f) for crops in all_crops for f in FIELDS
        ]
        modes = [_FIELD_MODES[f] for _ in all_crops for f in FIELDS]
        per_engine_texts = []
        with trace_span("fusion.ocr"):
            for engine in self.engines:
                if hasattr(engine, "read_batch"):
                    outs = engine.read_batch(flat_crops, modes=modes)
                    per_engine_texts.append([o.text if o else "" for o in outs])
                else:
                    texts = []
                    for crop, mode in zip(flat_crops, modes):
                        texts.append(
                            engine.read(crop, mode=mode).text if crop is not None else ""
                        )
                    per_engine_texts.append(texts)

        # 4. merge per invoice (same rules as extract())
        for j, idx in enumerate(todo):
            meta = empty_meta()
            qr_raw = qr_raws[j]
            meta["qr_raw"] = qr_raw
            qr_invoice, qr_date = parse_header_qr(qr_raw)
            items = parse_items_qr(qr_raw)
            if qr_invoice:
                meta["invoice_no"], meta["source"] = qr_invoice, "QR"
            if qr_date:
                meta["date"], meta["date_source"] = qr_date, "QR"

            readings = {
                f: [texts[j * n_fields + fi] for texts in per_engine_texts]
                for fi, f in enumerate(FIELDS)
            }
            if not meta["invoice_no"]:
                for text in readings["invoice_no"]:
                    cand = clean_invoice_candidate(text) if text else None
                    if cand:
                        meta["invoice_no"], meta["source"] = cand, "merged_ocr"
                        break
            if not meta["date"]:
                for text in readings["date"]:
                    cand = clean_date_candidate(text) if text else None
                    if cand:
                        meta["date"], meta["date_source"] = cand, "merged_ocr"
                        break
            meta["total_amount"] = extract_amount(*readings["total_amount"])
            meta["amount_source"] = "merged_ocr"
            if self.cfg.adjust_items_to_total and items:
                try:
                    total = int(meta["total_amount"])
                except (TypeError, ValueError):
                    total = 0
                if total > 0:
                    items = adjust_items_to_total(items, total)
            meta["failures"] = logs[j].as_dicts()
            result = (meta, items, qr_raw)
            self._cache[image_content_key(pil_images[idx])] = result
            results[idx] = result
        return results
