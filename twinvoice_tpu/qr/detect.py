"""QR detection + decode pipeline.

Reference pipeline (app_camera.py:328-365, 510-547): locate QR candidates
with OpenCV's detector, crop, enhance (histogram equalization + 3× cubic
upscale), then decode each candidate with ZXing via a Java subprocess and
temp PNG files, falling back to a 2×-upscaled full-image scan; keep decoded
strings longer than 20 chars.

Here decode is a pluggable protocol with three backends, no subprocess and
no temp files:
  1. ``native`` — our from-scratch C++ QR decoder (twinvoice_tpu.qr.native)
  2. ``opencv`` — cv2.QRCodeDetector detectAndDecode
  3. any callable ``ndarray -> list[str]`` (tests use canned fakes)
"""

from __future__ import annotations

import threading
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

QrDecodeFn = Callable[[np.ndarray], List[str]]

MIN_PAYLOAD_LEN = 20  # reference keeps only >20-char strings (app_camera.py:542)


def detect_qr_regions(rgb: np.ndarray) -> List[Tuple[int, int, int, int]]:
    """Locate likely QR bounding boxes (x1, y1, x2, y2) in an RGB array.

    Detection (finder-pattern search) tolerates far lower resolution than
    decoding, so frames wider than ``_DETECT_MAX_DIM`` are first scanned at
    a downscale (~4× cheaper on the host — the bulk-extraction path is
    host-CPU-bound, docs/PERFORMANCE.md). If the cheap pass finds fewer
    than 2 boxes (a TW invoice has exactly 2 QRs) the full-resolution scan
    runs as before, so accuracy cannot regress. Boxes are always in
    full-resolution coordinates; decode reads the original pixels.
    """
    import cv2

    gray = cv2.cvtColor(rgb, cv2.COLOR_RGB2GRAY)
    scale = max(gray.shape) / float(_DETECT_MAX_DIM)
    if scale > 1.0:
        small = cv2.resize(
            gray, (int(gray.shape[1] / scale), int(gray.shape[0] / scale)),
            interpolation=cv2.INTER_AREA)
        boxes = _detect_gray(small, cv2)
        if len(boxes) >= 2:
            return [
                (int(x1 * scale), int(y1 * scale),
                 min(int(x2 * scale + 1), gray.shape[1]),
                 min(int(y2 * scale + 1), gray.shape[0]))
                for (x1, y1, x2, y2) in boxes
            ]
    return _detect_gray(gray, cv2)


# only downscale genuinely large frames (phone photos): a TW invoice QR is
# roughly a quarter of the invoice width, and detectMulti needs ~2 px per
# module — below ~800 px frames the downscaled pass starts missing QRs and
# the full-res fallback makes detection *slower*, not faster (measured)
_DETECT_MAX_DIM = 800


_TLS = threading.local()


def _detector(cv2):
    # constructing cv2.QRCodeDetector costs ~14 ms on this box — reuse one
    # per thread (extract_batch scans from a thread pool; cv2 detectors are
    # not documented thread-safe, so no sharing across threads)
    det = getattr(_TLS, "qr_detector", None)
    if det is None:
        det = _TLS.qr_detector = cv2.QRCodeDetector()
    return det


def _detect_gray(gray, cv2) -> List[Tuple[int, int, int, int]]:
    boxes = []
    detector = _detector(cv2)
    try:
        ok, points = detector.detectMulti(gray)
    except cv2.error:
        ok, points = False, None
    if not ok or points is None:
        try:
            ok1, pts1 = detector.detect(gray)
            points = pts1[None] if ok1 and pts1 is not None else None
        except cv2.error:
            points = None
    if points is None:
        return boxes
    for quad in points:
        q = np.asarray(quad).reshape(-1, 2)
        x1, y1 = q.min(axis=0)
        x2, y2 = q.max(axis=0)
        if x2 > x1 and y2 > y1:
            boxes.append((int(x1), int(y1), int(x2), int(y2)))
    return boxes


def enhance_qr_region(rgb_crop: np.ndarray, upscale: int = 3) -> np.ndarray:
    """Contrast-equalize and upsample a QR crop (app_camera.py:351-365 behavior)."""
    import cv2

    gray = cv2.cvtColor(rgb_crop, cv2.COLOR_RGB2GRAY)
    gray = cv2.equalizeHist(gray)
    gray = cv2.resize(gray, None, fx=upscale, fy=upscale, interpolation=cv2.INTER_CUBIC)
    return cv2.cvtColor(gray, cv2.COLOR_GRAY2RGB)


def opencv_decode(rgb: np.ndarray) -> List[str]:
    """Decode backend built on cv2.QRCodeDetector (multi + single)."""
    import cv2

    gray = cv2.cvtColor(rgb, cv2.COLOR_RGB2GRAY) if rgb.ndim == 3 else rgb
    det = _detector(cv2)
    out: List[str] = []
    try:
        ok, texts, _, _ = det.detectAndDecodeMulti(gray)
        if ok:
            out.extend(t for t in texts if t)
    except cv2.error:
        pass
    if not out:
        try:
            text, _, _ = det.detectAndDecode(gray)
            if text:
                out.append(text)
        except cv2.error:
            pass
    return out


def native_decode(rgb: np.ndarray) -> List[str]:
    """Decode backend using the in-repo C++ decoder; empty list if unbuilt."""
    try:
        from twinvoice_tpu.qr.native import decode as _dec

        return _dec(rgb)
    except Exception:
        return []


def default_decoders() -> List[QrDecodeFn]:
    return [native_decode, opencv_decode]


class QrPipeline:
    """Full-image QR scan: detect regions → enhance → decode; fall back to an
    upscaled full-image pass when no region is found."""

    def __init__(self, decoders: Optional[Sequence[QrDecodeFn]] = None,
                 min_len: int = MIN_PAYLOAD_LEN, max_payloads: int = 2):
        """``max_payloads``: stop scanning further candidates once this many
        distinct payloads decoded — a TW e-invoice carries exactly two QRs
        (header + '**' continuation), so the full-frame / half-tile passes
        are pure cost once both regions read. 0 disables early stop."""
        self.decoders = list(decoders) if decoders is not None else default_decoders()
        self.min_len = min_len
        self.max_payloads = max_payloads

    def _decode_all(self, arr: np.ndarray) -> List[str]:
        out: List[str] = []
        for dec in self.decoders:
            try:
                out.extend(dec(arr))
            except Exception:
                continue
            if out:
                break  # first backend that reads anything wins
        return out

    def scan(self, image) -> List[str]:
        """``image``: PIL.Image or RGB ndarray → unique payloads.

        Scans detected regions, the full frame, and (because a TW invoice
        carries TWO side-by-side QRs that multi-detectors often half-miss)
        the left/right halves as separate tiles. Candidates are built
        LAZILY so the early stop skips the enhance/slice work too.

        A payload survives if it is ≥ min_len OR starts with ``**`` — the
        TW e-invoice *item* QR is frequently shorter than 20 chars and the
        reference's meta classifier treats any ``**`` string as the item
        QR (app_camera.py:118) even though its ZXing shell path drops
        short strings (app_camera.py:542); without this the early stop
        never fires and every scan pays the full-frame + half-tile passes.
        """
        import cv2

        rgb = np.asarray(image.convert("RGB") if hasattr(image, "convert") else image)

        def candidates():
            # 0.75×-downscaled gray FIRST: the native finder scan is
            # ~O(pixels) and the bulk host is single-core (nproc=1 on this
            # box), so the cheapest pass that can read a clean invoice
            # goes first — measured 12.4 ms vs 26.9 ms full-frame RGB with
            # both QRs still decoding (0.5× is past the ~2 px/module
            # floor and RETRIES make it slower, measured 29 ms). A miss
            # costs one cheap extra attempt; the full cascade follows.
            if max(rgb.shape[:2]) >= 420:
                gray = cv2.cvtColor(rgb, cv2.COLOR_RGB2GRAY)
                yield cv2.resize(gray, None, fx=0.75, fy=0.75,
                                 interpolation=cv2.INTER_AREA)
            # then detected-region crops: when the fast pass read one QR
            # but missed the other (marginal module pitch at 0.75×), a
            # full-res region crop decodes in ~2-5 ms, where the
            # full-frame pass on such frames burns 115-180 ms in
            # version/RS retries (measured) — so regions go FIRST.
            regions = detect_qr_regions(rgb)
            misses = []
            for (x1, y1, x2, y2) in regions:
                crop = rgb[y1:y2, x1:x2]
                n_before = len(found)
                yield crop
                if len(found) == n_before:
                    misses.append(crop)
            # full frame: the native decoder's own finder scan catches
            # QRs that cv2.detectMulti's locator misses entirely; the
            # detect → raw crop → enhanced crop cascade above handles the
            # common partial-miss case more cheaply.
            yield rgb
            for crop in misses:
                yield enhance_qr_region(crop)
            w = rgb.shape[1]
            yield rgb[:, : w // 2]
            yield rgb[:, w // 2 :]

        found: List[str] = []

        def absorb(arr):
            for txt in self._decode_all(arr):
                txt = txt.strip()
                if (len(txt) >= self.min_len or txt.startswith("**")) and (
                        txt not in found):
                    found.append(txt)

        def roles_satisfied():
            # ADVICE r3: a raw count lets one ≥20-char misdecode on the
            # full-frame pass halt scanning before the region/half-tile
            # passes that recover the real header QR. Early-stop only once
            # both expected invoice QR roles are actually covered: a
            # header-shaped payload (invoice no + parseable ROC date) and
            # a TEXT ("**") payload.
            from .parse import is_text_qr_payload, parse_header_qr

            inv_no, date = parse_header_qr(found)
            has_header = inv_no is not None and date is not None
            has_text = any(is_text_qr_payload(s) for s in found)
            return has_header and has_text

        for arr in candidates():
            absorb(arr)
            if (
                self.max_payloads
                and len(found) >= self.max_payloads
                and roles_satisfied()
            ):
                return found
        if not found:  # last resort: 2× upscale of the full frame
            absorb(cv2.resize(rgb, None, fx=2, fy=2, interpolation=cv2.INTER_LINEAR))
        return found
