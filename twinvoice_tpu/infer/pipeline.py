"""The fused inference engine.

Contrast with the reference (inference.py:50-129), which reloads the 124 MB
checkpoint from disk on *every* call, runs eager torch, and post-processes in
host numpy. Here the model is loaded ONCE, BN is folded into conv weights,
and preprocess→forward→sigmoid→threshold→bbox is a single jitted XLA graph;
only the final variable-size crop slice touches the host (XLA needs static
shapes; crops are arbitrary rectangles of the original photo).

Two modes:
- parity (fp32 + host PIL resize): masks match the torch reference bit-for-bit
  at the thresholds (BASELINE config 1)
- serving (bf16 + device resize): the throughput path (BASELINE config 2)
"""

from __future__ import annotations

from functools import partial
import numpy as np
import jax
import jax.numpy as jnp

from twinvoice_tpu import FIELDS
from twinvoice_tpu.config import InferConfig, UNetConfig
from twinvoice_tpu.models.unet import fold_unet, unet_apply_folded
from twinvoice_tpu.ops.image import resize_bilinear
from twinvoice_tpu.infer.postprocess import (
    bbox_from_logits_fast,
    probability_to_logit_thresholds,
    scale_and_pad_boxes,
)


class Segmenter:
    """Field segmenter holding a BN-folded U-Net and its compiled graphs."""

    def __init__(
        self,
        params,
        state,
        model_cfg: UNetConfig = UNetConfig(),
        cfg: InferConfig = InferConfig(),
        dtype=jnp.float32,
        int8_calib=None,
        int8_pallas=None,
        int8_head="xla",
        int8_wpack=False,
    ):
        """``int8_calib``: an iterable of uint8 (B,H,W,3) batches switches the
        forward to the int8 MXU path (infer/quant.py) — weights quantized
        per-channel, activation scales calibrated from these batches. The
        fp32/bf16 folded params are still built (parity surface).
        ``int8_pallas``: route the box-only (``return_masks=False``) path
        through the full-Pallas int8 forward (ops/qconv_pallas) regardless
        of ``int8_head``; None = auto (currently off — measured slower, see
        the note below). Prepacking assumes the serving batch of 128; other
        batch sizes trip the kernels' tile asserts. ``int8_wpack``
        (default False — measured SLOWER on v5e: 430 vs 480 img/s; the
        int8 conv emitter is not lane-limited, docs/PERFORMANCE.md r3
        geometry post-mortem): run the full-resolution stages
        W-phase-packed (infer/wpack), bit-exact vs the concat graph;
        "enc" packs only the encoder stage. ``int8_head``: "xla"
        (default — measured
        faster at batch 128: XLA fuses the 1×1 out-conv into the row/col
        max-reductions well, while the Pallas head's M=3 micro-GEMMs are
        latency-bound) or "pallas" (ops/pallas_head fused head)."""
        self.cfg = cfg
        self.model_cfg = model_cfg
        self.dtype = dtype
        self.folded = fold_unet(params, state, cfg=model_cfg, dtype=dtype)
        self._thr = jnp.asarray(cfg.thresholds, jnp.float32)
        self.qparams = None
        self.pallas_params = None
        if int8_calib is not None:
            from twinvoice_tpu.infer.quant import (
                prepack_pallas,
                quantize_unet,
                unet_apply_quantized,
            )

            folded32 = fold_unet(params, state, cfg=model_cfg)
            self.qparams = quantize_unet(folded32, int8_calib)
            self._q_apply = unet_apply_quantized
            # The full-Pallas int8 trunk (ops/qconv_pallas, frame-format
            # kernels) lowers on TPU but measured ~4× behind XLA
            # (docs/PERFORMANCE.md post-mortem), so it stays opt-in; the
            # serving default is the XLA int8 trunk (concat-form decoder)
            # with the XLA head (int8_head="xla", measured fastest at b128).
            if int8_pallas is None:
                int8_pallas = False
            if int8_pallas:
                # chunking follows the serving tile plan: grid from cfg,
                # batch 128 (the throughput batch; kernels assert on
                # mismatch with a clear message)
                self.pallas_params = prepack_pallas(
                    self.qparams, img_size=cfg.img_size
                )

        size = cfg.img_size

        logit_thr = probability_to_logit_thresholds(cfg.thresholds)

        q_apply = getattr(self, "_q_apply", None)
        quantized = self.qparams is not None
        use_pallas_trunk = self.pallas_params is not None
        use_pallas_head = int8_head == "pallas"
        use_wpack = bool(int8_wpack) and quantized
        wpack_mode = "enc" if int8_wpack == "enc" else "full"
        use_nhwc = int8_wpack == "nhwc"  # ops/nhwc_conv mega-kernel trunk
        if use_nhwc:
            # ADVICE r3: 'nhwc' only has an implementation for the box-only
            # (return_masks=False) path; mask requests and _run_from_raw
            # fall back to the XLA wpack trunk (mode='full'). Warn up front
            # so A/Bs of those paths don't silently measure the fallback.
            import warnings

            warnings.warn(
                "int8_wpack='nhwc' applies only to the box-only "
                "(return_masks=False) path; mask paths fall back to the "
                "XLA wpack trunk (mode='full')",
                stacklevel=2,
            )

        @partial(jax.jit, static_argnames=("return_masks",))
        def _run(folded, imgs_u8, orig_sizes, return_masks=True):
            """imgs_u8: (B, size, size, 3) uint8; orig_sizes: (B, 2) int32 (ow, oh).
            When quantized, ``folded`` is {"q": qparams[, "pq": packed]}."""
            if quantized:
                folded, pq = folded["q"], folded.get("pq")
            if quantized and not return_masks and (use_pallas_head
                                                   or use_pallas_trunk):
                # box-only throughput path: fused head — the 1×1 out-conv
                # and the row/col max-reductions run in one Pallas kernel
                # and the (B,S,S,3) logits tensor is never materialized.
                # With pallas_params the whole int8 trunk runs as Pallas
                # kernels too (ops/qconv_pallas); bias folds into thresholds.
                from twinvoice_tpu.infer.quant import (
                    unet_apply_quantized_pallas_rowcol_max,
                    unet_apply_quantized_rowcol_max,
                )
                from twinvoice_tpu.ops.pallas_head import bbox_from_rowcol_max

                if use_pallas_trunk:
                    row_max, col_max = unet_apply_quantized_pallas_rowcol_max(
                        folded, pq, imgs_u8
                    )
                else:
                    row_max, col_max = unet_apply_quantized_rowcol_max(
                        folded, imgs_u8
                    )
                thr_eff = logit_thr - folded["out"]["bias"].astype(jnp.float32)
                gboxes, valid = bbox_from_rowcol_max(row_max, col_max, thr_eff)
                boxes, ok = jax.vmap(
                    lambda gb, v, osz: scale_and_pad_boxes(
                        gb, v, osz, size, cfg.pad_frac
                    )
                )(gboxes, valid, orig_sizes)
                return None, boxes, ok
            if quantized and not return_masks and use_wpack:
                # box-only path on the W-phase-packed trunk (infer/wpack):
                # full-lane convs at full res, packed 1×1 head, packed
                # row/col max-reductions — logits never unpacked.
                from twinvoice_tpu.infer.wpack import (
                    unet_apply_quantized_nhwc_rowcol_max,
                    unet_apply_quantized_wpack_rowcol_max,
                )
                from twinvoice_tpu.ops.pallas_head import bbox_from_rowcol_max

                if use_nhwc:
                    row_max, col_max = unet_apply_quantized_nhwc_rowcol_max(
                        folded, imgs_u8
                    )
                else:
                    row_max, col_max = unet_apply_quantized_wpack_rowcol_max(
                        folded, imgs_u8, mode=wpack_mode
                    )
                thr_eff = logit_thr - folded["out"]["bias"].astype(jnp.float32)
                gboxes, valid = bbox_from_rowcol_max(row_max, col_max, thr_eff)
                boxes, ok = jax.vmap(
                    lambda gb, v, osz: scale_and_pad_boxes(
                        gb, v, osz, size, cfg.pad_frac
                    )
                )(gboxes, valid, orig_sizes)
                return None, boxes, ok
            if quantized:
                # bf16 logits on the box path when requested: halves the
                # largest fusion's HBM traffic; masks keep f32 logits
                ldt = (jnp.bfloat16
                       if (int8_head == "xla-bf16" and not return_masks)
                       else jnp.float32)
                if use_wpack:
                    from twinvoice_tpu.infer.wpack import (
                        unet_apply_quantized_wpack,
                    )

                    logits = unet_apply_quantized_wpack(
                        folded, imgs_u8, logits_dtype=ldt, mode=wpack_mode
                    )
                else:
                    logits = q_apply(folded, imgs_u8, logits_dtype=ldt)
            else:
                x = imgs_u8.astype(dtype) / jnp.asarray(255.0, dtype)
                logits = unet_apply_folded(folded, x)

            def post(lg, osz):
                # max-reduction bbox in logit space: identical decisions to
                # sigmoid+threshold, 3× less HBM traffic (see postprocess.py)
                gboxes, valid = bbox_from_logits_fast(lg, logit_thr)
                boxes, ok = scale_and_pad_boxes(gboxes, valid, osz, size, cfg.pad_frac)
                return boxes, ok

            boxes, ok = jax.vmap(post)(logits, orig_sizes)
            if return_masks:
                prob = jax.nn.sigmoid(logits.astype(jnp.float32))
                mask = prob > self._thr
            else:
                mask = None
            return mask, boxes, ok

        @jax.jit
        def _run_from_raw(folded, raw_u8, orig_sizes):
            """Device resize variant: raw_u8 (B, H, W, 3) uint8 any fixed H,W."""
            if quantized:
                folded = folded["q"]
            x = resize_bilinear(raw_u8.astype(jnp.float32), size, size)
            if quantized:
                xq8 = jnp.clip(jnp.round(x), 0, 255).astype(jnp.uint8)
                if use_wpack:
                    from twinvoice_tpu.infer.wpack import (
                        unet_apply_quantized_wpack,
                    )

                    logits = unet_apply_quantized_wpack(folded, xq8,
                                                        mode=wpack_mode)
                else:
                    logits = q_apply(folded, xq8)
            else:
                x = (x / 255.0).astype(dtype)
                logits = unet_apply_folded(folded, x)

            def post(lg, osz):
                gboxes, valid = bbox_from_logits_fast(lg, logit_thr)
                boxes, ok = scale_and_pad_boxes(gboxes, valid, osz, size, cfg.pad_frac)
                return boxes, ok

            boxes, ok = jax.vmap(post)(logits, orig_sizes)
            mask = jax.nn.sigmoid(logits.astype(jnp.float32)) > self._thr
            return mask, boxes, ok

        @partial(jax.jit, static_argnames=("return_masks",))
        def _run_gray(folded, gray_u8, orig_sizes, return_masks=True):
            """(B, S, S) uint8 luminance → same outputs as _run. The
            channel replication happens ON DEVICE so the host→device
            transfer is 3× smaller — on this relay-attached box the bulk
            path's upload is its bottleneck (docs/PERFORMANCE.md);
            measured mask agreement vs RGB is ≥99.95%."""
            return _run(folded, jnp.repeat(gray_u8[..., None], 3, axis=-1),
                        orig_sizes, return_masks=return_masks)

        self._run = _run
        self._run_gray = _run_gray
        self._run_from_raw = _run_from_raw
        # the pytree the jitted graphs consume: qparams (+ prepacked Pallas
        # weights) in int8 mode
        if quantized:
            self._serve_params = {"q": self.qparams}
            if use_pallas_trunk:
                self._serve_params["pq"] = self.pallas_params
        else:
            self._serve_params = self.folded

    # -- constructors ------------------------------------------------------

    @classmethod
    def from_pth(cls, path, model_cfg=UNetConfig(), cfg=InferConfig(), dtype=jnp.float32):
        from twinvoice_tpu.port import load_pth

        params, state = load_pth(path, model_cfg)
        return cls(params, state, model_cfg, cfg, dtype)

    @classmethod
    def from_checkpoint(cls, ckpt_dir, model_cfg=UNetConfig(), cfg=InferConfig(), dtype=jnp.float32):
        from twinvoice_tpu.train.checkpoint import restore_params

        params, state = restore_params(ckpt_dir, model_cfg)
        return cls(params, state, model_cfg, cfg, dtype)

    # -- batch API (throughput path) ---------------------------------------

    def segment_batch(self, imgs_u8, orig_sizes=None, *, pre_resized=True,
                      return_masks=True):
        """Batched device path.

        ``imgs_u8``: uint8 (B, H, W, 3); if ``pre_resized`` H=W=img_size.
        ``orig_sizes``: (B, 2) int32 (ow, oh); defaults to input size.
        Returns (mask (B,S,S,3) bool or None, boxes (B,3,4) int32,
        valid (B,3) bool). ``return_masks=False`` is the throughput path.
        """
        imgs_u8 = jnp.asarray(imgs_u8)
        if orig_sizes is None:
            b = imgs_u8.shape[0]
            orig_sizes = jnp.tile(
                jnp.asarray([[imgs_u8.shape[2], imgs_u8.shape[1]]], jnp.int32), (b, 1)
            )
        else:
            orig_sizes = jnp.asarray(orig_sizes, jnp.int32)
        if not pre_resized:
            return self._run_from_raw(self._serve_params, imgs_u8, orig_sizes)
        return self._run(self._serve_params, imgs_u8, orig_sizes, return_masks=return_masks)

    def segment_pil_batch(self, pil_images, *, return_masks=True,
                          gray_h2d=False, h2d_chunks=1):
        """Batched PIL path: ONE device call segments all images; crops are
        sliced per image on host. Returns a list of (masks, crops) pairs
        matching :meth:`segment_pil`'s contract (used by
        fusion.InvoiceExtractor.extract_batch).

        ``return_masks=False`` skips the mask fetch entirely: at batch 32
        the (B, S, S, 3) bool mask tensor is ~25 MB of device→host
        transfer that bulk extraction never reads (it only uses crops) —
        only the (B, 3, 4) boxes come back. Masks are then ``None``.

        ``gray_h2d=True`` uploads luminance and replicates to 3 channels
        on device — 3× fewer host→device bytes, mask agreement ≥99.95%
        (bulk-path default via FusionConfig.gray_h2d).

        ``h2d_chunks>1`` splits the batch and pipelines it: while chunk k
        computes on device, chunk k+1's host-side resize + H2D upload run
        on the host (dispatch is async; nothing is fetched until every
        chunk is in flight). This overlaps the relay upload — the r3 bulk
        diagnosis' remaining wall — with device compute, the serving-side
        analogue of the queue-depth-2 dispatch trick. Identical results to
        the one-shot path (pure batch split).
        """
        from twinvoice_tpu.utils.tracing import trace_span

        size = self.cfg.img_size
        run = self._run_gray if gray_h2d else self._run
        convert = "L" if gray_h2d else "RGB"

        try:  # bulk prep rides cv2: 3.6× faster than PIL on this 1-core
            import cv2  # host (54 vs 194 ms / 32 imgs), mean |Δ| ≈ 0.5 gray

            def prep(imgs):  # levels — below the gray-H2D deviation budget
                out = []
                for im in imgs:
                    arr = np.asarray(im.convert("RGB"))
                    if gray_h2d:
                        arr = cv2.cvtColor(arr, cv2.COLOR_RGB2GRAY)
                    out.append(cv2.resize(arr, (size, size),
                                          interpolation=cv2.INTER_AREA))
                return np.stack(out)
        except ImportError:

            def prep(imgs):
                return np.stack([
                    np.asarray(im.convert(convert).resize((size, size)),
                               np.uint8)
                    for im in imgs
                ])

        n = len(pil_images)
        if h2d_chunks > 1 and n >= 2 * h2d_chunks and not return_masks:
            bounds = np.linspace(0, n, h2d_chunks + 1).astype(int)
            pending = []
            for a, b in zip(bounds[:-1], bounds[1:]):
                chunk = pil_images[a:b]
                with trace_span("segment.prep"):
                    arrs = prep(chunk)  # overlaps prior chunks' device compute
                szs = np.asarray([im.size for im in chunk], np.int32)
                with trace_span("segment.h2d"):
                    darr = jnp.asarray(arrs)
                with trace_span("segment.dispatch"):
                    _, cboxes, cok = run(self._serve_params, darr,
                                         jnp.asarray(szs),
                                         return_masks=False)
                pending.append((cboxes, cok))
            mask = None
            with trace_span("segment.fetch"):
                boxes = np.concatenate([np.asarray(b) for b, _ in pending])
                ok = np.concatenate([np.asarray(o) for _, o in pending])
        else:
            with trace_span("segment.prep"):
                arrs = prep(pil_images)
            sizes = np.asarray([im.size for im in pil_images], np.int32)
            with trace_span("segment.h2d"):
                darr = jnp.asarray(arrs)
            with trace_span("segment.dispatch"):
                mask, boxes, ok = run(self._serve_params, darr,
                                      jnp.asarray(sizes),
                                      return_masks=return_masks)
            with trace_span("segment.fetch"):
                if return_masks:
                    mask = np.asarray(mask)
                boxes = np.asarray(boxes)
                ok = np.asarray(ok)

        out = []
        for bi, pil_img in enumerate(pil_images):
            masks = (
                {f: mask[bi, :, :, i] for i, f in enumerate(FIELDS)}
                if return_masks else None
            )
            crops = {}
            for i, f in enumerate(FIELDS):
                if not ok[bi, i]:
                    crops[f] = None
                    continue
                x1, y1, x2, y2 = (int(v) for v in boxes[bi, i])
                crop = pil_img.crop((x1, y1, x2, y2))
                carr = np.asarray(crop)
                if carr.size == 0 or carr.mean() < self.cfg.black_crop_mean:
                    crops[f] = None
                    continue
                crops[f] = crop
            out.append((masks, crops))
        return out

    # -- single-image PIL API (reference-parity surface) -------------------

    def segment_pil(self, pil_img):
        """Drop-in equivalent of the reference ``run_unet`` contract:
        returns ``(masks: dict[field, bool (S,S)], crops: dict[field, PIL|None])``.

        Resize is done on host with PIL to reproduce the reference's resize
        convention exactly (inference.py:63); the model + postprocess run as
        one jitted graph.
        """
        size = self.cfg.img_size
        ow, oh = pil_img.size
        # reference does resize twice (inference.py:63 then :35); idempotent
        small = pil_img.convert("RGB").resize((size, size))
        arr = np.asarray(small, np.uint8)[None]
        sizes = np.asarray([[ow, oh]], np.int32)
        mask, boxes, ok = self._run(self._serve_params, jnp.asarray(arr), jnp.asarray(sizes))
        mask = np.asarray(mask[0])
        boxes = np.asarray(boxes[0])
        ok = np.asarray(ok[0])

        masks = {f: mask[:, :, i] for i, f in enumerate(FIELDS)}
        crops = {}
        for i, f in enumerate(FIELDS):
            if not ok[i]:
                crops[f] = None
                continue
            x1, y1, x2, y2 = (int(v) for v in boxes[i])
            crop = pil_img.crop((x1, y1, x2, y2))
            carr = np.asarray(crop)
            if carr.size == 0 or carr.mean() < self.cfg.black_crop_mean:
                crops[f] = None  # all-black rejection (inference.py:122-124)
                continue
            crops[f] = crop
        return masks, crops
