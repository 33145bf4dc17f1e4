"""int8 post-training quantization for the BN-folded serving U-Net.

Why: round-1 tracing showed the interior convs already at ~98% of the
chip's bf16 peak (docs/PERFORMANCE.md) — the only remaining throughput
lever for the width-64 flagship is the MXU's int8 path (~2× bf16 peak on
v5e). This module quantizes the folded model (models/unet.fold_unet):

- weights: symmetric per-output-channel int8 (scale = absmax/127)
- activations: symmetric per-tensor int8 with scales calibrated from
  representative batches (abs-max over a fp32 forward's conv outputs)
- compute: int8×int8 convs with int32 accumulation; the dequantize →
  bias → ReLU → requantize epilogue is elementwise, so XLA fuses it into
  each conv
- the decoder keeps the concat-free split-conv form; the two partial
  convolutions are dequantized, summed in f32, then requantized
- the final 1×1 logit conv dequantizes to f32 (never quantized)

Quality must be re-validated per model via the perturbation gauntlet
(scripts/eval_gauntlet.py) before an int8 variant is promoted.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from twinvoice_tpu.ops.conv import conv1x1, conv3x3, conv_transpose2x2_serving, max_pool2  # noqa: F401  (serving fn used by the calibration mirror)

# input uint8 [0,255] → int8 [0,127] via >>1: scale maps back to the same
# normalized [0,1] domain the fp32 graph sees (x/255 ≈ q * 2/255)
INPUT_SCALE = 2.0 / 255.0


# ------------------------------------------------------------- calibration


def _absmax(x):
    return jnp.max(jnp.abs(x.astype(jnp.float32)))


def collect_activation_scales(folded, x_f32):
    """fp32 forward mirroring unet_apply_folded, recording each conv
    output's post-ReLU abs-max. Returns the scales pytree (host floats).

    Mirror kept in lockstep with models.unet.unet_apply_folded — both walk
    enc → bottleneck → (up, split-conv dec) with the same params tree.
    """
    scales = {"enc": [], "up": [], "dec": []}
    skips = []
    h = x_f32
    for p in folded["enc"]:
        h = jax.nn.relu(conv3x3(h, p["conv1"]))
        s1 = _absmax(h)
        h = jax.nn.relu(conv3x3(h, p["conv2"]))
        scales["enc"].append({"c1": s1, "c2": _absmax(h)})
        skips.append(h)
        h = max_pool2(h)
    h = jax.nn.relu(conv3x3(h, folded["bottleneck"]["conv1"]))
    s1 = _absmax(h)
    h = jax.nn.relu(conv3x3(h, folded["bottleneck"]["conv2"]))
    scales["bottleneck"] = {"c1": s1, "c2": _absmax(h)}
    for up_p, dec_p, skip in zip(folded["up"], folded["dec"], reversed(skips)):
        h = conv_transpose2x2_serving(h, up_p)
        scales["up"].append(_absmax(h))
        c = h.shape[-1]
        k1 = dec_p["conv1"]["kernel"]
        part_up = conv3x3(h, {"kernel": k1[:, :, :c], "bias": dec_p["conv1"]["bias"]})
        part_skip = conv3x3(skip, {"kernel": k1[:, :, c:]})
        h = jax.nn.relu(part_up + part_skip)
        s1 = _absmax(h)
        h = jax.nn.relu(conv3x3(h, dec_p["conv2"]))
        scales["dec"].append({"c1": s1, "c2": _absmax(h)})
    return scales


def _merge_max(a, b):
    return jax.tree.map(lambda x, y: np.maximum(np.asarray(x), np.asarray(y)), a, b)


def calibrate(folded, batches):
    """Run scale collection over several uint8 batches; keep the max."""
    collect = jax.jit(lambda f, x: collect_activation_scales(f, x))
    acc = None
    for imgs_u8 in batches:
        x = jnp.asarray(imgs_u8).astype(jnp.float32) / 255.0
        s = jax.device_get(collect(folded, x))
        acc = s if acc is None else _merge_max(acc, s)
    # guard against dead channels / zero activations
    return jax.tree.map(lambda v: float(max(v, 1e-6)), acc)


# ------------------------------------------------------------ quantization


def _quant_weights(conv_p):
    """f32 conv params → (int8 kernel, per-cout scale, f32 bias)."""
    k = np.asarray(conv_p["kernel"], np.float32)
    sw = np.maximum(np.abs(k).reshape(-1, k.shape[-1]).max(0), 1e-8) / 127.0
    kq = np.clip(np.round(k / sw), -127, 127).astype(np.int8)
    out = {"kernel": jnp.asarray(kq), "w_scale": jnp.asarray(sw, jnp.float32)}
    if "bias" in conv_p and conv_p["bias"] is not None:
        out["bias"] = jnp.asarray(np.asarray(conv_p["bias"], np.float32))
    return out


def quantize_unet(folded, calib_batches):
    """→ qparams pytree for :func:`unet_apply_quantized`."""
    scales = calibrate(folded, calib_batches)
    q = {
        "enc": [
            {"conv1": _quant_weights(p["conv1"]), "conv2": _quant_weights(p["conv2"]),
             "s1": scales["enc"][i]["c1"], "s2": scales["enc"][i]["c2"]}
            for i, p in enumerate(folded["enc"])
        ],
        "bottleneck": {
            "conv1": _quant_weights(folded["bottleneck"]["conv1"]),
            "conv2": _quant_weights(folded["bottleneck"]["conv2"]),
            "s1": scales["bottleneck"]["c1"], "s2": scales["bottleneck"]["c2"],
        },
        "up": [
            {**_quant_weights(p), "s_out": scales["up"][i]}
            for i, p in enumerate(folded["up"])
        ],
        "dec": [
            {"conv1": _quant_weights(p["conv1"]), "conv2": _quant_weights(p["conv2"]),
             "s1": scales["dec"][i]["c1"], "s2": scales["dec"][i]["c2"]}
            for i, p in enumerate(folded["dec"])
        ],
        "out": {
            "kernel": jnp.asarray(np.asarray(folded["out"]["kernel"], np.float32)),
            "bias": jnp.asarray(np.asarray(folded["out"]["bias"], np.float32)),
        },
    }
    # Harmonize each skip's requant scale with its paired upsample output so
    # the decoder conv1 sees ONE input scale. This makes the concat form of
    # the decoder (one 2C-in conv; XLA fuses the whole epilogue, no s32 HBM
    # round-trip) bit-identical to the split form: with s_up == s_skip,
    # (part_up·s + part_skip·s)·w = s·conv(concat). max() only widens a
    # scale, so nothing clips; one side quantizes ≤1 bit coarser.
    for j, uq in enumerate(q["up"]):
        i = len(q["enc"]) - 1 - j
        common = max(float(q["enc"][i]["s2"]), float(uq["s_out"]))
        q["enc"][i]["s2"] = common
        uq["s_out"] = common
    return q


# --------------------------------------------------------------- inference


def _requant(y_f32, s_out):
    """f32 → int8 at scale ``s_out/127`` (post-ReLU, so [0, 127])."""
    return jnp.clip(jnp.round(y_f32 * (127.0 / s_out)), 0, 127).astype(jnp.int8)


def _qconv(xq, s_in, qp, conv_fn):
    """int8 conv → f32: conv_int32 * (s_in * w_scale) + bias."""
    y = conv_fn(xq, {"kernel": qp["kernel"], "bias": None})
    y = y.astype(jnp.float32) * (s_in * qp["w_scale"])
    if "bias" in qp:
        y = y + qp["bias"]
    return y


def _q_double_conv(q, xq, s_in):
    s1 = q["s1"] / 127.0
    h = _requant(jax.nn.relu(_qconv(xq, s_in, q["conv1"], _conv3x3_i8)), q["s1"])
    h = jax.nn.relu(_qconv(h, s1, q["conv2"], _conv3x3_i8))
    s2 = q["s2"] / 127.0
    return _requant(h, q["s2"]), s2


def _conv3x3_i8(x, p):
    from jax import lax

    return lax.conv_general_dilated(
        x, p["kernel"], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )


def _conv_transpose2x2_i8(x, kernel):
    """int8 2×2 stride-2 transpose conv, int32 accumulation (over Cin).
    Same flip convention as ops.conv.conv_transpose2x2_serving."""
    from jax import lax

    return lax.conv_transpose(
        x, kernel[::-1, ::-1], strides=(2, 2), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )


def unet_apply_quantized_features(q, imgs_u8, concat=True):
    """uint8 (N,H,W,3) images → (final decoder activations int8 (N,H,W,C),
    their dequant scale). The int8 trunk shared by the logits path and the
    Pallas fused-head box path (ops/pallas_head).

    ``concat`` (static) selects the decoder-conv1 formulation. The scales
    are harmonized at quantize time (s_up == s_skip), so both forms compute
    the SAME s32 sums and the outputs are bit-identical:
    - True (serving default): concatenate the two int8 inputs and run ONE
      2C-in conv — XLA fuses dequant→bias→ReLU→requant into the conv's
      epilogue, and no s32 tensor ever reaches HBM (the r1 trace showed the
      split form materializing 4 B/elem partial sums, ~38 ms/batch-128 at
      full res — docs/PERFORMANCE.md).
    - False: the split two-conv form (kept for the Pallas trunk kernels and
      their correctness tests)."""
    xq = (imgs_u8 >> 1).astype(jnp.int8)  # [0,127], scale 2/255 in [0,1] units
    s = INPUT_SCALE
    skips = []
    h = xq
    for lq in q["enc"]:
        h, s = _q_double_conv(lq, h, s)
        skips.append((h, s))
        h = max_pool2(h)
    h, s = _q_double_conv(q["bottleneck"], h, s)
    for up_q, dec_q, (skip, s_skip) in zip(q["up"], q["dec"], reversed(skips)):
        up = _conv_transpose2x2_i8(h, up_q["kernel"])
        up = up.astype(jnp.float32) * (s * up_q["w_scale"])
        if "bias" in up_q:
            up = up + up_q["bias"]
        # transpose-conv output is NOT ReLU'd in the reference graph, so it
        # requantizes symmetrically to [-127, 127]
        upq = jnp.clip(
            jnp.round(up * (127.0 / up_q["s_out"])), -127, 127
        ).astype(jnp.int8)
        s_up = up_q["s_out"] / 127.0
        k1 = dec_q["conv1"]["kernel"]
        w1 = dec_q["conv1"]["w_scale"]
        if concat:
            # s_up == s_skip by quantize-time harmonization
            hcat = jnp.concatenate([upq, skip], axis=-1)
            part = _conv3x3_i8(hcat, {"kernel": k1}).astype(jnp.float32)
            y = part * s_up * w1 + dec_q["conv1"]["bias"]
        else:
            c = upq.shape[-1]
            part_up = _conv3x3_i8(upq, {"kernel": k1[:, :, :c]}).astype(jnp.float32)
            part_skip = _conv3x3_i8(skip, {"kernel": k1[:, :, c:]}).astype(jnp.float32)
            y = (part_up * s_up + part_skip * s_skip) * w1 + dec_q["conv1"]["bias"]
        h = _requant(jax.nn.relu(y), dec_q["s1"])
        s1 = dec_q["s1"] / 127.0
        y2 = jax.nn.relu(_qconv(h, s1, dec_q["conv2"], _conv3x3_i8))
        h = _requant(y2, dec_q["s2"])
        s = dec_q["s2"] / 127.0
    return h, s


def unet_apply_quantized(q, imgs_u8, concat=True, logits_dtype=jnp.float32):
    """uint8 (N,H,W,3) images → logits, int8 MXU end to end.

    ``logits_dtype=jnp.bfloat16`` halves the logits tensor's HBM traffic —
    the single largest fusion in the box path (402 MB f32 at batch 128);
    int8 activations are exact in bf16 and the bbox threshold decisions sit
    far above bf16 resolution (gauntlet-verified). f32 remains the default
    (and the CPU test path: the CPU backend cannot dot bf16)."""
    h, s = unet_apply_quantized_features(q, imgs_u8, concat=concat)
    hf = h.astype(logits_dtype) * jnp.asarray(s, logits_dtype)
    out = {"kernel": q["out"]["kernel"].astype(logits_dtype),
           "bias": q["out"]["bias"].astype(logits_dtype)}
    return conv1x1(hf, out)


def prepack_pallas(q, img_size=512, batch=128):
    """qparams → prepacked GEMM-layout weights for the Pallas frame forward
    (ops/qconv_pallas). Done once at Segmenter build time.

    ``img_size``/``batch`` must match the serving shapes: the Cin chunking
    baked into each packed weight follows the same per-layer tile plan the
    apply computes from the live tensor shapes (the kernels assert on
    mismatch)."""
    from twinvoice_tpu.ops import qconv_pallas as QP

    def cc_for(h, cin, w, cout, two=False):
        return QP._plan_tiles(h, cin, w, batch, cout, two_inputs=two)[2]

    pq = {"enc": [], "dec": [], "up": []}
    hw = img_size
    for i, lq in enumerate(q["enc"]):
        k1 = np.asarray(lq["conv1"]["kernel"])
        k2 = np.asarray(lq["conv2"]["kernel"])
        entry = {"w2": QP.pack_w3x3(
            k2, cc_for(hw, k2.shape[2], hw, k2.shape[3]))}
        if i > 0:  # enc0 conv1 is the XLA stem
            entry["w1"] = QP.pack_w3x3(
                k1, cc_for(hw, k1.shape[2], hw, k1.shape[3]))
        pq["enc"].append(entry)
        hw //= 2
    kb1 = np.asarray(q["bottleneck"]["conv1"]["kernel"])
    kb2 = np.asarray(q["bottleneck"]["conv2"]["kernel"])
    pq["bottleneck"] = {
        "w1": QP.pack_w3x3(kb1, cc_for(hw, kb1.shape[2], hw, kb1.shape[3])),
        "w2": QP.pack_w3x3(kb2, cc_for(hw, kb2.shape[2], hw, kb2.shape[3])),
    }
    for uq, dq in zip(q["up"], q["dec"]):
        hw *= 2
        pq["up"].append(QP.pack_wup(uq["kernel"]))
        k1 = np.asarray(dq["conv1"]["kernel"])
        k2 = np.asarray(dq["conv2"]["kernel"])
        c = k1.shape[2] // 2
        cc1 = cc_for(hw, c, hw, k1.shape[3], two=True)
        pq["dec"].append({
            "w1_up": QP.pack_w3x3(k1[:, :, :c], cc1),
            "w1_skip": QP.pack_w3x3(k1[:, :, c:], cc1),
            "w2": QP.pack_w3x3(k2, cc_for(hw, k2.shape[2], hw, k2.shape[3])),
        })
    return pq


def unet_apply_quantized_pallas_rowcol_max(q, pq, imgs_u8):
    """Pallas-trunk int8 forward: every conv/pool/upsample after the stem is
    an ops/qconv_pallas frame kernel — no s32 tensor ever reaches HBM; the
    1×1 logit head runs as an XLA einsum on the frame (a Pallas head was
    measured latency-bound, docs/PERFORMANCE.md).

    Returns (row_max (N,H,3), col_max (N,W,3)) f32 *bias-free* logit maxima;
    callers fold ``q["out"]["bias"]`` into their thresholds.
    """
    from jax import lax

    from twinvoice_tpu.ops import qconv_pallas as QP

    # Stem: XLA conv with an HCWN output spec — the layout change rides the
    # conv's output write instead of a separate transpose pass; the
    # dequant→ReLU→requant epilogue fuses into it as usual.
    xq = (imgs_u8 >> 1).astype(jnp.int8)
    st = q["enc"][0]["conv1"]
    y = lax.conv_general_dilated(
        xq, st["kernel"], (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "HCWN"),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    y = y * (INPUT_SCALE * st["w_scale"]).reshape(1, -1, 1, 1)
    y = jax.nn.relu(y + st["bias"].reshape(1, -1, 1, 1))
    s1 = q["enc"][0]["s1"]
    h = jnp.clip(jnp.round(y * (127.0 / s1)), 0, 127).astype(jnp.int8)
    h = QP.to_frame(h)
    s = s1 / 127.0

    skips = []
    for i, (lq, pl_) in enumerate(zip(q["enc"], pq["enc"])):
        if i > 0:
            c1 = lq["conv1"]
            h = QP.qconv3x3_requant(
                h, pl_["w1"], s * c1["w_scale"], c1["bias"], lq["s1"])
            s = lq["s1"] / 127.0
        c2 = lq["conv2"]
        h = QP.qconv3x3_requant(
            h, pl_["w2"], s * c2["w_scale"], c2["bias"], lq["s2"])
        s = lq["s2"] / 127.0
        skips.append((h, s))
        h = QP.max_pool2_hcwn(h)

    bq, bp = q["bottleneck"], pq["bottleneck"]
    h = QP.qconv3x3_requant(
        h, bp["w1"], s * bq["conv1"]["w_scale"], bq["conv1"]["bias"], bq["s1"])
    s = bq["s1"] / 127.0
    h = QP.qconv3x3_requant(
        h, bp["w2"], s * bq["conv2"]["w_scale"], bq["conv2"]["bias"], bq["s2"])
    s = bq["s2"] / 127.0

    for uq, up_w, dq, dp, (skip, s_skip) in zip(
            q["up"], pq["up"], q["dec"], pq["dec"], reversed(skips)):
        h = QP.qupsample2x2_requant(
            h, up_w, s * uq["w_scale"],
            uq.get("bias", jnp.zeros(up_w.shape[2], jnp.float32)),
            uq["s_out"])
        s_up = uq["s_out"] / 127.0
        # s_up == s_skip (harmonized at quantize time) and the per-cout
        # weight scale spans the whole conv1 kernel, so both halves share
        # one dequant factor and can accumulate in one s32 scratch.
        c1 = dq["conv1"]
        h = QP.qconv3x3_split_requant(
            h, skip, dp["w1_up"], dp["w1_skip"],
            s_up * c1["w_scale"], c1["bias"], dq["s1"])
        s = dq["s1"] / 127.0
        c2 = dq["conv2"]
        h = QP.qconv3x3_requant(
            h, dp["w2"], s * c2["w_scale"], c2["bias"], dq["s2"])
        s = dq["s2"] / 127.0

    return QP.head_rowcol_max_frame(h, q["out"]["kernel"][0, 0],
                                    jnp.float32(s))


def unet_apply_quantized_rowcol_max(q, imgs_u8, interpret=None, concat=True):
    """uint8 images → (row_max (N,H,3), col_max (N,W,3)) of the *bias-free*
    logits via the Pallas fused head (never materializes the logits tensor).
    Callers fold ``q['out']['bias']`` into their logit thresholds."""
    from twinvoice_tpu.ops.pallas_head import head_rowcol_max

    h, s = unet_apply_quantized_features(q, imgs_u8, concat=concat)
    w2d = q["out"]["kernel"][0, 0]  # (Cin, 3)
    return head_rowcol_max(h, w2d, jnp.float32(s), interpret=interpret)
