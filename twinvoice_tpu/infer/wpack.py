"""W-phase-packed int8 convolutions for the full-resolution U-Net stages.

The round-2 trace (docs/PERFORMANCE.md) showed the w64 flagship's 512²
stages stuck at ~28% of int8 MXU peak while the interior ≥128-channel
stages run near peak: a conv with Cout=64 fills only half the MXU's 128
output lanes, and no Mosaic kernel could beat XLA's emitter at its own
layout game (the measured dead-end map in the Pallas post-mortem).

This module fixes the *GEMM geometry* instead, inside XLA: two adjacent
output columns are packed into the channel dim, so every full-res conv
becomes a 128-out-channel conv.

- pack-out (unpacked input): a 3×3 stride-1 conv with Cout=64 becomes a
  3×4 stride-(1,2) conv with Cout=128 — output column pair (2p, 2p+1)
  reads input columns 2p-1..2p+2, a width-4 window. The packed kernel is
  the original kernel placed at two offsets with zero-padded taps:
  9/12 taps live per output ⇒ 1.33× FLOPs at (ideally) 2× the lane
  utilization.
- packed-in/packed-out: when the input is already packed (B,H,W/2,2C), a
  width-3 window over column *pairs* covers the needed 4 columns out of
  6 ⇒ 2× FLOPs, still a net win at half-lane widths and it avoids any
  relayout copy between packed stages.
- the 2×2 stride-2 transpose conv packs for free: each input column
  produces exactly one output pair, so the packed form only dilates H
  (same matmul trick as ops/conv.conv_transpose2x2, H-only interleave).
- max-pool consumes a packed tensor directly: the W-halving is an
  elementwise max of the two phase lane-groups, and the result is the
  next stage's *unpacked* input — no relayout anywhere in the graph.

Every zero tap contributes exactly 0 to the int32 accumulator, so all
packed forms compute the SAME s32 sums as the originals — bit-exactness
is pinned in tests/unit/test_wpack.py.

Reference parity: these compute the same convolutions as the reference's
full-res DoubleConvs (unet_model.py:29-32, 46-49); the packing is a pure
serving-graph transformation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from twinvoice_tpu.infer.quant import INPUT_SCALE, _conv3x3_i8, _qconv, _q_double_conv, _requant
from twinvoice_tpu.ops.conv import conv1x1, max_pool2


# ------------------------------------------------------- kernel packing


def pack_kernel_out(k):
    """(3,3,Cin,Co) → (3,4,Cin,2Co) for the stride-(1,2) pack-out conv.

    out[n,h,p,do*Co+o] = conv3x3(x)[n,h,2p+do,o]; with padding (1,1) the
    width-4 window at output pair p starts at input column 2p-1, so the
    original tap kw sits at kx=kw (phase 0) / kx=kw+1 (phase 1)."""
    kh, kw, ci, co = k.shape
    assert (kh, kw) == (3, 3), k.shape
    kp = jnp.zeros((3, 4, ci, 2 * co), k.dtype)
    kp = kp.at[:, 0:3, :, :co].set(k)
    kp = kp.at[:, 1:4, :, co:].set(k)
    return kp


def pack_kernel_in_out(blocks):
    """Packed-in/packed-out kernel from per-source-blocks.

    ``blocks``: list of (3,3,Ci,Co) kernels, one per packed input tensor
    (concatenated lane-wise in order: [src0_ph0|src0_ph1|src1_ph0|...]).
    Returns (3,3,ΣCi*2, 2Co).

    Derivation (per source, per output phase do): output column 2p+do
    needs input columns 2p+do-1..2p+do+1; in pair coordinates with a
    width-3 window starting at pair p-1 (padding 1), original tap kw maps
    to (pair-tap pp, phase dj):
      do=0: kw0→(0,1)  kw1→(1,0)  kw2→(1,1)
      do=1: kw0→(1,0)  kw1→(1,1)  kw2→(2,0)
    """
    co = blocks[0].shape[3]
    ci_tot = sum(b.shape[2] for b in blocks)
    kp = jnp.zeros((3, 3, 2 * ci_tot, 2 * co), blocks[0].dtype)
    ofs = 0
    for k in blocks:
        ci = k.shape[2]
        lo, hi = ofs, ofs + ci          # phase-0 / phase-1 lane groups
        # do = 0
        kp = kp.at[:, 0, hi:hi + ci, :co].set(k[:, 0])
        kp = kp.at[:, 1, lo:lo + ci, :co].set(k[:, 1])
        kp = kp.at[:, 1, hi:hi + ci, :co].set(k[:, 2])
        # do = 1
        kp = kp.at[:, 1, lo:lo + ci, co:].set(k[:, 0])
        kp = kp.at[:, 1, hi:hi + ci, co:].set(k[:, 1])
        kp = kp.at[:, 2, lo:lo + ci, co:].set(k[:, 2])
        ofs += 2 * ci
    return kp


def tile2(v):
    """Per-Cout vectors (scale/bias) → their packed-2-phase form."""
    return jnp.concatenate([v, v])


# ------------------------------------------------------------ conv forms


def conv3x3_pack_out_i8(x, kp):
    """int8 (B,H,W,C) × packed (3,4,C,2Co) → int32 (B,H,W/2,2Co)."""
    return lax.conv_general_dilated(
        x, kp, (1, 2), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )


def conv3x3_packed_i8(t, kp):
    """packed int8 (B,H,P,2C) × (3,3,2C,2Co) → int32 (B,H,P,2Co)."""
    return lax.conv_general_dilated(
        t, kp, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )


def conv_transpose2x2_pack_out_i8(x, k):
    """int8 (B,H,W,C) × (2,2,C,Co) → packed int32 (B,2H,W,2Co).

    Same semantics as ops/conv.conv_transpose2x2 (``out[n,2i+a,2j+b,o] =
    Σ_c x·K[a,b,c,o]``) with the W-interleave replaced by the phase dim:
    packed[n,2i+a,j,b*Co+o] — i.e. a stride-(2,1) transpose conv whose
    width tap rides in the output channels. Expressed via
    ``lax.conv_transpose`` (not a matmul+transpose) so XLA fuses the
    dequant→requant epilogue into the conv and the s32 output (8.6 GB at
    b128 full-res!) never reaches HBM — the matmul form OOM'd the chip."""
    kh, kw, ci, co = k.shape
    assert (kh, kw) == (2, 2) and ci == x.shape[3], (k.shape, x.shape)
    # kp[a, 0, c, b*Co+o] = K[a, b, c, o]; same H-flip convention as
    # quant._conv_transpose2x2_i8 (W flip is a no-op at width 1)
    kp = jnp.transpose(k, (0, 2, 1, 3)).reshape(kh, 1, ci, kw * co)
    return lax.conv_transpose(
        x, kp[::-1], strides=(2, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )


def max_pool2_packed(t):
    """packed (B,2I,P,2C) → UNPACKED (B,I,P,C): 2×2 max-pool whose column
    pairs are exactly the phase lane-groups."""
    c = t.shape[-1] // 2
    m = jnp.maximum(t[..., :c], t[..., c:])         # W-halving
    return jnp.maximum(m[:, 0::2], m[:, 1::2])      # H-halving


def unpack(t):
    """packed (B,H,P,2C) → (B,H,2P,C); a plain reshape (the phase dim is
    adjacent to the channel dim in memory)."""
    b, h, p, c2 = t.shape
    return t.reshape(b, h, 2 * p, c2 // 2)


# ------------------------------------------------------- the packed trunk


def unet_apply_quantized_features_wpack(q, imgs_u8, mode="full"):
    """Packed-full-res variant of quant.unet_apply_quantized_features
    (kept in lockstep — bit-exactness pinned in tests/unit/test_wpack.py).

    Only the full-resolution stages change:
    - enc0 conv2 runs pack-out (1.33× FLOPs, full lanes); its packed
      output IS the skip and feeds max-pool directly (which unpacks free)
    - the last up-conv packs for free; the last decoder DoubleConv runs
      packed-in/packed-out (2× FLOPs, full lanes, zero relayouts)
    Returns (packed final activations int8 (B,H,W/2,2C), dequant scale).

    ``mode``: "full" packs encoder+decoder as above; "enc" packs only
    enc0 conv2 and unpacks the skip with a reshape (one int8 relayout)
    so the decoder runs the original concat form — the A/B isolating the
    stride-(1,2) pack-out conv from the 2×-FLOP packed-in decoder.
    """
    xq = (imgs_u8 >> 1).astype(jnp.int8)
    s = INPUT_SCALE
    skips = []

    # ---- enc0: conv1 unpacked (3→C, cheap), conv2 pack-out
    e0 = q["enc"][0]
    h = _requant(jax.nn.relu(_qconv(xq, s, e0["conv1"], _conv3x3_i8)), e0["s1"])
    s = e0["s1"] / 127.0
    c2 = e0["conv2"]
    y = conv3x3_pack_out_i8(h, pack_kernel_out(c2["kernel"])).astype(jnp.float32)
    y = y * (s * tile2(c2["w_scale"])) + tile2(c2["bias"])
    hp = _requant(jax.nn.relu(y), e0["s2"])          # packed (B,H,W/2,2C)
    s = e0["s2"] / 127.0
    skips.append((hp, s))
    h = max_pool2_packed(hp)                          # unpacked, half-res

    # ---- interior: unchanged int8 graph
    for lq in q["enc"][1:]:
        h, s = _q_double_conv(lq, h, s)
        skips.append((h, s))
        h = max_pool2(h)
    h, s = _q_double_conv(q["bottleneck"], h, s)

    last = len(q["dec"]) - 1
    if mode == "enc":
        # unpack the packed skip once; run the whole decoder in the
        # original concat form and re-pack only the returned features
        hp0, s0 = skips[0]
        skips[0] = (unpack(hp0), s0)
    for j, (up_q, dec_q) in enumerate(zip(q["up"], q["dec"])):
        skip, s_skip = skips[len(skips) - 1 - j]
        if j < last or mode == "enc":
            # interior decoder stage: the concat-form path from quant.py
            up = jnp.asarray(
                lax.conv_transpose(
                    h, up_q["kernel"][::-1, ::-1], strides=(2, 2),
                    padding="VALID",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.int32,
                )
            ).astype(jnp.float32) * (s * up_q["w_scale"])
            if "bias" in up_q:
                up = up + up_q["bias"]
            upq = jnp.clip(
                jnp.round(up * (127.0 / up_q["s_out"])), -127, 127
            ).astype(jnp.int8)
            s_up = up_q["s_out"] / 127.0
            k1 = dec_q["conv1"]
            hcat = jnp.concatenate([upq, skip], axis=-1)
            part = _conv3x3_i8(hcat, {"kernel": k1["kernel"]}).astype(jnp.float32)
            y = part * s_up * k1["w_scale"] + k1["bias"]
            h = _requant(jax.nn.relu(y), dec_q["s1"])
            s1 = dec_q["s1"] / 127.0
            y2 = jax.nn.relu(_qconv(h, s1, dec_q["conv2"], _conv3x3_i8))
            h = _requant(y2, dec_q["s2"])
            s = dec_q["s2"] / 127.0
        else:
            # ---- full-res decoder stage, packed end-to-end
            up = conv_transpose2x2_pack_out_i8(h, up_q["kernel"]).astype(
                jnp.float32
            ) * (s * tile2(up_q["w_scale"]))
            if "bias" in up_q:
                up = up + tile2(up_q["bias"])
            upq = jnp.clip(
                jnp.round(up * (127.0 / up_q["s_out"])), -127, 127
            ).astype(jnp.int8)                        # packed (B,H,W/2,2C)
            s_up = up_q["s_out"] / 127.0              # == s_skip (harmonized)
            k1 = dec_q["conv1"]["kernel"]
            c = up_q["kernel"].shape[3]
            kp1 = pack_kernel_in_out([k1[:, :, :c], k1[:, :, c:]])
            tcat = jnp.concatenate([upq, skip], axis=-1)
            y = conv3x3_packed_i8(tcat, kp1).astype(jnp.float32)
            # multiply order mirrors quant.py's concat branch exactly
            # (part * s_up * w_scale) so the f32 epilogue is bit-identical
            y = y * s_up * tile2(dec_q["conv1"]["w_scale"])
            y = y + tile2(dec_q["conv1"]["bias"])
            hp = _requant(jax.nn.relu(y), dec_q["s1"])
            s1 = dec_q["s1"] / 127.0
            kp2 = pack_kernel_in_out([dec_q["conv2"]["kernel"]])
            y2 = conv3x3_packed_i8(hp, kp2).astype(jnp.float32)
            y2 = y2 * (s1 * tile2(dec_q["conv2"]["w_scale"]))
            y2 = y2 + tile2(dec_q["conv2"]["bias"])
            hp = _requant(jax.nn.relu(y2), dec_q["s2"])
            s = dec_q["s2"] / 127.0
            return hp, s
    assert mode == "enc", "decoder must end at full resolution"
    return h, s  # enc mode: UNPACKED final activations


def unet_apply_quantized_wpack(q, imgs_u8, logits_dtype=jnp.float32,
                               mode="full"):
    """uint8 images → logits via the packed trunk (bit-exact vs the concat
    graph, pinned). The head unpacks with a reshape and runs the same 1×1
    conv as quant.unet_apply_quantized."""
    hp, s = unet_apply_quantized_features_wpack(q, imgs_u8, mode=mode)
    if mode == "enc":
        hf = hp.astype(logits_dtype) * jnp.asarray(s, logits_dtype)
    else:
        hf = unpack(hp).astype(logits_dtype) * jnp.asarray(s, logits_dtype)
    out = {"kernel": q["out"]["kernel"].astype(logits_dtype),
           "bias": q["out"]["bias"].astype(logits_dtype)}
    return conv1x1(hf, out)


def unet_apply_quantized_wpack_rowcol_max(q, imgs_u8, logits_dtype=jnp.float32,
                                          mode="full"):
    """Box-only path on the packed trunk: the 1×1 head runs packed
    ((2C,6) block-diagonal kernel) and the bbox row/col max-reductions
    consume the packed logits directly — only the tiny reduced tensors are
    ever unpacked. Returns *bias-free* (row_max (B,H,3), col_max (B,W,3));
    callers fold q['out']['bias'] into their thresholds (same contract as
    quant.unet_apply_quantized_rowcol_max)."""
    hp, s = unet_apply_quantized_features_wpack(q, imgs_u8, mode=mode)
    if mode == "enc":
        # unpacked trunk output: the old head/reduction shapes
        hf = hp.astype(logits_dtype) * jnp.asarray(s, logits_dtype)
        lg = conv1x1(hf, {"kernel": q["out"]["kernel"]}).astype(jnp.float32)
        return jnp.max(lg, axis=2), jnp.max(lg, axis=1)
    w = q["out"]["kernel"][0, 0]                       # (C, 3)
    c, co = w.shape
    wp = jnp.zeros((2 * c, 2 * co), jnp.float32)
    wp = wp.at[:c, :co].set(w)
    wp = wp.at[c:, co:].set(w)
    # same astype*scale → 1×1-conv shape XLA is known to fuse (the f32
    # activations never materialize); a dot_general here OOM'd at b128
    hf = hp.astype(logits_dtype) * jnp.asarray(s, logits_dtype)
    lp = conv1x1(hf, {"kernel": wp[None, None]}).astype(jnp.float32)
    # (B, H, P, 6)
    rm6 = jnp.max(lp, axis=2)                          # (B, H, 6)
    row_max = jnp.maximum(rm6[..., :co], rm6[..., co:])
    cm6 = jnp.max(lp, axis=1)                          # (B, P, 6)
    b, p = cm6.shape[0], cm6.shape[1]
    col_max = cm6.reshape(b, 2 * p, co)                # (w,c) = (2p+dj, c)
    return row_max, col_max


# ---------------------------------------------- mega-kernel packed trunk


def unet_apply_quantized_features_nhwc(q, imgs_u8, th=16, interpret=None):
    """Packed trunk with the full-res convs as ops/nhwc_conv pair
    MEGA-KERNELS (grid=(B,), inner-loop DMA streaming) instead of XLA
    convs; everything else identical to the wpack graph. Phases alternate
    A→B through each conv so chained stages need zero relayouts:

      stem (XLA) → to_phase_a → enc0 conv2 [kernel A→B] → packed pool
      → interior XLA stages → up (packed-out transpose) ‖ skip (phase B)
      → dec conv1 [kernel B→A] → dec conv2 [kernel A→B] → packed head

    Returns (phase-B packed activations int8, dequant scale).
    """
    from twinvoice_tpu.ops import nhwc_conv as NC

    xq = (imgs_u8 >> 1).astype(jnp.int8)
    s = INPUT_SCALE
    skips = []

    e0 = q["enc"][0]
    h = _requant(jax.nn.relu(_qconv(xq, s, e0["conv1"], _conv3x3_i8)), e0["s1"])
    s = e0["s1"] / 127.0
    c2 = e0["conv2"]
    hp = NC.qconv3x3_pair_requant(
        NC.to_phase_a(h), jnp.asarray(NC.pack_w_pair(c2["kernel"])),
        s * tile2(c2["w_scale"]), tile2(c2["bias"]), e0["s2"],
        in_phase="A", th=th, interpret=interpret,
    )                                               # phase B packed
    s = e0["s2"] / 127.0
    skips.append((hp, s))
    h = max_pool2_packed(hp)

    for lq in q["enc"][1:]:
        h, s = _q_double_conv(lq, h, s)
        skips.append((h, s))
        h = max_pool2(h)
    h, s = _q_double_conv(q["bottleneck"], h, s)

    last = len(q["dec"]) - 1
    for j, (up_q, dec_q) in enumerate(zip(q["up"], q["dec"])):
        skip, s_skip = skips[len(skips) - 1 - j]
        if j < last:
            up = jnp.asarray(
                lax.conv_transpose(
                    h, up_q["kernel"][::-1, ::-1], strides=(2, 2),
                    padding="VALID",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.int32,
                )
            ).astype(jnp.float32) * (s * up_q["w_scale"])
            if "bias" in up_q:
                up = up + up_q["bias"]
            upq = jnp.clip(
                jnp.round(up * (127.0 / up_q["s_out"])), -127, 127
            ).astype(jnp.int8)
            s_up = up_q["s_out"] / 127.0
            k1 = dec_q["conv1"]
            hcat = jnp.concatenate([upq, skip], axis=-1)
            part = _conv3x3_i8(hcat, {"kernel": k1["kernel"]}).astype(jnp.float32)
            y = part * s_up * k1["w_scale"] + k1["bias"]
            h = _requant(jax.nn.relu(y), dec_q["s1"])
            s1 = dec_q["s1"] / 127.0
            y2 = jax.nn.relu(_qconv(h, s1, dec_q["conv2"], _conv3x3_i8))
            h = _requant(y2, dec_q["s2"])
            s = dec_q["s2"] / 127.0
        else:
            up = conv_transpose2x2_pack_out_i8(h, up_q["kernel"]).astype(
                jnp.float32
            ) * (s * tile2(up_q["w_scale"]))
            if "bias" in up_q:
                up = up + tile2(up_q["bias"])
            upq = jnp.clip(
                jnp.round(up * (127.0 / up_q["s_out"])), -127, 127
            ).astype(jnp.int8)                      # phase B packed
            s_up = up_q["s_out"] / 127.0            # == s_skip
            k1 = dec_q["conv1"]["kernel"]
            c = up_q["kernel"].shape[3]
            # packed concat: lanes [up_ph0|up_ph1|skip_ph0|skip_ph1]
            tcat = jnp.concatenate([upq, skip], axis=-1)
            wp1 = jnp.asarray(NC.pack_w_pair_multi(
                [k1[:, :, :c], k1[:, :, c:]]))
            ha = NC.qconv3x3_pair_requant(
                tcat, wp1,
                s_up * tile2(dec_q["conv1"]["w_scale"]),
                tile2(dec_q["conv1"]["bias"]), dec_q["s1"],
                in_phase="B", th=th, interpret=interpret,
            )                                       # phase A packed
            s1 = dec_q["s1"] / 127.0
            wp2 = jnp.asarray(NC.pack_w_pair(dec_q["conv2"]["kernel"]))
            hp = NC.qconv3x3_pair_requant(
                ha, wp2,
                s1 * tile2(dec_q["conv2"]["w_scale"]),
                tile2(dec_q["conv2"]["bias"]), dec_q["s2"],
                in_phase="A", th=th, interpret=interpret,
            )                                       # phase B packed
            s = dec_q["s2"] / 127.0
            return hp, s
    raise AssertionError("decoder must end at full resolution")


def unet_apply_quantized_nhwc_rowcol_max(q, imgs_u8, th=16, interpret=None,
                                         logits_dtype=jnp.float32):
    """Box-only path on the mega-kernel trunk: packed 1×1 head + packed
    row/col reductions (same contract as the wpack variant: bias-free
    maxima, callers fold q['out']['bias'] into thresholds)."""
    hp, s = unet_apply_quantized_features_nhwc(q, imgs_u8, th=th,
                                               interpret=interpret)
    w = q["out"]["kernel"][0, 0]
    c, co = w.shape
    wp = jnp.zeros((2 * c, 2 * co), jnp.float32)
    wp = wp.at[:c, :co].set(w)
    wp = wp.at[c:, co:].set(w)
    hf = hp.astype(logits_dtype) * jnp.asarray(s, logits_dtype)
    lp = conv1x1(hf, {"kernel": wp[None, None]}).astype(jnp.float32)
    rm6 = jnp.max(lp, axis=2)
    row_max = jnp.maximum(rm6[..., :co], rm6[..., co:])
    cm6 = jnp.max(lp, axis=1)
    b, p = cm6.shape[0], cm6.shape[1]
    col_max = cm6.reshape(b, 2 * p, co)
    return row_max, col_max
