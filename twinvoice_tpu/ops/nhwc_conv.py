"""NHWC int8 conv mega-kernels: contiguous row-slab streaming.

Round-3 attribution (docs/PERFORMANCE.md) showed every round-2 Pallas
kernel was bound by ~10-22 µs of fixed per-grid-step/per-strided-DMA
overhead (three different kernels, one law: wall ≈ steps × overhead), not
by compute or memory bandwidth. The fix is streaming CONTIGUOUS row
slabs: an NHWC row is one 32 KB strip, where the old frame-format halo
windows were 192 tiny strided strips per tile — that's where the "85 ms
floor" actually lived.

Two generations live here:

- ``qconv3x3_*_dma`` — grid=(B,) with an inner ``fori_loop`` driving a
  hand-rolled 2-slot ``make_async_copy`` ring. Bit-exact in interpret
  mode, but **this toolchain's libtpu AOT compiler crashes on any
  make_async_copy inside a fori_loop** (bisected in
  scripts/mosaic_bisect.py: P1/P4/P5 compile, P2/P3/P6/P7 — every
  manual-DMA-in-loop topology — kill the compile helper with no
  message). Kept as the measured dead-end map.
- ``qconv3x3_nhwc_requant`` / ``qconv3x3_pair_requant`` — the shipping
  ROLLING-CARRY design: grid=(B, H/th + 1) with plain blocked (auto
  double-buffered) windows, NO manual DMA, NO halo overlap. The kernel
  keeps the previous row-block plus a one-row carry in VMEM scratch
  (scratch persists across the sequential grid), so step j assembles the
  halo slab for output block j-1 as carry ++ prev ++ cur[0]. One wasted
  step per image (j=0 primes the scratch; its output block is
  overwritten at j=1 — a *consecutive* revisit, which Pallas allows).

Reference parity: computes exactly the reference's full-res DoubleConv
convs (unet_model.py:29-32) in the int8 serving quantization scheme
(infer/quant.py); bit-exactness pinned in tests/unit/test_nhwc_conv.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret_default():
    return jax.default_backend() != "tpu"


@functools.partial(
    jax.jit, static_argnames=("relu", "th", "interpret")
)
def qconv3x3_nhwc_dma(x_pad, w, a, bias, out_scale, *, relu=True,
                          th=8, interpret=None):
    """DEAD END on this toolchain (see module docstring): int8 3×3 SAME
    conv + requant on NHWC via an in-loop manual DMA ring.

    ``x_pad``: (B, H+2, W+2, C) int8 — the caller zero-pads H and W by 1
    (in XLA; the pad fuses with the producer or costs one cheap copy).
    ``w``: (3, 3, C, Co) int8. ``a``: (Co,) f32 = s_in · w_scale.
    ``bias``: (Co,) f32. ``out_scale``: scalar f32.
    Returns (B, H, W, Co) int8 = clip(round(relu(conv·a + bias)·127/os)).

    Grid is (B,); each step loops over H/th row blocks with 2-slot
    double-buffered input AND output DMAs.
    """
    if interpret is None:
        interpret = _interpret_default()
    bsz, hp, wp, c = x_pad.shape
    h, wdt = hp - 2, wp - 2
    co = w.shape[3]
    assert h % th == 0, (h, th)
    nblk = h // th

    def kernel(x_hbm, w_ref, a_ref, b_ref, os_ref, o_hbm,
               xbuf, obuf, in_sem, out_sem):
        b = pl.program_id(0)

        def in_dma(blk, slot):
            return pltpu.make_async_copy(
                x_hbm.at[b, pl.ds(blk * th, th + 2)],
                xbuf.at[slot], in_sem.at[slot],
            )

        def out_dma(blk, slot):
            return pltpu.make_async_copy(
                obuf.at[slot],
                o_hbm.at[b, pl.ds(blk * th, th)], out_sem.at[slot],
            )

        in_dma(0, 0).start()
        inv_os = 127.0 / os_ref[0, 0]

        def body(blk, carry):
            slot = blk % 2

            @pl.when(blk + 1 < nblk)
            def _():
                in_dma(blk + 1, (blk + 1) % 2).start()

            in_dma(blk, slot).wait()
            xw = xbuf[slot]                       # (th+2, W+2, C)
            acc = jnp.zeros((th, wdt, co), jnp.int32)
            for dy in range(3):
                for dx in range(3):
                    acc = acc + lax.dot_general(
                        xw[dy : dy + th, dx : dx + wdt, :],
                        w_ref[dy, dx],
                        dimension_numbers=(((2,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    )
            y = acc.astype(jnp.float32) * a_ref[:] + b_ref[:]
            if relu:
                q = jnp.clip(jnp.round(jnp.maximum(y, 0.0) * inv_os),
                             0, 127).astype(jnp.int8)
            else:
                q = jnp.clip(jnp.round(y * inv_os),
                             -127, 127).astype(jnp.int8)

            # reclaim this obuf slot (its DMA was started at blk-2)
            @pl.when(blk >= 2)
            def _():
                out_dma(blk - 2, slot).wait()

            obuf[slot] = q
            out_dma(blk, slot).start()
            return carry

        lax.fori_loop(0, nblk, body, 0)
        # drain the last (up to) two in-flight output DMAs
        @pl.when(nblk >= 2)
        def _():
            out_dma(nblk - 2, (nblk - 2) % 2).wait()

        out_dma(nblk - 1, (nblk - 1) % 2).wait()

    return pl.pallas_call(
        kernel,
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((3, 3, c, co), lambda b: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((co,), lambda b: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((co,), lambda b: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda b: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((bsz, h, wdt, co), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((2, th + 2, wp, c), jnp.int8),
            pltpu.VMEM((2, th, wdt, co), jnp.int8),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(x_pad, w, a.astype(jnp.float32), bias.astype(jnp.float32),
      jnp.asarray(out_scale, jnp.float32).reshape(1, 1))


def pad_nhwc(x):
    """Zero-pad H and W by 1 (the conv's SAME halo) — int8 NHWC."""
    return jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))


@functools.partial(
    jax.jit, static_argnames=("relu", "th", "interpret")
)
def qconv3x3_nhwc_requant(x_pad, w, a, bias, out_scale, *, relu=True,
                          th=8, interpret=None):
    """int8 3×3 SAME conv + requant on NHWC — rolling-carry streaming.

    Same contract as :func:`qconv3x3_nhwc_dma` (``x_pad`` is the H- and
    W-padded input), but built only from toolchain-proven pieces: grid
    (B, H/th + 1) with blocked auto-double-buffered windows; the halo
    slab for output block j-1 is assembled at step j from VMEM-scratch
    state (previous block + one carry row) plus the current block's first
    row. See module docstring.
    """
    if interpret is None:
        interpret = _interpret_default()
    bsz, hp, wp, c = x_pad.shape
    h, wdt = hp - 2, wp - 2
    co = w.shape[3]
    assert h % th == 0, (h, th)
    nblk = h // th
    x = x_pad[:, 1:-1]  # drop the H pad; the carry scheme re-derives it

    def kernel(x_ref, w_ref, a_ref, b_ref, os_ref, o_ref, prev, carry):
        j = pl.program_id(1)
        cur = x_ref[0]                           # (th, W+2, C)
        inv_os = 127.0 / os_ref[0, 0]
        # bottom halo row: zero on the drain step, else cur's first row
        first = jnp.where(j == nblk, jnp.zeros_like(cur[:1]), cur[:1])
        slab = jnp.concatenate([carry[...], prev[...], first], axis=0)
        acc = jnp.zeros((th, wdt, co), jnp.int32)
        for dy in range(3):
            for dx in range(3):
                acc = acc + lax.dot_general(
                    slab[dy : dy + th, dx : dx + wdt, :],
                    w_ref[dy, dx],
                    dimension_numbers=(((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
        y = acc.astype(jnp.float32) * a_ref[:] + b_ref[:]
        if relu:
            q = jnp.clip(jnp.round(jnp.maximum(y, 0.0) * inv_os),
                         0, 127).astype(jnp.int8)
        else:
            q = jnp.clip(jnp.round(y * inv_os), -127, 127).astype(jnp.int8)
        o_ref[0] = q
        # scratch rollover (read prev's last row BEFORE overwriting prev);
        # j=0 primes carry with the zero top-halo row
        prev_last = prev[th - 1 : th]
        carry[...] = jnp.where(j == 0, jnp.zeros_like(prev_last), prev_last)
        prev[...] = cur

    return pl.pallas_call(
        kernel,
        grid=(bsz, nblk + 1),
        in_specs=[
            pl.BlockSpec((1, th, wp, c),
                         lambda b, j: (b, jnp.minimum(j, nblk - 1), 0, 0)),
            pl.BlockSpec((3, 3, c, co), lambda b, j: (0, 0, 0, 0)),
            pl.BlockSpec((co,), lambda b, j: (0,)),
            pl.BlockSpec((co,), lambda b, j: (0,)),
            pl.BlockSpec((1, 1), lambda b, j: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, th, wdt, co),
            lambda b, j: (b, jnp.maximum(j - 1, 0), 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bsz, h, wdt, co), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((th, wp, c), jnp.int8),
            pltpu.VMEM((1, wp, c), jnp.int8),
        ],
        interpret=interpret,
    )(x, w, a.astype(jnp.float32), bias.astype(jnp.float32),
      jnp.asarray(out_scale, jnp.float32).reshape(1, 1))


# ------------------------------------------------- pair-packed mega-kernel
#
# The v1 kernel above fixes the DMA/dispatch overhead but its tap-dots are
# (M, 64)@(64, 64) — a quarter of the MXU. The pair-packed variant packs
# two adjacent columns into the lane dim ON BOTH SIDES, making every dot
# (M, 128k)@(128k, 128) at 1.33× FLOPs (the wpack zero-tap trick, but
# executed inside a kernel where the data movement is ours, not the XLA
# emitter's).
#
# Phases: a packed tensor is phase A when pair p holds original columns
# (2p-1, 2p) — 257 pairs, W-pad baked in as zeros — and phase B when pair
# p holds (2p, 2p+1) — 256 pairs. A 3-wide conv maps A→B and B→A with the
# SAME kernel and the SAME packed weights (derivation in the docstring);
# stages simply alternate phases, so chained convs need no relayout at
# all. H padding is handled inside the kernel (zeroed halo rows at the
# image borders).


def pack_w_pair_multi(blocks):
    """Packed pair weights for an input that is a LANE-CONCAT of packed
    sources (e.g. the decoder's [up_ph0|up_ph1|skip_ph0|skip_ph1]).

    ``blocks``: one (3, 3, Ci, Co) kernel per packed source, in lane
    order. Returns (3, 2, 2·ΣCi, 2·Co). View v=0 is the input pair at the
    output pair's own index, v=1 the next one (phase-shift handled by
    slab provisioning, so the same packing serves A→B and B→A):
      out phase-lo: v0lo→w0 v0hi→w1 v1lo→w2
      out phase-hi: v0hi→w0 v1lo→w1 v1hi→w2

    jnp throughout, so it can run at trace time inside a jitted graph
    (the packing constant-folds / costs microseconds per call).
    """
    co = blocks[0].shape[3]
    ci_tot = sum(k.shape[2] for k in blocks)
    wp = jnp.zeros((3, 2, 2 * ci_tot, 2 * co), blocks[0].dtype)
    ofs = 0
    for k in blocks:
        ci = k.shape[2]
        lo, hi = ofs, ofs + ci
        wp = wp.at[:, 0, lo : lo + ci, :co].set(k[:, 0])
        wp = wp.at[:, 0, hi : hi + ci, :co].set(k[:, 1])
        wp = wp.at[:, 0, hi : hi + ci, co:].set(k[:, 0])
        wp = wp.at[:, 1, lo : lo + ci, :co].set(k[:, 2])
        wp = wp.at[:, 1, lo : lo + ci, co:].set(k[:, 1])
        wp = wp.at[:, 1, hi : hi + ci, co:].set(k[:, 2])
        ofs += 2 * ci
    return wp


def pack_w_pair(w):
    """Single-source convenience wrapper over :func:`pack_w_pair_multi`."""
    return pack_w_pair_multi([w])


@functools.partial(
    jax.jit, static_argnames=("in_phase", "relu", "th", "interpret")
)
def qconv3x3_pair_dma(x, wp, a2, bias2, out_scale, *, in_phase="A",
                          relu=True, th=8, interpret=None):
    """DEAD END on this toolchain (see module docstring): pair-packed
    int8 3×3 SAME conv + requant via an in-loop manual DMA ring; A→B or B→A.

    ``x``: (B, H, P, Cpk) int8 packed, H UNPADDED (halo rows zeroed
    in-kernel). P = 257 (phase A, W-pad baked in) or 256 (phase B).
    ``wp``: (3, 2, Cpk, 128) from :func:`pack_w_pair` (Cpk = 2·Cin).
    ``a2``/``bias2``: (128,) f32 — per-out-channel dequant scale/bias in
    PACKED order (tile2 of the 64-wide vectors). Returns packed output in
    the opposite phase: (B, H, 256, 128) from A, (B, H, 257, 128) from B
    (pad pairs zeroed).
    """
    if interpret is None:
        interpret = _interpret_default()
    bsz, h, p_in, cpk = x.shape
    assert h % th == 0, (h, th)
    nblk = h // th
    a_phase_in = in_phase == "A"
    # phase A = W/2+1 pairs (odd), phase B = W/2 pairs (even)
    assert p_in % 2 == (1 if a_phase_in else 0), (p_in, in_phase)
    p_out = p_in - 1 if a_phase_in else p_in + 1
    co2 = wp.shape[3]
    # slab width: A input is used as-is (views [p], [p+1]); a B input gets
    # zero pairs at BOTH slab edges so views [q], [q+1] read B-pairs
    # q-1, q for q = 0..p_out-1 (the last output pair's second view is
    # past the image)
    slab_p = p_in if a_phase_in else p_in + 2

    def kernel(x_hbm, w_ref, a_ref, b_ref, os_ref, o_hbm,
               xbuf, obuf, in_sem, out_sem):
        b = pl.program_id(0)
        dst0 = 0 if a_phase_in else 1  # B input lands at slab col 1

        def in_dma(blk, slot, r0, nr, dst_r):
            return pltpu.make_async_copy(
                x_hbm.at[b, pl.ds(r0, nr)],
                xbuf.at[slot, pl.ds(dst_r, nr), pl.ds(dst0, p_in)],
                in_sem.at[slot],
            )

        def start_in(blk, slot):
            # H-halo handling: first/last block read one fewer row; the
            # missing halo row is zeroed at use time
            @pl.when(blk == 0)
            def _():
                in_dma(blk, slot, 0, th + 1, 1).start()

            @pl.when((blk > 0) & (blk < nblk - 1))
            def _():
                in_dma(blk, slot, blk * th - 1, th + 2, 0).start()

            @pl.when((blk == nblk - 1) & (blk > 0))
            def _():
                in_dma(blk, slot, blk * th - 1, th + 1, 0).start()

        def wait_in(blk, slot):
            @pl.when((blk == 0) | (blk == nblk - 1))
            def _():
                pltpu.make_async_copy(
                    x_hbm.at[b, pl.ds(0, th + 1)],
                    xbuf.at[slot, pl.ds(0, th + 1), pl.ds(dst0, p_in)],
                    in_sem.at[slot],
                ).wait()

            @pl.when((blk > 0) & (blk < nblk - 1))
            def _():
                pltpu.make_async_copy(
                    x_hbm.at[b, pl.ds(0, th + 2)],
                    xbuf.at[slot, pl.ds(0, th + 2), pl.ds(dst0, p_in)],
                    in_sem.at[slot],
                ).wait()

        def out_dma(blk, slot):
            return pltpu.make_async_copy(
                obuf.at[slot],
                o_hbm.at[b, pl.ds(blk * th, th)], out_sem.at[slot],
            )

        start_in(0, 0)
        inv_os = 127.0 / os_ref[0, 0]

        def body(blk, carry):
            slot = blk % 2

            @pl.when(blk + 1 < nblk)
            def _():
                start_in(blk + 1, (blk + 1) % 2)

            wait_in(blk, slot)
            # zero the halo rows / pad pair that the DMA did not write
            @pl.when(blk == 0)
            def _():
                xbuf[slot, 0] = jnp.zeros((slab_p, cpk), jnp.int8)

            @pl.when(blk == nblk - 1)
            def _():
                xbuf[slot, th + 1] = jnp.zeros((slab_p, cpk), jnp.int8)

            if not a_phase_in:
                xbuf[slot, :, 0] = jnp.zeros((th + 2, cpk), jnp.int8)
                xbuf[slot, :, slab_p - 1] = jnp.zeros((th + 2, cpk),
                                                      jnp.int8)

            xw = xbuf[slot]                          # (th+2, slab_p, cpk)
            acc = jnp.zeros((th, p_out, co2), jnp.int32)
            for dy in range(3):
                for v in range(2):
                    acc = acc + lax.dot_general(
                        xw[dy : dy + th, v : v + p_out, :],
                        w_ref[dy, v],
                        dimension_numbers=(((2,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    )
            y = acc.astype(jnp.float32) * a_ref[:] + b_ref[:]
            if relu:
                q = jnp.clip(jnp.round(jnp.maximum(y, 0.0) * inv_os),
                             0, 127).astype(jnp.int8)
            else:
                q = jnp.clip(jnp.round(y * inv_os),
                             -127, 127).astype(jnp.int8)
            if not a_phase_in:
                # phase-A output: zero the baked-in W pad columns.
                # (iota+where, NOT .at[].set — the jnp update lowers to
                # scatter, which Mosaic cannot lower inside a kernel)
                half = co2 // 2
                pair_i = lax.broadcasted_iota(jnp.int32, q.shape, 1)
                ch_i = lax.broadcasted_iota(jnp.int32, q.shape, 2)
                pad_mask = ((pair_i == 0) & (ch_i < half)) | (
                    (pair_i == p_out - 1) & (ch_i >= half))
                q = jnp.where(pad_mask, jnp.int8(0), q)

            @pl.when(blk >= 2)
            def _():
                out_dma(blk - 2, slot).wait()

            obuf[slot] = q
            out_dma(blk, slot).start()
            return carry

        lax.fori_loop(0, nblk, body, 0)

        @pl.when(nblk >= 2)
        def _():
            out_dma(nblk - 2, (nblk - 2) % 2).wait()

        out_dma(nblk - 1, (nblk - 1) % 2).wait()

    return pl.pallas_call(
        kernel,
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((3, 2, cpk, co2), lambda b: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((co2,), lambda b: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((co2,), lambda b: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda b: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((bsz, h, p_out, co2), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((2, th + 2, slab_p, cpk), jnp.int8),
            pltpu.VMEM((2, th, p_out, co2), jnp.int8),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(x, wp, a2.astype(jnp.float32), bias2.astype(jnp.float32),
      jnp.asarray(out_scale, jnp.float32).reshape(1, 1))


@functools.partial(
    jax.jit, static_argnames=("in_phase", "relu", "th", "interpret")
)
def qconv3x3_pair_requant(x, wp, a2, bias2, out_scale, *, in_phase="A",
                          relu=True, th=8, interpret=None):
    """Pair-packed int8 3×3 SAME conv + requant; A→B or B→A.

    Rolling-carry edition of :func:`qconv3x3_pair_dma` (same contract):
    ``x`` (B, H, P, Cpk) int8 packed with H unpadded; returns the packed
    output in the opposite phase. Grid (B, H/th + 1), blocked windows,
    halo from VMEM-scratch carry — no manual DMA, no scatter (the B→A
    pad-column zeroing is an iota mask). See module docstring.
    """
    if interpret is None:
        interpret = _interpret_default()
    bsz, h, p_in, cpk = x.shape
    assert h % th == 0, (h, th)
    nblk = h // th
    a_phase_in = in_phase == "A"
    assert p_in % 2 == (1 if a_phase_in else 0), (p_in, in_phase)
    p_out = p_in - 1 if a_phase_in else p_in + 1
    co2 = wp.shape[3]
    # Sublane-align the GEMM width: the B→A direction's natural p_out is
    # ODD (257 at the flagship shape) and an M=257 GEMM measured 3×
    # slower than the even A→B one (199 vs 63 ms) AND killed the compile
    # helper at th=16. Compute PG = roundup8(p_out) columns instead and
    # slice the tail off in XLA after the kernel. The B input's W halo
    # (a zero pair column on the left) plus the alignment tail are baked
    # in with ONE fusable XLA pad — the old per-step in-kernel concat is
    # gone. Measured: B→A 199 → 74 ms, and th=16 compiles.
    pg = ((p_out + 7) // 8) * 8
    if a_phase_in:
        if pg > p_out:  # odd-P test shapes; flagship A→B is already even
            x = jnp.pad(x, ((0, 0), (0, 0), (0, pg + 1 - p_in), (0, 0)))
    else:
        x = jnp.pad(x, ((0, 0), (0, 0), (1, pg - p_in), (0, 0)))
    p_slab = max(p_in if a_phase_in else p_in + 2, pg + 1)

    def kernel(x_ref, w_ref, a_ref, b_ref, os_ref, o_ref, prev, carry):
        j = pl.program_id(1)
        cur = x_ref[0]                           # (th, p_slab, cpk)
        inv_os = 127.0 / os_ref[0, 0]
        first = jnp.where(j == nblk, jnp.zeros_like(cur[:1]), cur[:1])
        slab = jnp.concatenate([carry[...], prev[...], first], axis=0)
        acc = jnp.zeros((th, pg, co2), jnp.int32)
        for dy in range(3):
            for v in range(2):
                acc = acc + lax.dot_general(
                    slab[dy : dy + th, v : v + pg, :],
                    w_ref[dy, v],
                    dimension_numbers=(((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
        y = acc.astype(jnp.float32) * a_ref[:] + b_ref[:]
        if relu:
            q = jnp.clip(jnp.round(jnp.maximum(y, 0.0) * inv_os),
                         0, 127).astype(jnp.int8)
        else:
            q = jnp.clip(jnp.round(y * inv_os), -127, 127).astype(jnp.int8)
        if not a_phase_in:
            # phase-A output: zero the baked-in W pad columns (iota+where;
            # .at[].set would lower to scatter, which Mosaic rejects)
            half = co2 // 2
            pair_i = lax.broadcasted_iota(jnp.int32, q.shape, 1)
            ch_i = lax.broadcasted_iota(jnp.int32, q.shape, 2)
            pad_mask = ((pair_i == 0) & (ch_i < half)) | (
                (pair_i == p_out - 1) & (ch_i >= half))
            q = jnp.where(pad_mask, jnp.int8(0), q)
        o_ref[0] = q
        prev_last = prev[th - 1 : th]
        carry[...] = jnp.where(j == 0, jnp.zeros_like(prev_last), prev_last)
        prev[...] = cur

    out = pl.pallas_call(
        kernel,
        grid=(bsz, nblk + 1),
        in_specs=[
            pl.BlockSpec((1, th, p_slab, cpk),
                         lambda b, j: (b, jnp.minimum(j, nblk - 1), 0, 0)),
            pl.BlockSpec((3, 2, cpk, co2), lambda b, j: (0, 0, 0, 0)),
            pl.BlockSpec((co2,), lambda b, j: (0,)),
            pl.BlockSpec((co2,), lambda b, j: (0,)),
            pl.BlockSpec((1, 1), lambda b, j: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, th, pg, co2),
            lambda b, j: (b, jnp.maximum(j - 1, 0), 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bsz, h, pg, co2), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((th, p_slab, cpk), jnp.int8),
            pltpu.VMEM((1, p_slab, cpk), jnp.int8),
        ],
        interpret=interpret,
    )(x, wp, a2.astype(jnp.float32), bias2.astype(jnp.float32),
      jnp.asarray(out_scale, jnp.float32).reshape(1, 1))
    return out[:, :, :p_out, :] if pg > p_out else out


def to_phase_a(x):
    """NHWC int8 (B, H, W, C) → phase-A packed (B, H, W/2+1, 2C).

    Pair p holds original columns (2p-1, 2p); the W pad is baked in as
    zeros. One XLA pad+reshape — the packed domain's entry relayout."""
    b, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0)))
    return xp.reshape(b, h, (w + 2) // 2, 2 * c)


def from_phase_b(t):
    """Phase-B packed (B, H, P, 2C) → NHWC (B, H, 2P, C) (plain reshape)."""
    b, h, p, c2 = t.shape
    return t.reshape(b, h, 2 * p, c2 // 2)
