"""Pallas int8 U-Net kernels in a zero-bordered (H, C, W, N) "frame" layout.

Why (VERDICT r1 #2): the int8 XLA serving graph (infer/quant.py) leaves
~2× on the table at the full-resolution stages — the r1 trace measured the
512²×64ch convs at ~28% of int8 MXU peak under XLA's conv emitter. These
kernels stream row-strips through VMEM and express each conv as dy-packed
int8 GEMMs (lhs (Cout, 3·Cin·chunk) @ rhs (3·Cin·chunk, Wt, N)) with the
dequant→(split add)→bias→ReLU→requant epilogue fused in-kernel, so nothing
wider than int8 ever touches HBM.

Layout: lanes = batch N, sublanes = W. A row strip x[h-1:h+2] is contiguous
in (dy, Cin), so the GEMM needs no in-kernel shuffling: K is a free reshape
and the three dx taps are free W-slices of the halo'd block.

**The frame format** — how the halo works on THIS toolchain. Mosaic here
rejects block windows with OOB padding ("Low padding not supported yet")
and cannot prove alignment for Element-indexed *output* windows, so:

- Every activation is stored with a fixed ZERO border: frame shape
  (H + 2·FH, C, W + 2·FW, N), interior at ``[FH:FH+H, :, FW:FW+W]``,
  FH=4 / FW=32. The zero border IS the conv's SAME padding (matching
  ops/conv.conv3x3 and the torch reference, unet_model.py:10).
- Output tiles use plain *blocked* BlockSpecs over the frame. Border
  thickness is a multiple of every tile size (Hs ∈ {1,2,4} | FH,
  Wt ∈ {8,16,32} | FW), so each output tile is purely border or purely
  interior; border tiles just write zeros — border maintenance costs no
  separate pass.
- Input halo windows use Element indexing in the one form the toolchain
  accepts (verified by direct probe): in-bounds windows, W offsets written
  as ``8·(…)`` so the divisibility prover succeeds. Border tiles clamp
  their (unused) windows into bounds; int8 garbage cannot NaN.
- Cin is chunked across the innermost grid dimension with an s32 VMEM
  scratch accumulator (epilogue on the last chunk), keeping VMEM bounded
  at the deep 512-channel layers.

The decoder's split conv (upsample half + skip half) accumulates both
GEMMs into one s32 accumulator — valid because quantize_unet harmonizes
the two input scales and the per-cout weight scale spans the whole kernel,
so both halves share one dequant factor.

The 1×1 logit head stays in XLA (einsum on the frame) — a Pallas head was
measured latency-bound (M=3 micro-GEMMs, docs/PERFORMANCE.md post-mortem).

Used by infer/quant.py's `unet_apply_quantized_pallas_rowcol_max`;
correctness is pinned against the XLA int8 graph in
tests/unit/test_qconv_pallas.py (interpret mode, CPU).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

FH = 4    # frame border rows (top and bottom)
FW = 32   # frame border cols (left and right)


def _interpret_default():
    return jax.default_backend() != "tpu"


# ------------------------------------------------------------------- frame


def to_frame(x_hcwn):
    """(H, C, W, N) → zero-bordered frame (H+2·FH, C, W+2·FW, N)."""
    return jnp.pad(x_hcwn, ((FH, FH), (0, 0), (FW, FW), (0, 0)))


def from_frame(xf):
    """Interior view of a frame."""
    return xf[FH:-FH, :, FW:-FW, :]


def to_hcwn(x_nhwc):
    """(N, H, W, C) → (H, C, W, N)."""
    return jnp.transpose(x_nhwc, (1, 3, 2, 0))


def from_hcwn(x_hcwn):
    """(H, C, W, N) → (N, H, W, C)."""
    return jnp.transpose(x_hcwn, (3, 0, 2, 1))


# ------------------------------------------------------------ tile planning


def _plan_tiles(h, cin, w, n, cout, two_inputs=False, budget=10 << 20):
    """→ (Hs, Wt, CC): row-strip height, W tile, Cin chunk. Constraints:
    Hs | h and Hs | FH; Wt | w and Wt | FW; VMEM ≤ budget."""
    n_in = 2 if two_inputs else 1
    # production W (≥24) always hits an 8-multiple tile; the sub-8 tiles
    # exist for tiny CPU-test nets (interpret mode has no alignment prover)
    for wt in (32, 16, 8, 4, 2, 1):
        if w % wt:
            continue
        for hs in (4, 2, 1):
            if h % hs:
                continue
            for cc in (cin, 256, 128, 64):
                if cc > cin or cin % cc:
                    continue
                in_b = 2 * n_in * (hs + 2) * cc * (wt + 2 * 8) * n
                acc_b = hs * cout * wt * n * 4
                out_b = 2 * hs * cout * wt * n
                w_b = n_in * 3 * cout * 3 * cc
                if in_b + acc_b + out_b + w_b <= budget:
                    return hs, wt, cc
    return 1, 8, min(64, cin)


# ------------------------------------------------------------------ prepack


def pack_w3x3(kernel_hwio, cc=None):
    """(3,3,Cin,Cout) int8 HWIO → (Cin/cc, 3dx, Cout, 3dy·cc) GEMM lhs
    chunked over Cin (``cc`` defaults to all of Cin → leading dim 1)."""
    k = np.asarray(kernel_hwio)
    _, _, cin, cout = k.shape
    cc = cc or cin
    assert cin % cc == 0
    nci = cin // cc
    out = np.zeros((nci, 3, cout, 3 * cc), k.dtype)
    for ci in range(nci):
        for dx in range(3):
            for dy in range(3):
                out[ci, dx, :, dy * cc : (dy + 1) * cc] = (
                    k[dy, dx, ci * cc : (ci + 1) * cc].T
                )
    return jnp.asarray(out)


# ------------------------------------------------------- conv3x3 + requant


def _make_qconv_kernel(CC, Wt, Hs, relu, split, kh, kl, bh, bw):
    """Kernel factory for the frame-format conv. Grid = (k, l, ci), ci
    innermost (accumulation). (kh, kl) = grid extent, (bh, bw) = number of
    border tiles on each side."""

    def kernel(*refs):
        if split:
            x_ref, x2_ref, w_ref, w2_ref, a_ref, b_ref, os_ref, o_ref, acc = refs
        else:
            x_ref, w_ref, a_ref, b_ref, os_ref, o_ref, acc = refs
        k = pl.program_id(0)
        l = pl.program_id(1)
        ci = pl.program_id(2)
        nci = pl.num_programs(2)
        Cout = o_ref.shape[1]

        @pl.when(ci == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)

        for r in range(Hs):
            k3 = x_ref[r : r + 3].reshape(3 * CC, Wt + 16, -1)
            for dx in range(3):
                acc[r] += jax.lax.dot_general(
                    w_ref[0, dx], k3[:, dx + 7 : dx + 7 + Wt, :],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
            if split:
                k3b = x2_ref[r : r + 3].reshape(3 * CC, Wt + 16, -1)
                for dx in range(3):
                    acc[r] += jax.lax.dot_general(
                        w2_ref[0, dx], k3b[:, dx + 7 : dx + 7 + Wt, :],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    )

        @pl.when(ci == nci - 1)
        def _():
            interior = (
                (k >= bh) & (k < kh - bh) & (l >= bw) & (l < kl - bw)
            )
            inv_os = 127.0 / os_ref[0, 0]
            a = a_ref[:].reshape(1, Cout, 1, 1)
            b = b_ref[:].reshape(1, Cout, 1, 1)
            y = acc[:].astype(jnp.float32) * a + b
            if relu:
                y = jnp.maximum(y, 0.0)
                q = jnp.clip(jnp.round(y * inv_os), 0, 127)
            else:
                q = jnp.clip(jnp.round(y * inv_os), -127, 127)
            o_ref[:] = jnp.where(interior, q, 0.0).astype(jnp.int8)

    return kernel


def _halo_in_spec(Hs, cc, Wt, N, hp, wp):
    """Element-indexed in-bounds halo window over the frame: rows
    [k·Hs-1, ·+Hs+2), cols [l·Wt-8, ·+Wt+16), clamped into bounds for the
    border tiles (whose data is unused). W offsets are written as 8·(…)
    so Mosaic's divisibility prover accepts them."""
    E = pl.Element
    max_h = hp - (Hs + 2)
    if Wt % 8 == 0:
        # write the W offset as 8·(…) so Mosaic's divisibility prover
        # accepts it on real TPU
        max_w8 = (wp - (Wt + 16)) // 8
        wt8 = Wt // 8

        def woff(l):
            return 8 * jnp.clip(l * wt8 - 1, 0, max_w8)
    else:  # tiny CPU-test tiles; interpret mode only
        max_w = wp - (Wt + 16)

        def woff(l):
            return jnp.clip(l * Wt - 8, 0, max_w)

    def idx(k, l, ci):
        return (jnp.clip(k * Hs - 1, 0, max_h), ci * cc, woff(l), 0)

    return pl.BlockSpec(
        (E(Hs + 2, (0, 0)), E(cc, (0, 0)), E(Wt + 16, (0, 0)), E(N, (0, 0))),
        idx,
        memory_space=pltpu.VMEM,
    )


@functools.partial(jax.jit, static_argnames=("relu", "interpret", "tiles"))
def qconv3x3_requant(x, wpack, a, bias, out_scale, *, relu=True,
                     interpret=None, tiles=None):
    """int8 3×3 SAME conv → f32 epilogue → s8 on frame-format tensors.

    ``x``: frame (H+2FH, Cin, W+2FW, N) with zero borders; returns the same
    format. ``wpack``: (Cin/cc, 3, Cout, 3·cc) from :func:`pack_w3x3` —
    its chunking must match ``tiles``. ``a``: (Cout,) f32 = s_in·w_scale.
    ``bias``: (Cout,) f32. ``out_scale``: scalar f32; output requantizes to
    ``clip(round(relu(y)·127/out_scale))`` exactly like quant._requant.
    """
    if interpret is None:
        interpret = _interpret_default()
    Hp, Cin, Wp, N = x.shape
    H, W = Hp - 2 * FH, Wp - 2 * FW
    Cout = wpack.shape[2]
    Hs, Wt, CC = tiles or _plan_tiles(H, Cin, W, N, Cout)
    assert wpack.shape[0] == Cin // CC and wpack.shape[3] == 3 * CC, (
        "wpack chunking disagrees with tile plan; pass matching tiles=")
    kh, kl = Hp // Hs, Wp // Wt
    bh, bw = FH // Hs, FW // Wt
    kern = _make_qconv_kernel(CC, Wt, Hs, relu, False, kh, kl, bh, bw)
    return pl.pallas_call(
        kern,
        grid=(kh, kl, Cin // CC),
        in_specs=[
            _halo_in_spec(Hs, CC, Wt, N, Hp, Wp),
            pl.BlockSpec((1, 3, Cout, 3 * CC), lambda k, l, ci: (ci, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Cout, 1), lambda k, l, ci: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Cout, 1), lambda k, l, ci: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda k, l, ci: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((Hs, Cout, Wt, N), lambda k, l, ci: (k, 0, l, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Hp, Cout, Wp, N), jnp.int8),
        scratch_shapes=[pltpu.VMEM((Hs, Cout, Wt, N), jnp.int32)],
        interpret=interpret,
    )(x, wpack, a.astype(jnp.float32).reshape(-1, 1),
      bias.astype(jnp.float32).reshape(-1, 1),
      jnp.asarray(out_scale, jnp.float32).reshape(1, 1))


@functools.partial(jax.jit, static_argnames=("relu", "interpret", "tiles"))
def qconv3x3_split_requant(x, x2, wpack, wpack2, a, bias, out_scale, *,
                           relu=True, interpret=None, tiles=None):
    """Decoder conv1 on two frame inputs (upsample half, skip half) with a
    SHARED dequant factor ``a`` (valid: quantize_unet harmonizes the two
    input scales and the weight scale spans the whole conv1 kernel); both
    GEMMs accumulate into one s32 scratch — no s32 ever reaches HBM."""
    if interpret is None:
        interpret = _interpret_default()
    Hp, Cin, Wp, N = x.shape
    H, W = Hp - 2 * FH, Wp - 2 * FW
    assert x2.shape == x.shape, "split halves must have equal channels"
    Cout = wpack.shape[2]
    Hs, Wt, CC = tiles or _plan_tiles(H, Cin, W, N, Cout, two_inputs=True)
    assert wpack.shape[0] == Cin // CC and wpack.shape[3] == 3 * CC
    kh, kl = Hp // Hs, Wp // Wt
    bh, bw = FH // Hs, FW // Wt
    kern = _make_qconv_kernel(CC, Wt, Hs, relu, True, kh, kl, bh, bw)
    return pl.pallas_call(
        kern,
        grid=(kh, kl, Cin // CC),
        in_specs=[
            _halo_in_spec(Hs, CC, Wt, N, Hp, Wp),
            _halo_in_spec(Hs, CC, Wt, N, Hp, Wp),
            pl.BlockSpec((1, 3, Cout, 3 * CC), lambda k, l, ci: (ci, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, Cout, 3 * CC), lambda k, l, ci: (ci, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Cout, 1), lambda k, l, ci: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Cout, 1), lambda k, l, ci: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda k, l, ci: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((Hs, Cout, Wt, N), lambda k, l, ci: (k, 0, l, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Hp, Cout, Wp, N), jnp.int8),
        scratch_shapes=[pltpu.VMEM((Hs, Cout, Wt, N), jnp.int32)],
        interpret=interpret,
    )(x, x2, wpack, wpack2, a.astype(jnp.float32).reshape(-1, 1),
      bias.astype(jnp.float32).reshape(-1, 1),
      jnp.asarray(out_scale, jnp.float32).reshape(1, 1))


# ---------------------------------------- conv3x3, manually pipelined DMA


@functools.partial(jax.jit,
                   static_argnames=("relu", "interpret", "tiles", "mxu_bf16"))
def qconv3x3_requant_dma(x, wpack, a, bias, out_scale, *, relu=True,
                         interpret=None, tiles=None, mxu_bf16=False):
    """Like :func:`qconv3x3_requant` but with HAND-PIPELINED input DMAs.

    The blocked/Element auto-pipeline was measured NOT to double-buffer
    Element-window inputs (~20 µs of DMA latency per tile — 4× behind
    XLA's conv emitter at the flagship shape, docs/PERFORMANCE.md). Here
    the input stays in HBM (`memory_space=ANY`) and the kernel itself
    streams halo windows into a 2-slot VMEM scratch with
    ``pltpu.make_async_copy``, starting tile t+1's copy before computing
    tile t — the guide's double-buffering pattern. Single Cin chunk only
    (Cin ≤ 128 — the full-res layers where the flops are; deeper layers
    use the blocked kernel).
    """
    if interpret is None:
        interpret = _interpret_default()
    Hp, Cin, Wp, N = x.shape
    H, W = Hp - 2 * FH, Wp - 2 * FW
    Cout = wpack.shape[2]
    assert wpack.shape[0] == 1, "single-Cin-chunk kernel"
    if tiles is None:
        # budget well under the 16 MB VMEM: the kernel's f32 epilogue
        # temporaries roughly double the accounted footprint (measured:
        # a 13 MB plan stack-allocated 25.4 MB)
        for wt in (128, 64, 32, 16, 8, 4, 2, 1):
            if W % wt == 0:
                hs = 1
                if (2 * (hs + 2) * Cin * (wt + 16) * N          # 2 slots
                        + hs * Cout * wt * N * 4                 # acc
                        + 2 * hs * Cout * wt * N) <= (6 << 20):  # out x2
                    break
        tiles = (hs, wt)
    Hs, Wt = tiles
    kh, kl = H // Hs, W // Wt
    T = kh * kl
    bh, bw = 0, 0  # interior-only grid: outputs cover only interior tiles

    def kernel(x_hbm, w_ref, a_ref, b_ref, os_ref, o_ref, xbuf, acc, sem):
        t = pl.program_id(0)

        def dma(tt, slot):
            # interior tile (k, l): output covers interior rows/cols
            # [k·Hs, ·+Hs) × [l·Wt, ·+Wt) = frame offset (+FH, +FW); the
            # halo window starts one row above and PW-1=7 cols left of the
            # first tap so the tap math matches the blocked kernels
            k = tt // kl
            l = tt % kl
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(k * Hs + FH - 1, Hs + 2), :,
                         pl.ds(l * Wt + FW - 8, Wt + 16), :],
                xbuf.at[slot],
                sem.at[slot],
            )

        @pl.when(t == 0)
        def _():
            dma(t, 0).start()

        @pl.when(t + 1 < T)
        def _():
            dma(t + 1, (t + 1) % 2).start()

        dma(t, t % 2).wait()
        xw = xbuf[t % 2]                                  # (Hs+2, Cin, Wt+16, N)

        inv_os = 127.0 / os_ref[0, 0]
        for r in range(Hs):
            k3 = xw[r : r + 3].reshape(3 * Cin, Wt + 16, N)
            acc[:] = jnp.zeros_like(acc)
            if mxu_bf16:
                # bf16 MXU with f32 accumulation — still bit-exact: int8
                # values are exact in bf16 and every partial sum stays
                # below 2^24 (127·127·(9·Cin) for Cin ≤ 1024)
                wr = w_ref[0].astype(jnp.bfloat16)
                for dx in range(3):
                    acc[:] += jax.lax.dot_general(
                        wr[dx],
                        k3[:, dx + 7 : dx + 7 + Wt, :].astype(jnp.bfloat16),
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
            else:
                for dx in range(3):
                    acc[:] += jax.lax.dot_general(
                        w_ref[0, dx], k3[:, dx + 7 : dx + 7 + Wt, :],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    )
            y = acc[:].astype(jnp.float32) * a_ref[:].reshape(Cout, 1, 1)
            y = y + b_ref[:].reshape(Cout, 1, 1)
            if relu:
                y = jnp.maximum(y, 0.0)
                o_ref[r] = jnp.clip(jnp.round(y * inv_os), 0, 127
                                    ).astype(jnp.int8)
            else:
                o_ref[r] = jnp.clip(jnp.round(y * inv_os), -127, 127
                                    ).astype(jnp.int8)

    out = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, 3, Cout, 3 * Cin), lambda t: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Cout, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Cout, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda t: (0, 0), memory_space=pltpu.SMEM),
        ],
        # UNPADDED blocked output (Element-indexed output windows trip this
        # Mosaic's window prover); callers re-frame with to_frame — a thin
        # copy next to the conv itself
        out_specs=pl.BlockSpec(
            (Hs, Cout, Wt, N), lambda t: (t // kl, 0, t % kl, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, Cout, W, N), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((2, Hs + 2, Cin, Wt + 16, N), jnp.int8),
            pltpu.VMEM((Cout, Wt, N),
                       jnp.float32 if mxu_bf16 else jnp.int32),  # per row
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(x, wpack, a.astype(jnp.float32).reshape(-1, 1),
      bias.astype(jnp.float32).reshape(-1, 1),
      jnp.asarray(out_scale, jnp.float32).reshape(1, 1))
    return to_frame(out)


# ----------------------------------------------------------------- maxpool


@functools.partial(jax.jit, static_argnames=("interpret",))
def max_pool2_hcwn(x, interpret=None):
    """2×2 stride-2 max pool on frames: (H+2FH, C, W+2FW, N) →
    (H/2+2FH, C, W/2+2FW, N).

    Implementation note (r4): this is plain XLA, not a Pallas kernel. The
    Pallas version's in-kernel i8 pairing reshape would not lower on real
    TPU — Mosaic rejected the sublane-split reshape at small lane counts
    and crashed the remote compile helper at the production N=128 — and a
    2×2 pool is pure bandwidth (no MXU work), so a kernel cannot beat the
    XLA emitter here anyway. The strided slices below fuse into one pass.
    ``interpret`` is accepted for signature compatibility and ignored.
    """
    del interpret
    Hp, C, Wp, N = x.shape
    H, W = Hp - 2 * FH, Wp - 2 * FW
    i = x[FH : FH + H, :, FW : FW + W, :]
    m = jnp.maximum(
        jnp.maximum(i[0::2, :, 0::2, :], i[0::2, :, 1::2, :]),
        jnp.maximum(i[1::2, :, 0::2, :], i[1::2, :, 1::2, :]),
    )
    return to_frame(m)


# ------------------------------------------------- transpose-conv upsample


def pack_wup(kernel_hwio):
    """(2,2,Cin,Cout) int8 — ``q["up"]["kernel"]`` as stored — → (2dy, 2dx,
    Cout, Cin) GEMM lhs. Orientation note: for k=2 s=2 VALID,
    ``lax.conv_transpose(x, k[::-1,::-1])`` (quant._conv_transpose2x2_i8)
    reduces to ``y[2h+dy, 2w+dx] = Σ_ci x[h,w,ci]·k[dy,dx,ci,co]`` — the
    explicit flip cancels conv_transpose's implicit rotation (pinned by
    tests/unit/test_qconv_pallas.py)."""
    k = np.asarray(kernel_hwio)
    return jnp.asarray(np.transpose(k, (0, 1, 3, 2)))


@functools.partial(jax.jit, static_argnames=("interpret",))
def qupsample2x2_requant(x, wup, a, bias, out_scale, interpret=None):
    """int8 2×2 stride-2 transpose conv + symmetric requant (no ReLU — the
    reference graph applies none here, unet_model.py:38-48 / quant.py) on
    frames: (H+2FH, Cin, W+2FW, N) → (2H+2FH, Cout, 2W+2FW, N).

    y[2h+dy, 2w+dx] = Σ_ci K[dy,dx,ci,co]·x[h,w,ci]  (non-overlapping taps).
    """
    if interpret is None:
        interpret = _interpret_default()
    Hp, Cin, Wp, N = x.shape
    H, W = Hp - 2 * FH, Wp - 2 * FW
    Cout = wup.shape[2]
    Hpo, Wpo = 2 * H + 2 * FH, 2 * W + 2 * FW

    wt = max(c for c in (16, 8, 4, 2, 1) if W % c == 0)
    while (Cin * wt * N) * 2 + 2 * 2 * Cout * 2 * wt * N > (10 << 20) and wt > 8:
        wt //= 2
    kl = Wpo // (2 * wt)
    bw_out = FW // (2 * wt)  # border tiles per side in out W blocks

    def kernel(x_ref, w_ref, a_ref, b_ref, os_ref, o_ref):
        ko = pl.program_id(0)
        jo = pl.program_id(1)
        interior = ((ko >= FH // 2) & (ko < (Hpo // 2) - FH // 2)
                    & (jo >= bw_out) & (jo < kl - bw_out))
        row = x_ref[0]                                  # (Cin, wt, N)
        inv_os = 127.0 / os_ref[0, 0]
        for dy in range(2):
            parts = []
            for dx in range(2):
                acc = jax.lax.dot_general(
                    w_ref[dy, dx], row,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )                                       # (Cout, wt, N)
                y = acc.astype(jnp.float32) * a_ref[:].reshape(Cout, 1, 1)
                y = y + b_ref[:].reshape(Cout, 1, 1)
                parts.append(y)
            inter = jnp.stack(parts, axis=2)            # (Cout, wt, 2, N)
            inter = inter.reshape(Cout, 2 * wt, N)
            q = jnp.clip(jnp.round(inter * inv_os), -127, 127)
            o_ref[dy] = jnp.where(interior, q, 0.0).astype(jnp.int8)

    return pl.pallas_call(
        kernel,
        grid=(Hpo // 2, kl),
        in_specs=[
            pl.BlockSpec(
                (1, Cin, wt, N),
                lambda ko, jo: (jnp.clip(ko + FH // 2, 0, Hp - 1), 0,
                                jnp.clip(jo + FW // wt - bw_out, 0,
                                         Wp // wt - 1), 0),
                memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 2, Cout, Cin), lambda ko, jo: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Cout, 1), lambda ko, jo: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Cout, 1), lambda ko, jo: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda ko, jo: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((2, Cout, 2 * wt, N),
                               lambda ko, jo: (ko, 0, jo, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Hpo, Cout, Wpo, N), jnp.int8),
        interpret=interpret,
    )(x, wup, a.astype(jnp.float32).reshape(-1, 1),
      bias.astype(jnp.float32).reshape(-1, 1),
      jnp.asarray(out_scale, jnp.float32).reshape(1, 1))


# ------------------------------------------------------------ XLA head


def head_rowcol_max_frame(xf, w, act_scale):
    """Frame (H+2FH, C, W+2FW, N) s8 final activations → bias-free logit
    row/col maxima via an XLA einsum (a Pallas head was measured
    latency-bound — see module docstring).

    Returns (row_max (N, H, 3), col_max (N, W, 3)) f32.
    """
    x = from_frame(xf)                                  # (H, C, W, N)
    # bf16 operands on TPU (int8 values are exact in bf16; weights round
    # like the serving graph); the CPU backend's dot thunk can't mix
    # bf16×bf16→f32, so tests compute in f32 after the same bf16 rounding
    dot_t = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    wf = (w.astype(jnp.float32) * act_scale).astype(jnp.bfloat16)  # (C, 3)
    logits = jnp.einsum(
        "hcwn,ck->hkwn", x.astype(dot_t), wf.astype(dot_t),
        preferred_element_type=jnp.float32,
    )                                                   # (H, 3, W, N)
    row_max = jnp.max(logits, axis=2)                   # (H, 3, N)
    col_max = jnp.max(logits, axis=0)                   # (3, W, N)
    return (
        jnp.transpose(row_max, (2, 0, 1)),              # (N, H, 3)
        jnp.transpose(col_max, (2, 1, 0)),              # (N, W, 3)
    )
