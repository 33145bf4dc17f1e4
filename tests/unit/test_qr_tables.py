"""Spec-table consistency for the QR encoder/decoder version tables.

The per-version EC block structure (qr/encode.py _EC_TABLE, mirrored in
native/qrdecode.cpp EC_TABLE) is public ISO/IEC 18004 data; this test pins
it against codeword totals derived from first principles (module geometry),
so a mis-transcribed row cannot hide behind an encoder/decoder shared bug.
"""

from twinvoice_tpu.qr.encode import _ALIGN_POS, _EC_TABLE


def total_codewords(v: int) -> int:
    n = 17 + 4 * v
    total = n * n
    total -= 3 * 64                # finder + separator corners (8x8 each)
    total -= 2 * (n - 16)          # timing rows/cols
    centers = _ALIGN_POS[v]
    if centers:
        k = len(centers)
        total -= (k * k - 3) * 25  # alignment patterns (minus finder corners)
        total += 2 * (k - 2) * 5   # alignment-on-timing double counting
    total -= 31                    # format info + dark module
    if v >= 7:
        total -= 36                # version info blocks
    return total // 8


def test_ec_table_consistent_with_geometry():
    for v in range(1, 41):
        want = total_codewords(v)
        for level, (ec, g1b, g1dc, g2b, g2dc) in _EC_TABLE[v].items():
            got = g1b * (g1dc + ec) + g2b * (g2dc + ec)
            assert got == want, (v, level, got, want)


def test_align_positions_well_formed():
    for v in range(2, 41):
        c = _ALIGN_POS[v]
        assert c[0] == 6
        assert c[-1] == 17 + 4 * v - 7          # flush with the right finder
        assert all((b - a) % 2 == 0 and b > a for a, b in zip(c, c[1:]))


def test_group2_blocks_hold_one_extra_codeword():
    # when group 2 exists its blocks carry exactly one more data codeword
    for v in range(1, 41):
        for level, (ec, g1b, g1dc, g2b, g2dc) in _EC_TABLE[v].items():
            if g2b:
                assert g2dc == g1dc + 1, (v, level)
