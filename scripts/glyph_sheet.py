"""Render the in-repo stroke font's full glyph coverage to a PNG sheet.

The fidelity contract for ocr/fonts/tw_glyphs.py is "clearly recognizable
when rendered"; this is the tool that produces the sheet a human eyeballs
to check it (referenced from tw_glyphs.py's module docstring).

Usage: python scripts/glyph_sheet.py [out.png] [--size N]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(out_path="glyph_sheet.png", size=64):
    from PIL import Image

    from twinvoice_tpu.ocr.fonts import strokefont

    chars = sorted(strokefont.coverage())
    cols = 16
    rows = (len(chars) + cols - 1) // cols
    glyphs = [strokefont.render_char(ch, size=size) for ch in chars]
    cell = max(max(g.shape) for g in glyphs) + 4
    sheet = np.full((rows * cell, cols * cell), 255, np.uint8)
    for i, g in enumerate(glyphs):
        r, c = divmod(i, cols)
        sheet[r * cell + 2 : r * cell + 2 + g.shape[0],
              c * cell + 2 : c * cell + 2 + g.shape[1]] = g
    Image.fromarray(sheet).save(out_path)
    print(f"{len(chars)} glyphs -> {out_path} ({rows}x{cols} cells)")


if __name__ == "__main__":
    size = 64
    if "--size" in sys.argv:
        i = sys.argv.index("--size")
        size = int(sys.argv[i + 1])
        del sys.argv[i : i + 2]
    main(sys.argv[1] if len(sys.argv) > 1 else "glyph_sheet.png", size)
