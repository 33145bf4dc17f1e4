from twinvoice_tpu.ocr.fonts.strokefont import (  # noqa: F401
    coverage,
    draw_text,
    has_glyph,
    render_char,
    render_text,
)
