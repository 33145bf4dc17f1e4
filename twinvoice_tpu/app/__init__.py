"""UI layer. ``twinvoice_tpu.app.dashboard`` holds the (streamlit-free,
testable) data aggregation; ``twinvoice_tpu.app.main`` is the Streamlit app
itself (gated — streamlit is optional)."""

from twinvoice_tpu.app.dashboard import (
    prepare_frames,
    monthly_totals,
    category_totals,
    year_summary,
)
