"""Dashboard aggregation — the computation behind the reference's tab2
(app_camera.py:1091-1259), factored out of the UI so it's unit-testable and
reusable (the reference interleaves pandas transforms with streamlit calls).

Behavior matched: amount coerced numeric→int with NaN→0, date→datetime with
coercion, year/month derived columns (app_camera.py:1119-1124), newest-first
ordering, monthly bar totals (1174-1175), category pie totals (1249-1255).
"""

from __future__ import annotations

from typing import List, Optional


def prepare_frames(invoices: List[dict], items: List[dict]):
    """Raw store rows → (df_invoices with year/month cols, df_items)."""
    import pandas as pd

    df = pd.DataFrame(invoices)
    df_items = pd.DataFrame(items)
    if not df.empty:
        df["total_amount"] = (
            pd.to_numeric(df["total_amount"], errors="coerce").fillna(0).astype(int)
        )
        df["date"] = pd.to_datetime(df["date"], errors="coerce")
        year = df["date"].dt.year
        df["year"] = year.map(lambda y: "" if pd.isna(y) else str(int(y)))
        df["month"] = df["date"].dt.to_period("M").astype(str)
    return df, df_items


def years(df) -> List[str]:
    if df.empty:
        return []
    return sorted((y for y in df["year"].unique().tolist() if y), reverse=True)


def year_summary(df, year: str):
    """(filtered df, total spend for the year)."""
    sel = df[df["year"] == year].copy()
    total = int(sel["total_amount"].sum()) if not sel.empty else 0
    return sel, total


def months_in(df_year) -> List[str]:
    return sorted(df_year["month"].unique().tolist(), reverse=True)


def monthly_totals(df_year):
    """Per-month totals for the bar chart; adds a 2-digit month label."""
    mon = df_year.groupby("month")["total_amount"].sum().reset_index()
    mon["month_label"] = mon["month"].str[-2:]
    return mon


def category_totals(df_year, month: Optional[str] = None):
    """Per-category totals for the pie chart, optionally month-filtered."""
    sel = df_year if month is None else df_year[df_year["month"] == month]
    return sel.groupby("category")["total_amount"].sum().reset_index()


def invoices_sorted(df_year, month: Optional[str] = None):
    sel = df_year if month is None else df_year[df_year["month"] == month]
    return sel.sort_values("date", ascending=False)


def items_for_invoice(df_items, invoice_id: int):
    if df_items.empty:
        return df_items
    return df_items[df_items["invoice_id"] == invoice_id]
