"""Dashboard aggregation tests (reference tab2 behavior, app_camera.py:1091-1259)."""

import pytest

from twinvoice_tpu.app import dashboard as D
from twinvoice_tpu.store.memory import MemoryStore


@pytest.fixture
def store():
    s = MemoryStore()
    rows = [
        ("AB11111111", "2025-01-15", "100", "餐飲"),
        ("AB22222222", "2025-01-20", "50", "交通"),
        ("AB33333333", "2025-02-05", "200", "餐飲"),
        ("AB44444444", "2024-12-31", "999", "購物"),
        ("AB55555555", None, "77", "生活"),  # bad date → NaT, excluded from years
    ]
    for no, date, amt, cat in rows:
        s.save_invoice(
            {"invoice_no": no, "date": date, "total_amount": amt, "category": cat,
             "source": "QR", "qr_raw": []},
            [{"name": "x", "qty": 1, "price": int(amt), "amount": int(amt)}],
        )
    return s


def test_prepare_and_years(store):
    df, df_items = D.prepare_frames(store.list_invoices(), store.list_items())
    assert len(df) == 5 and len(df_items) == 5
    assert df["total_amount"].dtype.kind == "i"
    ys = D.years(df)
    assert "2025" in ys and "2024" in ys
    assert ys == sorted(ys, reverse=True)


def test_year_summary_and_monthly(store):
    df, _ = D.prepare_frames(store.list_invoices(), store.list_items())
    df25, total = D.year_summary(df, "2025")
    assert total == 350
    mon = D.monthly_totals(df25)
    got = dict(zip(mon["month"], mon["total_amount"]))
    assert got == {"2025-01": 150, "2025-02": 200}
    assert set(mon["month_label"]) == {"01", "02"}


def test_category_totals_with_month_filter(store):
    df, _ = D.prepare_frames(store.list_invoices(), store.list_items())
    df25, _ = D.year_summary(df, "2025")
    all_year = dict(
        zip(*(D.category_totals(df25)[c] for c in ("category", "total_amount")))
    )
    assert all_year == {"餐飲": 300, "交通": 50}
    jan = dict(
        zip(*(D.category_totals(df25, "2025-01")[c] for c in ("category", "total_amount")))
    )
    assert jan == {"餐飲": 100, "交通": 50}


def test_invoices_sorted_and_items(store):
    df, df_items = D.prepare_frames(store.list_invoices(), store.list_items())
    df25, _ = D.year_summary(df, "2025")
    ordered = D.invoices_sorted(df25)
    dates = [d.strftime("%Y-%m-%d") for d in ordered["date"]]
    assert dates == sorted(dates, reverse=True)
    iid = int(ordered.iloc[0]["id"])
    its = D.items_for_invoice(df_items, iid)
    assert len(its) == 1 and int(its.iloc[0]["invoice_id"]) == iid


def test_empty_store():
    df, df_items = D.prepare_frames([], [])
    assert df.empty and D.years(df) == []
