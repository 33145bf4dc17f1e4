"""InvoiceStore contract tests against the in-memory backend, plus the
supabase client against a scripted fake client (SURVEY.md §4.3)."""

from twinvoice_tpu.store.base import invoice_row_from_meta, item_rows
from twinvoice_tpu.store.memory import MemoryStore
from twinvoice_tpu.store.supabase_store import SupabaseStore


META = {
    "invoice_no": "AB12345678XX",  # deliberately >10 chars
    "date": "2025-09-09",
    "total_amount": "120",
    "category": "餐飲",
    "source": "QR",
    "qr_raw": ["a", "b"],
}
ITEMS = [{"name": "奶茶", "qty": 2, "price": 30, "amount": 60}]


def test_row_shaping():
    row = invoice_row_from_meta(META, ITEMS)
    assert row["invoice_no"] == "AB12345678"  # truncated to 10
    assert row["total_amount"] == 120
    assert row["details"]["qr_count"] == 2
    assert invoice_row_from_meta({}, [])["category"] == "未分類"
    assert invoice_row_from_meta({"total_amount": None}, [])["total_amount"] == 0


def test_memory_store_save_list_delete():
    store = MemoryStore()
    i1 = store.save_invoice(META, ITEMS)
    i2 = store.save_invoice({**META, "invoice_no": "CD11111111"}, [])
    assert (i1, i2) == (1, 2)

    invs = store.list_invoices()
    assert [r["id"] for r in invs] == [2, 1]  # newest first
    items = store.list_items()
    assert len(items) == 1 and items[0]["invoice_id"] == 1

    assert store.delete_invoice(1)
    assert store.list_items() == []
    assert not store.delete_invoice(99)


class _FakeTable:
    def __init__(self, db, name):
        self.db, self.name = db, name
        self._op = None
        self._rows = None
        self._filters = []

    def insert(self, rows):
        self._op = ("insert", rows)
        return self

    def delete(self):
        self._op = ("delete", None)
        return self

    def select(self, *_):
        self._op = ("select", None)
        return self

    def eq(self, col, val):
        self._filters.append((col, val))
        return self

    def order(self, *a, **k):
        return self

    def limit(self, n):
        return self

    def execute(self):
        op, payload = self._op
        table = self.db.setdefault(self.name, [])

        class R:
            data = None

        r = R()
        if op == "insert":
            rows = payload if isinstance(payload, list) else [payload]
            for row in rows:
                row = dict(row)
                row.setdefault("id", len(table) + 1)
                table.append(row)
            r.data = rows if isinstance(payload, list) else [table[-1]]
        elif op == "delete":
            self.db[self.name] = [
                row for row in table
                if not all(row.get(c) == v for c, v in self._filters)
            ]
            r.data = []
        else:
            r.data = list(table)
        return r


class _FakeClient:
    def __init__(self):
        self.db = {}

    def table(self, name):
        return _FakeTable(self.db, name)


def test_supabase_store_against_fake_client():
    client = _FakeClient()
    store = SupabaseStore(client=client)
    assert store.available()
    inv_id = store.save_invoice(META, ITEMS)
    assert inv_id == 1
    assert len(client.db["invoice_items"]) == 1
    assert store.list_invoices()[0]["invoice_no"] == "AB12345678"
    assert store.delete_invoice(inv_id)
    assert client.db["invoices_data"] == []
    assert client.db["invoice_items"] == []


def test_supabase_store_unavailable_without_creds(monkeypatch):
    monkeypatch.delenv("SUPABASE_URL", raising=False)
    monkeypatch.delenv("SUPABASE_KEY", raising=False)
    store = SupabaseStore()
    assert not store.available()
    assert store.save_invoice(META, ITEMS) is None
    assert store.list_invoices() == []
