"""End-to-end drive of examples/indices.example.yaml — the 'a user of
the reference could switch' evidence: every index type from the
reference's own example spec (query-analog parquet with dotted nested
columns, multiple update sources, about-file, model) loads through the
Loader and serves."""

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture()
def example_data(tmp_path):
    def write(name, table):
        d = tmp_path / name
        d.mkdir(exist_ok=True)
        pq.write_table(table, str(d / "part-0.parquet"))

    write(
        "users",
        pa.table(
            {
                "user_id": [f"u{i}" for i in range(40)],
                "name": [f"user {i}" for i in range(40)],
                "email": [f"u{i}@example.test" for i in range(40)],
                "status": ["active" if i % 2 else "inactive" for i in range(40)],
                "tags": pa.array([["alpha", "beta"] if i % 3 else ["gamma"] for i in range(40)]),
                "description": [f"likes indexing engine {i}" for i in range(40)],
                "bio": [f"builder of searchable things number{i}" for i in range(40)],
                "created_at": pa.array([1000 + i for i in range(40)], pa.int64()),
                "updated_at": pa.array([2000 + i for i in range(40)], pa.int64()),
                "last_active": pa.array([3000 + i for i in range(40)], pa.int64()),
            }
        ),
    )
    write(
        "users_upd_ts",
        pa.table(
            {
                "user_id": ["u3", "u5"],
                "updated_at": pa.array([9999, 9998], pa.int64()),
            }
        ),
    )
    write(
        "users_upd_status",
        pa.table({"user_id": ["u3", "ghost"], "status": ["suspended", "x"]}),
    )
    write(
        "products",
        pa.table(
            {
                "product_id": [f"p{i}" for i in range(30)],
                "name": [f"widget model{i}" for i in range(30)],
                "category": ["tools"] * 30,
                "tags": pa.array([["sale"]] * 30),
                "metadata.category": ["hardware" if i % 2 else "software" for i in range(30)],
                "metadata.brand": ["acme"] * 30,
                "description": [f"a fine widget number {i}" for i in range(30)],
                "metadata.notes": [f"note text {i}" for i in range(30)],
                "price": pa.array([100 + i for i in range(30)], pa.int64()),
                "price_updated": pa.array([0] * 30, pa.int64()),
            }
        ),
    )
    write(
        "products_upd",
        pa.table(
            {
                "product_id": ["p7"],
                "price": pa.array([777], pa.int64()),
                "price_updated": pa.array([42], pa.int64()),
            }
        ),
    )
    write(
        "orders",
        pa.table(
            {
                "order_id": [f"o{i}" for i in range(20)],
                "customer_id": [f"u{i % 5}" for i in range(20)],
                "status": ["shipped"] * 20,
                "shipping.city": ["berlin" if i % 2 else "paris" for i in range(20)],
                "shipping.country": ["de" if i % 2 else "fr" for i in range(20)],
                "billing.city": ["berlin"] * 20,
                "payment.method": ["card"] * 20,
                "items": pa.array([["sku1", "sku2"]] * 20),
                "notes": [f"deliver order {i} fastly" for i in range(20)],
                "shipping.instructions": [f"ring bell {i} times" for i in range(20)],
                "customer_name": [f"customer number{i % 5}" for i in range(20)],
                "total_amount": pa.array([50 + i for i in range(20)], pa.int64()),
                "shipping.cost": pa.array([5] * 20, pa.int64()),
                "created_at": pa.array([i for i in range(20)], pa.int64()),
                "is_express": pa.array([i % 2 == 0 for i in range(20)]),
                "payment.is_verified": pa.array([True] * 20),
            }
        ),
    )
    # spec paths are relative to the example file's conventions; rewrite
    # them to the tmp data dirs
    with open(os.path.join(REPO, "examples", "indices.example.yaml")) as f:
        spec = yaml.safe_load(f)
    for entry in spec["indices"]:
        for s in [entry.get("source", {})] + entry.get("update_sources", []):
            if s.get("type", "parquet") == "parquet" and s.get("path"):
                s["path"] = str(tmp_path / s["path"].lstrip("./"))
    return spec, tmp_path


def test_reference_example_spec_end_to_end(ray_session, example_data):
    from raybm25.hashing import hash64
    from raybm25.loader.runner import Loader
    from raybm25.query.engine import IndexReader

    spec, tmp_path = example_data
    root = str(tmp_path / "indexes")
    summary = Loader(
        spec, root, about_file=os.path.join(REPO, "examples", "about.example.yaml")
    ).load()
    stats = {s["index"]: s for s in summary["indices"]}
    assert stats["users"]["docs"] == 40
    assert stats["products"]["docs"] == 30
    assert stats["orders"]["docs"] == 20
    assert stats["about_page"]["docs"] == 2      # page-less entry skipped
    assert stats["model_nodes"]["docs"] == 6  # node/property/value docs
    assert all(s["error"] is None for s in summary["indices"])

    # users: updates applied through BOTH update sources
    ru = IndexReader(os.path.join(root, "users"))
    u3 = hash64(np.array(["u3"], dtype=object))
    doc = ru.get_docs(u3).to_pandas().iloc[0]
    assert doc["updated_at"] == 9999 and doc["status"] == "suspended"
    # keyword array: one term per element
    assert len(ru.term_docs("tags", "gamma")) == len([i for i in range(40) if i % 3 == 0])
    # sayt prefix over bio
    assert len(ru.term_docs("bio", "#searc")) == 40

    # products: dotted nested keyword + text fields are first-class
    rp = IndexReader(os.path.join(root, "products"))
    assert len(rp.term_docs("metadata.category", "hardware")) == 15
    hits = rp.search_pruned("note text 7", 3, field="metadata.notes")
    assert hits
    p7 = hash64(np.array(["p7"], dtype=object))
    assert rp.get_docs(p7).to_pandas().iloc[0]["price"] == 777  # update applied

    # orders: nested keyword/bool + sayt
    ro = IndexReader(os.path.join(root, "orders"))
    assert len(ro.term_docs("shipping.country", "fr")) == 10
    assert len(ro.term_docs("customer_name", "#numb")) == 20

    # about: doc id page{n}
    ra = IndexReader(os.path.join(root, "about_page"))
    page2 = hash64(np.array(["page2"], dtype=object))
    assert ra.get_docs(page2).to_pandas().iloc[0]["title"] == "Team"
