"""Index aliases + wildcard patterns (_aliases / GET /logs-*/_search)."""

import pyarrow as pa
import pytest

from raybm25.index.build import build_index
from raybm25.loader.aliases import (
    delete_alias,
    get_aliases,
    put_alias,
    resolve_indices,
    search_indices,
)


@pytest.fixture(scope="module")
def root(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("aliases")
    import pyarrow.parquet as pq

    for name, docs in (
        ("logs-2026-01", ["error disk", "boot ok"]),
        ("logs-2026-02", ["error net error", "fine"]),
        ("metrics", ["cpu high"]),
    ):
        pq.write_table(
            pa.table({"doc_id": list(range(len(docs))), "text": docs}),
            str(tmp / f"{name}.parquet"),
        )
        build_index(str(tmp / f"{name}.parquet"), str(tmp / name),
                    key_col="doc_id", id_col="doc_id", ts_col=None, num_buckets=2)
    return str(tmp)


def test_wildcard_pattern(root):
    dirs = resolve_indices(root, "logs-*")
    assert [d.rsplit("/", 1)[1] for d in dirs] == ["logs-2026-01", "logs-2026-02"]
    with pytest.raises(ValueError, match="matched nothing"):
        resolve_indices(root, "nope-*")


def test_alias_lifecycle(root):
    put_alias(root, "logs", ["logs-2026-01", "logs-2026-02"])
    assert get_aliases(root) == {"logs": ["logs-2026-01", "logs-2026-02"]}
    assert [d.rsplit("/", 1)[1] for d in resolve_indices(root, "logs")] == [
        "logs-2026-01", "logs-2026-02",
    ]
    with pytest.raises(ValueError, match="unknown indices"):
        put_alias(root, "bad", ["ghost"])
    delete_alias(root, "logs")
    with pytest.raises(KeyError):
        delete_alias(root, "logs")
    with pytest.raises(ValueError, match="no index, alias or pattern"):
        resolve_indices(root, "logs")


def test_comma_list_and_plain(root):
    dirs = resolve_indices(root, "metrics, logs-2026-01")
    assert [d.rsplit("/", 1)[1] for d in dirs] == ["metrics", "logs-2026-01"]


def test_search_over_pattern(root):
    resp = search_indices(
        root, "logs-*", {"query": {"match": {"text": "error"}}, "size": 10}
    )
    got = {(h["_index"], h["_id"]) for h in resp["hits"]["hits"]}
    assert got == {("logs-2026-01", 0), ("logs-2026-02", 0)}
    # doc with two "error" occurrences ranks first
    assert resp["hits"]["hits"][0]["_index"] == "logs-2026-02"
