"""_mapping / _settings introspection endpoints."""

import pyarrow as pa
import pytest

from raybm25.index.build import build_index
from raybm25.query.dsl import run_get_mapping, run_get_settings


@pytest.fixture(scope="module")
def idx(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("mapend")
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "doc_id": [0, 1],
                "text": ["alpha beta", "gamma"],
                "title": ["t one", "t two"],
                "lang": ["en", "de"],
                "n": [10, 20],
                "embedding": [[0.1, 0.2], [0.3, 0.4]],
            }
        ),
        str(tmp / "d.parquet"),
    )
    out = str(tmp / "idx")
    build_index(
        str(tmp / "d.parquet"),
        out,
        key_col="doc_id",
        id_col="doc_id",
        ts_col=None,
        text_cols=("text",),
        sayt_cols=(),
        keyword_cols=("lang",),
        stored_cols=["text", "title", "lang", "n", "embedding"],
        num_buckets=2,
        positions=True,
        k1=1.4,
        b=0.6,
    )
    return out


def test_mapping_reconstruction(idx):
    m = run_get_mapping(idx)["mappings"]
    assert m["dynamic"] is False
    p = m["properties"]
    assert p["text"]["type"] == "text" and p["text"]["index_options"] == "positions"
    assert p["lang"]["type"] == "keyword"
    assert p["n"]["type"] == "long"
    assert p["embedding"]["type"] == "knn_vector"
    assert p["title"] == {"type": "keyword", "index": False}  # stored, unindexed
    assert "doc_id" not in p and "dl" not in p and "texth" not in p


def test_settings(idx):
    s = run_get_settings(idx)["settings"]["index"]
    assert s["similarity"]["default"] == {"type": "BM25", "k1": 1.4, "b": 0.6}
    assert s["positions"] is True
    assert s["docstore_partitions"] == 2
    assert s["analysis"]["analyzer"]


@pytest.fixture(scope="module")
def idx2(ray_session, tmp_path_factory):
    """Second index where ``n`` is a DOUBLE (field-caps type conflict)."""
    tmp = tmp_path_factory.mktemp("mapend2")
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "doc_id": [0, 1],
                "text": ["delta epsilon", "zeta"],
                "lang": ["fr", "en"],
                "n": [1.5, 2.5],
            }
        ),
        str(tmp / "d.parquet"),
    )
    out = str(tmp / "idx2")
    build_index(
        str(tmp / "d.parquet"),
        out,
        key_col="doc_id",
        id_col="doc_id",
        ts_col=None,
        text_cols=("text",),
        sayt_cols=(),
        keyword_cols=("lang",),
        stored_cols=["text", "lang", "n"],
        num_buckets=2,
    )
    return out


def test_field_caps_single(idx):
    from raybm25.query.dsl import run_field_caps

    caps = run_field_caps(idx)
    assert caps["indices"] == ["idx"]
    f = caps["fields"]
    assert f["text"] == {
        "text": {"type": "text", "searchable": True, "aggregatable": False}
    }
    assert f["lang"]["keyword"]["aggregatable"] is True
    assert f["n"]["long"] == {
        "type": "long", "searchable": True, "aggregatable": True
    }
    assert f["embedding"]["knn_vector"]["aggregatable"] is False
    # stored-only (index: False) columns are not searchable -> omitted
    assert "title" not in f and "doc_id" not in f


def test_field_caps_multi_index_conflict(idx, idx2):
    from raybm25.query.dsl import run_field_caps

    caps = run_field_caps([idx, idx2])
    assert caps["indices"] == ["idx", "idx2"]
    n = caps["fields"]["n"]
    # conflicting types each carry the indices that use them
    assert set(n) == {"long", "double"}
    assert n["long"]["indices"] == ["idx"]
    assert n["double"]["indices"] == ["idx2"]
    # non-conflicting fields merge with no indices annotation
    assert "indices" not in caps["fields"]["text"]["text"]
    # fields= filter
    only = run_field_caps([idx, idx2], fields=["lang"])
    assert list(only["fields"]) == ["lang"]
