"""Ingest-pipeline processors: each kind vs expected output, compile-
time validation, ignore_missing, and the map_batches stage."""

import pyarrow as pa
import pytest

from raybm25.loader.ingest import IngestStage, compile_pipeline


def _t(**cols):
    return pa.table(cols)


def test_each_processor():
    t = _t(a=[" X ", "y"], n=[1, 2], s=["p-q", "r"])
    out = compile_pipeline(
        [
            {"trim": {"field": "a"}},
            {"lowercase": {"field": "a"}},
            {"set": {"field": "tag", "value": "v"}},
            {"rename": {"field": "n", "target_field": "num"}},
            {"convert": {"field": "num", "type": "string"}},
            {"gsub": {"field": "s", "pattern": "-", "replacement": "_"}},
            {"split": {"field": "s", "separator": "_"}},
        ]
    )(t)
    assert out.column("a").to_pylist() == ["x", "y"]
    assert out.column("tag").to_pylist() == ["v", "v"]
    assert "n" not in out.column_names
    assert out.column("num").to_pylist() == ["1", "2"]
    assert out.column("s").to_pylist() == [["p", "q"], ["r"]]


def test_uppercase_remove_and_set_override():
    t = _t(a=["x"], b=["keep"])
    out = compile_pipeline(
        [
            {"uppercase": {"field": "a"}},
            {"remove": {"field": "b"}},
            {"set": {"field": "a", "value": "z", "override": False}},
        ]
    )(t)
    assert out.column("a").to_pylist() == ["X"]  # override=False kept it
    assert out.column_names == ["a"]


def test_convert_types():
    t = _t(x=["1", "2"], y=[1.5, 2.5], z=[0, 1])
    out = compile_pipeline(
        [
            {"convert": {"field": "x", "type": "integer"}},
            {"convert": {"field": "y", "type": "string"}},
            {"convert": {"field": "z", "type": "boolean"}},
        ]
    )(t)
    assert out.column("x").to_pylist() == [1, 2]
    assert out.column("z").to_pylist() == [False, True]


def test_missing_field_and_ignore_missing():
    t = _t(a=["x"])
    with pytest.raises(ValueError, match="missing field"):
        compile_pipeline([{"lowercase": {"field": "nope"}}])(t)
    out = compile_pipeline(
        [{"lowercase": {"field": "nope", "ignore_missing": True}}]
    )(t)
    assert out.column_names == ["a"]


def test_compile_time_validation():
    with pytest.raises(ValueError, match="unsupported ingest processor"):
        compile_pipeline([{"frobnicate": {"field": "a"}}])
    with pytest.raises(ValueError, match="set needs"):
        compile_pipeline([{"set": {"field": "a"}}])
    with pytest.raises(ValueError, match="convert type"):
        compile_pipeline([{"convert": {"field": "a", "type": "decimal"}}])
    with pytest.raises(ValueError, match="single-key"):
        compile_pipeline([{"set": {}, "remove": {}}])


def test_rename_collision_raises():
    t = _t(a=["x"], b=["y"])
    with pytest.raises(ValueError, match="already exists"):
        compile_pipeline([{"rename": {"field": "a", "target_field": "b"}}])(t)


def test_map_batches_stage(ray_session):
    import ray.data

    ds = ray.data.from_arrow(_t(a=["Hello", "World"], n=[1, 2]))
    out = ds.map_batches(
        IngestStage([{"lowercase": {"field": "a"}}]),
        batch_format="pyarrow",
    ).to_pandas()
    assert sorted(out["a"]) == ["hello", "world"]


def test_build_index_with_ingest_pipeline(ray_session, tmp_path):
    """build_index(ingest=...): processors run before tokenize; the
    pruned read includes processor source columns and excludes
    produced ones (a renamed text column doesn't exist in source)."""
    import numpy as np
    import pyarrow.parquet as pq

    from raybm25.index.build import build_index
    from raybm25.query.engine import IndexReader

    pa_tbl = pa.table(
        {
            "doc_id": [0, 1, 2],
            "body": ["QUICK Fox", "lazy DOG", "QUICK dog"],
        }
    )
    pq.write_table(pa_tbl, str(tmp_path / "src.parquet"))
    idx = str(tmp_path / "idx")
    build_index(
        str(tmp_path / "src.parquet"),
        idx,
        key_col="doc_id",
        id_col="doc_id",
        ts_col=None,
        text_cols=("text",),
        stored_cols=["text"],
        num_buckets=2,
        ingest=[
            {"rename": {"field": "body", "target_field": "text"}},
            {"lowercase": {"field": "text"}},
        ],
    )
    r = IndexReader(idx)
    assert r.n_docs == 3
    hits = r.search("quick", k=5)
    assert sorted(d for d, _ in hits) == [0, 2]
    stored = r.get_docs(np.array([0], dtype=np.uint64))
    assert stored.column("text").to_pylist() == ["quick fox"]


def test_json_processor_struct_and_root(ray_session):
    import pyarrow as pa

    from raybm25.loader.ingest import compile_pipeline

    t = pa.table({
        "id": [1, 2, 3],
        "props": ['{"k": 5, "tag": "a"}', '{"k": 7, "tag": "b"}', None],
    })
    # add_to_root: keys become top-level columns; null rows parse as {}
    out = compile_pipeline(
        [{"json": {"field": "props", "add_to_root": True}}]
    )(t)
    assert out.column("k").to_pylist() == [5, 7, None]
    assert out.column("tag").to_pylist() == ["a", "b", None]
    # target_field: struct column
    out2 = compile_pipeline(
        [{"json": {"field": "props", "target_field": "p"}}]
    )(t)
    assert out2.column("p").to_pylist()[0] == {"k": 5, "tag": "a"}
    # in-place (default target = source field)
    out3 = compile_pipeline([{"json": {"field": "props"}}])(t)
    assert out3.column("props").to_pylist()[1] == {"k": 7, "tag": "b"}


def test_json_processor_errors(ray_session):
    import pyarrow as pa
    import pytest

    from raybm25.loader.ingest import compile_pipeline

    with pytest.raises(ValueError):
        compile_pipeline([{"json": {"field": "p", "add_to_root": True,
                                    "target_field": "x"}}])
    t = pa.table({"k": [1], "props": ['{"k": 2}']})
    with pytest.raises(ValueError):
        # add_to_root key collides with existing column
        compile_pipeline([{"json": {"field": "props",
                                    "add_to_root": True}}])(t)
    t2 = pa.table({"props": ['{"a":\n 1}']})
    with pytest.raises(ValueError):
        compile_pipeline([{"json": {"field": "props"}}])(t2)
    # empty batch passes through
    t3 = pa.table({"props": pa.array([], pa.string())})
    out = compile_pipeline([{"json": {"field": "props"}}])(t3)
    assert len(out) == 0
