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
