"""Search templates (_search/template + stored scripts) and the _cat
endpoints."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from raybm25.index.build import build_index
from raybm25.query.cat import cat_aliases, cat_count, cat_indices, cat_templates
from raybm25.query.dsl import run_query
from raybm25.query.engine import IndexReader
from raybm25.query.searchtemplate import (
    delete_script,
    get_script,
    put_script,
    render_template,
    run_search_template,
)


@pytest.fixture(scope="module")
def env(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("tmplcat")
    pq.write_table(
        pa.table(
            {
                "doc_id": [0, 1, 2, 3],
                "text": ["merge join", "merge sort", "join stream",
                         "stream window"],
                "lang": ["en", "de", "en", "en"],
            }
        ),
        str(tmp / "d.parquet"),
    )
    root = str(tmp / "indexes")
    idx = f"{root}/pages"
    build_index(str(tmp / "d.parquet"), idx, key_col="doc_id",
                id_col="doc_id", ts_col=None, keyword_cols=("lang",),
                stored_cols=["text", "lang"], num_buckets=2)
    return root, idx


def test_render_types_preserved():
    out = render_template(
        {"size": "{{k}}", "query": {"terms": {"lang": "{{langs}}"}},
         "note": "top {{k}} hits"},
        {"k": 5, "langs": ["en", "de"]},
    )
    assert out["size"] == 5                      # raw int, not "5"
    assert out["query"]["terms"]["lang"] == ["en", "de"]
    assert out["note"] == "top 5 hits"           # embedded stringifies


def test_render_tojson_and_missing():
    out = render_template(
        {"f": "{{#toJson}}clauses{{/toJson}}"}, {"clauses": [{"a": 1}]}
    )
    assert out["f"] == [{"a": 1}]
    with pytest.raises(ValueError, match="missing template param"):
        render_template({"x": "{{nope}}"}, {})
    with pytest.raises(ValueError, match="unsupported mustache"):
        render_template({"x": "{{#each}}y{{/each}}"}, {"each": 1})


def test_inline_search_template(env):
    _root, idx = env
    r = IndexReader(idx)
    out = run_search_template(
        r,
        {
            "source": {
                "query": {"match": {"text": "{{q}}"}},
                "size": "{{k}}",
            },
            "params": {"q": "merge", "k": 2},
        },
    )
    direct = run_query(r, {"query": {"match": {"text": "merge"}},
                           "size": 2})
    # `took` is wall-clock ms — drop it before comparing responses
    out.pop("took", None), direct.pop("took", None)
    assert out == direct


def test_stored_template_roundtrip(env):
    root, idx = env
    put_script(root, "by_lang", {
        "query": {"bool": {"must": [{"match": {"text": "{{q}}"}}],
                           "filter": [{"term": {"lang": "{{lang}}"}}]}},
    })
    assert "query" in get_script(root, "by_lang")
    out = run_search_template(
        IndexReader(idx),
        {"id": "by_lang", "params": {"q": "merge", "lang": "en"}},
        script_root=root,
    )
    assert [h["_id"] for h in out["hits"]["hits"]] == [0]
    assert cat_templates(root) == [{"name": "by_lang"}]
    delete_script(root, "by_lang")
    with pytest.raises(ValueError):
        get_script(root, "by_lang")


def test_template_body_validation(env):
    _root, idx = env
    with pytest.raises(ValueError, match="exactly one"):
        run_search_template(IndexReader(idx), {"params": {}})
    with pytest.raises(ValueError, match="script_root"):
        run_search_template(IndexReader(idx), {"id": "x", "params": {}})


def test_cat_indices_count_aliases(env):
    root, idx = env
    rows = cat_indices(root)
    assert rows == [
        {"index": "pages", "status": "open", "docs.count": 4,
         "docs.deleted": 0, "store.size_bytes": rows[0]["store.size_bytes"]}
    ]
    assert rows[0]["store.size_bytes"] > 0
    assert cat_count(idx) == [{"count": 4}]
    from raybm25.loader.aliases import put_alias

    put_alias(root, "logs", ["pages"])
    assert cat_aliases(root) == [{"alias": "logs", "index": "pages"}]
