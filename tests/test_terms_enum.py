"""_terms_enum endpoint: prefix filtering, size cap, search_after
pagination, complete flag, and the keyword-field path — against the
brute-force token set. Reference behavior: OpenSearch POST
/<index>/_terms_enum (Lucene FST dictionary walk)."""

import re

import pyarrow as pa
import pytest

from raybm25.index.build import build_index
from raybm25.query.dsl import run_terms_enum
from raybm25.query.engine import IndexReader

TOK = re.compile(r"[a-z0-9]+")

DOCS = [
    "apple apricot banana",
    "banana cherry APPLE",
    "date apricot elder fig",
    "grape fig cherry",
]
LANGS = ["en", "de", "en", "fr"]


@pytest.fixture(scope="module")
def rdr(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("tenum")
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table({"doc_id": list(range(len(DOCS))), "text": DOCS,
                  "lang": LANGS}),
        str(tmp / "d.parquet"),
    )
    idx = str(tmp / "idx")
    build_index(str(tmp / "d.parquet"), idx, key_col="doc_id",
                id_col="doc_id", ts_col=None, keyword_cols=("lang",),
                stored_cols=["text", "lang"], num_buckets=2)
    return IndexReader(idx)


def _vocab():
    return sorted({t for d in DOCS for t in TOK.findall(d.lower())})


def test_prefix_and_size(rdr):
    want = [t for t in _vocab() if t.startswith("ap")]
    got = run_terms_enum(rdr, {"field": "text", "string": "ap", "size": 10})
    assert got == {"terms": want, "complete": True}
    cut = run_terms_enum(rdr, {"field": "text", "string": "ap", "size": 1})
    assert cut == {"terms": want[:1], "complete": False}


def test_full_enumeration_pages(rdr):
    vocab = _vocab()
    terms, after = [], None
    for _ in range(20):
        body = {"field": "text", "size": 3}
        if after is not None:
            body["search_after"] = after
        page = run_terms_enum(rdr, body)
        terms.extend(page["terms"])
        if page["complete"]:
            break
        after = page["terms"][-1]
    assert terms == vocab


def test_keyword_field_and_errors(rdr):
    got = run_terms_enum(rdr, {"field": "lang", "string": ""})
    assert got["terms"] == sorted(set(LANGS))
    # case_insensitive input prefix is lowercased against the
    # lowercase-analyzed dictionary
    up = run_terms_enum(rdr, {"field": "text", "string": "AP", "size": 10})
    assert up["terms"] == [t for t in _vocab() if t.startswith("ap")]
    with pytest.raises(ValueError, match="field"):
        run_terms_enum(rdr, {"string": "a"})


def test_search_after_skips_exact_term(rdr):
    vocab = _vocab()
    got = run_terms_enum(
        rdr, {"field": "text", "search_after": vocab[0], "size": 100}
    )
    assert got["terms"] == vocab[1:]
