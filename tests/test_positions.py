"""Positional postings: encode/decode round-trip and arbitrary-length
match_phrase (OpenSearch match_phrase parity — the reference's ``text``
mappings store positions by default,
/root/reference/opensearch_loader/loader.py:311-312)."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from raybm25.analysis import tokenize
from raybm25.codec import decode_positions
from raybm25.fixtures import make_pages
from raybm25.hashing import hash64
from raybm25.index.build import build_index, rebuild_postings
from raybm25.query.engine import IndexReader


def test_positions_roundtrip_random():
    rng = np.random.default_rng(7)
    n = 500
    gid = np.sort(rng.integers(0, 40, n)).astype(np.int64)
    doc_ids = rng.permutation(np.arange(n, dtype=np.uint64))
    tfs = rng.integers(1, 9, n).astype(np.int64)
    dls = rng.integers(5, 200, n).astype(np.int64)
    # ascending positions per posting
    poss = np.concatenate(
        [np.sort(rng.choice(5000, size=t, replace=False)) for t in tfs]
    ).astype(np.int64)
    from raybm25.index.encode import encode_posting_groups

    enc = encode_posting_groups(gid, doc_ids, tfs, dls, poss=poss)
    order = enc["order"]
    el_starts = enc["el_starts"]
    bounds = np.append(el_starts, n)
    occ_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(tfs, out=occ_off[1:])
    from raybm25.codec import varbyte_decode

    for g in range(len(el_starts)):
        lo, hi = bounds[g], bounds[g + 1]
        g_tfs = varbyte_decode(enc["tfs_enc"][g])
        got = decode_positions(enc["poss_enc"][g], g_tfs)
        want = np.concatenate(
            [poss[occ_off[e] : occ_off[e] + tfs[e]] for e in order[lo:hi]]
        )
        assert np.array_equal(got, want.astype(np.int32))


@pytest.fixture(scope="module")
def pos_built(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("posidx")
    pages_path = str(root / "pages.parquet")
    pages = make_pages(n_rows=400, seed=11)
    pq.write_table(pages, pages_path)
    index_dir = str(root / "index")
    build_index(
        pages_path,
        index_dir,
        key_col="url",
        ts_col="warc_ts",
        extract_html=True,
        keyword_cols=("lang",),
        num_buckets=8,
        range_buckets=2,  # multiple doc ranges: positions must survive segment concat
        batch_size=64,
        positions=True,
    )
    df = pages.to_pandas().sort_values(["url", "warc_ts", "text"], kind="mergesort")
    df = df.drop_duplicates("url", keep="last")
    df["doc_id"] = hash64(df["url"].to_numpy(dtype=object))
    docs = dict(zip(df["doc_id"].tolist(), df["text"].tolist()))
    return index_dir, docs


def _brute_phrase(docs, phrase):
    ptoks = tokenize(phrase)
    out = []
    for did, text in docs.items():
        toks = tokenize(text)
        for i in range(len(toks) - len(ptoks) + 1):
            if toks[i : i + len(ptoks)] == ptoks:
                out.append(did)
                break
    return np.sort(np.array(out, dtype=np.uint64))


def test_match_phrase_vs_brute_force(pos_built):
    index_dir, docs = pos_built
    r = IndexReader(index_dir)
    # phrases harvested from the corpus itself (guaranteed hits) at
    # widths beyond the sayt shingle cap, plus misses and repeats
    texts = sorted(docs.values())
    t0 = tokenize(texts[0])
    t1 = tokenize(texts[len(texts) // 2])
    phrases = [
        " ".join(t0[2:6]),        # 4-token hit
        " ".join(t1[1:6]),        # 5-token hit
        " ".join(t0[:3]),         # 3-token hit
        t0[0],                    # single token
        " ".join(t0[2:6]) + " zzzzunseen",  # one absent term
        " ".join(reversed(t0[2:6])),        # present terms, wrong order (may hit)
    ]
    # a phrase with a repeated adjacent token, if the corpus has one
    for text in texts:
        toks = tokenize(text)
        for i in range(len(toks) - 1):
            if toks[i] == toks[i + 1]:
                phrases.append(" ".join(toks[max(0, i - 1) : i + 2]))
                break
        else:
            continue
        break
    for ph in phrases:
        got = r.match_phrase(ph)
        want = _brute_phrase(docs, ph)
        assert np.array_equal(got, want), f"phrase {ph!r}: {got} != {want}"


def test_match_phrase_requires_positions(pos_built, ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("noposidx")
    pages_path = str(root / "pages.parquet")
    pq.write_table(make_pages(n_rows=50, seed=3), pages_path)
    index_dir = str(root / "index")
    build_index(
        pages_path, index_dir, key_col="url", ts_col="warc_ts",
        extract_html=True, num_buckets=4, batch_size=64,
    )
    r = IndexReader(index_dir)
    with pytest.raises(ValueError, match="positions"):
        r.match_phrase("any phrase here")


def test_match_phrase_scan_layout(pos_built, ray_session, tmp_path_factory):
    """The scan layout threads positions through the same partials
    helpers; match_phrase results must agree with the hash layout."""
    from raybm25.index.build_scan import build_index_scan

    index_dir, docs = pos_built
    root = tmp_path_factory.mktemp("posscan")
    pages_path = str(root / "pages.parquet")
    pq.write_table(make_pages(n_rows=400, seed=11), pages_path)
    scan_dir = str(root / "index")
    build_index_scan(
        pages_path, scan_dir, key_col="url", ts_col="warc_ts",
        extract_html=True, keyword_cols=("lang",), positions=True,
    )
    r_hash = IndexReader(index_dir)
    r_scan = IndexReader(scan_dir)
    texts = sorted(docs.values())
    for src in (texts[0], texts[7]):
        ph = " ".join(tokenize(src)[2:6])
        a, b = r_hash.match_phrase(ph), r_scan.match_phrase(ph)
        assert np.array_equal(a, b)
        assert np.array_equal(a, _brute_phrase(docs, ph))


def test_search_phrase_hand_computed(ray_session, tmp_path_factory):
    """Lucene PhraseQuery scoring: tf = phrase occurrences, idf = sum
    of term idfs, verified bit-for-bit against a hand computation."""
    import math
    import pyarrow as pa

    root = tmp_path_factory.mktemp("phrasebm25")
    docs = {
        "u1": "red fox red fox jumps",      # "red fox" twice, dl=5
        "u2": "red fox sleeps here today",  # once, dl=5
        "u3": "fox red nothing else",       # reversed only, dl=4
        "u4": "red and fox apart words",    # both terms, no phrase, dl=5
    }
    tbl = pa.table({"url": list(docs), "text": list(docs.values())})
    pages_path = str(root / "pages.parquet")
    pq.write_table(tbl, pages_path)
    index_dir = str(root / "index")
    build_index(
        pages_path, index_dir, key_col="url", ts_col=None,
        num_buckets=2, batch_size=4, positions=True,
    )
    r = IndexReader(index_dir)
    hits = r.search_phrase("red fox", k=10)
    ids = {int(h) for h, _ in hits}
    want_ids = {int(hash64(np.array([u], dtype=object))[0]) for u in ("u1", "u2")}
    assert ids == {np.uint64(i) for i in want_ids} or ids == want_ids
    n, avgdl = 4, (5 + 5 + 4 + 5) / 4
    k1, b = r.k1, r.b
    idf_sum = math.log(1.0 + (n - 4 + 0.5) / (4 + 0.5))   # 'red' df=4 (all docs)
    idf_sum += math.log(1.0 + (n - 4 + 0.5) / (4 + 0.5))  # 'fox' df=4 (all docs)
    def score(ptf, dl):
        tf = float(ptf)
        return idf_sum * (tf / (tf + k1 * (1.0 - b + b * dl / avgdl)))
    by_id = {int(np.uint64(np.int64(h)) if h < 0 else h): s for h, s in hits}
    u1, u2 = (int(hash64(np.array([u], dtype=object))[0]) for u in ("u1", "u2"))
    assert by_id[u1] == score(2, 5)
    assert by_id[u2] == score(1, 5)
    assert by_id[u1] > by_id[u2]


def test_rebuild_preserves_positions(pos_built):
    index_dir, docs = pos_built
    r0 = IndexReader(index_dir)
    texts = sorted(docs.values())
    ph = " ".join(tokenize(texts[3])[1:5])
    before = r0.match_phrase(ph)
    assert before.size > 0
    rebuild_postings(index_dir)
    r1 = IndexReader(index_dir)
    assert np.array_equal(r1.match_phrase(ph), before)


def _brute_phrase_prefix(docs, phrase, vocab=None):
    ptoks = tokenize(phrase)
    head, pref = ptoks[:-1], ptoks[-1]
    out = []
    for did, text in docs.items():
        toks = tokenize(text)
        n = len(head)
        for i in range(len(toks) - n):
            if toks[i : i + n] == head and toks[i + n].startswith(pref):
                out.append(did)
                break
    return np.sort(np.array(out, dtype=np.uint64))


def test_match_phrase_prefix_vs_brute_force(pos_built):
    index_dir, docs = pos_built
    r = IndexReader(index_dir)
    # harvest head+prefix probes from the corpus (guaranteed non-empty)
    probes = []
    for text in list(docs.values())[:30]:
        toks = tokenize(text)
        if len(toks) >= 4:
            probes.append(f"{toks[1]} {toks[2][:3]}")
            probes.append(f"{toks[0]} {toks[1]} {toks[2][:2]}")
        if len(probes) >= 8:
            break
    assert probes
    for ph in probes:
        # lift the expansion cap for exact brute-force parity (the
        # default 50 is Lucene's truncation, exercised separately)
        got = r.match_phrase_prefix(ph, max_expansions=100_000)
        want = _brute_phrase_prefix(docs, ph)
        assert np.array_equal(got, want), ph
        assert got.size > 0  # harvested probes must hit


def test_match_phrase_prefix_single_token(pos_built):
    index_dir, docs = pos_built
    r = IndexReader(index_dir)
    some = tokenize(next(iter(docs.values())))[0][:3]
    got = set(r.match_phrase_prefix(some).tolist())
    want = {d for d, t in docs.items()
            if any(tok.startswith(some) for tok in tokenize(t))}
    assert got == want


def test_match_phrase_prefix_max_expansions(pos_built):
    index_dir, docs = pos_built
    r = IndexReader(index_dir)
    toks = tokenize(next(iter(docs.values())))
    ph = f"{toks[0]} {toks[1][:1]}"
    full = set(r.match_phrase_prefix(ph, max_expansions=10_000).tolist())
    capped = set(r.match_phrase_prefix(ph, max_expansions=1).tolist())
    assert capped <= full
    # cap=1 keeps only the dictionary-first expansion
    first = r.expand_prefix(toks[1][:1])[0]
    want = _brute_phrase(docs, f"{toks[0]} {first}")
    assert np.array_equal(np.sort(np.array(sorted(capped), dtype=np.uint64)), want)


def test_match_phrase_prefix_no_match(pos_built):
    index_dir, docs = pos_built
    r = IndexReader(index_dir)
    assert r.match_phrase_prefix("zzqq yyxx").size == 0


def test_highlight_wraps_query_terms(pos_built):
    index_dir, docs = pos_built
    r = IndexReader(index_dir)
    did, text = next(iter(docs.items()))
    toks = tokenize(text)
    q = f"{toks[0]} {toks[3]}"
    hl = r.highlight(did, q)
    # wrapped text strips back to the original
    assert hl.replace("<em>", "").replace("</em>", "") == r.get_docs(
        np.array([did], dtype=np.uint64)
    ).column("text")[0].as_py()
    # every wrapped token analyzes to a query term
    import re as _re

    wrapped = _re.findall(r"<em>(.*?)</em>", hl)
    assert wrapped
    assert {w.lower() for w in wrapped} <= set(tokenize(q))
    # count matches the doc's occurrences of the query terms
    want_n = sum(1 for t in toks if t in set(tokenize(q)))
    assert len(wrapped) == want_n


def test_simple_query_string(pos_built):
    """simple_query_string subset: terms + -negation + quoted phrase,
    or/and operators, vs hand-composed engine calls."""
    from raybm25.query.dsl import run_query, _match_docs

    index_dir, docs = pos_built
    r = IndexReader(index_dir)

    # or-mode with negation: union of term hits minus negated docs
    resp = run_query(
        r, {"size": 1000, "query": {"simple_query_string": {
            "query": "quick fox -lazy"}}}
    )
    got = {h["_id"]: h["_score"] for h in resp["hits"]["hits"]}
    base = dict(r.search_pruned("quick fox", r.n_docs))
    nd = {int(d) for d in _match_docs(r, "match", {"text": "lazy"})}
    want = {d: s for d, s in base.items() if d not in nd}
    assert got == want
    assert nd & set(base), "negation never fired; weak fixture"

    # and-mode: all terms required
    resp2 = run_query(
        r, {"size": 1000, "query": {"simple_query_string": {
            "query": "quick fox", "default_operator": "and"}}}
    )
    got2 = {h["_id"]: h["_score"] for h in resp2["hits"]["hits"]}
    assert got2 == dict(r.search_bool(must="quick fox", k=r.n_docs))

    # quoted phrase clause: phrase score added, or-mode union
    resp3 = run_query(
        r, {"size": 1000, "query": {"simple_query_string": {
            "query": 'quick "lazy dog"'}}}
    )
    got3 = {h["_id"]: h["_score"] for h in resp3["hits"]["hits"]}
    a = dict(r.search_pruned("quick", r.n_docs))
    b = dict(r.search_phrase("lazy dog", r.n_docs))
    want3 = {d: a.get(d, 0.0) + b.get(d, 0.0) for d in set(a) | set(b)}
    assert set(got3) == set(want3)
    for d in got3:
        assert got3[d] == pytest.approx(want3[d], rel=1e-12)

    # unsupported syntax is loud, not silently dropped
    for badq in ["a | b", "(a b)", "pre*", "fuzz~2"]:
        with pytest.raises(ValueError):
            run_query(r, {"query": {"simple_query_string": {"query": badq}}})


# ---------------------------------------------------------------- span_not /
# span_within (round-5 span algebra)


def _brute_span_not(docs, inc, exc, pre=0, post=0):
    """Docs with an `inc` occurrence having no `exc` occurrence in
    [p - pre, p + post] (single-term include spans)."""
    out = []
    for did, text in docs.items():
        toks = tokenize(text)
        epos = {i for i, t in enumerate(toks) if t == exc}
        for p, t in enumerate(toks):
            if t == inc and not any(
                q in epos for q in range(max(p - pre, 0), p + post + 1)
            ):
                out.append(did)
                break
    return np.sort(np.array(out, dtype=np.uint64))


def _brute_span_within(docs, little, t1, t2, slop):
    """Docs where `little` lies inside a greedy t1->earliest-t2 chain
    with gap <= slop (the engine's pinned enumeration)."""
    out = []
    for did, text in docs.items():
        toks = tokenize(text)
        hit = False
        for i, t in enumerate(toks):
            if t != t1:
                continue
            nxt = [j for j in range(i + 1, len(toks)) if toks[j] == t2]
            if not nxt:
                continue
            j = nxt[0]
            if j - i - 1 <= slop and any(
                toks[m] == little for m in range(i, j + 1)
            ):
                hit = True
                break
        if hit:
            out.append(did)
    return np.sort(np.array(out, dtype=np.uint64))


def test_span_not_vs_brute_force(pos_built):
    index_dir, docs = pos_built
    r = IndexReader(index_dir)
    # kengul / fisraqua are the fixture's two highest-df terms, so the
    # windows genuinely overlap; fox/lazy pin the df=2 tail
    for inc, exc, pre, post in [
        ("kengul", "fisraqua", 0, 3),
        ("kengul", "fisraqua", 2, 0),
        ("fisraqua", "kengul", 1, 1),
        ("fox", "lazy", 0, 3),
        ("kengul", "zzzabsent", 0, 5),
    ]:
        got = r.span_not_docs([inc], exc, pre=pre, post=post)
        want = _brute_span_not(docs, inc, exc, pre, post)
        assert got.tolist() == want.tolist(), (inc, exc, pre, post)
    # the exclusion must actually fire: a huge window drops docs a
    # no-op exclude keeps
    full = r.span_not_docs(["kengul"], "zzzabsent", post=1000)
    assert len(r.span_not_docs(["kengul"], "fisraqua", post=1000)) < len(full)


def test_span_not_multi_term_include(pos_built):
    index_dir, docs = pos_built
    r = IndexReader(index_dir)
    # include = span_near(quick, fox, slop=2): blocked when exclude
    # falls within [start, end + post]
    got = r.span_not_docs(["quick", "fox"], "lazy", slop=2, post=2)
    out = []
    for did, text in docs.items():
        toks = tokenize(text)
        for i, t in enumerate(toks):
            if t != "quick":
                continue
            nxt = [j for j in range(i + 1, len(toks)) if toks[j] == "fox"]
            if not nxt or nxt[0] - i - 1 > 2:
                continue
            j = nxt[0]
            if not any(toks[m] == "lazy" for m in range(i, min(j + 3, len(toks)))):
                out.append(did)
                break
    assert got.tolist() == sorted(out)


def test_span_within_vs_brute_force(pos_built):
    index_dir, docs = pos_built
    r = IndexReader(index_dir)
    for little, t1, t2, slop in [
        ("quick", "quick", "dog", 8),
        ("fox", "quick", "lazy", 6),
        ("lazy", "fox", "dog", 4),
    ]:
        got = r.span_within_docs(little, [t1, t2], slop=slop)
        want = _brute_span_within(docs, little, t1, t2, slop)
        assert got.tolist() == want.tolist(), (little, t1, t2, slop)


def test_span_not_within_dsl_kinds(pos_built):
    from raybm25.query.dsl import _match_docs

    index_dir, docs = pos_built
    r = IndexReader(index_dir)
    got = _match_docs(
        r,
        "span_not",
        {
            "include": {"span_term": {"text": "fox"}},
            "exclude": {"span_term": {"text": "lazy"}},
            "dist": 2,
        },
    )
    assert got.tolist() == _brute_span_not(docs, "fox", "lazy", 2, 2).tolist()
    big = {
        "span_near": {
            "clauses": [
                {"span_term": {"text": "quick"}},
                {"span_term": {"text": "lazy"}},
            ],
            "slop": 6,
            "in_order": True,
        }
    }
    w = _match_docs(
        r, "span_within", {"little": {"span_term": {"text": "fox"}}, "big": big}
    )
    c = _match_docs(
        r, "span_containing", {"little": {"span_term": {"text": "fox"}}, "big": big}
    )
    # span_within and span_containing match the same DOCUMENTS
    assert w.tolist() == c.tolist()
    assert w.tolist() == _brute_span_within(docs, "fox", "quick", "lazy", 6).tolist()
