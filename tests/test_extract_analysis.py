import pyarrow as pa

from raybm25.analysis import doc_lengths, sayt_expand, term_freqs, tokenize
from raybm25.extract import extract_batch, extract_text, render_html
from raybm25.fixtures import HAND_DOCS, make_pages


def test_tokenize_basic():
    assert tokenize("The quick, QUICK fox-42!") == ["the", "quick", "quick", "fox", "42"]
    assert tokenize("") == []
    assert term_freqs("a b a") == {"a": 2, "b": 1}


def test_doc_lengths():
    assert doc_lengths(["a b c", "", "x"]).tolist() == [3, 0, 1]


def test_extract_inverts_template():
    for text in HAND_DOCS + ["multi\n\npara & <tag> doc", "", "a&amp;b already-escaped"]:
        html = render_html(text, "https://x.example/")
        assert extract_text(html) == text


def test_extract_invariant_on_fixture():
    """The per-row invariant from BASELINE.json input_hint, byte-compared."""
    pages = make_pages(n_rows=200, seed=7)
    out = extract_batch(pages)
    for orig, ext in zip(pages["text"].to_pylist(), out["text"].to_pylist()):
        assert orig.encode() == ext.encode()


def test_byte_level_extract_matches_str_path():
    """extract_column / extract_column_hashed (the buffer-walking byte
    path, VERDICT r2 #7) must equal per-row extract_text byte-for-byte
    and hash-for-hash — on plain, sliced, and large_binary arrays."""
    import numpy as np

    from raybm25.extract import extract_column, extract_column_hashed
    from raybm25.hashing import hash64

    pages = make_pages(n_rows=120, seed=3)
    html = pages.column("html").combine_chunks()
    want = [extract_text(h) for h in html.to_pylist()]
    want_th = hash64(np.array(want, dtype=object))

    for col in (
        html,
        html.slice(0, len(html)),        # zero-offset slice
        pa.chunked_array([html]),        # chunked
        html.cast(pa.large_binary()),    # int64 offsets
    ):
        got, th = extract_column_hashed(col)
        assert got.to_pylist() == want
        assert (th == want_th).all()
        assert extract_column(col).to_pylist() == want
    # non-zero offset slice
    got = extract_column(html.slice(10, 50))
    assert got.to_pylist() == want[10:60]
    # nulls + empties fall back cleanly
    mixed = pa.array([None, b"", html[0].as_py()], pa.binary())
    assert extract_column(mixed).to_pylist() == ["", "", want[0]]


def test_fixture_determinism_and_dups():
    a = make_pages(n_rows=300, seed=42)
    b = make_pages(n_rows=300, seed=42)
    assert a.equals(b)
    urls = a["url"].to_pylist()
    assert len(set(urls)) < len(urls)  # has duplicate urls


def test_sayt_expand():
    terms = sayt_expand(["ab", "cd"], max_shingle=2, max_prefix=3)
    assert "ab cd" in terms
    assert "#a" in terms and "#ab" in terms and "#ab " in terms


def test_arrow_tokenize_matches_python():
    """arrow_tokenize must produce the same token streams as the Python
    analyzer (the engine/oracle/SQL shared definition) for ASCII text;
    property-tested over adversarial strings."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from raybm25.analysis import arrow_tokenize, tokenize

    @given(
        st.lists(
            st.text(
                alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=60
            ),
            min_size=1,
            max_size=20,
        )
    )
    @settings(max_examples=150, deadline=None)
    def check(texts):
        tid, terms, doc_pos, dl = arrow_tokenize(pa.array(texts, pa.string()))
        got = [[] for _ in texts]
        for t, d in zip(tid, doc_pos):
            got[d].append(terms[t])
        expected = [tokenize(t) for t in texts]
        assert got == expected
        assert dl.tolist() == [len(e) for e in expected]

    check()


def test_arrow_tokenize_nulls_and_empties():
    from raybm25.analysis import arrow_tokenize

    tid, terms, doc_pos, dl = arrow_tokenize(pa.array([None, "", "a b", "!!"], pa.string()))
    assert dl.tolist() == [0, 0, 2, 0]
    assert [terms[t] for t in tid] == ["a", "b"]
