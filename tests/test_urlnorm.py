"""URL canonicalization: rule-by-rule hand checks plus pass-through
of non-url rows and the streaming stage."""

import pyarrow as pa

from raybm25.extras.urlnorm import (
    UrlCanonStage,
    canonical_url_dedup,
    canonicalize_urls,
)


def _c(url):
    return canonicalize_urls(pa.array([url]))[0].as_py()


def test_case_and_ports():
    assert _c("HTTPS://WWW.Example.COM:443/Path") == (
        "https://www.example.com/Path"
    )
    assert _c("HTTP://Host.com:80/") == "http://host.com"
    # non-default port survives
    assert _c("http://host.com:8080/x") == "http://host.com:8080/x"
    # :443 on plain http is NOT a default port
    assert _c("http://host.com:443/x") == "http://host.com:443/x"


def test_fragment_and_tracking():
    assert _c("https://a.com/p?id=5#frag") == "https://a.com/p?id=5"
    assert _c("https://a.com/p?utm_source=f&id=5&utm_campaign=x") == (
        "https://a.com/p?id=5"
    )
    assert _c("https://a.com/p?utm_source=f") == "https://a.com/p"
    assert _c("https://a.com/p?id=1&fbclid=zz&gclid=yy") == (
        "https://a.com/p?id=1"
    )
    # tracking-only query with fragment
    assert _c("https://a.com/?utm_a=1#x") == "https://a.com"


def test_path_case_preserved():
    assert _c("https://a.com/CaseSensitive/Path?Q=Mixed") == (
        "https://a.com/CaseSensitive/Path?Q=Mixed"
    )


def test_bare_slash_collapses():
    assert _c("https://a.com/") == "https://a.com"
    assert _c("https://a.com/x/") == "https://a.com/x/"


def test_non_url_passthrough():
    assert _c("not a url") == "not a url"
    assert _c("") == ""
    out = canonicalize_urls(pa.array([None, "x"]))
    assert out.to_pylist() == ["", "x"]


def test_stage_and_dedup_wrapper(ray_session):
    import ray.data

    rows = [
        {"url": "HTTP://Site.com/?utm_source=x", "n": 1},
        {"url": "http://site.com/", "n": 2},
        {"url": "http://other.com/a", "n": 3},
    ]
    ann = canonical_url_dedup(
        ray.data.from_items(rows), concurrency=1
    ).to_pandas()
    canon = dict(zip(ann["n"], ann["url_canon"]))
    assert canon[1] == canon[2] == "http://site.com"
    assert canon[3] == "http://other.com/a"
