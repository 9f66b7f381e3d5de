"""geo_distance / geo_bounding_box queries and the geo_distance
aggregation, vs brute-force haversine over known coordinates."""

import numpy as np
import pyarrow as pa
import pytest

from raybm25.index.build import build_index
from raybm25.query.dsl import _match_docs, _parse_distance, run_query
from raybm25.query.engine import IndexReader

# (doc_id, text, lat, lon)
DOCS = [
    (0, "alpha point", 0.0, 0.0),
    (1, "alpha point", 0.0, 1.0),      # ~111 km east
    (2, "alpha point", 45.0, 45.0),
    (3, "beta point", -30.0, 120.0),
    (4, "alpha point", 89.0, 0.0),     # near north pole
    (5, "alpha point", 0.0, -179.0),
]

R = 6371000.0


def _hav(lat, lon, olat, olon):
    la1, la2 = np.radians(lat), np.radians(olat)
    dla = np.radians(olat - lat)
    dlo = np.radians(olon - lon)
    h = np.sin(dla / 2) ** 2 + np.cos(la1) * np.cos(la2) * np.sin(dlo / 2) ** 2
    return 2 * R * np.arcsin(np.sqrt(h))


@pytest.fixture(scope="module")
def idx(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("geo")
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "doc_id": [d for d, _, _, _ in DOCS],
                "text": [t for _, t, _, _ in DOCS],
                "loc_lat": [la for _, _, la, _ in DOCS],
                "loc_lon": [lo for _, _, _, lo in DOCS],
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
        stored_cols=["text", "loc_lat", "loc_lon"],
        num_buckets=2,
    )
    return out


def test_geo_distance_vs_brute(idx):
    r = IndexReader(idx)
    for dist_km, olat, olon in [(200, 0.0, 0.0), (8000, 0.0, 0.0), (150, 89.5, 10.0)]:
        ids = _match_docs(
            r,
            "geo_distance",
            {"distance": f"{dist_km}km", "loc": {"lat": olat, "lon": olon}},
        )
        want = sorted(
            d
            for d, _, la, lo in DOCS
            if _hav(la, lo, olat, olon) <= dist_km * 1000
        )
        assert sorted(ids.tolist()) == want, (dist_km, olat, olon)


def test_geo_distance_near_antimeridian(idx):
    # doc 5 sits at lon -179; an origin at lon +179 is ~222 km away
    # across the antimeridian — haversine handles the wrap natively
    r = IndexReader(idx)
    ids = _match_docs(
        r,
        "geo_distance",
        {"distance": "300km", "loc": {"lat": 0.0, "lon": 179.0}},
    )
    assert ids.tolist() == [5]


def test_geo_bbox_inclusive_edges(idx):
    r = IndexReader(idx)
    ids = _match_docs(
        r,
        "geo_bounding_box",
        {
            "loc": {
                "top_left": {"lat": 45.0, "lon": 0.0},
                "bottom_right": {"lat": 0.0, "lon": 45.0},
            }
        },
    )
    # inclusive bounds: docs 0 (0,0), 1 (0,1), 2 (45,45)
    assert sorted(ids.tolist()) == [0, 1, 2]


def test_geo_bbox_rejects_dateline_cross(idx):
    r = IndexReader(idx)
    with pytest.raises(ValueError, match="dateline"):
        _match_docs(
            r,
            "geo_bounding_box",
            {
                "loc": {
                    "top_left": {"lat": 10.0, "lon": 170.0},
                    "bottom_right": {"lat": -10.0, "lon": -170.0},
                }
            },
        )


def test_geo_distance_agg_rings(idx):
    resp = run_query(
        idx,
        {
            "query": {"match": {"text": {"query": "alpha"}}},
            "size": 0,
            "aggs": {
                "rings": {
                    "geo_distance": {
                        "field": "loc",
                        "origin": {"lat": 0.0, "lon": 0.0},
                        "unit": "km",
                        "ranges": [
                            {"to": 500},
                            {"from": 500, "to": 9000},
                            {"from": 9000},
                        ],
                    }
                }
            },
        },
    )
    buckets = resp["aggregations"]["rings"]["buckets"]
    alpha = [(d, la, lo) for d, t, la, lo in DOCS if "alpha" in t]
    dists = {d: _hav(la, lo, 0.0, 0.0) / 1000 for d, la, lo in alpha}
    want = [
        sum(1 for v in dists.values() if v < 500),
        sum(1 for v in dists.values() if 500 <= v < 9000),
        sum(1 for v in dists.values() if v >= 9000),
    ]
    assert [b["doc_count"] for b in buckets] == want
    assert buckets[0]["to"] == 500 and buckets[0]["from"] is None
    assert buckets[2]["from"] == 9000 and buckets[2]["to"] is None


def test_parse_distance():
    assert _parse_distance("10km") == 10000.0
    assert _parse_distance("250m") == 250.0
    assert _parse_distance("1.5 km") == 1500.0
    assert _parse_distance(42) == 42.0
    assert _parse_distance("2mi") == pytest.approx(3218.688)
    with pytest.raises(ValueError):
        _parse_distance("10 parsecs")


def test_geotile_grid_vs_brute(idx):
    resp = run_query(
        idx,
        {
            "query": {"match": {"text": {"query": "point"}}},
            "size": 0,
            "aggs": {
                "t": {"geotile_grid": {"field": "loc", "precision": 2, "size": 20}}
            },
        },
    )
    from collections import Counter

    want = Counter()
    for _, _, la, lo in DOCS:
        la_c = min(max(la, -85.05112878), 85.05112878)
        x = min(max(int(np.floor(4 * (lo + 180.0) / 360.0)), 0), 3)
        rad = np.radians(la_c)
        y = int(np.floor(4 * (1 - np.log(np.tan(rad) + 1 / np.cos(rad)) / np.pi) / 2))
        want[f"2/{x}/{min(max(y, 0), 3)}"] += 1
    got = {b["key"]: b["doc_count"] for b in resp["aggregations"]["t"]["buckets"]}
    assert got == dict(want)
    counts = [b["doc_count"] for b in resp["aggregations"]["t"]["buckets"]]
    assert counts == sorted(counts, reverse=True)


def test_geotile_precision_bounds(idx):
    from raybm25.query.engine import IndexReader

    r = IndexReader(idx)
    with pytest.raises(ValueError, match="precision"):
        r.facet_geotile("point", "loc", 30)
    # zoom 0 = one world tile holding every matching doc
    rows = r.facet_geotile("point", "loc", 0)
    assert rows == [("0/0/0", len(DOCS))]


def test_geo_bounds_centroid_vs_brute(idx):
    from raybm25.query.engine import IndexReader

    r = IndexReader(idx)
    pts = [(la, lo) for d, t, la, lo in DOCS if "point" in t]
    b = r.geo_bounds_agg("point", "loc")
    assert b["top_left"] == {"lat": max(p[0] for p in pts),
                             "lon": min(p[1] for p in pts)}
    assert b["bottom_right"] == {"lat": min(p[0] for p in pts),
                                 "lon": max(p[1] for p in pts)}
    c = r.geo_centroid_agg("point", "loc")
    assert c["count"] == len(pts)
    assert c["location"]["lat"] == pytest.approx(
        sum(p[0] for p in pts) / len(pts))
    assert c["location"]["lon"] == pytest.approx(
        sum(p[1] for p in pts) / len(pts))
    assert r.geo_bounds_agg("zzz", "loc") is None
    assert r.geo_centroid_agg("zzz", "loc") is None


def test_geo_bounds_centroid_dsl_body(idx):
    from raybm25.query.dsl import run_query
    from raybm25.query.engine import IndexReader

    r = IndexReader(idx)
    resp = run_query(
        r,
        {
            "size": 0,
            "query": {"match": {"text": "point"}},
            "aggs": {
                "bb": {"geo_bounds": {"field": "loc"}},
                "cc": {"geo_centroid": {"field": "loc"}},
            },
        },
    )
    assert resp["aggregations"]["bb"]["bounds"] == r.geo_bounds_agg("point", "loc")
    assert resp["aggregations"]["cc"] == r.geo_centroid_agg("point", "loc")


def test_geohash_known_cells(ray_session, tmp_path_factory):
    # canonical geohash test vector: (57.64911, 10.40744) -> u4pruydqqvj
    tmp = tmp_path_factory.mktemp("geohash")
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "doc_id": [0, 1, 2],
                "text": ["alpha", "alpha", "alpha"],
                "loc_lat": [57.64911, 57.64911, -25.382708],
                "loc_lon": [10.40744, 10.40744, -49.265506],
            }
        ),
        str(tmp / "d.parquet"),
    )
    out = str(tmp / "idx")
    build_index(str(tmp / "d.parquet"), out, key_col="doc_id",
                id_col="doc_id", ts_col=None, text_cols=("text",),
                stored_cols=["text", "loc_lat", "loc_lon"], num_buckets=2)
    r = IndexReader(out)
    for p, want in [(1, "u"), (5, "u4pru"), (11, "u4pruydqqvj")]:
        rows = r.facet_geohash("alpha", "loc", p)
        assert rows[0] == (want, 2), (p, rows)
    # second known vector: Curitiba -> 6gkzwgjz (precision 8)
    rows = r.facet_geohash("alpha", "loc", 8)
    assert ("6gkzwgjz", 1) in rows
    # DSL body + precision bounds
    resp = run_query(out, {
        "query": {"match": {"text": {"query": "alpha"}}}, "size": 0,
        "aggs": {"c": {"geohash_grid": {"field": "loc", "precision": 5}}},
    })
    assert resp["aggregations"]["c"]["buckets"][0]["key"] == "u4pru"
    with pytest.raises(ValueError):
        r.facet_geohash("alpha", "loc", 0)
    with pytest.raises(ValueError):
        r.facet_geohash("alpha", "loc", 13)


def test_geo_polygon_point_in_poly(idx):
    """Even-odd crossing vs matplotlib-free brute force: a diamond
    around the origin contains exactly docs 0 and 1."""
    r = IndexReader(idx)
    pts = [(10.0, -5.0), (10.0, 5.0), (-10.0, 5.0), (-10.0, -5.0)]
    ids = r.geo_polygon_docs("loc", pts)
    assert ids.tolist() == [0, 1]


def test_geo_polygon_dsl_and_vertex_count(idx):
    r = IndexReader(idx)
    ids = _match_docs(
        r,
        "geo_polygon",
        {
            "loc": {
                "points": [
                    {"lat": 50.0, "lon": 40.0},
                    {"lat": 50.0, "lon": 50.0},
                    {"lat": 40.0, "lon": 50.0},
                    {"lat": 40.0, "lon": 40.0},
                ]
            }
        },
    )
    assert ids.tolist() == [2]
    with pytest.raises(ValueError, match="at least 3"):
        r.geo_polygon_docs("loc", [(0.0, 0.0), (1.0, 1.0)])


def test_geo_polygon_concave(idx):
    """A concave (arrow-shaped) polygon: the notch excludes the
    origin while the wings still contain (0, 1) — the even-odd rule,
    not a bbox approximation."""
    r = IndexReader(idx)
    # wings cover lon in [0.5, 3] at lat 0; the notch re-enters at
    # lon < 0.5, excluding doc 0 at (0, 0)
    pts = [
        (5.0, 0.5),
        (5.0, 3.0),
        (-5.0, 3.0),
        (-5.0, 0.5),
        (0.0, 0.5),
    ]
    ids = r.geo_polygon_docs("loc", pts)
    assert 1 in ids.tolist() and 0 not in ids.tolist()
