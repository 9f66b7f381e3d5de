"""Index templates: pattern matching, priority resolution, mapping
merge, and integration through parse_spec."""

import pytest

from raybm25.loader.spec import parse_spec
from raybm25.loader.templates import (
    _merge_grouped_mapping,
    apply_templates,
    match_template,
)

TEMPLATES = [
    {
        "name": "logs",
        "index_patterns": ["logs-*"],
        "priority": 10,
        "template": {
            "id_field": "event_id",
            "ts_field": "ts",
            "mapping": {"text": ["message"], "keyword": ["level"]},
        },
    },
    {
        "name": "logs_special",
        "index_patterns": ["logs-special-*"],
        "priority": 20,
        "template": {"id_field": "special_id",
                     "mapping": {"text": ["message"]}},
    },
    {
        "name": "metrics",
        "index_patterns": ["metrics-*"],
        "priority": 10,
        "template": {"id_field": "metric_id",
                     "mapping": {"keyword": ["host"]}},
    },
]


def test_match_highest_priority():
    assert match_template("logs-2026", TEMPLATES)["name"] == "logs"
    assert (
        match_template("logs-special-x", TEMPLATES)["name"] == "logs_special"
    )
    assert match_template("other", TEMPLATES) is None


def test_equal_priority_tie_rejected():
    tmpls = TEMPLATES + [
        {"name": "logs2", "index_patterns": ["logs-*"], "priority": 10,
         "template": {"id_field": "x", "mapping": {"text": ["m"]}}}
    ]
    with pytest.raises(ValueError, match="equal"):
        match_template("logs-1", tmpls)


def test_mapping_merge_entry_wins_per_field():
    merged = _merge_grouped_mapping(
        {"text": ["message", "extra"], "keyword": ["level"]},
        {"keyword": ["message"]},  # entry remaps message -> keyword
    )
    assert sorted(merged["keyword"]) == ["level", "message"]
    assert merged["text"] == ["extra"]


def test_apply_fills_gaps_only():
    entry = {"index_name": "logs-a", "id_field": "my_id",
             "mapping": {"text": ["body"]}}
    out = apply_templates(entry, TEMPLATES)
    assert out["id_field"] == "my_id"          # entry wins
    assert out["ts_field"] == "ts"             # template fills
    assert sorted(out["mapping"]["text"]) == ["body", "message"]
    assert out["mapping"]["keyword"] == ["level"]


def test_parse_spec_integration():
    cfg = {
        "templates": TEMPLATES,
        "indices": [
            {"index_name": "logs-2026-08", "source": {"path": "/x"}},
            {"index_name": "standalone", "id_field": "doc_id",
             "mapping": {"text": ["text"]}, "source": {"path": "/y"}},
        ],
    }
    specs = parse_spec(cfg)
    by_name = {s.index_name: s for s in specs}
    s = by_name["logs-2026-08"]
    assert s.id_field == "event_id" and s.ts_field == "ts"
    assert s.mapping["message"]["type"] == "text"
    assert s.mapping["level"]["type"] == "keyword"
    assert by_name["standalone"].id_field == "doc_id"


def test_parse_spec_template_validation():
    cfg = {
        "templates": [{"name": "bad", "index_patterns": []}],
        "indices": [{"index_name": "x", "id_field": "i",
                     "mapping": {"text": ["t"]}, "source": {}}],
    }
    with pytest.raises(ValueError, match="index_patterns"):
        parse_spec(cfg)


def test_templated_index_without_own_mapping_still_validates():
    """A template alone satisfies the mapping/id requirements."""
    cfg = {
        "templates": TEMPLATES,
        "indices": [{"index_name": "metrics-cpu", "source": {}}],
    }
    (s,) = parse_spec(cfg)
    assert s.id_field == "metric_id"
    assert s.mapping["host"]["type"] == "keyword"
