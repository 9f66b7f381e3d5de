"""Index templates: name-pattern defaults for index specs (the
OpenSearch composable ``_index_template`` analog).

The reference creates each index from an explicit mapping file; at
fleet scale operators instead register templates that match index
NAME PATTERNS (``logs-*``) and supply mapping/settings defaults, so a
new time-partitioned index needs only its name.  Spec YAML::

    templates:
      - name: logs
        index_patterns: ["logs-*"]
        priority: 10
        template:
          id_field: event_id
          ts_field: ts
          mapping: {text: [message], keyword: [level]}
    indices:
      - index_name: logs-2026-08
        source: {path: ...}

Resolution follows the OpenSearch composable-template rules (public
semantics): among matching templates the HIGHEST priority applies;
two matching templates with equal priority are rejected loudly (the
ambiguity error, not silent shadowing).  The index entry's own values
always override the template's; grouped mappings merge field-wise
with the entry winning per field name.
"""

from __future__ import annotations

import fnmatch


def _validate_templates(templates: list[dict]) -> None:
    seen = set()
    for t in templates:
        name = t.get("name")
        if not name:
            raise ValueError("every template needs a name")
        if name in seen:
            raise ValueError(f"duplicate template name {name!r}")
        seen.add(name)
        pats = t.get("index_patterns")
        if not isinstance(pats, (list, tuple)) or not pats:
            raise ValueError(
                f"template {name!r}: index_patterns must be a non-empty list"
            )
        if not isinstance(t.get("template"), dict):
            raise ValueError(f"template {name!r}: missing 'template' body")


def match_template(index_name: str, templates: list[dict]) -> dict | None:
    """The single highest-priority template matching ``index_name``
    (None when nothing matches; ValueError on a priority tie)."""
    matches = [
        t
        for t in templates
        if any(
            fnmatch.fnmatchcase(index_name, str(p))
            for p in t["index_patterns"]
        )
    ]
    if not matches:
        return None
    best = max(int(t.get("priority", 0)) for t in matches)
    top = [t for t in matches if int(t.get("priority", 0)) == best]
    if len(top) > 1:
        names = sorted(t["name"] for t in top)
        raise ValueError(
            f"index {index_name!r} matches templates {names} at equal "
            f"priority {best} — set distinct priorities"
        )
    return top[0]


def _merge_grouped_mapping(tmpl: dict | None, entry: dict | None) -> dict:
    """Field-wise union of two grouped ``{type: [fields]}`` mappings;
    a field present in the entry keeps the ENTRY's type."""
    tmpl = tmpl or {}
    entry = entry or {}
    if not tmpl:
        return dict(entry)
    entry_fields = {
        str(f).strip()
        for fl in entry.values()
        if fl
        for f in fl
    }
    out = {t: list(fl or []) for t, fl in entry.items()}
    for t, fl in tmpl.items():
        for f in fl or []:
            if str(f).strip() not in entry_fields:
                bucket = out.setdefault(t, [])
                if f not in bucket:
                    bucket.append(f)
    return out


def apply_templates(entry: dict, templates: list[dict]) -> dict:
    """Return the index entry with its matching template's defaults
    filled in (entry values win; mappings merge field-wise)."""
    if not templates:
        return entry
    _validate_templates(templates)
    name = entry.get("index_name", "")
    t = match_template(name, templates)
    if t is None:
        return entry
    body = t["template"]
    merged = dict(entry)
    for key, v in body.items():
        if key == "mapping":
            merged["mapping"] = _merge_grouped_mapping(
                v, entry.get("mapping")
            )
        elif key not in merged or merged[key] in (None, ""):
            merged[key] = v
    return merged
