"""Index spec + mapping parser — the reference's pipeline-definition API.

Mirrors the YAML surface of /root/reference/indices.example.yaml
(SURVEY.md §2 'User-extension surface') and the grouped-mapping parser
semantics of opensearch_loader/loader.py:281-371 (SURVEY.md §2 M4) —
every ValueError path is reproduced:

- invalid field type (valid: keyword, text, search_as_you_type, long,
  integer, double, float, boolean, date, object)   (loader.py:311-323)
- empty / whitespace-only field names              (loader.py:326-329)
- duplicate field names, flat or nested            (loader.py:331-333,348-349)
- more than one dot in a field name                (loader.py:339-340)
- parent/leaf conflicts (`a` and `a.b` both mapped) (loader.py:358-361)
- empty resulting mapping                          (loader.py:368-369)

Config-value coercion mirrors config.py:79-111 (M10/M12): strings are
stripped recursively; "true"/"1"/"yes" -> bool, int-ish -> int,
comma-lists -> list.
"""

from __future__ import annotations

from dataclasses import dataclass, field

VALID_TYPES = {
    "keyword",
    "text",
    "search_as_you_type",
    "long",
    "integer",
    "double",
    "float",
    "boolean",
    "date",
    "object",
    # beyond the reference's list: the OpenSearch k-NN plugin field —
    # a list<float> column stored in the docstore and served by
    # query/engine.knn_search / the DSL "knn" clause
    "knn_vector",
}

STORED_NUMERIC_TYPES = {"long", "integer", "double", "float", "boolean", "date"}


def parse_mapping(grouped: dict) -> dict:
    """Grouped ``{type: [field, ...]}`` -> flat properties dict
    ``{field: {"type": t}}`` with nested single-level dot support
    (``a.b`` -> ``{"a": {"type": "object", "properties": {"b": ...}}}``)."""
    if not isinstance(grouped, dict) or not grouped:
        raise ValueError("mapping must be a non-empty {type: [fields]} dict")
    properties: dict = {}
    seen: set[str] = set()
    for ftype, fields in grouped.items():
        ftype = str(ftype).strip()
        if ftype not in VALID_TYPES:
            raise ValueError(
                f"invalid mapping type {ftype!r}; valid types: {sorted(VALID_TYPES)}"
            )
        if fields is None:
            continue
        if not isinstance(fields, (list, tuple)):
            raise ValueError(f"mapping type {ftype!r} must map to a list of field names")
        for raw in fields:
            name = str(raw).strip()
            if not name:
                raise ValueError(f"empty field name under mapping type {ftype!r}")
            if name in seen:
                raise ValueError(f"duplicate field name {name!r} in mapping")
            seen.add(name)
            if "." in name:
                parts = name.split(".")
                if len(parts) != 2 or not all(p.strip() for p in parts):
                    raise ValueError(
                        f"field {name!r}: only single-level dot notation is supported"
                    )
                parent, leaf = parts
                if parent in properties and properties[parent].get("type") != "object":
                    raise ValueError(
                        f"field {parent!r} is mapped both as a leaf and as an object parent"
                    )
                node = properties.setdefault(parent, {"type": "object", "properties": {}})
                node.setdefault("properties", {})[leaf] = {"type": ftype}
            else:
                if name in properties and properties[name].get("properties"):
                    raise ValueError(
                        f"field {name!r} is mapped both as a leaf and as an object parent"
                    )
                properties[name] = {"type": ftype}
    if not properties:
        raise ValueError("mapping resolved to zero properties")
    return properties


def mapping_field_kinds(properties: dict) -> dict[str, list[str]]:
    """Flatten a properties dict into engine column roles."""
    kinds: dict[str, list[str]] = {
        "text": [],
        "keyword": [],
        "search_as_you_type": [],
        "stored": [],
        "vector": [],
    }
    for name, node in properties.items():
        t = node.get("type")
        if t == "object":
            for leaf, leafnode in node.get("properties", {}).items():
                lt = leafnode.get("type")
                full = f"{name}.{leaf}"
                if lt in ("text", "keyword", "search_as_you_type"):
                    kinds[lt].append(full)
                else:
                    kinds["stored"].append(full)
        elif t in ("text", "keyword", "search_as_you_type"):
            kinds[t].append(name)
        elif t == "knn_vector":
            # stored doc-value (the default build stores every source
            # column) that the knn query path reads; tracked separately
            # so callers can see the vector surface
            kinds["vector"].append(name)
            kinds["stored"].append(name)
        else:
            kinds["stored"].append(name)
    return kinds


def coerce_value(v):
    """Env-style scalar coercion (config.py:79-100 semantics)."""
    if isinstance(v, str):
        s = v.strip()
        if s.lower() in ("true", "1", "yes"):
            return True
        if s.lower() in ("false", "0", "no"):
            return False
        try:
            return int(s)
        except ValueError:
            pass
        if "," in s:
            return [p.strip() for p in s.split(",") if p.strip()]
        return s
    return v


def strip_strings(obj):
    """Recursive whitespace normalization (config.py:102-111)."""
    if isinstance(obj, str):
        return obj.strip()
    if isinstance(obj, dict):
        return {strip_strings(k): strip_strings(v) for k, v in obj.items()}
    if isinstance(obj, list):
        return [strip_strings(x) for x in obj]
    return obj


@dataclass
class SourceSpec:
    """Analog of initial_query / update_queries entries: where the rows
    come from. Kinds: parquet | items | model (SURVEY.md §2 S1/S3/S5)."""

    kind: str = "parquet"
    path: str | None = None
    items: list | None = None
    name: str = "initial"
    limit: int | None = None  # test_mode first-page analog (O2)


@dataclass
class IndexSpec:
    index_name: str
    id_field: str
    mapping: dict  # parsed properties
    source: SourceSpec
    update_sources: list[SourceSpec] = field(default_factory=list)
    ts_field: str | None = None
    extract_html: bool = False


def parse_spec(cfg: dict) -> list[IndexSpec]:
    """Parse the top-level ``{indices: [...]}`` config document.
    Optional ``templates:`` entries supply name-pattern defaults
    (loader/templates.py — the composable _index_template analog)."""
    from .templates import apply_templates

    cfg = strip_strings(cfg)
    indices = cfg.get("indices")
    if not indices:
        raise ValueError("spec must contain a non-empty 'indices' list")
    templates = cfg.get("templates") or []
    out = []
    for entry in indices:
        entry = apply_templates(entry, templates)
        name = entry.get("index_name")
        if not name:
            raise ValueError("every index needs an index_name")
        id_field = entry.get("id_field")
        if not id_field:
            raise ValueError(f"index {name!r}: id_field is required")
        mapping = parse_mapping(entry.get("mapping") or {})

        def _src(d: dict, default_name: str) -> SourceSpec:
            return SourceSpec(
                kind=d.get("type", "parquet"),
                path=d.get("path"),
                items=d.get("items"),
                name=d.get("name", default_name),
                limit=d.get("limit"),
            )

        src = _src(entry.get("source") or {}, "initial")
        ups = [
            _src(u, f"update_{i}") for i, u in enumerate(entry.get("update_sources") or [])
        ]
        out.append(
            IndexSpec(
                index_name=name,
                id_field=id_field,
                mapping=mapping,
                source=src,
                update_sources=ups,
                ts_field=entry.get("ts_field"),
                extract_html=bool(entry.get("extract_html", False)),
            )
        )
    return out


def select_indices(specs: list[IndexSpec], selected) -> list[IndexSpec]:
    """selected_indices filter (SURVEY.md §2 M13): empty/None -> all;
    unknown names are warned about and ignored."""
    if not selected:
        return specs
    if isinstance(selected, str):
        selected = [s.strip() for s in selected.split(",") if s.strip()]
    wanted = {s.strip() for s in selected}
    known = {s.index_name for s in specs}
    import logging

    for unknown in sorted(wanted - known):
        logging.getLogger(__name__).warning("selected index %r does not exist", unknown)
    return [s for s in specs if s.index_name in wanted]
