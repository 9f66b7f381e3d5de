"""Schema validation: first-page fields vs declared mapping.

Reproduces SURVEY.md §2 M5/M6 (loader.py:431-458, 373-429): the field
names of the first batch of source rows — extracted recursively with
dot notation through dicts and the first element of list-of-dicts —
must ALL appear in the mapping, else the index is skipped (initial
load) or the update query aborts (raising). Arrow-side we introspect
the schema of the first block instead of per-doc dicts (O(1) per
source)."""

from __future__ import annotations

import logging

import pyarrow as pa

logger = logging.getLogger(__name__)


# Per-document cap on nested objects, matching the reference's index
# setting ``index.mapping.nested_objects.limit: 100000``
# (opensearch_client.py:96; SURVEY.md §2 B11). The server enforced it
# at index time; here ingest validation enforces it.
NESTED_OBJECTS_LIMIT = 100_000


def count_nested_objects(doc: dict) -> int:
    """Number of nested objects (dicts below the root, including dicts
    inside lists) one document carries — the quantity OpenSearch's
    nested-objects limit bounds."""
    n = 0
    stack = list(doc.values())
    while stack:
        v = stack.pop()
        if isinstance(v, dict):
            n += 1
            stack.extend(v.values())
        elif isinstance(v, list):
            stack.extend(v)
    return n


def validate_nested_limit(doc: dict, limit: int = NESTED_OBJECTS_LIMIT) -> None:
    """Raise (abort the source) when a document exceeds the nested-
    objects cap — the index-time failure the reference's server setting
    would produce."""
    n = count_nested_objects(doc)
    if n > limit:
        raise ValueError(
            f"document exceeds nested objects limit: {n} > {limit}"
        )


def extract_field_names(doc: dict, prefix: str = "") -> set[str]:
    """Recursive field-name set with dot notation (loader.py:431-458):
    descends dicts, and the FIRST element of a list of dicts."""
    names: set[str] = set()
    for key, value in doc.items():
        full = f"{prefix}{key}"
        names.add(full)
        if isinstance(value, dict):
            names |= extract_field_names(value, f"{full}.")
        elif isinstance(value, list) and value and isinstance(value[0], dict):
            names |= extract_field_names(value[0], f"{full}.")
    return names


def schema_field_names(schema: pa.Schema) -> set[str]:
    """Arrow equivalent: flatten struct (and list-of-struct) fields."""
    names: set[str] = set()

    def walk(name: str, typ: pa.DataType):
        names.add(name)
        if pa.types.is_struct(typ):
            for f in typ:
                walk(f"{name}.{f.name}", f.type)
        elif pa.types.is_list(typ) or pa.types.is_large_list(typ):
            vt = typ.value_type
            if pa.types.is_struct(vt):
                for f in vt:
                    walk(f"{name}.{f.name}", f.type)

    for f in schema:
        walk(f.name, f.type)
    return names


def mapped_field_names(properties: dict) -> set[str]:
    names: set[str] = set()
    for name, node in properties.items():
        names.add(name)
        for leaf in node.get("properties", {}) or {}:
            names.add(f"{name}.{leaf}")
    return names


def validate_fields(
    index_name: str,
    observed: set[str],
    properties: dict,
    id_field: str,
    extra_allowed: tuple[str, ...] = (),
) -> bool:
    """All observed fields must be mapped (or be the id/ts field).
    Returns False (skip index) and logs each unmapped field, mirroring
    loader.py:373-429."""
    allowed = mapped_field_names(properties) | {id_field} | set(extra_allowed)
    unmapped = sorted(observed - allowed)
    for f in unmapped:
        logger.warning("index %s: field %r from source is not in the mapping", index_name, f)
    return not unmapped


def flatten_structs(table: pa.Table) -> pa.Table:
    """Struct columns -> dotted leaf columns (single level), matching
    the mapping's ``a.b`` notation (SURVEY.md §1 'Nested object
    fields'). Non-struct columns pass through unchanged."""
    cols, names = [], []
    for name in table.column_names:
        col = table.column(name)
        if pa.types.is_struct(col.type):
            combined = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            for f in col.type:
                names.append(f"{name}.{f.name}")
                cols.append(combined.field(f.name))
        else:
            names.append(name)
            cols.append(col)
    return pa.table(dict(zip(names, cols)))
