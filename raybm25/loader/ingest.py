"""Ingest pipelines: the OpenSearch ``_ingest/pipeline`` processor
chain, applied to document batches BEFORE indexing.

The reference loader ships documents to OpenSearch, where any attached
ingest pipeline runs server-side (opensearch_loader delegates all
transforms); here the pipeline is a compiled chain of vectorized
pyarrow.compute kernels over Arrow batches — one kernel call per
processor per batch, no per-row Python.

Supported processors (the common transform set):

- ``set``        {field, value [, override=True]}
- ``rename``     {field, target_field}
- ``remove``     {field}
- ``lowercase`` / ``uppercase`` / ``trim``   {field}
- ``gsub``       {field, pattern, replacement}  (RE2-style regex)
- ``split``      {field, separator}  -> list<string> column
- ``convert``    {field, type: integer|float|string|boolean}
- ``json``       {field [, target_field | add_to_root=True]} — parse a
  JSON-string column; the whole batch parses in ONE
  ``pyarrow.json.read_json`` C++ pass (rows joined as NDJSON, so
  values must be single-line JSON — embedded newlines fail loudly).
  ``add_to_root`` appends each parsed key as a top-level column
  (conflicts error); otherwise the result is a struct column at
  ``target_field`` (default: the source field).

Unknown processors and missing fields raise ``ValueError`` loudly
(set ``ignore_missing: true`` on a processor to skip absent fields,
mirroring the OpenSearch option).

Use ``compile_pipeline(processors)`` for a ``pa.Table -> pa.Table``
callable, or ``IngestStage`` as a ``map_batches`` stage
(``ds.map_batches(IngestStage(processors), batch_format="pyarrow")``).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["compile_pipeline", "IngestStage"]

_CONVERT_TYPES = {
    "integer": pa.int64(),
    "long": pa.int64(),
    "float": pa.float64(),
    "double": pa.float64(),
    "string": pa.string(),
    "boolean": pa.bool_(),
}


def _require(table: pa.Table, field: str, spec: dict) -> bool:
    """True if the field is present; raises unless ignore_missing."""
    if field in table.column_names:
        return True
    if spec.get("ignore_missing"):
        return False
    raise ValueError(f"ingest processor references missing field {field!r}")


def _set_col(table: pa.Table, name: str, arr) -> pa.Table:
    if name in table.column_names:
        return table.set_column(table.column_names.index(name), name, arr)
    return table.append_column(name, arr)


def _apply_json(table: pa.Table, f: str, spec: dict) -> pa.Table:
    """The ``json`` processor body: one NDJSON parse for the whole
    batch (pyarrow.json C++ reader), then either a struct column or
    root-level key columns."""
    import io

    import pyarrow.json as pa_json

    if len(table) == 0:
        return table
    col = pc.fill_null(table.column(f), "{}")
    vals = col.to_pylist()
    if any("\n" in v for v in vals):
        raise ValueError(
            f"json processor field {f!r} holds multi-line JSON; the "
            "batched NDJSON parse needs single-line values"
        )
    parsed = pa_json.read_json(
        io.BytesIO(("\n".join(vals) or "{}").encode())
    ).combine_chunks()
    if len(parsed) != len(table):
        raise ValueError(
            f"json processor parsed {len(parsed)} rows from {len(table)}"
        )
    if spec.get("add_to_root"):
        for name in parsed.column_names:
            if name in table.column_names:
                raise ValueError(
                    f"json add_to_root key {name!r} collides with an "
                    "existing column"
                )
            table = table.append_column(name, parsed.column(name))
        return table
    tgt = str(spec.get("target_field", f))
    struct = pa.StructArray.from_arrays(
        [parsed.column(n).combine_chunks() for n in parsed.column_names],
        names=parsed.column_names,
    )
    return _set_col(table, tgt, struct)


def compile_pipeline(processors: list[dict]):
    """Validate the processor list eagerly (bad pipelines fail at
    compile time, not mid-build) and return a table transform."""
    steps = []
    for i, p in enumerate(processors):
        if not isinstance(p, dict) or len(p) != 1:
            raise ValueError(f"processor #{i} must be a single-key map")
        kind, spec = next(iter(p.items()))
        if kind == "set":
            if "field" not in spec or "value" not in spec:
                raise ValueError("set needs field + value")
        elif kind == "rename":
            if "field" not in spec or "target_field" not in spec:
                raise ValueError("rename needs field + target_field")
        elif kind in ("remove", "lowercase", "uppercase", "trim"):
            if "field" not in spec:
                raise ValueError(f"{kind} needs field")
        elif kind == "gsub":
            if not all(k in spec for k in ("field", "pattern", "replacement")):
                raise ValueError("gsub needs field + pattern + replacement")
        elif kind == "split":
            if "field" not in spec or "separator" not in spec:
                raise ValueError("split needs field + separator")
        elif kind == "convert":
            if str(spec.get("type")) not in _CONVERT_TYPES:
                raise ValueError(
                    f"convert type must be one of {sorted(_CONVERT_TYPES)}"
                )
            if "field" not in spec:
                raise ValueError("convert needs field")
        elif kind == "json":
            if "field" not in spec:
                raise ValueError("json needs field")
            if spec.get("add_to_root") and "target_field" in spec:
                raise ValueError(
                    "json takes target_field OR add_to_root, not both"
                )
        else:
            raise ValueError(f"unsupported ingest processor {kind!r}")
        steps.append((kind, dict(spec)))

    def _apply(table: pa.Table) -> pa.Table:
        for kind, spec in steps:
            f = str(spec.get("field", ""))
            if kind == "set":
                if f in table.column_names and not spec.get("override", True):
                    continue
                arr = pa.array([spec["value"]] * len(table))
                table = _set_col(table, f, arr)
                continue
            if not _require(table, f, spec):
                continue
            if kind == "rename":
                tgt = str(spec["target_field"])
                if tgt in table.column_names:
                    raise ValueError(f"rename target {tgt!r} already exists")
                names = [
                    tgt if n == f else n for n in table.column_names
                ]
                table = table.rename_columns(names)
            elif kind == "remove":
                table = table.drop_columns([f])
            elif kind == "lowercase":
                table = _set_col(table, f, pc.utf8_lower(table.column(f)))
            elif kind == "uppercase":
                table = _set_col(table, f, pc.utf8_upper(table.column(f)))
            elif kind == "trim":
                table = _set_col(
                    table, f, pc.utf8_trim_whitespace(table.column(f))
                )
            elif kind == "gsub":
                table = _set_col(
                    table,
                    f,
                    pc.replace_substring_regex(
                        table.column(f),
                        pattern=str(spec["pattern"]),
                        replacement=str(spec["replacement"]),
                    ),
                )
            elif kind == "split":
                table = _set_col(
                    table,
                    f,
                    pc.split_pattern(
                        table.column(f), pattern=str(spec["separator"])
                    ),
                )
            elif kind == "convert":
                table = _set_col(
                    table,
                    f,
                    pc.cast(table.column(f), _CONVERT_TYPES[str(spec["type"])]),
                )
            elif kind == "json":
                table = _apply_json(table, f, spec)
        return table

    return _apply


class IngestStage:
    """Actor-friendly ``map_batches`` stage: the pipeline compiles once
    per worker in ``__init__``, each batch pays only the kernel calls."""

    def __init__(self, processors: list[dict]):
        self._apply = compile_pipeline(processors)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return self._apply(batch)
