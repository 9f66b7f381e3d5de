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
        return table

    return _apply


class IngestStage:
    """Actor-friendly ``map_batches`` stage: the pipeline compiles once
    per worker in ``__init__``, each batch pays only the kernel calls."""

    def __init__(self, processors: list[dict]):
        self._apply = compile_pipeline(processors)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return self._apply(batch)
