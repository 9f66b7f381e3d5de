"""Loader lifecycle — the reference's control plane, Ray-Data-native.

Mirrors Loader.load (SURVEY.md §3, loader.py:98-203):
- parse + validate the index spec, apply the selected-indices filter
  (M13),
- a sequential loop over indices with per-index try/except error
  isolation — a failure records an ERROR row and continues
  (loader.py:163-196),
- per index: first-batch schema validation (M6; unmapped fields ->
  skip the index), initial build (upsert semantics via dedup), then
  update sources applied sequentially (J2) — a validation error aborts
  the remaining update sources for that index (loader.py:650-653) —
  each phase ending in a manifest commit (refresh, B10),
- summary sink (S9: name, docs or ERROR, duration) and per-source
  timing sink (S10), written as JSON + text under ``logs/``.

``test_mode`` limits every update source to its first ``limit`` rows
(O2 first-page dry-run; initial loads always run fully, matching
loader.py:590-594).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import asdict

import pyarrow as pa
import pyarrow.parquet as pq

from ..index.build import build_index
from .model_source import model_documents
from .spec import IndexSpec, SourceSpec, mapping_field_kinds, parse_spec, select_indices
from .update import apply_updates
from .validate import schema_field_names, validate_fields


def _table_from_items(items: list[dict]) -> pa.Table:
    """pa.Table.from_pylist infers the schema from the FIRST row only;
    heterogeneous docs (e.g. model node/property/value docs) would
    silently lose columns. Normalize to the key union first."""
    if not items:
        return pa.table({})
    keys: list[str] = []
    seen = set()
    for it in items:
        for k in it:
            if k not in seen:
                seen.add(k)
                keys.append(k)
    return pa.Table.from_pylist([{k: it.get(k) for k in keys} for it in items])


def _format_time(seconds: float) -> str:
    """seconds -> '2m 35s'; negative -> 'N/A' (loader.py:62-80)."""
    if seconds < 0:
        return "N/A"
    m, s = divmod(int(round(seconds)), 60)
    return f"{m}m {s}s" if m else f"{s}s"


def truncate_query(q: str, limit: int = 200) -> str:
    """Collapse whitespace + cap for logs (M11, loader.py:82-96)."""
    q = " ".join(q.split())
    return q if len(q) <= limit else q[: limit - 3] + "..."


class Loader:
    def __init__(
        self,
        spec: dict | str,
        index_root: str,
        *,
        selected_indices=None,
        test_mode: bool = False,
        log_dir: str | None = None,
        about_file: str | None = None,
    ):
        if isinstance(spec, str):
            import yaml

            with open(spec) as f:
                spec = yaml.safe_load(f)
        self.specs = select_indices(parse_spec(spec), selected_indices)
        self.index_root = index_root
        self.test_mode = test_mode
        self.log_dir = log_dir or os.path.join(index_root, "logs")
        # config-level about-file path: `about`-kind sources without a
        # path fall back to it (reference loader.py:460-488 reads the
        # path from config, not from the index entry)
        self.about_file = about_file
        self.index_stats: list[dict] = []  # ST4
        self.source_timings: dict[str, list[float]] = {}  # ST3

    # ----------------------------------------------------------- sources
    def _load_source(self, spec: IndexSpec, src: SourceSpec):
        """Source registry (S1/S3/S5): parquet path | inline items |
        model-schema generator. Returns (table_or_path, observed_fields)."""
        t0 = time.perf_counter()
        if src.kind == "parquet":
            if not src.path:
                raise ValueError(f"source {src.name!r}: parquet source needs a path")
            schema = pq.read_schema(
                src.path
                if os.path.isfile(src.path)
                else os.path.join(src.path, sorted(os.listdir(src.path))[0])
            )
            observed = schema_field_names(schema)
            data = src.path
        elif src.kind == "items":
            items = src.items or []
            data, observed = self._items_source(items)
        elif src.kind == "model":
            items = list(model_documents(src.items or {}))
            data, observed = self._items_source(items)
        elif src.kind == "about":
            data, observed = self._about_source(spec, src)
        else:
            raise ValueError(f"unknown source kind {src.kind!r}")
        self.source_timings.setdefault(f"{spec.index_name}:{src.name}", []).append(
            time.perf_counter() - t0
        )
        return data, observed

    def _items_source(self, items: list[dict]):
        from .validate import extract_field_names, validate_nested_limit

        for it in items:
            validate_nested_limit(it)  # B11: 100k nested objects/doc cap
        data = _table_from_items(items)
        observed = set()
        for it in items[:100]:
            observed |= extract_field_names(it)
        return data, observed

    def _about_source(self, spec: IndexSpec, src: SourceSpec):
        """About-file YAML source (SURVEY.md §2 S3; reference
        loader.py:686-703): entries lacking a ``page`` field are skipped
        with a warning; doc id = ``page{page_num}``. A missing path
        means the index is simply not loaded (0 docs, not an error —
        loader.py:484-486)."""
        import logging

        import yaml

        log = logging.getLogger(__name__)
        path = src.path or self.about_file
        if not path:
            log.warning(
                '"about_file" not configured, %s will not be loaded!', spec.index_name
            )
            return None, set()
        if not os.path.isfile(path):
            raise ValueError(f'"{path}" is not a file!')
        with open(path) as f:
            pages = yaml.safe_load(f)
        if not pages:
            log.warning("About file %s is empty", path)
            return None, set()
        items = []
        for page in pages:
            page_num = page.get("page") if isinstance(page, dict) else None
            if page_num is None:
                log.warning("Skipping page without 'page' field: %r", page)
                continue
            items.append({**page, spec.id_field: f"page{page_num}"})
        data, _ = self._items_source(items)
        # about pages are NOT schema-validated in the reference
        # (load_about_page upserts the dict as-is) — return no observed
        # fields so the mapping check passes them through
        return data, set()

    # ----------------------------------------------------------- lifecycle
    def load(self) -> dict:
        t_start = time.perf_counter()
        for spec in self.specs:
            t0 = time.perf_counter()
            try:
                n_docs = self._process_index(spec)
                self.index_stats.append(
                    {
                        "index": spec.index_name,
                        "docs": n_docs,
                        "secs": time.perf_counter() - t0,
                        "error": None,
                    }
                )
            except Exception as exc:  # per-index isolation (loader.py:182-195)
                self.index_stats.append(
                    {
                        "index": spec.index_name,
                        "docs": "ERROR",
                        "secs": time.perf_counter() - t0,
                        "error": f"{type(exc).__name__}: {exc}",
                    }
                )
        summary = self._write_summary(time.perf_counter() - t_start)
        self._write_timings()
        return summary

    def _index_dir(self, name: str) -> str:
        return os.path.join(self.index_root, name)

    def _process_index(self, spec: IndexSpec) -> int:
        kinds = mapping_field_kinds(spec.mapping)
        data, observed = self._load_source(spec, spec.source)
        if data is None:  # about source without a configured file
            return 0
        if observed and not validate_fields(
            spec.index_name,
            observed,
            spec.mapping,
            spec.id_field,
            extra_allowed=(spec.ts_field,) if spec.ts_field else (),
        ):
            # unmapped fields in the initial source -> skip this index
            # (loader.py:601-605 semantics: skip, not raise)
            return 0

        # integer id columns index directly; strings hash (doc keys)
        id_is_int = False
        if isinstance(data, str):
            schema = pq.read_schema(
                data
                if os.path.isfile(data)
                else os.path.join(data, sorted(os.listdir(data))[0])
            )
            if spec.id_field in schema.names:
                id_is_int = pa.types.is_integer(schema.field(spec.id_field).type)
        elif isinstance(data, pa.Table) and spec.id_field in data.column_names:
            id_is_int = pa.types.is_integer(data.schema.field(spec.id_field).type)

        if isinstance(data, pa.Table):
            import ray.data

            from .validate import flatten_structs

            data = flatten_structs(data)
            source = ray.data.from_arrow(data)
        else:
            source = data
        text_cols = tuple(kinds["text"]) + tuple(kinds["search_as_you_type"])
        if not text_cols:
            text_cols = (spec.id_field,)  # degenerate: key-only index
        sayt_cols = tuple(kinds["search_as_you_type"])
        if isinstance(source, str):
            # parquet sources build on the SCAN layout: one docstore
            # partition per input file, keys-only dedup shuffle — the
            # corpus text never crosses an exchange (VERDICT r1 #7; the
            # hash layout shuffles full text). sayt expansion is per-doc
            # and runs inside the scan tokenize stage (VERDICT r2 #4),
            # so sayt-mapped parquet corpora take the scale path too.
            # Only inline/model sources stay on the hash layout.
            from ..index.build_scan import build_index_scan

            metrics = build_index_scan(
                source,
                self._index_dir(spec.index_name),
                key_col=spec.id_field,
                id_col=spec.id_field if id_is_int else None,
                ts_col=spec.ts_field,
                text_cols=text_cols,
                extract_html=spec.extract_html,
                keyword_cols=tuple(kinds["keyword"]),
                sayt_cols=sayt_cols,
                overwrite=True,
            )
        else:
            metrics = build_index(
                source,
                self._index_dir(spec.index_name),
                key_col=spec.id_field,
                id_col=spec.id_field if id_is_int else None,
                ts_col=spec.ts_field,
                text_cols=text_cols,
                extract_html=spec.extract_html,
                keyword_cols=tuple(kinds["keyword"]),
                sayt_cols=sayt_cols,
                overwrite=True,
            )
        n_docs = int(metrics["n_docs"])

        # ------------- update phase (sequential, J2) -------------
        for usrc in spec.update_sources:
            udata, uobserved = self._load_source(spec, usrc)
            if uobserved and not validate_fields(
                spec.index_name, uobserved, spec.mapping, spec.id_field
            ):
                # a bad update source aborts the REMAINING update
                # sources for this index (loader.py:650-653) — raising
                # here is caught by _process_update wrapper below
                raise ValueError(
                    f"update source {usrc.name!r} has fields outside the mapping"
                )
            limit = usrc.limit if (self.test_mode or usrc.limit) else None
            t0 = time.perf_counter()
            # parquet paths pass through as-is: apply_updates streams
            # them (per-file attach tasks) unless a limit applies
            apply_updates(
                self._index_dir(spec.index_name),
                udata,
                spec.id_field,
                limit=limit,
                rebuild=False,
            )
            self.source_timings.setdefault(
                f"{spec.index_name}:{usrc.name}", []
            ).append(time.perf_counter() - t0)
        if spec.update_sources:
            from ..index.build import rebuild_postings
            from ..index.build_scan import rebuild_postings_scan
            from ..index.manifest import load_manifest

            idx_dir = self._index_dir(spec.index_name)
            man = load_manifest(idx_dir)
            if man is not None and man.data.get("layout") == "scan":
                rebuild_postings_scan(idx_dir)  # final refresh
            else:
                rebuild_postings(idx_dir)  # final refresh
        return n_docs

    # ----------------------------------------------------------- sinks
    def _write_summary(self, total_secs: float) -> dict:
        """S9: per-index table -> console-ish text + JSON."""
        os.makedirs(self.log_dir, exist_ok=True)
        lines = [f"{'INDEX':<30} {'DOCS':>10} {'TIME':>10}"]
        for s in self.index_stats:
            lines.append(f"{s['index']:<30} {str(s['docs']):>10} {_format_time(s['secs']):>10}")
        lines.append(f"TOTAL {_format_time(total_secs)}")
        text = "\n".join(lines)
        summary = {"total_secs": total_secs, "indices": self.index_stats, "table": text}
        with open(os.path.join(self.log_dir, "loading-summary.json"), "w") as f:
            json.dump(summary, f, indent=1, default=str)
        with open(os.path.join(self.log_dir, "loading-summary.txt"), "w") as f:
            f.write(text + "\n")
        return summary

    def _write_timings(self) -> None:
        """S10: mean per-source timing, keys sorted (O3)."""
        os.makedirs(self.log_dir, exist_ok=True)
        out = {
            key: {"mean_secs": sum(v) / len(v), "runs": len(v)}
            for key, v in sorted(self.source_timings.items())
        }
        with open(os.path.join(self.log_dir, "query-timing.json"), "w") as f:
            json.dump(out, f, indent=1)
