"""OpenSearch ``_bulk`` endpoint adapter over the loader primitives.

The reference's entire write path IS the bulk API: ``bulk_upsert``
builds ``index`` actions (/root/reference/opensearch_loader/
opensearch_client.py:189-226) and ``bulk_update`` builds ``update``
actions with ``doc_as_upsert: False`` (:228-350, ``document_missing``
failures counted as benign skips). This module accepts the parsed
NDJSON action stream and maps each action family onto the engine's
native operations, with ONE postings rebuild for the whole batch:

- ``index``  -> replace semantics: existing doc deleted (tombstone /
  bucket compaction, no rebuild), fresh doc inserted through the
  merge_document insert path. Falsy ids are skipped with a count
  (reference :201-204).
- ``update`` -> ``apply_updates`` partial merge; updates for unknown
  keys become ``document_missing`` no-ops (status 404 on the item,
  ``errors`` stays False — the reference treats them as benign).
- ``delete`` -> ``delete_docs``; absent ids report ``not_found``.

Per-item results mirror OpenSearch: ``{"items": [{"index": {"_id",
"result", "status"}}, ...], "errors": bool, counters...}``.

Scale note: ``index`` inserts route per-doc through the single-doc
insert path — right for the reference's trickle upserts; LARGE ingests
belong in ``build_index`` / the scan layout's incremental file append
(tests/test_build_scan.py::test_incremental_append_new_files), which
builds only new partitions.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

from ..index.manifest import load_manifest
from .update import _doc_ids_for, _insert_document, apply_updates


def _parse_actions(actions: list[dict]) -> list[tuple[str, object, dict | None]]:
    """Flattened NDJSON stream -> [(op, _id, doc_or_None)]."""
    ops: list[tuple[str, object, dict | None]] = []
    i = 0
    while i < len(actions):
        meta = actions[i]
        if not isinstance(meta, dict) or len(meta) != 1:
            raise ValueError(f"bulk action line {i} must be a single-key dict")
        op, body = next(iter(meta.items()))
        if op not in ("index", "create", "update", "delete"):
            raise ValueError(f"unsupported bulk op {op!r}")
        _id = (body or {}).get("_id")
        if op == "delete":
            ops.append((op, _id, None))
            i += 1
        else:
            if i + 1 >= len(actions):
                raise ValueError(f"bulk op {op!r} at line {i} missing its source line")
            src = actions[i + 1]
            if op == "update":
                if not isinstance(src, dict) or "doc" not in src:
                    raise ValueError("update source must be {'doc': {...}}")
                src = src["doc"]
            ops.append((op, _id, dict(src)))
            i += 2
    return ops


def run_bulk(index_dir: str, actions: list[dict], id_field: str | None = None) -> dict:
    """Execute a parsed ``_bulk`` action stream against a committed
    index. One postings rebuild for the whole batch (refresh barrier at
    the end — the reference calls ``refresh=False`` per bulk and
    refreshes once after the load, loader.py:643)."""
    from ..query.engine import IndexReader

    man = load_manifest(index_dir)
    if man is None:
        raise FileNotFoundError(f"no index at {index_dir}")
    id_field = id_field or man.data.get("key_col", "doc_id")
    id_is_int = bool(man.data.get("id_is_int", False))
    layout = man.data.get("layout", "hash")

    ops = _parse_actions(actions)
    items: list[dict | None] = [None] * len(ops)
    skipped_falsy = 0

    # falsy-id index/create actions: warn-skip (reference S6 semantics)
    for i, (op, _id, _doc) in enumerate(ops):
        if op in ("index", "create") and not _id:
            items[i] = {op: {"_id": _id, "result": "skipped", "status": 400}}
            skipped_falsy += 1
        elif op in ("update", "delete") and _id is None:
            items[i] = {op: {"_id": None, "result": "skipped", "status": 400}}
            skipped_falsy += 1

    live = [(i, op, _id, doc) for i, (op, _id, doc) in enumerate(ops) if items[i] is None]

    # actions are applied grouped per family (deletes -> inserts ->
    # updates), not strictly in stream order; referencing one id twice
    # in a batch would make the outcome order-dependent — reject loudly
    seen_ids = [_id for _, _, _id, _ in live]
    if len(set(map(str, seen_ids))) != len(seen_ids):
        raise ValueError("bulk batch references the same _id more than once")

    # one existence probe for every referenced id
    all_ids = [_id for _, _, _id, _ in live]
    doc_ids = _doc_ids_for(all_ids, id_is_int) if all_ids else np.empty(0, np.uint64)
    r = IndexReader(index_dir)
    existing = set(r.ids_docs(doc_ids).tolist()) if doc_ids.size else set()
    del r  # readers cache docstore state; mutations below invalidate it

    # 1) deletes: explicit delete actions + replace-target index actions
    del_ids: list[object] = []
    for (i, op, _id, _doc), did in zip(live, doc_ids):
        if op == "delete" and did in existing:
            del_ids.append(_id)
        elif op in ("index", "create") and did in existing:
            if op == "create":
                continue  # create fails on existing, no delete
            del_ids.append(_id)
    # the returned counter reports only explicit delete actions; the
    # replace-target deletes are internal to the index-action semantics
    deleted = sum(
        1 for (i, op, _id, _d), did in zip(live, doc_ids)
        if op == "delete" and did in existing
    )
    if del_ids:
        from .delete import delete_docs

        delete_docs(index_dir, _doc_ids_for(del_ids, id_is_int), rebuild=False)

    # 2) index/create inserts (every surviving target is now absent)
    created = updated = 0
    for (i, op, _id, doc), did in zip(live, doc_ids):
        if op == "delete":
            found = did in existing
            items[i] = {
                "delete": {
                    "_id": _id,
                    "result": "deleted" if found else "not_found",
                    "status": 200 if found else 404,
                }
            }
            continue
        if op == "create" and did in existing:
            items[i] = {
                "create": {"_id": _id, "result": "version_conflict", "status": 409}
            }
            continue
        if op in ("index", "create"):
            _insert_document(index_dir, {id_field: _id, **doc}, id_field)
            was = did in existing and op == "index"
            items[i] = {
                op: {
                    "_id": _id,
                    "result": "updated" if was else "created",
                    "status": 200 if was else 201,
                }
            }
            if was:
                updated += 1
            else:
                created += 1

    # 3) partial updates, one co-partitioned batch; unknown keys are
    # benign document_missing no-ops
    upd = [(i, _id, doc, did) for (i, op, _id, doc), did in zip(live, doc_ids) if op == "update"]
    if upd:
        present = [(i, _id, doc) for i, _id, doc, did in upd if did in existing]
        for i, _id, doc, did in upd:
            if did not in existing:
                items[i] = {
                    "update": {
                        "_id": _id,
                        "result": "document_missing",
                        "status": 404,
                    }
                }
        if present:
            rows = [{id_field: _id, **doc} for _, _id, doc in present]
            res = apply_updates(
                index_dir,
                pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False),
                id_field,
                rebuild=False,
            )
            updated += int(res.get("updated", 0))
            for i, _id, _doc in present:
                items[i] = {
                    "update": {"_id": _id, "result": "updated", "status": 200}
                }

    # 4) one refresh barrier: rebuild postings for the whole batch
    if layout == "scan":
        from ..index.build_scan import rebuild_postings_scan

        rebuild_postings_scan(index_dir)
    else:
        from ..index.build import rebuild_postings

        rebuild_postings(index_dir)

    # documented-benign outcomes (the reference counts them as skips,
    # not failures): falsy-id warn-skips, document_missing update
    # no-ops, delete not_found. Genuine failures (e.g. create
    # version_conflict) still flip ``errors``.
    _benign = {"skipped", "document_missing", "not_found"}
    return {
        "errors": any(
            (v := next(iter(it.values())))["status"] >= 400
            and v["result"] not in _benign
            for it in items
            if it
        ),
        "items": items,
        "created": created,
        "updated": updated,
        "deleted": deleted,
        "skipped": skipped_falsy,
    }
