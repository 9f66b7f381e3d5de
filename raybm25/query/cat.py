"""``_cat`` endpoints (the ``?format=json`` shape clients and
dashboards read): compact operational listings over the index root.

Each function returns a list of row dicts — the JSON form of
``GET _cat/indices`` / ``_cat/count`` / ``_cat/aliases`` /
``_cat/templates``.  Everything is served from committed manifests
plus one directory walk per index; no data files are opened.
"""

from __future__ import annotations

import os

from ..index.manifest import load_manifest
from .dsl import run_stats

try:  # stored search templates share the root registry
    from .searchtemplate import _load as _load_templates
except Exception:  # pragma: no cover
    _load_templates = None


def cat_indices(index_root: str) -> list[dict]:
    """One row per committed index under ``index_root``: name, doc
    count, store bytes (``GET _cat/indices?format=json``)."""
    rows = []
    if not os.path.isdir(index_root):
        return rows
    for name in sorted(os.listdir(index_root)):
        d = os.path.join(index_root, name)
        if not os.path.isdir(d) or load_manifest(d) is None:
            continue
        st = run_stats(d)
        rows.append(
            {
                "index": name,
                "status": "open",
                "docs.count": st["docs"]["count"],
                "docs.deleted": st["docs"]["deleted"],
                "store.size_bytes": st["store"]["size_in_bytes"],
            }
        )
    return rows


def cat_count(index_dir: str) -> list[dict]:
    """``GET _cat/count`` for one index."""
    st = run_stats(index_dir)
    return [{"count": st["docs"]["count"]}]


def cat_aliases(index_root: str) -> list[dict]:
    """``GET _cat/aliases``: rows from the alias registry beside the
    index dirs (loader/aliases.py)."""
    from ..loader.aliases import get_aliases

    rows = []
    for alias, targets in sorted(get_aliases(index_root).items()):
        for t in targets if isinstance(targets, list) else [targets]:
            rows.append({"alias": alias, "index": t})
    return rows


def cat_templates(index_root: str) -> list[dict]:
    """``GET _cat/templates``: stored search templates in the root
    registry."""
    if _load_templates is None:  # pragma: no cover
        return []
    return [
        {"name": k} for k in sorted(_load_templates(index_root))
    ]
