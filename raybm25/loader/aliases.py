"""Index aliases + wildcard index patterns over an index root.

The OpenSearch ``_aliases`` API and the ``GET /logs-*/_search`` index
patterns, filesystem-native: indexes live as directories under one
root (the Loader's ``index_root``), aliases in ``aliases.json`` beside
them (atomic rename on every change — same durability contract as the
per-index manifest). ``resolve_indices`` is the single resolution
step the query layer composes with ``run_query_multi`` for
scatter-gather over every matched partition index.
"""

from __future__ import annotations

import fnmatch
import json
import os

ALIASES_FILE = "aliases.json"


def _aliases_path(index_root: str) -> str:
    return os.path.join(index_root, ALIASES_FILE)


def get_aliases(index_root: str) -> dict[str, list[str]]:
    """The alias registry: ``{alias: [index_name, ...]}``."""
    path = _aliases_path(index_root)
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        return {str(k): [str(v) for v in vs] for k, vs in json.load(f).items()}


def _write(index_root: str, aliases: dict[str, list[str]]) -> None:
    path = _aliases_path(index_root)
    tmp = f"{path}.tmp-{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump({k: sorted(v) for k, v in sorted(aliases.items())}, f, indent=1)
    os.replace(tmp, path)


def _index_names(index_root: str) -> list[str]:
    """Committed index directories under the root (a directory with a
    manifest.json is an index; anything else is ignored)."""
    if not os.path.isdir(index_root):
        return []
    return sorted(
        d
        for d in os.listdir(index_root)
        if os.path.exists(os.path.join(index_root, d, "manifest.json"))
    )


def put_alias(index_root: str, alias: str, indices: list[str]) -> dict:
    """Point ``alias`` at the given index names (replaces any previous
    membership — the ``_aliases`` actions=[add] idiom). Unknown index
    names are rejected loudly."""
    known = set(_index_names(index_root))
    missing = [i for i in indices if i not in known]
    if missing:
        raise ValueError(f"unknown indices for alias {alias!r}: {missing}")
    if not indices:
        raise ValueError(f"alias {alias!r} needs at least one index")
    aliases = get_aliases(index_root)
    aliases[alias] = list(indices)
    _write(index_root, aliases)
    return {"acknowledged": True, alias: sorted(indices)}


def delete_alias(index_root: str, alias: str) -> dict:
    aliases = get_aliases(index_root)
    if alias not in aliases:
        raise KeyError(f"no such alias {alias!r}")
    del aliases[alias]
    _write(index_root, aliases)
    return {"acknowledged": True}


def resolve_indices(index_root: str, expr: str) -> list[str]:
    """Resolve an index expression to index DIRECTORIES, in name order:
    - ``a,b`` — comma list (each part resolved recursively),
    - ``logs-*`` — wildcard over committed index names,
    - an alias name — its member indexes,
    - a plain index name — itself.
    Raises on anything that resolves to zero indexes (loud, like an
    OpenSearch 404 — silent empties hide typos)."""
    if "," in expr:
        out: list[str] = []
        for part in expr.split(","):
            part = part.strip()
            if part:
                for d in resolve_indices(index_root, part):
                    if d not in out:
                        out.append(d)
        if not out:
            raise ValueError(f"index expression {expr!r} matched nothing")
        return out
    names = _index_names(index_root)
    if "*" in expr or "?" in expr:
        hit = [n for n in names if fnmatch.fnmatch(n, expr)]
        if not hit:
            raise ValueError(f"index pattern {expr!r} matched nothing")
        return [os.path.join(index_root, n) for n in hit]
    aliases = get_aliases(index_root)
    if expr in aliases:
        return [os.path.join(index_root, n) for n in aliases[expr]]
    if expr in names:
        return [os.path.join(index_root, expr)]
    raise ValueError(f"no index, alias or pattern {expr!r} under {index_root}")


def search_indices(index_root: str, expr: str, body: dict) -> dict:
    """``GET /<expr>/_search``: resolve the expression and scatter-
    gather through ``run_query_multi`` (per-index BM25 stats, global
    (score desc, doc_id asc) merge)."""
    from ..query.dsl import run_query_multi

    return run_query_multi(resolve_indices(index_root, expr), body)
