"""Search templates: parameterized request bodies (the OpenSearch
``_search/template`` endpoint with mustache variables, plus the
``_scripts/<id>`` stored-template registry).

Clients ship a body skeleton with ``{{variables}}`` and a ``params``
dict; the engine renders and runs it.  Supported mustache subset
(the part search templates actually use):

- ``{{var}}`` — whole-string values substitute the RAW param (ints
  stay ints, lists stay lists: ``"size": "{{k}}"`` with ``k: 5``
  renders ``"size": 5``); embedded occurrences stringify.
- ``{{var}}`` with a missing param raises ``ValueError`` (loud — the
  silent-empty mustache default turns typos into match-nothing
  queries).
- ``{{#toJson}}var{{/toJson}}`` — whole-string form substitutes the
  param as-is (it is already structured data here, not a JSON text).

Stored templates live in a ``search_templates.json`` registry beside
the index dirs (same atomic-rename pattern as loader/aliases.py).
"""

from __future__ import annotations

import json
import os
import re
from typing import Any

TEMPLATES_FILE = "search_templates.json"
_VAR_RE = re.compile(r"\{\{\s*([#/^]?)\s*([A-Za-z0-9_.]+)\s*\}\}")
_TOJSON_RE = re.compile(
    r"^\{\{\s*#toJson\s*\}\}\s*([A-Za-z0-9_.]+)\s*\{\{\s*/toJson\s*\}\}$"
)


def _render_string(s: str, params: dict) -> Any:
    m = _TOJSON_RE.match(s)
    if m:
        name = m.group(1)
        if name not in params:
            raise ValueError(f"missing template param {name!r}")
        return params[name]
    whole = _VAR_RE.fullmatch(s)
    if whole:
        sigil, name = whole.groups()
        if sigil:
            raise ValueError(f"unsupported mustache section {s!r}")
        if name not in params:
            raise ValueError(f"missing template param {name!r}")
        return params[name]

    def _sub(mm):
        sigil, name = mm.groups()
        if sigil:
            raise ValueError(f"unsupported mustache section {mm.group(0)!r}")
        if name not in params:
            raise ValueError(f"missing template param {name!r}")
        return str(params[name])

    return _VAR_RE.sub(_sub, s)


def render_template(source, params: dict | None) -> Any:
    """Deep-render ``{{var}}`` placeholders in a request body."""
    params = params or {}
    if isinstance(source, str):
        return _render_string(source, params)
    if isinstance(source, dict):
        return {
            (
                _render_string(k, params)
                if isinstance(k, str) and "{{" in k
                else k
            ): render_template(v, params)
            for k, v in source.items()
        }
    if isinstance(source, list):
        return [render_template(v, params) for v in source]
    return source


# ------------------------------------------------ stored registry
def _registry_path(root: str) -> str:
    return os.path.join(root, TEMPLATES_FILE)


def _load(root: str) -> dict:
    p = _registry_path(root)
    if not os.path.exists(p):
        return {}
    with open(p) as f:
        return json.load(f)


def put_script(root: str, script_id: str, source: dict) -> None:
    """Store a search template (``PUT _scripts/<id>`` analog)."""
    if not isinstance(source, dict):
        raise ValueError("template source must be a request-body dict")
    os.makedirs(root, exist_ok=True)
    reg = _load(root)
    reg[str(script_id)] = source
    tmp = _registry_path(root) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(reg, f, indent=1, sort_keys=True)
    os.replace(tmp, _registry_path(root))


def get_script(root: str, script_id: str) -> dict:
    reg = _load(root)
    if str(script_id) not in reg:
        raise ValueError(f"no stored search template {script_id!r}")
    return reg[str(script_id)]


def delete_script(root: str, script_id: str) -> None:
    reg = _load(root)
    if str(script_id) not in reg:
        raise ValueError(f"no stored search template {script_id!r}")
    del reg[str(script_id)]
    tmp = _registry_path(root) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(reg, f, indent=1, sort_keys=True)
    os.replace(tmp, _registry_path(root))


def run_search_template(index_dir_or_reader, body: dict,
                        script_root: str | None = None) -> dict:
    """``POST _search/template``: body carries either an inline
    ``source`` or a stored-template ``id``, plus ``params``."""
    from .dsl import run_query

    if ("source" in body) == ("id" in body):
        raise ValueError(
            "search template needs exactly one of 'source' or 'id'"
        )
    if "id" in body:
        if script_root is None:
            raise ValueError("stored-template lookup needs script_root")
        source = get_script(script_root, body["id"])
    else:
        source = body["source"]
        if isinstance(source, str):
            # OpenSearch also accepts the source as a JSON string
            source = json.loads(source)
    rendered = render_template(source, body.get("params"))
    return run_query(index_dir_or_reader, rendered)
