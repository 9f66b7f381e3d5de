"""Model-schema document generator (SURVEY.md §2 S4/S5).

The reference loads graph-model YAML files (schema.py:29-107) and
generates synthetic documents per node / property / enum value
(loader.py:728-788): ids compose as ``{node}_{prop}`` and
``{node}_{prop}_{value}``; properties whose type contains
``@relation`` are skipped (loader.py:758-759); later model files
overwrite earlier keys (dict.update union, schema.py:50-58, D3); node
keys starting with ``_`` are excluded (D4).

Model dict shape (a plain-dict stand-in for the reference's YAML):
    {"Nodes": {node_name: {"Props": {prop: {"Type": <t>|{"Enum": [...]}}}}}}
"""

from __future__ import annotations

from collections.abc import Iterator


def merge_model_files(models: list[dict]) -> dict:
    """Later files overwrite earlier keys (D3 last-wins union)."""
    out: dict = {}
    for m in models:
        for k, v in (m or {}).items():
            if k == "Nodes" and isinstance(v, dict) and isinstance(out.get("Nodes"), dict):
                out["Nodes"].update(v)
            else:
                out[k] = v
    return out


def model_documents(model: dict, subtype: str = "all") -> Iterator[dict]:
    """Yield node / property / enum-value documents.

    subtype: 'node' | 'property' | 'value' | 'all'.
    """
    nodes = (model or {}).get("Nodes", {}) or {}
    for node_name, node in sorted(nodes.items()):
        if node_name.startswith("_"):  # D4 node filter
            continue
        if subtype in ("node", "all"):
            yield {"id": node_name, "kind": "node", "node": node_name}
        props = (node or {}).get("Props", {}) or {}
        for prop_name, prop in sorted(props.items()):
            ptype = (prop or {}).get("Type")
            if isinstance(ptype, str) and "@relation" in ptype:
                continue  # relation-typed props are skipped
            if subtype in ("property", "all"):
                yield {
                    "id": f"{node_name}_{prop_name}",
                    "kind": "property",
                    "node": node_name,
                    "property": prop_name,
                }
            enum = ptype.get("Enum") if isinstance(ptype, dict) else None
            if enum and subtype in ("value", "all"):
                for value in sorted({str(v) for v in enum}):  # F15 set-normalize
                    yield {
                        "id": f"{node_name}_{prop_name}_{value}",
                        "kind": "value",
                        "node": node_name,
                        "property": prop_name,
                        "value": value,
                    }
