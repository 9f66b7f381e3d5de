"""Runtime configuration with precedence CLI > env > YAML.

Mirrors the reference's config manager (opensearch_loader/config.py:
18-77): a YAML app-config file is the base layer, ``RAYBM25_*``
environment variables override it (the reference's ``OS_LOADER_*``),
and explicit CLI arguments override both. Values are whitespace-
stripped and type-coerced the same way (config.py:79-111 — booleans
from true/1/yes, ints, comma-separated lists).
"""

from __future__ import annotations

import os

from .spec import coerce_value, strip_strings

ENV_PREFIX = "RAYBM25_"

# env var (sans prefix) -> config key; the reference's mapping shape
# (config.py:46-66) restricted to knobs this engine actually has —
# connection settings have no analog (there is no server).
ENV_KEYS = {
    "INDEX_SPEC_FILE": "index_spec_file",
    "INDEX_ROOT": "index_root",
    "SELECTED_INDICES": "selected_indices",
    "TEST_MODE": "test_mode",
    "ABOUT_FILE": "about_file",
    "MODEL_FILES": "model_files",
    "LOG_DIR": "log_dir",
}


class Config:
    """Layered config: ``Config(yaml_path, cli_args_dict)``.

    ``cli_args`` entries with value ``None`` are treated as "not given
    on the CLI" and do not override (argparse defaults semantics,
    reference config.py:69-77).
    """

    def __init__(self, config_file: str | None = None, cli_args: dict | None = None,
                 env: dict | None = None):
        self.config: dict = {}
        if config_file:
            import yaml

            with open(config_file) as f:
                loaded = yaml.safe_load(f) or {}
            self.config.update(strip_strings(loaded))
        env = os.environ if env is None else env
        for suffix, key in ENV_KEYS.items():
            raw = env.get(ENV_PREFIX + suffix)
            if raw is not None:
                self.config[key] = coerce_value(raw.strip())
        for key, val in (cli_args or {}).items():
            if val is not None:
                self.config[key] = coerce_value(val) if isinstance(val, str) else val

    def get(self, key: str, default=None):
        return self.config.get(key, default)

    def __contains__(self, key: str) -> bool:
        return key in self.config
