from .spec import IndexSpec, parse_mapping, parse_spec  # noqa: F401
from .runner import Loader  # noqa: F401
from .update import apply_updates, merge_document  # noqa: F401
from .bulk import run_bulk  # noqa: F401
from .delete import delete_by_query, delete_docs  # noqa: F401
from .forcemerge import force_merge  # noqa: F401
from .snapshot import (  # noqa: F401
    create_snapshot,
    delete_snapshot,
    list_snapshots,
    restore_snapshot,
)
from .export import export_matching, update_by_query  # noqa: F401
from .aliases import (  # noqa: F401
    delete_alias,
    get_aliases,
    put_alias,
    resolve_indices,
    search_indices,
)
