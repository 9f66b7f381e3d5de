from .build import build_index, rebuild_postings  # noqa: F401
from .build_scan import build_index_scan  # noqa: F401
from .manifest import Manifest, load_manifest  # noqa: F401
