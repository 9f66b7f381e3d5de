from .build import build_index  # noqa: F401
from .manifest import Manifest, load_manifest  # noqa: F401
