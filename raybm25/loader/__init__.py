from .spec import IndexSpec, parse_mapping, parse_spec  # noqa: F401
from .runner import Loader  # noqa: F401
from .update import apply_updates  # noqa: F401
