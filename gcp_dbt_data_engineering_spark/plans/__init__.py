from .analytics import SPECS as ANALYTICS_SPECS  # noqa: F401
from .spec import QuerySpec  # noqa: F401
