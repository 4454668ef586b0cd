"""Import every query module so REGISTRY is fully populated."""

from . import relational  # noqa: F401

try:  # modules added incrementally; keep import robust mid-build
    from . import llm  # noqa: F401
except ImportError:  # pragma: no cover
    pass
try:
    from . import etl_flavored  # noqa: F401
except ImportError:  # pragma: no cover
    pass
try:
    from . import events_queries  # noqa: F401
except ImportError:  # pragma: no cover
    pass
try:
    from . import streaming_queries  # noqa: F401
except ImportError:  # pragma: no cover
    pass
try:
    from . import subqueries  # noqa: F401
except ImportError:  # pragma: no cover
    pass
try:
    from . import stats  # noqa: F401
except ImportError:  # pragma: no cover
    pass
try:
    from . import tpch_more  # noqa: F401
except ImportError:  # pragma: no cover
    pass
try:
    from . import tpch_rest  # noqa: F401
except ImportError:  # pragma: no cover
    pass
try:
    from . import incremental  # noqa: F401
except ImportError:  # pragma: no cover
    pass
try:
    from . import graph  # noqa: F401
except ImportError:  # pragma: no cover
    pass
