from .registry import REGISTRY, Query, query  # noqa: F401


def load_all() -> None:
    """Import every query module so REGISTRY is fully populated."""
    from . import relational_queries  # noqa: F401
    from . import text_queries  # noqa: F401
    from . import vector_queries  # noqa: F401
    from . import stream_queries  # noqa: F401
    from . import northstar_queries  # noqa: F401
    from . import enrich_queries  # noqa: F401
    from . import io_queries  # noqa: F401
    from . import fixture_queries  # noqa: F401
    from . import curation_queries  # noqa: F401
    from . import search_queries  # noqa: F401
    from . import graph_queries  # noqa: F401
    from . import layout_queries  # noqa: F401
