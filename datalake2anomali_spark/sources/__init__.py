from .datalake import (  # noqa: F401
    BulkSearchDataSource,
    WorldWatchDataSource,
    enrich_html,
    register_sources,
)
