"""traildb_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of traildb/traildb (reference surveyed in
SURVEY.md), plus large-scale training-data pipeline operators (dedup,
similarity search, text analysis, multimodal plumbing).
"""

from .dataset import TrailDataset, TrailInfo, normalize_events
from .operators.filters import (
    EventFilter,
    Term,
    TimeRange,
    parse_filter,
    trail_filter_overrides,
    uuid_whitelist,
)
from .operators import analytics, curation, dedup, joins, similarity, text, trails
from .session import get_spark

__all__ = [
    "analytics",
    "curation",
    "dedup",
    "joins",
    "similarity",
    "text",
    "TrailDataset",
    "TrailInfo",
    "EventFilter",
    "Term",
    "TimeRange",
    "parse_filter",
    "uuid_whitelist",
    "trail_filter_overrides",
    "normalize_events",
    "get_spark",
    "trails",
]
