"""Custom relational operators Spark lacks as built-ins (task brief §custom).

Each is a composition of existing DataFrame ops (no UDFs, no mapPartitions):
the point is that "custom operator" at 100 TB means "a shuffle-shape you
choose deliberately", not imperative code.  See :mod:`.temporal` for as-of
join, point-in-interval (range) join, and multi-resolution time rollups;
:mod:`.skew` for salted aggregation/join (hot-key mitigation).
"""

from datalake2anomali_spark.operators import skew, temporal  # noqa: F401
