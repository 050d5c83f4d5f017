"""A3/K5: pipeline observability — per-query row counts and discard counters.

The reference logs, per configured query, how many atoms the bulk search
returned and how many were discarded and why — unsupported atom type
(``/root/reference/src/Datalake2Anomali.py:378-381``) and per-query result
counts (``:327-332``) — through its wrapped logger (``src/core.py:16-31``).

Spark's native equivalent is ``df.observe()``: aggregate expressions attached
to a plan node that are computed *as the rows stream past* during the action
that consumes the DataFrame — no second scan, no ``.count()`` re-execution,
and they work identically on a 100 TB input because the counters are partial
aggregates merged on the driver.

Design note: the stock EP-A chain (``transforms.generate_indicators``)
expresses the F2 drop as an inner broadcast join, which never materializes
the dropped rows anywhere a counter could see them.  The instrumented
variant therefore flips that join to ``left`` and keeps the drop as an
explicit filter AFTER the observation point — semantically identical output
(broadcast left-join + non-null filter ≡ broadcast inner join; asserted in
tests/test_metrics.py), but every parsed row crosses the observed node
exactly once, carrying its discard reason.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from .schemas import atom_type_dim
from .transforms import parse_positional, resolve_itype

logger = logging.getLogger("datalake2anomali_spark.metrics")

#: Metric column names (fixed part; per-query counters are ``n_rows_<hash>``).
METRIC_COLS = ("n_parsed", "n_unsupported_type", "n_missing_md5", "n_indicators")


def instrumented_indicators(
    bulk_raw: DataFrame,
    specs: DataFrame,
    query_hashes: list[str] | None = None,
) -> tuple[DataFrame, Observation]:
    """EP-A with observed counters; returns ``(indicators, observation)``.

    After any action on the returned DataFrame, ``observation.get`` yields::

        n_parsed             rows parsed from the bulk scan (pre-filter)
        n_unsupported_type   F2 discards (atom type not in the 6-row dim)
        n_missing_md5        F3 discards (file/md5 atom without a hash)
        n_indicators         rows surviving both filters
        n_rows_<hash>        per-query surviving counts (A3), one per entry
                             in ``query_hashes`` — config-sized, like the
                             reference's per-query log loop (``:327-332``)

    The output DataFrame is column-for-column identical to
    ``transforms.generate_indicators``.
    """
    parsed = parse_positional(bulk_raw)
    dim = atom_type_dim(bulk_raw.sparkSession)
    flagged = parsed.join(F.broadcast(dim), "atom_type", "left")

    supported = F.col("anomali_type").isNotNull()
    md5_ok = ~((F.col("anomali_type") == "md5") & F.col("hashes_md5").isNull())
    kept_cond = supported & md5_ok

    exprs = [
        F.count(F.lit(1)).alias("n_parsed"),
        F.count_if(~supported).alias("n_unsupported_type"),
        F.count_if(supported & ~md5_ok).alias("n_missing_md5"),
        F.count_if(kept_cond).alias("n_indicators"),
    ]
    for h in query_hashes or []:
        exprs.append(
            F.count_if(kept_cond & (F.col("query_hash") == h)).alias(f"n_rows_{h}")
        )

    obs = Observation("ep_a_metrics")
    observed = flagged.observe(obs, *exprs)

    kept = observed.filter(supported).filter(md5_ok)
    enriched = resolve_itype(kept, specs)
    out = enriched.select(
        "dataset_name",
        "anomali_type",
        "anomali_itype",
        "anomali_severity",
        "atom_type",
        "atom_value",
        "hashes_md5",
        "threat_scores",
        "threat_tags",
    )
    return out, obs


def log_metrics(obs: Observation, level: int = logging.INFO) -> dict:
    """K5: emit the observed counters as one structured log record.

    Mirrors the reference's per-run summary logging (``src/core.py:16-31``,
    ``src/Datalake2Anomali.py:327-332``); returns the metrics dict so callers
    can ship it to any metrics sink.  Call only after an action has run on
    the observed DataFrame (``Observation.get`` blocks until then).
    """
    metrics = dict(obs.get)
    logger.log(level, "ep_a metrics", extra={"metrics": metrics})
    return metrics
