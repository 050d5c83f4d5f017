"""Indicator → Anomali intelligence payload assembly.

Reference: ``AnomaliApi._prepareIndicatorPayload``
(``/root/reference/src/Datalake2Anomali.py:60-102``):

- A1 (``:83``): ``confidence = max(threat_scores)`` — per-row array max.
- P4 (``:72-79``): the observable value lands under a JSON key *named after
  its type* (``{"domain": "evil.com", ...}``) — a row-local pivot.  Built
  here as ``to_json`` of a 1-entry map merged into the rest of the object,
  all codegen'd string ops (no UDF).
- P5/P6 (``:88-98``): tags = ``[{name: dataset_name, tlp}]`` plus, when
  ``add_dtl_tags``, each source tag as ``{name, tlp}``.
- P7/S3 (``:61-68``): payload ``meta`` carries classification and an
  expiration timestamp.  The reference HARDCODES now+1h and silently ignores
  its own ``anomali_expiration_period`` config knob
  (``src/config.py.default:20`` — declared, documented in README.md:25-26,
  never read).  We honor the knob: ``expiration_hours`` defaults to 1 to
  match observed reference behavior but is configurable, and the timestamp
  base is injectable for deterministic testing.

Everything is row-local (no shuffle); payload batching happens in the sink
(``sinks/anomali.py``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def confidence_col() -> Column:
    """A1: per-row max of the threat_scores array."""
    return F.array_max("threat_scores").cast("int")


def tags_col(tags_tlp: str = "white", add_dtl_tags: bool = True) -> Column:
    """P5/P6: dataset tag + optional per-row source tags, as array<struct>."""
    base = F.array(
        F.struct(
            F.col("dataset_name").alias("name"),
            F.lit(tags_tlp).alias("tlp"),
        )
    )
    extra = F.transform(
        F.coalesce(F.col("threat_tags"), F.array().cast("array<string>")),
        lambda t: F.struct(t.alias("name"), F.lit(tags_tlp).alias("tlp")),
    )
    return F.concat(base, extra) if add_dtl_tags else base


def prepare_objects(
    indicators: DataFrame, tags_tlp: str = "white", add_dtl_tags: bool = True
) -> DataFrame:
    """Typed (pre-JSON) form of the Anomali objects — one row per indicator."""
    return indicators.select(
        F.col("anomali_type").alias("value_key"),
        F.when(F.col("anomali_type") == "md5", F.col("hashes_md5"))
        .otherwise(F.col("atom_value"))
        .alias("value"),
        confidence_col().alias("confidence"),
        F.col("anomali_itype").alias("itype"),
        F.col("anomali_severity").alias("severity"),
        tags_col(tags_tlp, add_dtl_tags).alias("tags"),
    )


def objects_json(objects: DataFrame) -> DataFrame:
    """P4/P8: render each object with its type-keyed value column.

    ``to_json(map(value_key → value))`` produces ``{"<type>":"<value>"}``;
    the rest of the object is ``to_json(struct(...))``; the two JSON objects
    are merged with a codegen'd concat — no UDF, no driver loop.
    """
    keyed = F.to_json(F.create_map(F.col("value_key"), F.col("value")))
    rest = F.to_json(F.struct("confidence", "itype", "severity", "tags"))
    merged = F.concat(
        F.regexp_replace(keyed, r"\}$", ""),
        F.lit(","),
        F.substring(rest, 2, 2_000_000_000),
    )
    return objects.withColumn("object_json", merged)


def payload_meta(
    classification: str = "private",
    expiration_hours: int = 1,
    now: Column | None = None,
) -> Column:
    """P7: the payload-level meta struct.

    ``now`` is injectable (defaults to ``current_timestamp()``) so tests and
    oracle queries can pin a deterministic base time.
    """
    base = now if now is not None else F.current_timestamp()
    return F.struct(
        F.lit(True).alias("allow_update"),
        F.lit(True).alias("enrich"),
        F.lit(classification).alias("classification"),
        F.date_format(
            base + F.make_interval(hours=F.lit(expiration_hours)),
            "yyyy-MM-dd'T'HH:mm:ss",
        ).alias("expiration_ts"),
    )
