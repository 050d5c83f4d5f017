"""EP-A core: bulk-search rows → normalized indicators.

Reference behavior being reproduced (all cites into
``/root/reference/src/Datalake2Anomali.py``):

- P1/P2 (``:342-376``): each bulk-search result row is a positional JSON
  array ``[atom_type, atom_value, md5, threat_scores, tags?]``; the tags
  element may be absent (arity guard ``len(threat) > 4`` at ``:374``).
- J1/F2 (``:345-346, 378-381``): atom_type → anomali_type via the 6-row dim;
  unknown types are dropped.
- F3 (``:347-351``): ``file`` atoms with no md5 are dropped.
- J3 (``:353-358``): itype = spec override map, else global default map,
  else null.
- J2 (``:342, 362-369``): every row inherits dataset_name / severity from
  the spec that produced it.
- O2 (``:342-377``): results of all specs are concatenated with NO dedup —
  the same atom under two specs yields two indicators.

Scale notes: the parse is row-local (whole-stage codegen'd JSON path
expressions — no Python), both dimension joins are broadcast (6 and 5 rows),
and the spec join broadcasts too (specs are config-sized).  The whole EP-A
plan is shuffle-free map-only, so it scales linearly with input splits —
at 100 TB there is still no exchange in this plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .schemas import atom_type_dim, default_itype_dim


def parse_positional(bulk_raw: DataFrame, raw_col: str = "raw") -> DataFrame:
    """P1/P2: positional JSON array row → named, typed columns.

    Spark 4 VariantType does the heavy lifting: ``parse_json`` once, then
    ``variant_get`` path extractions (root-array indexing, which
    ``get_json_object`` does not support) — all JVM-side, no Python.  A
    4-element row (no tags) yields NULL at ``$[4]`` — the reference's arity
    guard (``len(threat) > 4`` at ``:374``) — which downstream treats as
    "no tags"; a JSON ``null`` md5 extracts as SQL NULL.
    """
    v = F.parse_json(F.col(raw_col))
    return bulk_raw.select(
        "query_hash",
        F.variant_get(v, "$[0]", "string").alias("atom_type"),
        F.variant_get(v, "$[1]", "string").alias("atom_value"),
        F.variant_get(v, "$[2]", "string").alias("hashes_md5"),
        F.variant_get(v, "$[3]", "array<int>").alias("threat_scores"),
        F.variant_get(v, "$[4]", "array<string>").alias("threat_tags"),
    )


def join_type_dim(parsed: DataFrame) -> DataFrame:
    """J1 + F2: inner broadcast join against the 6-row type dimension.

    The inner join IS the unsupported-type filter — a miss drops the row,
    exactly the reference's ``.get()`` + skip.
    """
    dim = atom_type_dim(parsed.sparkSession)
    return parsed.join(F.broadcast(dim), "atom_type", "inner")


def filter_md5_required(df: DataFrame) -> DataFrame:
    """F3: drop ``md5``-typed rows whose md5 hash is missing."""
    return df.filter(~((F.col("anomali_type") == "md5") & F.col("hashes_md5").isNull()))


def resolve_itype(df: DataFrame, specs: DataFrame) -> DataFrame:
    """J2 + J3: attach spec metadata and resolve the itype coalesce.

    Spec attachment is a broadcast equi-join on ``query_hash`` (the
    reference correlates by list position; a join on the handle is the
    set-oriented equivalent and keeps UNION-ALL semantics — no dedup).
    itype = per-spec override map → global default map → NULL.
    """
    dflt = default_itype_dim(df.sparkSession)
    joined = df.join(F.broadcast(specs), "query_hash", "inner").join(
        F.broadcast(dflt), "anomali_type", "left"
    )
    return joined.withColumn(
        "anomali_itype",
        F.coalesce(
            F.element_at(F.col("anomali_itype"), F.col("anomali_type")),
            F.col("default_itype"),
        ),
    ).drop("default_itype")


def generate_indicators(bulk_raw: DataFrame, specs: DataFrame) -> DataFrame:
    """EP-A core (reference ``_generateIndicators`` ``:338-385``)."""
    parsed = parse_positional(bulk_raw)
    typed = join_type_dim(parsed)
    kept = filter_md5_required(typed)
    enriched = resolve_itype(kept, specs)
    return enriched.select(
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
