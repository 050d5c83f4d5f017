"""Oracle-checked IOC pipeline queries (SURVEY §2 EP-A / EP-B).

Each query derives IOC-shaped inputs from the driver tables (see
``ioc/derive.py``), runs the REAL pipeline transforms, and has a DuckDB twin
that repeats the identical derivation + relational semantics in ANSI SQL.
A hash match therefore verifies: positional JSON parse (P1/P2), type dim
join + discard (J1/F2), md5 filter (F3), spec enrichment (J2), itype
coalesce (J3), union-all no-dedup (O2), array-max confidence (A1), tag
assembly (P5/P6), type-keyed JSON pivot (P4/P8), upsert routing (J4) and the
incremental high-watermark cursor (A2/SRC4/SRC7/T2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..ioc.derive import (
    derive_advisories,
    derive_bulk_raw,
    derive_existing_tipreports,
    derived_specs_df,
)
from ..ioc.payload import objects_json, payload_meta, prepare_objects
from ..ioc.specs import validate_specs
from ..ioc.transforms import generate_indicators
from ..ioc.upsert import incremental_advisories, route_upserts

# Shared CTE prefix: the deterministic derivation + the EP-A relational chain,
# written once and reused by every IOC oracle.
_IOC_CTES = """
WITH raws AS (
  SELECT c_custkey AS k,
    '["' ||
    CASE c_custkey % 8 WHEN 0 THEN 'fqdn' WHEN 1 THEN 'domain' WHEN 2 THEN 'ip'
         WHEN 3 THEN 'url' WHEN 4 THEN 'email' WHEN 5 THEN 'file'
         WHEN 6 THEN 'cve' ELSE 'asn' END ||
    '","atom-' || CAST(c_custkey AS VARCHAR) || '",' ||
    COALESCE('"' || CASE WHEN c_custkey % 8 = 5 AND c_custkey % 3 <> 0
                         THEN md5('h' || CAST(c_custkey AS VARCHAR)) END || '"',
             'null') ||
    ',[' || CAST(c_custkey % 101 AS VARCHAR) || ',' ||
            CAST((c_custkey * 7) % 101 AS VARCHAR) || ',' ||
            CAST((c_custkey * 13) % 101 AS VARCHAR) || ']' ||
    COALESCE(',' || CASE WHEN c_custkey % 4 = 0 THEN NULL
                         WHEN c_custkey % 4 = 1 THEN 'null'
                         ELSE '["tag-' || CAST(c_custkey % 5 AS VARCHAR) ||
                              '","seg-' || lower(c_mktsegment) || '"]' END,
             '') ||
    ']' AS raw
  FROM customer
),
bulk AS (
  SELECT 'qh-' || CAST(k % 3 AS VARCHAR) AS query_hash, raw FROM raws
  UNION ALL
  SELECT 'qh-' || CAST((k + 1) % 3 AS VARCHAR) AS query_hash, raw
  FROM raws WHERE k % 10 = 0
),
parsed AS (
  SELECT query_hash,
    json_extract_string(raw, '$[0]') AS atom_type,
    json_extract_string(raw, '$[1]') AS atom_value,
    json_extract_string(raw, '$[2]') AS hashes_md5,
    CAST(raw -> '$[3]' AS INTEGER[]) AS threat_scores,
    CAST(raw -> '$[4]' AS VARCHAR[]) AS threat_tags
  FROM bulk
),
typed AS (
  SELECT parsed.*,
    CASE atom_type WHEN 'fqdn' THEN 'domain' WHEN 'domain' THEN 'domain'
         WHEN 'ip' THEN 'srcip' WHEN 'url' THEN 'url' WHEN 'email' THEN 'email'
         WHEN 'file' THEN 'md5' END AS anomali_type
  FROM parsed
),
kept AS (
  SELECT * FROM typed
  WHERE anomali_type IS NOT NULL
    AND NOT (anomali_type = 'md5' AND hashes_md5 IS NULL)
),
specs(query_hash, dataset_name, anomali_severity) AS (
  SELECT * FROM (VALUES ('qh-0', 'dataset_alpha', 'medium'),
                        ('qh-1', 'dataset_beta', 'high'),
                        ('qh-2', 'dataset_gamma', 'low')) v
),
enriched AS (
  SELECT kept.*, dataset_name, anomali_severity,
    COALESCE(
      CASE WHEN kept.query_hash = 'qh-0' AND anomali_type = 'domain' THEN 'custom_dom_itype'
           WHEN kept.query_hash = 'qh-0' AND anomali_type = 'md5' THEN 'custom_md5_itype'
           WHEN kept.query_hash = 'qh-2' AND anomali_type = 'srcip' THEN 'custom_ip_itype' END,
      CASE anomali_type WHEN 'domain' THEN 'suspicious_domain' WHEN 'srcip' THEN 'actor_ip'
           WHEN 'url' THEN 'suspicious_url' WHEN 'email' THEN 'suspicious_email'
           WHEN 'md5' THEN 'mal_md5' END
    ) AS anomali_itype
  FROM kept JOIN specs ON kept.query_hash = specs.query_hash
)
"""


def _indicators(spark: SparkSession, sf_dir: str) -> DataFrame:
    bulk = derive_bulk_raw(spark, sf_dir)
    valid, _rejected = validate_specs(derived_specs_df(spark))
    return generate_indicators(bulk, valid)


def ioc_indicators(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EP-A end-to-end: bulk rows → normalized indicator relation."""
    return _indicators(spark, sf_dir).select(
        "dataset_name",
        "anomali_type",
        "anomali_itype",
        "anomali_severity",
        "atom_type",
        "atom_value",
        "hashes_md5",
        F.array_max("threat_scores").cast("int").alias("confidence"),
        F.array_join("threat_tags", ",").alias("threat_tags_csv"),
    )


IOC_INDICATORS_SQL = (
    _IOC_CTES
    + """
SELECT dataset_name, anomali_type, anomali_itype, anomali_severity,
       atom_type, atom_value, hashes_md5,
       CAST(list_aggregate(threat_scores, 'max') AS INTEGER) AS confidence,
       array_to_string(threat_tags, ',') AS threat_tags_csv
FROM enriched
"""
)


def ioc_indicators_observed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EP-A through the instrumented A3/K5 plan (``ioc/metrics.py``).

    Same output relation as ``ioc_indicators`` — the driver hashing this
    against ``IOC_INDICATORS_SQL`` proves the observed variant (broadcast
    *left* join + post-observation filters, so every parsed row crosses the
    ``observe()`` node) is output-identical to the stock inner-join chain.
    The counter values themselves are pinned in tests/test_metrics.py; here
    they just ride along on the driver's action at zero extra scan cost.
    """
    from ..ioc.metrics import instrumented_indicators

    bulk = derive_bulk_raw(spark, sf_dir)
    valid, _rejected = validate_specs(derived_specs_df(spark))
    out, _obs = instrumented_indicators(bulk, valid)
    return out.select(
        "dataset_name",
        "anomali_type",
        "anomali_itype",
        "anomali_severity",
        "atom_type",
        "atom_value",
        "hashes_md5",
        F.array_max("threat_scores").cast("int").alias("confidence"),
        F.array_join("threat_tags", ",").alias("threat_tags_csv"),
    )


def ioc_payload_objects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 + P4 prep + P5/P6 tag assembly, pre-JSON typed form."""
    objs = prepare_objects(_indicators(spark, sf_dir), tags_tlp="white", add_dtl_tags=True)
    return objs.select(
        "value_key",
        "value",
        "confidence",
        "itype",
        "severity",
        F.to_json("tags").alias("tags_json"),
    )


IOC_PAYLOAD_OBJECTS_SQL = (
    _IOC_CTES
    + """
SELECT anomali_type AS value_key,
       CASE WHEN anomali_type = 'md5' THEN hashes_md5 ELSE atom_value END AS value,
       CAST(list_aggregate(threat_scores, 'max') AS INTEGER) AS confidence,
       anomali_itype AS itype,
       anomali_severity AS severity,
       '[{"name":"' || dataset_name || '","tlp":"white"}' ||
       COALESCE(array_to_string(
           list_transform(threat_tags, x -> ',{"name":"' || x || '","tlp":"white"}'), ''), '') ||
       ']' AS tags_json
FROM enriched
"""
)


def ioc_payload_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4/P7/P8: full type-keyed object JSON + deterministic payload meta."""
    objs = prepare_objects(_indicators(spark, sf_dir), tags_tlp="white", add_dtl_tags=True)
    rendered = objects_json(objs)
    meta = payload_meta(
        classification="private",
        expiration_hours=1,
        now=F.lit("2026-01-01 00:00:00").cast("timestamp"),
    )
    return rendered.select("object_json", F.to_json(meta).alias("meta_json"))


IOC_PAYLOAD_JSON_SQL = (
    _IOC_CTES
    + """
SELECT '{"' || anomali_type || '":"' ||
       CASE WHEN anomali_type = 'md5' THEN hashes_md5 ELSE atom_value END ||
       '","confidence":' || CAST(CAST(list_aggregate(threat_scores, 'max') AS INTEGER) AS VARCHAR) ||
       ',"itype":"' || anomali_itype ||
       '","severity":"' || anomali_severity ||
       '","tags":[{"name":"' || dataset_name || '","tlp":"white"}' ||
       COALESCE(array_to_string(
           list_transform(threat_tags, x -> ',{"name":"' || x || '","tlp":"white"}'), ''), '') ||
       ']}' AS object_json,
       '{"allow_update":true,"enrich":true,"classification":"private","expiration_ts":"2026-01-01T01:00:00"}' AS meta_json
FROM enriched
"""
)


#: Non-default expiration periods for the knob-honoring row: the reference
#: DECLARES ``anomali_expiration_period`` (``src/config.py.default:20``,
#: README.md:25-26) but hardcodes now+1h (``src/Datalake2Anomali.py:62``);
#: we honor the knob (SURVEY §2 S3) and this query certifies each period
#: produces its own expiration_ts.
EXPIRATION_PERIODS = (1, 24, 168)


def ioc_payload_expiration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3 with the ``anomali_expiration_period`` knob exercised end-to-end:
    every payload object rendered under each configured period, one row per
    (object, period), with the period's own ``expiration_ts``.  The oracle
    hardcodes the three expected timestamps independently, so a hash match
    proves the knob — not just the default — drives the interval
    arithmetic (``ioc/payload.py: payload_meta``)."""
    objs = prepare_objects(
        _indicators(spark, sf_dir), tags_tlp="white", add_dtl_tags=True
    )
    now = F.lit("2026-01-01 00:00:00").cast("timestamp")
    variants = [
        objs.select(
            "value_key",
            "value",
            F.lit(h).cast("int").alias("expiration_hours"),
            payload_meta(
                classification="private", expiration_hours=h, now=now
            ).getField("expiration_ts").alias("expiration_ts"),
        )
        for h in EXPIRATION_PERIODS
    ]
    out = variants[0]
    for v in variants[1:]:
        out = out.unionByName(v)
    return out


IOC_PAYLOAD_EXPIRATION_SQL = (
    _IOC_CTES
    + """
SELECT anomali_type AS value_key,
       CASE WHEN anomali_type = 'md5' THEN hashes_md5 ELSE atom_value END AS value,
       p.h AS expiration_hours,
       CASE p.h WHEN 1   THEN '2026-01-01T01:00:00'
                WHEN 24  THEN '2026-01-02T00:00:00'
                WHEN 168 THEN '2026-01-08T00:00:00' END AS expiration_ts
FROM enriched
CROSS JOIN (VALUES (CAST(1 AS INTEGER)), (CAST(24 AS INTEGER)), (CAST(168 AS INTEGER))) p(h)
"""
)


def ioc_upsert_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EP-B J4: batch MERGE routing against sink state."""
    adv = derive_advisories(spark, sf_dir)
    existing = derive_existing_tipreports(spark, sf_dir)
    routed = route_upserts(adv, existing)
    return routed.select("id", "action", "tipreport_id")


IOC_UPSERT_ROUTING_SQL = """
WITH adv AS (
  SELECT o_orderkey AS id FROM orders WHERE o_orderkey % 7 = 0
),
ex AS (
  SELECT o_orderkey AS aid, o_orderkey + 1000000 AS tid
  FROM orders WHERE o_orderkey % 14 = 0
)
SELECT id,
       CASE WHEN tid IS NULL THEN 'insert' ELSE 'update' END AS action,
       tid AS tipreport_id
FROM adv LEFT JOIN ex ON adv.id = ex.aid
"""


def ioc_incremental_cursor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRC4/A2/T2: advisories newer than the sink-side high-watermark."""
    adv = derive_advisories(spark, sf_dir)
    existing = derive_existing_tipreports(spark, sf_dir)
    fresh = incremental_advisories(adv, existing, "timestamp_updated")
    return fresh.select(
        "id",
        F.date_format("timestamp_updated", "yyyy-MM-dd HH:mm:ss").alias("updated_ts"),
    )


IOC_INCREMENTAL_CURSOR_SQL = """
WITH ex AS (
  SELECT o_orderdate - INTERVAL 2 YEAR AS m FROM orders WHERE o_orderkey % 14 = 0
  UNION ALL
  SELECT o_orderdate - INTERVAL 2 YEAR FROM orders WHERE o_orderkey % 11 = 0
),
adv AS (
  SELECT o_orderkey AS id, o_orderdate AS tu FROM orders WHERE o_orderkey % 7 = 0
)
SELECT id, strftime(tu, '%Y-%m-%d %H:%M:%S') AS updated_ts
FROM adv WHERE tu > (SELECT max(m) FROM ex)
"""

def ioc_rest_source_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EP-A end-to-end over the Python DataSource REST scan (SRC1-3).

    Rows-only for the driver (the source's data never touches parquet, so
    there is no DuckDB twin); the per-transform behavior is oracle-covered
    by ``ioc_indicators`` and the source itself by tests/test_sources.py.
    """
    import json as _json

    from ..ioc.specs import QuerySpec, specs_df
    from ..ioc.transforms import generate_indicators
    from ..sources import register_sources
    from ..sources.mock_backend import DEFAULT_FIELDS

    register_sources(spark)
    hashes = ["q1hash", "q2hash", "q3hash"]
    bulk = (
        spark.read.format("datalake_bulksearch")
        .option("query_hashes", _json.dumps(hashes))
        .option("query_fields", _json.dumps(DEFAULT_FIELDS + ["tags"]))
        .load()
    )
    specs = specs_df(
        spark,
        [
            QuerySpec(query_hash=h, dataset_name=f"ds_{h}", anomali_severity="medium")
            for h in hashes
        ],
    )
    return (
        generate_indicators(bulk, specs)
        .select(
            "dataset_name",
            "anomali_type",
            "anomali_itype",
            "anomali_severity",
            "atom_type",
            "atom_value",
            "hashes_md5",
            # Scalar-project the array columns (as ioc_indicators does): the
            # driver's pandas canonicalizer sorts object columns and cannot
            # hash Python lists.
            F.array_max("threat_scores").cast("int").alias("confidence"),
            F.array_join("threat_tags", ",").alias("threat_tags_csv"),
        )
        .orderBy("dataset_name", "atom_value")
    )


# Full-value oracle for the REST-source pipeline.  The mock backend
# (sources/mock_backend.py) is a pure function of sha256(key) seeds, so the
# oracle REGENERATES the exact same wire rows inside DuckDB — seed =
# first 8 bytes of sha256 as UBIGINT, identical row formulas — then applies
# the EP-A transform (F2 inner dim join, F3 md5 filter, spec enrichment,
# itype defaults) in SQL.  No parquet table involved: both engines derive
# the answer independently from the same deterministic definition, which
# checks the DataSource scan + parse + transform end to end by value.
_REST_SEED = "CAST(('0x' || substr(sha256({k}), 1, 16)) AS UBIGINT)"

IOC_REST_SOURCE_SQL = f"""
WITH qh AS (
  SELECT unnest(['q1hash', 'q2hash', 'q3hash']) AS query_hash
),
n AS (
  SELECT query_hash,
         50 + {_REST_SEED.format(k="query_hash || '/n'")} % 150 AS cnt
  FROM qh
),
idx AS (
  SELECT query_hash, unnest(range(0, CAST(cnt AS BIGINT))) AS i FROM n
),
seeded AS (
  SELECT query_hash, i, {_REST_SEED.format(k="query_hash || '/' || i")} AS seed
  FROM idx
),
atoms AS (
  SELECT query_hash, i, seed,
         (['fqdn','domain','ip','url','email','file','cve','paste'])[CAST(seed % 8 AS BIGINT) + 1] AS atom_type,
         [CAST((seed >> 8) % 100 AS INT), CAST((seed >> 16) % 100 AS INT), CAST((seed >> 24) % 100 AS INT)] AS threat_scores,
         ['tag' || (seed % 7), 'campaign' || (seed % 3)] AS threat_tags
  FROM seeded
),
wire AS (
  SELECT query_hash,
         atom_type,
         atom_type || '-' || (seed % 100000) || '.example' AS atom_value,
         CASE WHEN atom_type = 'file' AND seed % 5 <> 0
              THEN md5(query_hash || '/' || i) ELSE NULL END AS hashes_md5,
         threat_scores, threat_tags
  FROM atoms
),
typed AS (  -- F2: inner join against the 6-row type dim drops cve/paste
  SELECT w.*, t.anomali_type
  FROM wire w
  JOIN (VALUES ('fqdn','domain'), ('domain','domain'), ('ip','srcip'),
               ('url','url'), ('email','email'), ('file','md5')
       ) t(atom_type, anomali_type)
    ON w.atom_type = t.atom_type
),
kept AS (  -- F3: md5-typed atoms need a hash
  SELECT * FROM typed WHERE NOT (anomali_type = 'md5' AND hashes_md5 IS NULL)
),
enriched AS (  -- spec join (ds_<hash>/medium, no itype overrides) + J3 default
  SELECT 'ds_' || k.query_hash AS dataset_name,
         k.anomali_type,
         d.itype AS anomali_itype,
         'medium' AS anomali_severity,
         k.atom_type, k.atom_value, k.hashes_md5, k.threat_scores, k.threat_tags
  FROM kept k
  LEFT JOIN (VALUES ('domain','suspicious_domain'), ('srcip','actor_ip'),
                    ('url','suspicious_url'), ('email','suspicious_email'),
                    ('md5','mal_md5')
            ) d(atype, itype)
    ON k.anomali_type = d.atype
)
SELECT dataset_name, anomali_type, anomali_itype, anomali_severity,
       atom_type, atom_value, hashes_md5,
       CAST(list_aggregate(threat_scores, 'max') AS INTEGER) AS confidence,
       array_to_string(threat_tags, ',') AS threat_tags_csv
FROM enriched
"""


def ioc_advisory_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRC5/J5: WorldWatch advisory scan + per-row N+1 html detail fetch.

    The reference loops one blocking GET per advisory on the driver
    (``src/Datalake2Anomali.py:424-430``); here the fetch rides
    ``mapInPandas`` so it fans out with the data (sources/datalake.py
    ``enrich_html``).  Oracle-checked by value: both the advisory list and
    the html bodies are pure sha256-seeded functions, regenerated in SQL.
    """
    from ..sources import register_sources
    from ..sources.datalake import enrich_html

    register_sources(spark)
    adv = spark.read.format("worldwatch_advisories").load()
    return enrich_html(adv).select(
        "id",
        "title",
        "timestamp_updated",
        F.array_join("tags", ",").alias("tags_csv"),
        "html",
    )


IOC_ADVISORY_ENRICHMENT_SQL = f"""
WITH ids AS (
  SELECT unnest(range(0, 40)) AS id
),
seeded AS (
  SELECT id,
         {_REST_SEED.format(k="'adv/' || id")} AS seed,
         {_REST_SEED.format(k="'html/' || id")} AS hseed
  FROM ids
),
adv AS (
  SELECT id,
         'WorldWatch advisory ' || id AS title,
         strftime(TIMESTAMP '2024-01-01 00:00:00'
                  + to_hours(6 * id) + to_hours(CAST(seed % 72 AS BIGINT)),
                  '%Y-%m-%dT%H:%M:%SZ') AS timestamp_updated,
         'sector' || (seed % 5) || ',' || 'region' || (seed % 3) AS tags_csv,
         '<html><body>advisory ' || id || ' body ' || (hseed % 1000000)
           || '</body></html>' AS html
  FROM seeded
)
SELECT id, title, timestamp_updated, tags_csv, html FROM adv
"""


# Gate-footprint note (VERDICT r3 #5): `ioc_indicators` is not registered
# separately — `ioc_indicators_observed` returns the identical frame (observe()
# is transparent) against the identical IOC_INDICATORS_SQL oracle, so one row
# certifies both; the plain function remains the library entrypoint.
QUERIES = {
    "ioc_indicators_observed": ioc_indicators_observed,
    "ioc_payload_objects": ioc_payload_objects,
    "ioc_payload_json": ioc_payload_json,
    "ioc_payload_expiration": ioc_payload_expiration,
    "ioc_upsert_routing": ioc_upsert_routing,
    "ioc_incremental_cursor": ioc_incremental_cursor,
    "ioc_rest_source_pipeline": ioc_rest_source_pipeline,
    "ioc_advisory_enrichment": ioc_advisory_enrichment,
}

ORACLES = {
    "ioc_indicators_observed": IOC_INDICATORS_SQL,
    "ioc_payload_objects": IOC_PAYLOAD_OBJECTS_SQL,
    "ioc_payload_json": IOC_PAYLOAD_JSON_SQL,
    "ioc_payload_expiration": IOC_PAYLOAD_EXPIRATION_SQL,
    "ioc_upsert_routing": IOC_UPSERT_ROUTING_SQL,
    "ioc_incremental_cursor": IOC_INCREMENTAL_CURSOR_SQL,
    "ioc_rest_source_pipeline": IOC_REST_SOURCE_SQL,
    "ioc_advisory_enrichment": IOC_ADVISORY_ENRICHMENT_SQL,
}
