"""Property-based tests (hypothesis): engine results vs pure-Python
references on randomized small corpora, and partition-invariance of the
deterministic kernels.

Few examples per property (Spark jobs are seconds each), but each example
is a fresh randomized corpus — these catch semantic drift the fixed-corpus
oracle checks can't (e.g. a hash kernel that silently depends on batch
boundaries or partitioning).
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from datalake2anomali_spark.llm.dedup import minhash_signatures, ngram_jaccard_pairs
from datalake2anomali_spark.llm.graph import connected_components

from tests.conftest import hyp_settings

_SETTINGS = hyp_settings()

_WORDS = ["alpha", "beta", "gamma", "delta", "eps"]
_doc = st.lists(st.sampled_from(_WORDS), min_size=4, max_size=12).map(" ".join)


def _py_jaccard(a: str, b: str, n: int = 4) -> float:
    def sh(t: str) -> set[str]:
        w = t.split(" ")
        return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}

    sa, sb = sh(a), sh(b)
    return len(sa & sb) / len(sa | sb) if sa | sb else 0.0


@settings(**_SETTINGS)
@given(st.lists(_doc, min_size=2, max_size=8))
def test_ngram_jaccard_matches_python_reference(spark, texts):
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {
        (r.d1, r.d2): r.jaccard
        for r in ngram_jaccard_pairs(df, threshold=0.0001).collect()
    }
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            expect = _py_jaccard(texts[i], texts[j])
            if expect >= 0.0001:
                assert abs(got[(i, j)] - expect) < 1e-12, (i, j, texts)
            else:
                assert (i, j) not in got or got[(i, j)] < 0.0001


@settings(**_SETTINGS)
@given(st.lists(_doc, min_size=1, max_size=10), st.integers(min_value=1, max_value=4))
def test_minhash_signatures_partition_invariant(spark, texts, nparts):
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    base = {r.doc_id: r.signature for r in minhash_signatures(df).collect()}
    repart = {
        r.doc_id: r.signature
        for r in minhash_signatures(df.repartition(nparts)).collect()
    }
    assert base == repart


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15)).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=20,
    )
)
def test_connected_components_matches_union_find(spark, edges):
    # pure-Python union-find reference
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expect = {n: find(n) for n in parent}
    # find() with min-root union keeps the smallest id as the root
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.component for r in connected_components(df).collect()}
    assert got == expect


@settings(**_SETTINGS)
@given(
    st.integers(min_value=1, max_value=40),   # n_tokens
    st.integers(min_value=2, max_value=12),   # chunk_len
    st.integers(min_value=0, max_value=6),    # overlap (< chunk_len enforced)
)
def test_chunk_documents_covers_every_token_exactly(spark, n_tokens, chunk_len, overlap):
    from datalake2anomali_spark.llm.pipeline import chunk_documents

    overlap = min(overlap, chunk_len - 1)
    toks = [f"t{i}" for i in range(n_tokens)]
    df = spark.createDataFrame([(1, " ".join(toks))], "doc_id long, text string")
    rows = sorted(
        chunk_documents(df, chunk_len=chunk_len, overlap=overlap).collect(),
        key=lambda r: r.chunk_id,
    )
    stride = chunk_len - overlap
    covered = set()
    for i, r in enumerate(rows):
        assert r.chunk_id == i
        assert r.token_start == i * stride
        piece = r.chunk_text.split(" ") if r.chunk_text else []
        assert piece == toks[r.token_start : r.token_start + chunk_len]
        assert r.chunk_tokens == len(piece)
        covered.update(range(r.token_start, r.token_start + len(piece)))
    # every token covered; no chunk beyond the minimal covering count
    assert covered == set(range(n_tokens))
    import math

    assert len(rows) == max(1, math.ceil((n_tokens - overlap) / stride))


# -- round-5 operators: randomized references + invariances -------------------

_event = st.tuples(
    st.integers(min_value=1, max_value=3),  # user
    st.integers(min_value=0, max_value=50),  # ts seconds
    st.sampled_from(["view", "click", "purchase"]),
)


def _mk_events(spark, evs):
    rows = [
        (i, u, t * 1_000_000, ty, 0.0) for i, (u, t, ty) in enumerate(evs, 1)
    ]
    from pyspark.sql import functions as F

    return (
        spark.createDataFrame(
            rows,
            "event_id long, user_id long, ts_us long, event_type string, value double",
        )
        .withColumn("ts", F.timestamp_micros(F.col("ts_us")))
        .drop("ts_us")
    )


def _py_funnel(evs, steps=("view", "click", "purchase")):
    """Reference implementation: literal chain-of-mins definition."""
    out = {}
    users = {u for u, _, _ in evs}
    for u in users:
        mine = sorted(
            [(t, i, ty) for i, (uu, t, ty) in enumerate(evs, 1) if uu == u]
        )
        ts = []
        prev = None
        for step in steps:
            cand = [
                t for t, _, ty in mine
                if ty == step and (prev is None or t > prev)
            ]
            cur = min(cand) if cand else None
            ts.append(cur)
            if cur is None:
                break
            prev = cur
        ts += [None] * (len(steps) - len(ts))
        out[u] = tuple(t * 1_000_000 if t is not None else None for t in ts)
    return out


@settings(**_SETTINGS)
@given(st.lists(_event, min_size=1, max_size=25))
def test_funnel_matches_chain_of_mins_reference(spark, evs):
    from datalake2anomali_spark.operators.analytics import funnel_steps

    got = {
        r.entity: (r.step1_us, r.step2_us, r.step3_us)
        for r in funnel_steps(_mk_events(spark, evs), ("view", "click", "purchase")).collect()
    }
    assert got == _py_funnel(evs)


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(st.integers(1, 4), st.integers(0, 30), st.integers(-500, 500)),
        min_size=1,
        max_size=30,
    ),
    st.integers(min_value=2, max_value=5),
)
def test_merge_states_invariant_under_any_split(spark, rows, nsplit):
    """The mergeable-state contract: ANY partition of the input rows into
    delta batches merges to the exact full-recompute state."""
    from pyspark.sql import functions as F

    from datalake2anomali_spark.operators import views

    df = spark.createDataFrame(
        [(k, float(v) / 7.0, i) for i, (k, _t, v) in enumerate(rows, 1)],
        "k int, value double, event_id long",
    )
    kw = dict(sum_cols={"value": 3}, minmax_cols=["event_id"])
    full = sorted(map(tuple, views.rollup_state(df, ["k"], **kw).collect()))
    parts = [df.filter(F.col("event_id") % nsplit == i) for i in range(nsplit)]
    merged = views.merge_states(
        [views.rollup_state(p, ["k"], **kw) for p in parts], ["k"]
    )
    assert sorted(map(tuple, merged.collect())) == full


@settings(**_SETTINGS)
@given(
    # centi-grid values: v*100 is an exact integer, so the python-reference
    # round() below cannot diverge from Spark's HALF_UP on .5 boundaries
    st.lists(
        st.integers(min_value=-10_000, max_value=10_000).map(lambda n: n / 100.0),
        min_size=1,
        max_size=40,
    )
)
def test_exact_quantiles_match_sorted_reference(spark, vals):
    import math

    from datalake2anomali_spark.functions.selection import exact_quantiles

    df = spark.createDataFrame([(v,) for v in vals], "v double")
    qs = [0.1, 0.5, 0.9]
    got = {r.q: r.value_scaled for r in exact_quantiles(df, "v", qs).collect()}
    snapped = sorted(round(v * 100) for v in vals)
    for q in qs:
        rank = max(1, math.ceil(q * len(snapped)))
        assert got[q] == snapped[rank - 1], (vals, q)


# -- round-6 operators --------------------------------------------------------


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),  # key
            st.integers(min_value=0, max_value=2),   # partition
            st.one_of(st.none(), st.integers(min_value=-50, max_value=50)),
        ),
        min_size=1,
        max_size=25,
        unique_by=lambda t: t[0],
    ),
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=40),
            st.integers(min_value=0, max_value=3),
            st.one_of(st.none(), st.integers(min_value=-50, max_value=50)),
        ),
        min_size=1,
        max_size=15,
        unique_by=lambda t: t[0],
    ),
)
def test_merge_into_matches_dict_reference(spark, tmp_path_factory, target_rows, source_rows):
    """merge_into == pure-Python dict upsert, including NULL-ing updates,
    partition MOVES, and emptied partitions — randomized over every case
    the round-6 fix covers."""
    from pyspark.sql import functions as F

    from datalake2anomali_spark.operators.merge import merge_into

    path = str(tmp_path_factory.mktemp("mrg") / "t")
    tdf = spark.createDataFrame(
        [(k, f"p{p}", v) for k, p, v in target_rows], "k long, part string, v long"
    )
    tdf.write.partitionBy("part").parquet(path)
    sdf = spark.createDataFrame(
        [(k, f"p{p}", v) for k, p, v in source_rows], "k long, part string, v long"
    )
    merge_into(spark, path, sdf, ["k"], "part")

    expect = {k: (f"p{p}", v) for k, p, v in target_rows}
    expect.update({k: (f"p{p}", v) for k, p, v in source_rows})
    got = {
        r.k: (r.part, r.v)
        for r in spark.read.parquet(path).collect()
    }
    assert got == expect


@settings(**_SETTINGS)
@given(
    st.lists(st.integers(min_value=-10_000, max_value=10_000), min_size=1, max_size=50),
    st.integers(min_value=2, max_value=6),
)
def test_equi_depth_histogram_invariants(spark, vals, n_bins):
    """Masses are non-negative, total exactly n, cum is monotone, edges are
    sorted, and each edge is the exact ceil(i*n/B) order statistic."""
    from datalake2anomali_spark.functions.selection import equi_depth_histogram

    df = spark.createDataFrame([(v / 100.0,) for v in vals], "v double")
    rows = sorted(equi_depth_histogram(df, "v", n_bins).collect())
    n = len(vals)
    s = sorted(vals)
    assert sum(r.n_rows for r in rows) == n
    cums = [r.cum_rows for r in rows]
    assert cums == sorted(cums) and all(r.n_rows >= 0 for r in rows)
    for r in rows:
        rank = (r.bin * n + n_bins - 1) // n_bins
        assert r.hi_scaled == s[rank - 1], (vals, n_bins, r.bin)


@settings(**_SETTINGS)
@given(
    st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=60, unique=True),
    st.integers(min_value=1, max_value=9),
)
def test_global_row_numbers_permutation_invariant(spark, keys, nparts):
    """rn is the exact sorted position regardless of input order or
    partition count — gapless, no overlaps."""
    import random

    from datalake2anomali_spark.operators.ranking import global_row_numbers

    shuffled = list(keys)
    random.Random(1).shuffle(shuffled)
    df = spark.createDataFrame([(k,) for k in shuffled], "k long").repartition(3)
    got = {r.k: r.rn for r in global_row_numbers(df, ["k"], nparts).collect()}
    assert got == {k: i + 1 for i, k in enumerate(sorted(keys))}


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),          # user
            st.integers(min_value=0, max_value=50),          # ts (s)
            st.sampled_from(["view", "click", "purchase"]),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_attribution_total_credit_is_exact(spark, evs):
    """Every attributed journey hands out EXACTLY 1_000_000 ppm across its
    touches — no rounding leakage for any n (the remainder pinning)."""
    from pyspark.sql import functions as F

    from datalake2anomali_spark.operators.analytics import attribution_credit

    rows = [(u, t * 1_000_000, ty, i) for i, (u, t, ty) in enumerate(evs)]
    df = spark.createDataFrame(
        rows, "user_id long, ts_us long, event_type string, event_id long"
    ).select(
        "user_id", F.timestamp_micros("ts_us").alias("ts"), "event_type", "event_id"
    )
    got = attribution_credit(df).agg(F.sum("credit_ppm_sum")).collect()[0][0]

    # reference: count journeys that have >= 1 touch before a conversion
    by_user = {}
    for u, t, ty in evs:
        by_user.setdefault(u, []).append((t, ty))
    n_journeys = 0
    for u, seq in by_user.items():
        # stable sort by ts: same-ts events keep input order, which matches
        # the Spark side's (ts, event_id) order since event_id enumerates
        # the input
        seq.sort(key=lambda x: (x[0],))
        cnt = 0
        pending = 0
        for t, ty in seq:
            if ty == "purchase":
                if pending > 0:
                    cnt += 1
                pending = 0
            else:
                pending += 1
        n_journeys += cnt
    assert (got or 0) == n_journeys * 1_000_000


# -- round-7 operators --------------------------------------------------------


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["g1", "g2"]),
            st.integers(min_value=-10_000, max_value=10_000).map(lambda n: n / 100.0),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_groupwise_percentile_cont_matches_sorted_reference(spark, rows):
    """Per-group interpolation == the numpy-free python reference on the
    same snapped integers: h = q*(n-1), lo = s[floor(h)], hi = s[floor(h)+1],
    frac = fractional part in exact millionths."""
    from datalake2anomali_spark.functions.selection import (
        groupwise_percentile_cont,
    )

    qs = [0.1, 0.5, 0.9]
    df = spark.createDataFrame(rows, "g string, v double")
    got = {
        (r.g, r.q): (r.lo_scaled, r.hi_scaled, r.frac_num, r.interp_rem)
        for r in groupwise_percentile_cont(df, ["g"], "v", qs).collect()
    }
    by_g: dict[str, list[int]] = {}
    for g, v in rows:
        by_g.setdefault(g, []).append(round(v * 100))
    for g, vals in by_g.items():
        s = sorted(vals)
        n = len(s)
        for q in qs:
            num = round(q * 1_000_000) * (n - 1)
            lo0, frac = divmod(num, 1_000_000)
            lo, hi = s[lo0], s[min(lo0 + 1, n - 1)]
            assert got[(g, q)] == (lo, hi, frac, frac * (hi - lo)), (g, q, s)


@settings(**_SETTINGS)
@given(
    st.lists(st.integers(min_value=-(2**40), max_value=2**40), min_size=1, max_size=50),
    st.integers(min_value=-(2**40), max_value=2**40),
)
def test_bloom_filter_never_false_negative(spark, present, probe):
    """Every inserted value must probe positive (no false negatives —
    the property that makes skipping safe); an absent value may or may
    not probe positive, but the Spark-side hash must agree bit-for-bit
    with the pure-Python probe."""
    from pyspark.sql import functions as F

    from datalake2anomali_spark.io.publish import (
        _bloom_position_exprs,
        _BLOOM_K,
        _BLOOM_M,
        bloom_probe_positions,
    )

    df = spark.createDataFrame([(v,) for v in present], "x long")
    rows = (
        df.select(
            F.explode(F.array(*_bloom_position_exprs("x", _BLOOM_M, _BLOOM_K))).alias("p")
        )
        .collect()
    )
    bits = 0
    for r in rows:
        bits |= 1 << int(r.p)
    hexmap = f"{bits:x}"
    from datalake2anomali_spark.io.publish import _bloom_may_contain

    for v in present:
        assert _bloom_may_contain(hexmap, v), v
    # cross-engine hash agreement for the probe value
    spark_pos = sorted(
        int(r[0])
        for r in spark.createDataFrame([(probe,)], "x long")
        .select(F.explode(F.array(*_bloom_position_exprs("x", _BLOOM_M, _BLOOM_K))))
        .collect()
    )
    assert spark_pos == sorted(bloom_probe_positions(probe))


_vt_op = st.one_of(
    st.tuples(
        st.just("merge"),
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=25),  # key
                st.integers(min_value=0, max_value=2),   # partition
                st.one_of(st.none(), st.integers(min_value=-50, max_value=50)),
            ),
            min_size=1,
            max_size=8,
            unique_by=lambda t: t[0],
        ),
    ),
    st.tuples(st.just("delete"), st.integers(min_value=0, max_value=2)),
    st.tuples(st.just("delete_mor"), st.integers(min_value=0, max_value=2)),
    st.tuples(st.just("compact"), st.none()),
    st.tuples(st.just("restore"), st.none()),
    st.tuples(
        st.just("cdc"),
        st.tuples(
            st.lists(  # upserts
                st.tuples(
                    st.integers(min_value=0, max_value=25),
                    st.integers(min_value=0, max_value=2),
                    st.one_of(st.none(), st.integers(min_value=-50, max_value=50)),
                ),
                min_size=0,
                max_size=5,
                unique_by=lambda t: t[0],
            ),
            st.lists(  # delete keys
                st.integers(min_value=0, max_value=25), min_size=0, max_size=5,
                unique=True,
            ),
        ),
    ),
)


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=25),
            st.integers(min_value=0, max_value=2),
            st.one_of(st.none(), st.integers(min_value=-50, max_value=50)),
        ),
        min_size=1,
        max_size=10,
        unique_by=lambda t: t[0],
    ),
    st.lists(_vt_op, min_size=1, max_size=4),
)
def test_versioned_table_model_based(spark, tmp_path_factory, init_rows, ops):
    """Model-based check of the whole versioned-table protocol: a random
    sequence of MERGE / DELETE (copy-on-write AND merge-on-read) /
    OPTIMIZE / RESTORE / CDC ops must keep the published snapshot equal
    to a pure-Python dict model at every step, every committed version
    time-travel-readable, and the history's operations in order.  The
    merge-on-read arm interleaves deletion vectors with every other
    writer, so vector carry/clear is exercised under arbitrary
    rewrite orderings, not just the scripted unit scenarios."""
    from pyspark.sql import functions as F

    from datalake2anomali_spark.io.publish import (
        compact_versioned,
        delete_from_versioned,
        init_table,
        merge_into_versioned,
        read_manifest,
        read_snapshot,
        restore_version,
        table_history,
    )

    root = str(tmp_path_factory.mktemp("vt") / "t")

    def df_of(rows):
        return spark.createDataFrame(
            [(k, f"p{p}", v) for k, p, v in rows], "k long, part string, v long"
        )

    init_table(spark, df_of(init_rows), root, "part")
    model = {k: (f"p{p}", v) for k, p, v in init_rows}
    model_by_version = {read_manifest(root)["version"]: dict(model)}
    expected_ops = ["create"]

    def check():
        got = {r.k: (r.part, r.v) for r in read_snapshot(spark, root, "part").collect()}
        assert got == model, (got, model)

    for kind, arg in ops:
        if kind == "merge":
            merge_into_versioned(spark, root, df_of(arg), ["k"], "part")
            model.update({k: (f"p{p}", v) for k, p, v in arg})
            expected_ops.append("merge")
        elif kind == "delete":
            part = f"p{arg}"
            if not any(p == part for p, _v in model.values()):
                continue  # no-op delete commits nothing
            delete_from_versioned(spark, root, "part", F.col("part") == part)
            model = {k: pv for k, pv in model.items() if pv[0] != part}
            expected_ops.append("delete")
            if not model:
                break  # empty table: read_snapshot legitimately raises
        elif kind == "delete_mor":
            part = f"p{arg}"
            victims = {
                k for k, pv in model.items() if pv[0] == part and k % 2 == 0
            }
            if not victims:
                continue  # matches nothing: commits nothing
            delete_from_versioned(
                spark, root, "part",
                (F.col("part") == part) & (F.col("k") % 2 == 0),
                mode="merge_on_read", key_cols=["k"],
            )
            model = {k: pv for k, pv in model.items() if k not in victims}
            expected_ops.append("delete_mor")
            # NO break on empty: the partition mapping stays live under
            # vectors, so an all-deleted table still reads as zero rows
        elif kind == "cdc":
            ups, del_keys = arg
            if not ups and not del_keys:
                continue
            ups_df = df_of(ups).withColumn("_op", F.lit("upsert"))
            dels_df = df_of(
                [(kk, 0, None) for kk in del_keys]
            ).withColumn("_op", F.lit("delete"))
            batch = ups_df.unionByName(dels_df)
            # commits only when it affects something; an all-miss delete
            # with no upserts still claims+commits (rewrite of nothing)
            from datalake2anomali_spark.io.publish import cdc_apply_versioned

            cdc_apply_versioned(spark, root, batch, ["k"], "part")
            model.update({kk: (f"p{p}", vv) for kk, p, vv in ups})
            for kk in del_keys:
                model.pop(kk, None)  # upsert+delete same key -> deleted
            expected_ops.append("cdc_apply")
            if not model:
                break
        elif kind == "compact":
            compact_versioned(spark, root, "part", "k")
            expected_ops.append("optimize")
        else:  # restore to the oldest still-known version
            target = min(model_by_version)
            restore_version(root, target)
            model = dict(model_by_version[target])
            expected_ops.append(f"restore(v{target})")
        v_now = read_manifest(root)["version"]
        model_by_version[v_now] = dict(model)
        check()

    # every committed version still reads back as its recorded model
    for v, snap_model in model_by_version.items():
        if not snap_model:
            continue
        got = {
            r.k: (r.part, r.v)
            for r in read_snapshot(spark, root, "part", version=v).collect()
        }
        assert got == snap_model, f"time travel to v{v} diverged"
    assert [h["operation"] for h in table_history(root)] == expected_ops


@settings(**_SETTINGS)
@given(
    st.sampled_from(["days", "bucket", "truncate"]),
    st.integers(min_value=0, max_value=999),
    st.integers(min_value=1, max_value=400),
)
def test_hidden_pruning_never_drops_rows(spark, tmp_path_factory, kind, lo_off, span):
    """Pruning-safety property: for ANY transform and ANY predicate
    window, the pruned hidden read equals the unpruned read + row filter
    — may_match may only reject provably-empty partitions."""
    from pyspark.sql import functions as F

    from datalake2anomali_spark.io.hidden import init_hidden_table, read_hidden
    from datalake2anomali_spark.io.tables import load_table

    root = str(tmp_path_factory.mktemp("hp") / "t")
    e = load_table(spark, "/root/testdata/sf0.001", "events").limit(300)
    if kind == "days":
        spec, col = ["days", "ts"], "ts"
    elif kind == "bucket":
        spec, col = ["bucket", 8, "user_id"], "user_id"
    else:
        spec, col = ["truncate", 100, "event_id"], "event_id"
    init_hidden_table(spark, e, root, spec)

    if kind == "days":
        b = e.agg(F.min(F.unix_micros("ts")), F.max(F.unix_micros("ts"))).collect()[0]
        lo = int(b[0]) + lo_off * 3_600_000_000
        hi = lo + span * 3_600_000_000
        pred = ("between", col, lo, hi)
        want = e.filter((F.unix_micros(col) >= lo) & (F.unix_micros(col) <= hi))
    elif kind == "bucket":
        probe = lo_off  # any value, present or not
        pred = ("eq", col, probe)
        want = e.filter(F.col(col) == probe)
    else:
        b = e.agg(F.min("event_id")).collect()[0]
        lo = int(b[0]) + lo_off
        hi = lo + span
        pred = ("between", col, lo, hi)
        want = e.filter(F.col(col).between(lo, hi))

    got = read_hidden(spark, root, predicate=pred)
    cols = sorted(want.columns)
    assert got.count() == want.count(), (spec, pred)
    assert got.select(*cols).exceptAll(want.select(*cols)).count() == 0
    assert want.select(*cols).exceptAll(got.select(*cols)).count() == 0
