"""Composed training-data pipeline operators: clean → sample → summarize.

These are the corpus-preparation stages a pretraining data pipeline chains
on top of the primitive operators in this package (the C4/FineWeb shape:
language filter → quality filter → exact dedup → near-dup dedup →
stratified sample → corpus statistics).  Everything here composes the
existing map-only/equi-join primitives, so the composed plan inherits their
scale behavior; nothing introduces a new shuffle shape.

Scale notes:

- ``clean_corpus`` is two map-only passes (lang-id + quality live in the
  same projection) feeding two groupBy-on-digest / join-on-shingle dedup
  stages — the expensive stages are the dedups, already analyzed in
  :mod:`.dedup`.  The survivors frame carries only ``doc_id`` + small
  scalars; full text re-attaches by one join at the end (narrow shuffles).
- ``stratified_sample`` is a pure filter (deterministic md5-mod on the
  document id, per-stratum rate) — no shuffle, no ``rand()``: retried
  tasks keep identical samples (same rule as operators/skew.py salting).
- ``corpus_stats`` is one grouped aggregation; the interpolated median uses
  ``percentile`` (exact, sort-based per group).  At 100 TB prefer
  ``percentile_approx`` (mergeable sketch, one pass) — the exact form is
  kept where engine-exact oracle equality matters.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import dedup_exact, ngram_jaccard_pairs
from .text import pred_lang_col, quality_col, shingles_col, tokens_col


def md5_bucket_col(id_col: str = "doc_id", mod: int = 100) -> Column:
    """Deterministic [0, mod) bucket from the row id — the engine-portable
    substitute for ``rand()`` everywhere this package samples or splits
    (md5 is bit-identical across Spark, DuckDB, and retried tasks)."""
    return (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("long")
        % mod
    )


def clean_corpus(
    docs: DataFrame,
    lang: str = "en",
    min_quality: float = 0.5,
    jaccard_threshold: float = 0.8,
    max_df: int | None = 100,
) -> DataFrame:
    """C4/FineWeb-style cleaning: language → quality → exact → near-dup.

    Keeps documents that (1) identify as ``lang``, (2) score at least
    ``min_quality``, (3) survive exact dedup (smallest doc_id per identical
    text wins), and (4) are not the greater member of any near-duplicate
    pair at ``jaccard_threshold`` (so the smallest doc_id of a near-dup
    cluster survives, matching the exact-dedup convention).

    Returns (doc_id, pred_lang, quality, n_tokens) for survivors.
    """
    # One projection computes language + quality + token count together:
    # they are row-local expressions over the same text, so stacking them
    # costs zero extra passes (vs. joining lang_id()/text_stats() outputs
    # on doc_id — two shuffles and two extra scans for identical values).
    base = docs.select(
        "doc_id",
        "text",
        pred_lang_col().alias("pred_lang"),
        quality_col().alias("quality"),
        F.size(tokens_col()).alias("n_tokens"),
    ).filter((F.col("pred_lang") == lang) & (F.col("quality") >= min_quality))
    exact_survivors = dedup_exact(base).select("doc_id")
    # `kept` feeds both the near-dup pair generation and the final
    # anti-join. Deliberately NOT persisted: recomputing the codegen'd
    # scoring filter is cheaper than the persist's materialization barrier
    # (measured at sf0.1); at corpus scale the stage boundary to
    # materialize is the survivors written by write_corpus, not this
    # intermediate.
    kept = base.join(exact_survivors, "doc_id", "left_semi")
    near_pairs = ngram_jaccard_pairs(
        kept, threshold=jaccard_threshold, max_df=max_df
    ).select(F.col("d2").alias("doc_id"))
    return (
        kept.join(near_pairs, "doc_id", "left_anti")
        .select("doc_id", "pred_lang", "quality", "n_tokens")
    )


def stratified_sample(
    docs: DataFrame,
    strata_col: str,
    rates: dict[str, int],
    default_pct: int = 0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-stratum sampling: keep ``rates[stratum]``% of rows.

    The sampling predicate is ``md5(id) mod 100 < pct`` — a pure function of
    the row id, so the sample is identical across retries, partitionings,
    and engines (md5 is bit-identical everywhere; ``rand()`` is none of
    this).  ``rates`` maps stratum value → integer percent [0, 100];
    unlisted strata get ``default_pct``.
    """
    bucket = md5_bucket_col(id_col)
    pct = F.lit(default_pct)
    for value, p in rates.items():
        pct = F.when(F.col(strata_col) == value, F.lit(int(p))).otherwise(pct)
    return docs.filter(bucket < pct)


def decontaminate(
    docs: DataFrame,
    benchmark_pct: int = 5,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Flag training documents that overlap a held-out benchmark split.

    The GPT-3/PaLM decontamination recipe: any training document sharing an
    n-gram with an evaluation document is contaminated and must be dropped
    before training.  Here the "benchmark" is the deterministic
    ``benchmark_pct``% md5-bucket split of the corpus (stand-in for the
    real eval sets a production pipeline would load as a second table).

    Returns (doc_id, n_overlap_ngrams, n_benchmark_docs) for contaminated
    training docs only: distinct shared n-grams and distinct benchmark docs
    hit.

    Scale shape: the benchmark shingle index is broadcast — eval
    benchmarks are MBs against a 100 TB corpus by construction, so the
    probe side streams map-only through a broadcast hash join and the only
    shuffle is the final per-doc aggregation of matched rows (a tiny
    subset).  If the benchmark ever outgrew broadcast range, the same plan
    degrades gracefully to a shuffled equi-join on the shingle.
    """
    bucket = md5_bucket_col(id_col)
    sh = shingles_col(text_col, n)
    bench_idx = (
        docs.filter(bucket < benchmark_pct)
        .select(F.col(id_col).alias("bench_id"), F.explode(sh).alias("shingle"))
    )
    train = docs.filter(bucket >= benchmark_pct).select(
        id_col, F.explode(sh).alias("shingle")
    )
    return (
        train.join(F.broadcast(bench_idx), "shingle")
        .groupBy(id_col)
        .agg(
            F.countDistinct("shingle").alias("n_overlap_ngrams"),
            F.countDistinct("bench_id").alias("n_benchmark_docs"),
        )
    )


def pack_sequences(
    docs: DataFrame,
    seq_len: int = 512,
    shard_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Assign each document its token offset in fixed-length training
    sequences — the batch-packing layout step of a pretraining pipeline.

    Documents are concatenated per shard in ``id_col`` order; each doc gets
    its starting token offset (running sum of token counts), the id of the
    ``seq_len``-token sequence its first token lands in, and whether it
    spans a sequence boundary (i.e. would be split across training
    examples).  (shard, seq_id) identifies a training sequence.

    Scale shape: the running sum is a window partitioned by the shard —
    Spark sorts each shard locally after one hash exchange, so there is no
    global sort and no single-partition bottleneck; shards (source files /
    dump buckets) are the natural unit a real pipeline packs within.  A
    window ordered globally would serialize the corpus through one task —
    that formulation is deliberately not offered.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(shard_col).orderBy(id_col)
    base = docs.select(
        id_col, shard_col, F.size(tokens_col(text_col)).alias("n_tokens")
    )
    start = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("token_start")
    out = base.select(id_col, shard_col, "n_tokens", start)
    first_seq = F.floor(F.col("token_start") / seq_len)
    last_seq = F.floor((F.col("token_start") + F.col("n_tokens") - 1) / seq_len)
    return out.select(
        id_col,
        shard_col,
        "n_tokens",
        "token_start",
        first_seq.alias("seq_id"),
        (first_seq != last_seq).alias("crosses_boundary"),
    )


def chunk_documents(
    docs: DataFrame,
    chunk_len: int = 128,
    overlap: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split documents into overlapping fixed-length token chunks — the
    context-window layout step for embedding/RAG indexing and for training
    corpora whose documents exceed the model's sequence length.

    Chunk ``i`` covers tokens ``[i*stride, i*stride + chunk_len)`` with
    ``stride = chunk_len - overlap``; the chunk count
    ``ceil((n_tokens - overlap) / stride)`` (min 1) is the smallest number
    of such windows covering every token.  Output: one row per chunk with
    the re-joined chunk text and its token span.

    Scale shape: pure map + explode — tokenize, ``sequence()`` the chunk
    ids, ``posexplode``, ``slice`` the token array per chunk.  No shuffle,
    no UDF; row fan-out is bounded by ``n_tokens / stride`` per document,
    so output size tracks corpus token count regardless of document-length
    skew (one 1 GB document becomes many rows, not one giant row).
    """
    if overlap >= chunk_len:
        raise ValueError("chunk_documents: overlap must be < chunk_len")
    stride = chunk_len - overlap
    toks = tokens_col(text_col)
    n_chunks = F.greatest(
        F.lit(1), F.ceil((F.size(toks) - F.lit(overlap)) / F.lit(float(stride)))
    )
    base = docs.select(
        id_col, toks.alias("_toks"), n_chunks.cast("int").alias("_nc")
    )
    chunk = F.col("chunk_id")
    start = chunk * stride
    piece = F.slice(F.col("_toks"), start + 1, chunk_len)
    return (
        base.select(
            id_col,
            F.explode(F.sequence(F.lit(0), F.col("_nc") - 1)).alias("chunk_id"),
            "_toks",
        )
        .select(
            id_col,
            chunk.cast("long").alias("chunk_id"),
            start.cast("long").alias("token_start"),
            F.size(piece).cast("long").alias("chunk_tokens"),
            F.array_join(piece, " ").alias("chunk_text"),
        )
    )


def mixture_sample(
    docs: DataFrame,
    strata_col: str = "source",
    alpha: float = 0.5,
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-based mixture resampling: re-draw the corpus so stratum
    ``s`` contributes ``∝ n_s**alpha`` of the output — the multilingual /
    multi-source rebalancing step (alpha < 1 upsamples small strata,
    alpha = 1 is the identity mixture).

    Each input row is emitted ``copies`` times where the per-row expected
    copy count is ``rate_s = total * p(s) / n_s`` with
    ``p(s) = n_s**alpha / Σ n**alpha``: the integer part deterministically,
    the fractional part by the md5 bucket of the row id (so upsampling
    produces whole duplicated rows, downsampling a deterministic subset —
    identical across retries and engines).  Output: one row per emitted
    copy, ``(id, stratum, copy_id)``.

    Determinism note: ``rate`` is derived from *exact integer* per-stratum
    counts and a fixed-point ``floor(sqrt(n)*1e6)`` weight summed as BIGINT
    — never a float sum, whose ordering Spark does not guarantee — then one
    fixed-shape double expression, so Spark and any ANSI engine compute
    bit-identical rates (each IEEE op is correctly rounded; only reduction
    order is engine-dependent, and no reduction here is floating).

    Scale shape: one grouped count (tiny result), broadcast back, then a
    map-only explode.  No data-sized shuffle.
    """
    if alpha != 0.5:
        raise ValueError(
            "mixture_sample: only alpha=0.5 (sqrt temperature) is supported —"
            " other exponents need pow(), whose cross-engine bit-determinism"
            " is not guaranteed like sqrt's"
        )
    from pyspark.sql import Window

    counts = docs.groupBy(strata_col).agg(F.count(F.lit(1)).alias("_n"))
    # Totals come from an unpartitioned window over the counts frame — NOT
    # a second aggregation, which would re-evaluate the count subtree and
    # cost an extra full corpus scan.  The single-partition window holds
    # one row per stratum (strata are few by definition), and long sums
    # are exact, so determinism holds.
    w = Window.partitionBy()
    weights = counts.select(
        strata_col,
        "_n",
        F.floor(F.sqrt(F.col("_n")) * 1_000_000).cast("long").alias("_wt"),
    ).select(
        strata_col,
        "_n",
        "_wt",
        F.sum("_wt").over(w).alias("_wt_sum"),
        F.sum("_n").over(w).alias("_total"),
    )
    # rate = total * (wt / wt_sum) / n, evaluated in this exact shape
    rate = (
        F.col("_total").cast("double")
        * F.col("_wt").cast("double")
        / F.col("_wt_sum").cast("double")
        / F.col("_n").cast("double")
    )
    rates = weights.select(
        strata_col,
        F.floor(rate).cast("long").alias("_whole"),
        F.floor((rate - F.floor(rate)) * 1_000_000).cast("long").alias("_frac_ppm"),
    )
    bucket = md5_bucket_col(id_col, 1_000_000)
    copies = F.col("_whole") + (bucket < F.col("_frac_ppm")).cast("long")
    return (
        docs.select(id_col, strata_col)
        .join(F.broadcast(rates), strata_col)
        .select(id_col, strata_col, copies.alias("_copies"))
        .filter(F.col("_copies") > 0)
        .select(
            id_col,
            strata_col,
            F.explode(F.sequence(F.lit(1).cast("long"), F.col("_copies"))).alias(
                "copy_id"
            ),
        )
    )


def corpus_stats(docs: DataFrame) -> DataFrame:
    """Per-language corpus summary: doc counts, token totals, quality.

    One shuffle (groupBy pred_lang, map-side partials).  ``median_tokens``
    is the exact interpolated median — see the module docstring for the
    100 TB sketch alternative.
    """
    return (
        docs.select(
            pred_lang_col().alias("pred_lang"),
            quality_col().alias("quality"),
            F.size(tokens_col()).alias("n_tokens"),
        )
        .groupBy("pred_lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(F.avg("quality"), 6).alias("avg_quality"),
            F.percentile("n_tokens", F.lit(0.5)).alias("median_tokens"),
        )
    )


def weighted_sample_exact(
    docs: DataFrame,
    k: int,
    weight: Column,
    strata_col: str | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """EXACT-size weighted sampling without replacement: ``k`` rows per
    stratum (or globally), inclusion probability proportional to
    ``weight`` — the sampler the percent-based :func:`stratified_sample`
    cannot be when the spec says "exactly 10k docs per language, favor
    high quality" (a rate sampler's output size is binomial, not fixed).

    Efraimidis–Spirakis A-ES reduced to one expression + one top-k: each
    row draws ``u ∈ (0,1)`` DETERMINISTICALLY from ``md5(id)`` (identical
    across retries, partitionings, and engines — the module's standing
    rule; ``rand()`` is none of those) and ranks by the reservoir key
    ``ln(u)/w`` descending, which realizes exactly the
    weight-proportional without-replacement distribution (Efraimidis &
    Spirakis, IPL 2006).  Selection is the standard top-k-per-group
    window — one shuffle on the stratum — and the identical formula runs
    in any SQL engine, so the oracle can replay the draw bit-for-bit.

    Rows with non-positive or NULL weight are excluded (they cannot be
    drawn).  Output: the sampled rows plus their ``_es_key`` (exposed so
    downstream audits can verify the draw).
    """
    from pyspark.sql import Window

    # u in (0,1) from the id's md5: 12 hex chars -> 48 uniform bits, +1 so
    # u is never exactly 0 (ln(0) = -inf would break the key)
    u = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 12), 16, 10)
        .cast("double")
        + F.lit(1.0)
    ) / F.lit(float(16**12 + 1))
    key = F.log(u) / weight
    scoped = docs.filter(weight.isNotNull() & (weight > 0)).withColumn(
        "_es_key", key
    )
    parts = [strata_col] if strata_col else []
    w = Window.partitionBy(*parts).orderBy(
        F.desc("_es_key"), F.asc(id_col)
    )
    return (
        scoped.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )
