"""Corpus-curation funnel: staged filter accounting in one scan.

The standard shape of an LLM pretraining data pipeline is a funnel —
raw crawl → language filter → length filter → quality filter → dedup —
and the first thing its operators must report is how many documents
survive each stage (the yield curve drives every curation decision).

Naively that is one count-action per stage: k scans of a 100 TB corpus
for a k-stage funnel. This operator computes the whole funnel in ONE
scan: each stage is a boolean column, stage flags are cumulatively
AND-ed (a funnel is monotone by construction), and all stage counts are
conditional sums inside a single aggregate. The dedup stage rides the
same aggregate as a ``count(DISTINCT fingerprint)`` over survivors
only. The result unpivots to one row per stage JVM-side (explode over
a literal struct array — no driver round-trip, no second job).

Scale posture: one full scan, one 1-row-per-partition partial
aggregate, one exchange of k counters. The distinct-count term shuffles
surviving fingerprints once; swap it for ``approx_count_distinct`` at
the 100 TB tier if an estimate suffices (same plan shape, no distinct
shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flight_delays_progetto_big_data_2024_spark.functions.text import (
    fingerprint,
    lang_id,
    quality_score,
    token_count,
)

#: (stage name, flag builder) in funnel order; each flag is evaluated on
#: the raw row and AND-ed with every earlier stage.
_STAGES = ("lang_known", "length_ok", "quality_ok")


def curation_funnel(
    df: DataFrame,
    text_col: str = "text",
    min_tokens: int = 5,
    max_tokens: int = 10_000,
    min_quality: float = 0.3,
) -> DataFrame:
    """``(stage_id, stage, docs_kept)`` — cumulative survivor counts for
    the raw → lang-known → length-window → quality-threshold → exact-
    dedup funnel, computed in a single scan + single aggregate.

    Stage semantics (each includes all previous):

    1. ``raw``         — every input document
    2. ``lang_known``  — :func:`lang_id` != 'unknown'
    3. ``length_ok``   — token count in [min_tokens, max_tokens]
    4. ``quality_ok``  — :func:`quality_score` >= min_quality
    5. ``deduped``     — distinct :func:`fingerprint` among stage-4
       survivors (what a keep-one-per-hash dedup would retain)
    """
    n_tok = token_count(text_col)
    flags = df.select(
        (lang_id(text_col) != "unknown").alias("lang_known"),
        ((n_tok >= min_tokens) & (n_tok <= max_tokens)).alias("length_ok"),
        (quality_score(text_col) >= min_quality).alias("quality_ok"),
        fingerprint(text_col).alias("fp"),
    )
    keep = F.lit(True)
    sums = [F.count("*").alias("raw")]
    for stage in _STAGES:
        keep = keep & F.col(stage)
        sums.append(F.sum(keep.cast("long")).alias(stage))
    sums.append(F.count_distinct(F.when(keep, F.col("fp"))).alias("deduped"))
    agg = flags.agg(*sums)

    stages = ["raw", *_STAGES, "deduped"]
    return agg.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i + 1).alias("stage_id"),
                        F.lit(s).alias("stage"),
                        F.col(s).alias("docs_kept"),
                    )
                    for i, s in enumerate(stages)
                ]
            )
        ).alias("f")
    ).select("f.stage_id", "f.stage", "f.docs_kept")


def cap_per_group(
    df: DataFrame,
    group_col: str,
    n: int,
    order_cols: "list[str] | tuple[str, ...]" = ("doc_id",),
    rank_col: str | None = None,
) -> DataFrame:
    """Per-group mixture cap: keep at most ``n`` rows per ``group_col``,
    chosen deterministically by ``order_cols`` — the domain-mixture
    control of a web-crawl curation pipeline (no single domain may
    contribute more than its cap to the training mix; CCNet/RefinedWeb
    keep-N-per-host).

    One shuffle on the group key (the ``row_number`` window); NULL
    groups form their own capped group (window semantics — a crawl's
    missing-host rows shouldn't bypass the cap). NULL ORDER values
    sort LAST: Spark's ``asc`` puts nulls first, which would let rows
    with a MISSING order key crowd real rows out of the deterministic
    "lowest" slots (and silently diverge from ANSI/DuckDB, whose ASC
    defaults to NULLS LAST). Pass ``rank_col`` to also surface the
    1-based within-group rank.

    Scale/skew posture: the window sorts only WITHIN each group, so
    cost is Σ g·log g — but a hot domain at 20% of a 100 TB crawl is a
    single straggler task (windows are not AQE-skew-splittable). When
    the order is a uniform content hash (the usual deterministic-random
    mixture choice), use :func:`cap_per_group_hashed` — the broadcast
    hash-threshold pre-filter form, unconditionally exact and measured
    equal on the skew suite. tests/test_skew_bucketing.py measures both
    under skewed corpora.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        *[F.col(c).asc_nulls_last() for c in order_cols]
    )
    out = df.withColumn("__rk", F.row_number().over(w)).filter(
        F.col("__rk") <= n
    )
    if rank_col:
        return out.withColumnRenamed("__rk", rank_col)
    return out.drop("__rk")


def cap_per_group_hashed(
    df: DataFrame,
    group_col: str,
    n: int,
    id_col: str,
    margin: float = 4.0,
    rank_col: str | None = None,
) -> DataFrame:
    """Hot-domain-safe mixture cap: EXACTLY ``cap_per_group(df,
    group_col, n, order_cols=(xxhash64(id), id))`` — the deterministic-
    random keep-n-per-host a crawl pipeline actually wants — but with a
    broadcast hash-threshold PRE-FILTER so a domain owning 20% of a
    100 TB corpus never funnels through one window task.

    Mechanics: one count aggregate per domain (broadcast back); rows
    survive the pre-filter when their uniform 64-bit hash falls below
    ``margin·n/count`` of the hash space. long→double casting is
    monotonic, so the surviving set is a PREFIX of the (hash, id)
    order — the exact top-n is unchanged whenever at least
    ``min(n, count)`` rows survive. That guard is CHECKED, not
    assumed: domains whose surviving prefix came up short are
    re-included unfiltered via a second pass over just those domains'
    rows, so the operator is unconditionally exact — measured equal to
    the plain window form on the Zipf corpus, with the pre-filter
    dropping the hot domain's window input by ~margin·n/count. The
    short-domain set is derived from the COUNTS side (left join of
    pre-filter survivor counts onto the per-domain counts, coalescing
    absent groups to 0) — deriving it from the survivors side would
    skip domains with ZERO survivors entirely, and for keep-1-per-host
    (n=1, margin=4) P(zero survivors) ≈ e^-4 ≈ 1.8% per large domain:
    a real, not astronomical, loss rate.

    NULL domains keep their own capped group (null-safe joins — a
    plain equi-join would silently drop every NULL-domain row); NULL
    ids hash to one constant bucket and tie-break last.
    """
    from pyspark.sql import Window

    h = F.xxhash64(F.col(id_col))
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("__c"))
    frac = F.least(F.lit(1.0), F.lit(float(margin) * n) / F.col("__c"))
    thr = counts.select(
        F.col(group_col).alias("__g"),
        (F.lit(-(2.0**63)) + frac * F.lit(2.0**64)).alias("__thr"),
        "__c",
    )
    joined = df.join(
        F.broadcast(thr), F.col(group_col).eqNullSafe(F.col("__g"))
    )
    pre = joined.filter(h.cast("double") <= F.col("__thr"))
    # guard: a domain must keep min(n, count) survivors or fall back.
    # Derive `short` from the counts side: a domain whose pre-filter
    # survivor set is EMPTY has no row in pre.groupBy at all, so it
    # must enter via the left join's NULL → coalesce(0) path.
    pre_counts = pre.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("__s")
    )
    short = (
        thr.join(
            F.broadcast(pre_counts),
            F.col("__g").eqNullSafe(F.col(group_col)),
            "left",
        )
        .withColumn("__s", F.coalesce(F.col("__s"), F.lit(0)))
        .filter(F.col("__s") < F.least(F.lit(n), F.col("__c")))
        .select(F.col("__g").alias("__short_g"))
    )
    pre_ok = pre.join(
        F.broadcast(short),
        F.col(group_col).eqNullSafe(F.col("__short_g")),
        "left_anti",
    ).drop("__g", "__thr", "__c")
    fallback = df.join(
        F.broadcast(short),
        F.col(group_col).eqNullSafe(F.col("__short_g")),
        "left_semi",
    )
    base = pre_ok.unionByName(fallback)
    w = Window.partitionBy(group_col).orderBy(
        h.asc(), F.col(id_col).asc_nulls_last()
    )
    out = base.withColumn("__rk", F.row_number().over(w)).filter(
        F.col("__rk") <= n
    )
    if rank_col:
        return out.withColumnRenamed("__rk", rank_col)
    return out.drop("__rk")
