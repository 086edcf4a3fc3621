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
    single straggler task (windows are not AQE-skew-splittable). The
    mitigation when ``order_cols`` is a uniform content hash (the usual
    deterministic-random mixture choice) is a broadcast pre-filter:
    count per domain, and for domains with count ≫ n keep only rows
    whose hash falls below ``n·(1+ε)/count`` quantile BEFORE the exact
    window — order-preserving for the kept prefix, so the final top-n
    is identical. tests/test_skew_bucketing.py measures this operator
    under a Zipf corpus.
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
