"""Curation-funnel golden test on a corpus crafted so EVERY stage drops
at least one document (the sf* synthetic corpora have no exact dups, so
the parity check alone can't distinguish deduped from quality_ok)."""

from __future__ import annotations

from flight_delays_progetto_big_data_2024_spark.operators.curation import (
    curation_funnel,
)

GOOD = "the cat and the dog walked to the old market in town today again"

CORPUS = [
    (1, GOOD),                               # survives everything
    (2, GOOD),                               # exact dup of 1 -> dropped at dedup
    (3, "xxq zzv qqp wvx"),                  # no stopwords -> lang unknown
    (4, "the a of"),                         # lang ok, too short
    (5, "the " * 9 + "is is is is is"),      # lang ok, length ok, low diversity
]


def test_funnel_stage_counts(spark):
    docs = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    rows = {
        r["stage"]: (r["stage_id"], r["docs_kept"])
        for r in curation_funnel(
            docs, min_tokens=5, max_tokens=50, min_quality=0.5
        ).collect()
    }
    assert rows == {
        "raw": (1, 5),
        "lang_known": (2, 4),   # doc 3 out
        "length_ok": (3, 3),    # doc 4 out
        "quality_ok": (4, 2),   # doc 5 out (diversity ~0.14)
        "deduped": (5, 1),      # docs 1+2 share a fingerprint
    }


def test_funnel_is_single_job_one_scan(spark):
    docs = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    plan = (
        curation_funnel(docs)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    # the funnel must not re-scan per stage: one logical scan of the input
    assert plan.count("LocalRelation") + plan.count("LogicalRDD") == 1
