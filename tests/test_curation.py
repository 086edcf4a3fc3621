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


def test_cap_per_group_deterministic_and_null_group(spark):
    """Mixture cap keeps the n lowest-order rows per group, NULL group
    included (a crawl's missing-host rows must not bypass the cap),
    and groups under the cap pass through whole."""
    from flight_delays_progetto_big_data_2024_spark.operators.curation import (
        cap_per_group,
    )

    rows = [("a", i) for i in range(5)] + [("b", 10)] + [(None, i) for i in (3, 1, 2)]
    df = spark.createDataFrame(rows, "source string, doc_id long")
    kept = cap_per_group(df, "source", 2, order_cols=("doc_id",))
    got = {(r["source"], r["doc_id"]) for r in kept.collect()}
    assert got == {("a", 0), ("a", 1), ("b", 10), (None, 1), (None, 2)}
    ranked = cap_per_group(df, "source", 2, rank_col="rk")
    assert {(r["source"], r["doc_id"], r["rk"]) for r in ranked.collect()} == {
        ("a", 0, 1), ("a", 1, 2), ("b", 10, 1), (None, 1, 1), (None, 2, 2)
    }


def test_canonicalize_url_families_and_duckdb_parity(spark):
    """The five canonicalization families collapse as documented, NULL
    stays NULL, and the DuckDB twin produces byte-identical output on
    every probe — the q186 driver-hash contract in miniature."""
    import duckdb

    from flight_delays_progetto_big_data_2024_spark.functions.text import (
        canonicalize_url,
        canonicalize_url_sql,
    )

    urls = [
        "https://WWW.Example.COM:443/a/b/?utm_source=x&utm_medium=y#frag",
        "https://www.example.com/a/b",
        "http://Host.Net:80/path/?id=1&utm_campaign=z&gclid=abc",
        "https://site.org/p?a=1&fbclid=xyz&b=2",
        "https://x.y/?utm_source=only",
        "HTTPS://UPPER.com/Path/Case",       # path case preserved
        "https://h.com/a//b///",             # only trailing runs collapse
        "no-scheme/just/path/",              # degenerate: no scheme/host
        None,
    ]
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "i long, url string"
    )
    got = {r["i"]: r["c"]
           for r in df.select("i", canonicalize_url("url").alias("c")).collect()}
    assert got[0] == got[1] == "https://www.example.com/a/b"
    assert got[2] == "http://host.net/path?id=1"
    assert got[3] == "https://site.org/p?a=1&b=2"
    assert got[4] == "https://x.y"
    assert got[5] == "https://upper.com/Path/Case"
    assert got[6] == "https://h.com/a//b"
    assert got[8] is None

    con = duckdb.connect()
    oracle = dict(con.execute(
        f"SELECT i, {canonicalize_url_sql('url')} FROM (SELECT "
        f"unnest(range({len(urls)})) AS i, unnest($1::VARCHAR[]) AS url)",
        [urls],
    ).fetchall())
    assert got == oracle


def test_canonicalize_url_leading_tracking_param_keeps_separator(spark):
    """When the FIRST query param is a tracking param followed by real
    ones, stripping it consumed the '?' and left a dangling '&' glued
    to the path ('/p&x=2' — a different, invalid URL). The first '&'
    with no separator before it is promoted back to '?'; DuckDB twin
    included (engine-local backreference syntax: $1 vs \\1)."""
    import duckdb

    from flight_delays_progetto_big_data_2024_spark.functions.text import (
        canonicalize_url,
        canonicalize_url_sql,
    )

    urls = [
        "https://h.com/p?gclid=nav&x=2",
        "https://h.com/p?utm_source=a&b=1&utm_medium=c",
        "https://h.com/p?gclid=1&fbclid=2",
        "https://h.com/p?a=1&fbclid=x&b=2",
    ]
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)],
                               "i long, url string")
    got = {r["i"]: r["c"]
           for r in df.select("i", canonicalize_url("url").alias("c")).collect()}
    assert got[0] == "https://h.com/p?x=2"
    assert got[1] == "https://h.com/p?b=1"
    assert got[2] == "https://h.com/p"
    assert got[3] == "https://h.com/p?a=1&b=2"
    con = duckdb.connect()
    oracle = dict(con.execute(
        f"SELECT i, {canonicalize_url_sql('url')} FROM (SELECT "
        f"unnest(range({len(urls)})) AS i, unnest($1::VARCHAR[]) AS url)",
        [urls],
    ).fetchall())
    assert got == oracle


def test_canonicalize_url_ref_is_content_addressing_by_default(spark):
    """Bare ``ref`` is frequently content-addressing (?ref=main on a
    VCS host names a DIFFERENT page than ?ref=v2), so the DEFAULT
    canonicalizer must NOT strip it — collapsing those into one dedup
    family discards real documents (round-6 advisor). The aggressive
    opt-in set strips it for corpora where ref is known referral
    tracking; both modes stay DuckDB-parity-pinned."""
    import duckdb

    from flight_delays_progetto_big_data_2024_spark.functions.text import (
        TRACKING_PARAMS_AGGRESSIVE,
        canonicalize_url,
        canonicalize_url_sql,
    )

    urls = [
        "https://git.host/repo/file?ref=main",
        "https://git.host/repo/file?ref=v2.0",
        "https://h.com/p?ref=nav&x=2",
        "https://h.com/p?a=1&ref=x&b=2",
    ]
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)],
                               "i long, url string")
    default = {r["i"]: r["c"]
               for r in df.select("i", canonicalize_url("url").alias("c"))
               .collect()}
    # default: ref preserved — the two VCS refs stay DISTINCT keys
    assert default[0] == "https://git.host/repo/file?ref=main"
    assert default[1] == "https://git.host/repo/file?ref=v2.0"
    assert default[0] != default[1]
    assert default[2] == "https://h.com/p?ref=nav&x=2"
    assert default[3] == "https://h.com/p?a=1&ref=x&b=2"

    aggr = {
        r["i"]: r["c"]
        for r in df.select(
            "i",
            canonicalize_url("url", TRACKING_PARAMS_AGGRESSIVE).alias("c"),
        ).collect()
    }
    assert aggr[0] == aggr[1] == "https://git.host/repo/file"
    assert aggr[2] == "https://h.com/p?x=2"
    assert aggr[3] == "https://h.com/p?a=1&b=2"

    con = duckdb.connect()
    for got, sql in (
        (default, canonicalize_url_sql("url")),
        (aggr, canonicalize_url_sql("url", TRACKING_PARAMS_AGGRESSIVE)),
    ):
        oracle = dict(con.execute(
            f"SELECT i, {sql} FROM (SELECT "
            f"unnest(range({len(urls)})) AS i, unnest($1::VARCHAR[]) AS url)",
            [urls],
        ).fetchall())
        assert got == oracle


def test_cap_per_group_null_order_values_sort_last(spark):
    """Rows with a MISSING order key must not crowd real rows out of
    the cap: Spark's asc puts nulls FIRST (two NULL-doc_id rows were
    taking both slots while real docs were dropped), and DuckDB's ASC
    defaults to NULLS LAST — a silent engine divergence on dirty data.
    NULL-order rows now fill slots only after every real row."""
    from flight_delays_progetto_big_data_2024_spark.operators.curation import (
        cap_per_group,
    )

    df = spark.createDataFrame(
        [("a", None), ("a", 1), ("a", 2), ("a", None), ("b", None)],
        "source string, doc_id long",
    )
    kept = {(r["source"], r["doc_id"])
            for r in cap_per_group(df, "source", 2).collect()}
    assert kept == {("a", 1), ("a", 2), ("b", None)}
