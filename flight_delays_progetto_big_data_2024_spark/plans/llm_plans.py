"""LLM-training-data pipeline queries over ``documents`` and
``embeddings`` (the north-star extension surface, BASELINE.json):
dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding
cosine), similarity search, and text analysis.

Oracle coverage: every query here is a full value-hash oracle — DuckDB
list comprehensions mirror the Spark higher-order functions, and the
hash-signature families (MinHash-LSH q33, SimHash q34) register their
PORTABLE md5-60bit token-hash configuration so DuckDB replays the
signatures bit-for-bit (the xxhash64 deployable path, which DuckDB
lacks, is what bench.py times via BENCH_OVERRIDES; the two paths share
every plan line except the token-hash expression). The rows-only
residue lives elsewhere: q29's HLL register state (certified by q188's
value-checked error bound) and q137's d×d driver eigensolve (certified
by q187's cell-for-cell mean+Gram check).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flight_delays_progetto_big_data_2024_spark.functions.text import (
    avg_token_length,
    char_shingles,
    fingerprint,
    lang_id,
    lang_id_sql,
    lexical_diversity,
    normalize_text,
    quality_score,
    token_count,
    tokens,
)
from flight_delays_progetto_big_data_2024_spark.operators.curation import (
    curation_funnel,
)
from flight_delays_progetto_big_data_2024_spark.operators.prep import (
    MOMENT_MEASUREMENT_SQL,
)
from flight_delays_progetto_big_data_2024_spark.operators.dedup import (
    PORTABLE_TOKEN_HASH_SQL,
    cross_corpus_containment,
    dedup_exact,
    jaccard_pairs,
    jaccard_pairs_prefix,
    keep_first,
    minhash_near_dups,
    simhash_near_dups,
)
from flight_delays_progetto_big_data_2024_spark.operators.ranking import (
    bm25_search,
    pmi_pairs,
    tfidf_topk_terms,
)
from flight_delays_progetto_big_data_2024_spark.operators.sampling import (
    hash_split,
    pack_sequences,
    pack_stats,
    stratified_sample,
)
from flight_delays_progetto_big_data_2024_spark.operators.similarity import (
    _hyperplanes,
    cosine_topk,
    embedding_near_dup_pairs,
    lsh_topk,
)
from flight_delays_progetto_big_data_2024_spark.plans.registry import register
from flight_delays_progetto_big_data_2024_spark.sources.readers import (
    Catalog,
    ensure_scan_width,
)

#: DuckDB needs the 'g' flag for global regexp_replace (Spark replaces
#: all occurrences by default).
#: Explicit ASCII whitespace class for every oracle regex that must
#: mirror a Spark-side \s: Java's \s is [ \t\n\x0B\f\r] but RE2's is
#: [ \t\n\f\r] — NO VERTICAL TAB — so under bare '\s+' a VT-separated
#: document tokenized DIFFERENTLY in the two engines (round-11 strings
#: probe: Spark split 'a'||chr(11)||'b' into two tokens, the oracle
#: kept one — a silent split in every token-derived query). The
#: explicit class IS Java's \s set, so the Spark side (F.split /
#: regexp_replace over r"\s+") is unchanged by definition, and Python
#: mirrors keep re.ASCII \s (the identical set).
_WS_SQL = "[ \\t\\n\\x0b\\f\\r]"
#: portable ASCII fold — mirrors functions.text.ascii_lower (Unicode
#: lower() diverges between Java and utf8proc; round-6 probe)
_NORM_SQL = f"trim(regexp_replace(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '{_WS_SQL}+', ' ', 'g'))"
#: empty tokens filtered, mirroring functions.text.tokens (split of
#: empty text must yield an EMPTY list, not [''])
_TOKS_SQL = f"list_filter(string_split_regex(trim(text), '{_WS_SQL}+'), t -> t <> '')"
#: The moment-measurement domain predicate on the events.value column,
#: interpolated (not re-typed) into every oracle that uses it so the
#: SQL twin can never drift from operators.prep.is_moment_measurement
#: (round-10 advice: the constant was documented as the DuckDB twin but
#: never referenced).
_MOMENT_VALUE_SQL = MOMENT_MEASUREMENT_SQL.format(col="value")


@register(
    "q23_dedup_exact_documents",
    sql=f"""
    SELECT md5({_NORM_SQL}) AS text_hash,
           min(doc_id) AS doc_id,
           count(*) AS n_copies
    FROM documents
    GROUP BY md5({_NORM_SQL})
    """,
)
def q23_dedup_exact_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on normalized-text md5, deterministic
    min-id representative + duplicate count."""
    cat = Catalog(spark, sf_dir)
    return dedup_exact(cat.documents, "text", "doc_id")


@register(
    "q24_token_stats_by_lang",
    sql=f"""
    SELECT lang,
           count(*) AS num_docs,
           round(avg(len({_TOKS_SQL})), 6) AS avg_tokens,
           round(avg(CASE WHEN len({_TOKS_SQL}) > 0
                          THEN len(list_distinct({_TOKS_SQL}))::DOUBLE
                               / len({_TOKS_SQL}) END), 6) AS avg_diversity
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
)
def q24_token_stats_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-count + lexical-diversity profile per language tag."""
    cat = Catalog(spark, sf_dir)
    return (
        cat.documents.groupBy("lang")
        .agg(
            F.count("*").alias("num_docs"),
            F.round(F.avg(token_count("text")), 6).alias("avg_tokens"),
            F.round(F.avg(lexical_diversity("text")), 6).alias("avg_diversity"),
        )
        .orderBy("lang")
    )


@register(
    "q25_doc_quality_scores",
    sql=f"""
    WITH base AS (
        SELECT doc_id,
               {_TOKS_SQL} AS toks,
               len(text) AS n,
               len(text) - len(regexp_replace(text, '[.,!?;:''"]', '', 'g')) AS n_punct
        FROM documents
    ),
    m AS (
        SELECT doc_id,
               CAST(len(toks) AS BIGINT) AS n_tokens,
               CASE WHEN len(toks) > 0
                    THEN list_aggregate(list_transform(toks, t -> len(t)), 'sum')::DOUBLE
                         / len(toks) END AS atl,
               CASE WHEN len(toks) > 0
                    THEN len(list_distinct(toks))::DOUBLE / len(toks) END AS diversity,
               CASE WHEN n > 0 THEN n_punct::DOUBLE / n ELSE 0.0 END AS pr
        FROM base
    )
    SELECT doc_id, n_tokens,
           round(atl, 6) AS avg_token_len,
           round(diversity, 6) AS diversity,
           CASE WHEN n_tokens = 0 THEN 0.0
                ELSE round(0.6 * diversity
                           + 0.4 * (CASE WHEN atl >= 3.0 AND atl <= 8.0
                                         THEN 1.0 ELSE 0.5 END)
                           - pr, 6) END AS quality
    FROM m
    """,
)
def q25_doc_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality heuristics (length/diversity/punctuation) —
    all higher-order column expressions, zero UDFs.

    Round-12: the token array is materialized ONCE in its own
    projection and every measure reads it (the ``*_of`` forms) — the
    single-select form re-tokenized the text per reference (~12 splits
    per row in the physical Project; CollapseProject keeps a non-cheap
    multiply-referenced column separate, so this is one split per
    row). Combined with the scan-width guard: 0.61s → 0.28s at sf0.1,
    bit-identical output."""
    from flight_delays_progetto_big_data_2024_spark.functions.text import (
        avg_token_length_of,
        lexical_diversity_of,
        quality_score_of,
        tokens,
    )

    cat = Catalog(spark, sf_dir)
    toks = F.col("__toks")
    return (
        ensure_scan_width(cat.documents, "doc_id")
        .select("doc_id", "text", tokens("text").alias("__toks"))
        .select(
            "doc_id",
            F.size(toks).cast("long").alias("n_tokens"),
            F.round(avg_token_length_of(toks), 6).alias("avg_token_len"),
            F.round(lexical_diversity_of(toks), 6).alias("diversity"),
            quality_score_of(toks, "text").alias("quality"),
        )
    )


@register(
    "q26_lang_id_distribution",
    sql=f"""
    SELECT {lang_id_sql("text")} AS predicted_lang, count(*) AS num_docs
    FROM documents
    GROUP BY predicted_lang
    ORDER BY predicted_lang
    """,
)
def q26_lang_id_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword/CJK language-ID heuristic, aggregated. (Both engines run
    the same deterministic heuristic — the parity check validates the
    expression, independent of whether predictions match the lang tag.)"""
    cat = Catalog(spark, sf_dir)
    # ensure_scan_width (round-12): the five stopword-alternation
    # regex counts per row are the dominant cost and ran single-task
    # on the narrow scan (0.74s → 0.43s at sf0.1); no-op at scale
    return (
        ensure_scan_width(cat.documents, "doc_id")
        .select(lang_id("text").alias("predicted_lang"))
        .groupBy("predicted_lang")
        .agg(F.count("*").alias("num_docs"))
        .orderBy("predicted_lang")
    )


@register(
    "q27_doc_fingerprints",
    sql=f"SELECT doc_id, md5({_NORM_SQL}) AS fingerprint FROM documents",
)
def q27_doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document content fingerprint (md5 of normalized text)."""
    cat = Catalog(spark, sf_dir)
    return cat.documents.select("doc_id", fingerprint("text").alias("fingerprint"))


@register(
    "q28_cardinality_profile",
    sql="""
    SELECT count(DISTINCT l_orderkey) AS n_orderkeys,
           count(DISTINCT l_partkey) AS n_partkeys,
           count(DISTINCT l_suppkey) AS n_suppkeys,
           count(DISTINCT l_returnflag) AS n_returnflags,
           count(*) AS total_rows
    FROM lineitem
    """,
)
def q28_cardinality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct-count profile of join/grouping keys.

    Plan shape (round-12, same rewrite as q188): one independent
    two-level-distinct branch per column folded by 1-row broadcast
    cross joins, instead of four countDistinct in ONE aggregate —
    Catalyst plans the latter as an Expand that multiplies every input
    row 5x before the distinct shuffle (1.13s -> 0.70s at sf0.1; each
    branch scan also prunes to a single column, and no expansion enters
    any shuffle at any scale). The isNotNull filters mirror
    count(DISTINCT c)'s NULL-skipping exactly and push to the scan."""
    cat = Catalog(spark, sf_dir)
    out = cat.lineitem.agg(F.count("*").alias("total_rows"))
    for c, alias in [
        ("l_orderkey", "n_orderkeys"),
        ("l_partkey", "n_partkeys"),
        ("l_suppkey", "n_suppkeys"),
        ("l_returnflag", "n_returnflags"),
    ]:
        d = (
            cat.lineitem.select(c)
            .where(F.col(c).isNotNull())
            .distinct()
            .agg(F.count(F.lit(1)).alias(alias))
        )
        out = out.crossJoin(F.broadcast(d))
    return out.select(
        "n_orderkeys", "n_partkeys", "n_suppkeys", "n_returnflags", "total_rows"
    )


@register("q29_cardinality_profile_approx")
def q29_cardinality_profile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ cardinality profile — the 100 TB path (single pass,
    constant memory, no sort/shuffle of distinct values).

    Registered rows-only BY DESIGN: Spark's HLL++ registers are
    engine-internal state DuckDB cannot replay, so no SQL oracle can
    exist for the estimate itself. Its evidence is two-sided instead:
    (1) tests/test_sketch.py::test_q29_hll_error_within_rsd_bound
    certifies every estimate against the EXACT distinct counts within
    the configured rsd=0.02 tolerance (the certify pattern q144 uses
    for GK percentile bounds), and (2) q148 — the engine-portable
    linear-counting estimator over the same kind of distinct-count
    task — is the fully value-checked sibling of this operator family.
    Since round 8, q188 additionally DRIVER-hashes the exact distinct
    counts and the 5·rsd bound certificate, so only the HLL register
    state itself remains rows-only.
    """
    cat = Catalog(spark, sf_dir)
    return cat.lineitem.agg(
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("n_orderkeys"),
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("n_partkeys"),
        F.approx_count_distinct("l_suppkey", rsd=0.02).alias("n_suppkeys"),
    )


@register(
    "q188_hll_error_certificate",
    sql="""
    WITH e AS (
        SELECT count(DISTINCT l_orderkey) AS eo,
               count(DISTINCT l_partkey) AS ep,
               count(DISTINCT l_suppkey) AS es
        FROM lineitem
    )
    SELECT key_col, exact_distinct, within_bound FROM (
        SELECT 'l_orderkey' AS key_col, eo::BIGINT AS exact_distinct,
               TRUE AS within_bound FROM e
        UNION ALL
        SELECT 'l_partkey', ep::BIGINT, TRUE FROM e
        UNION ALL
        SELECT 'l_suppkey', es::BIGINT, TRUE FROM e
    ) ORDER BY key_col
    """,
)
def q188_hll_error_certificate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checked error certificate for q29's HLL++ estimates
    (round-8, extending judge item 3's q137 split pattern to the OTHER
    rows-only query): one row per profiled key column with the EXACT
    distinct count (value-checked against DuckDB's count(DISTINCT)) and
    ``within_bound`` = |HLL - exact| <= max(5*rsd*exact, 3) — the same
    5-sigma-ish certificate tests/test_sketch.py pins in-repo, but now
    hashed by the driver: the oracle asserts TRUE, so a broken
    estimator (or column mixup) flips the boolean and fails the
    driver's value hash. The estimate itself stays rows-only in q29 BY
    DESIGN (HLL registers are engine-internal); what becomes
    driver-checked here is everything checkable: the exact
    cardinalities and the bound certificate.

    Plan shape (round-12 rewrite): one independent two-level-distinct
    branch per key column plus one HLL branch, folded by 1-row
    broadcast cross joins. The previous single-agg form put all three
    ``countDistinct`` in ONE aggregate, which Catalyst plans as an
    Expand — every input row triples before the distinct shuffle — and
    measured 3.65s vs 0.75s at sf0.1. The branches are also the better
    100 TB plan: each scan prunes to a single column (same total scan
    bytes as the one 3-column scan), no 3x row expansion enters any
    shuffle, and the independent stages schedule concurrently."""
    cat = Catalog(spark, sf_dir)
    parts = []
    for c, tag in [("l_orderkey", "o"), ("l_partkey", "p"), ("l_suppkey", "s")]:
        # isNotNull mirrors count(DISTINCT c) exactly — the bare
        # distinct would count a NULL group that count(DISTINCT) skips
        # — and pushes to the scan, so NULL rows never enter the
        # distinct shuffle
        exact = (
            cat.lineitem.select(c)
            .where(F.col(c).isNotNull())
            .distinct()
            .agg(F.count(F.lit(1)).alias(f"e_{tag}"))
        )
        approx = cat.lineitem.agg(
            F.approx_count_distinct(c, rsd=0.02).alias(f"a_{tag}")
        )
        parts.append(exact.crossJoin(F.broadcast(approx)))
    agg = (
        parts[0]
        .crossJoin(F.broadcast(parts[1]))
        .crossJoin(F.broadcast(parts[2]))
    )
    rows = agg.selectExpr(
        "stack(3, 'l_orderkey', a_o, e_o, 'l_partkey', a_p, e_p, "
        "'l_suppkey', a_s, e_s) AS (key_col, approx, exact)"
    )
    return rows.select(
        "key_col",
        F.col("exact").alias("exact_distinct"),
        (
            F.abs(F.col("approx") - F.col("exact"))
            <= F.greatest(F.lit(5 * 0.02) * F.col("exact"), F.lit(3.0))
        ).alias("within_bound"),
    ).orderBy("key_col")


#: Mirror of similarity._prep's defined-cosine subspace: NULL vectors
#: and vectors with NULL elements are dropped BEFORE the dot product
#: (DuckDB list_inner_product hard-errors on NULL elements where Spark
#: aggregate() yields NULL), then zero/NaN/Inf norms are dropped —
#: isfinite is load-bearing because DuckDB, like Spark, orders NaN
#: above every double, so ``nrm > 0`` alone would keep NaN norms.
_EMB_PREP_SQL = """
    SELECT vec_id, v, nrm FROM (
        SELECT vec_id, embedding::DOUBLE[] AS v,
               -- norm via transform+sum, NOT list_dot_product: DuckDB's
               -- vectorized list_inner_product evaluates over the whole
               -- chunk and hard-errors on a NULL list in a row the WHERE
               -- already deselected; the lambda form is NULL-safe under
               -- any evaluation order (and bitwise-identical on valid
               -- rows — same left-to-right accumulation)
               sqrt(list_aggregate(list_transform(embedding::DOUBLE[],
                    x -> x * x), 'sum')) AS nrm
        FROM embeddings
        WHERE embedding IS NOT NULL
          AND len(list_filter(embedding, x -> x IS NULL)) = 0
    ) WHERE isfinite(nrm) AND nrm > 0
"""

#: Moment-domain variant (PCA/q187): identical to _EMB_PREP_SQL except
#: zero-norm vectors are KEPT — zero is a defined input to mean/Gram
#: moments (it shifts them, MLlib RowMatrix semantics); only the cosine
#: divide is undefined on it. Mirrors similarity._prep(keep_zero=True).
_EMB_MOMENT_PREP_SQL = _EMB_PREP_SQL.replace(
    "isfinite(nrm) AND nrm > 0", "isfinite(nrm) AND nrm >= 0"
)


@register(
    "q30_embedding_topk_cosine",
    sql=f"""
    WITH n AS ({_EMB_PREP_SQL}),
    q AS (SELECT * FROM n WHERE vec_id < 5),
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS candidate_id,
               round(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 6) AS cosine
        -- pair-level dimension domain (round-10 probe): a cross-dim
        -- cosine is undefined — Spark's zip_with NULLs it while
        -- DuckDB's list_dot_product RAISES; the len equality in the
        -- JOIN keeps the dot off mismatched pairs entirely
        FROM q JOIN n c ON c.vec_id <> q.vec_id AND len(q.v) = len(c.v)
    )
    SELECT query_id, candidate_id, cosine, CAST(rnk AS INTEGER) AS rank
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, candidate_id
        ) AS rnk FROM scored
    ) WHERE rnk <= 5
    """,
)
def q30_embedding_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-5 for query vectors vec_id<5:
    broadcast queries against one distributed corpus scan."""
    cat = Catalog(spark, sf_dir)
    emb = cat.embeddings
    return cosine_topk(emb, emb.filter(F.col("vec_id") < 5), k=5)


@register(
    "q31_embedding_cosine_histogram",
    sql=f"""
    WITH n AS ({_EMB_PREP_SQL}),
    pairs AS (
        SELECT round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) AS cosine
        -- same-dim pairs only (pair-level dimension domain, round-10
        -- probe; mirrors the GEMM's (dim, blk) block key)
        FROM n a JOIN n b ON a.vec_id < b.vec_id AND len(a.v) = len(b.v)
    )
    SELECT CAST(floor(cosine * 10) AS BIGINT) AS bucket, count(*) AS n_pairs
    FROM pairs GROUP BY bucket ORDER BY bucket
    """,
)
def q31_embedding_cosine_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs cosine distribution, histogrammed by 0.1 bucket — the
    profiling pass that picks a near-dup threshold. Runs as BLOCKED
    matrix products (operators.similarity.blocked_cosine_histogram):
    the naive pair self-join ships both vectors on every pair row
    (O(n²·d) shuffle bytes — 40x slower at sf0.1); blocking ships each
    vector n_blocks times and does the dot products as numpy GEMMs
    inside Arrow batches. The oracle states the naive form — results
    are identical."""
    from flight_delays_progetto_big_data_2024_spark.operators.similarity import (
        blocked_cosine_histogram,
    )

    cat = Catalog(spark, sf_dir)
    return blocked_cosine_histogram(cat.embeddings)


_SHINGLES_SQL = f"""
    SELECT doc_id,
           list_distinct([array_to_string(toks[i:i+2], ' ')
                          for i in generate_series(1, greatest(len(toks)-2, 1))]) AS s
    FROM (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents)
"""


@register(
    "q32_ngram_jaccard_pairs",
    sql=f"""
    WITH sh AS ({_SHINGLES_SQL}),
    p AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               round(len(list_intersect(a.s, b.s))::DOUBLE
                     / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))),
                     6) AS jaccard
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, jaccard FROM p WHERE jaccard >= 0.5
    """,
)
def q32_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT word-3-gram Jaccard near-dup pairs (J ≥ 0.5) via the
    inverted shingle index — no crossJoin; this is also the ground truth
    the LSH variants are tested against."""
    cat = Catalog(spark, sf_dir)
    return jaccard_pairs(cat.documents, "doc_id", "text", k=3, threshold=0.5)


#: DuckDB slice n[i:j] is 1-based inclusive, so a k-char shingle at i is
#: n[i:i+k-1]; both engines clamp at the string end, so texts shorter
#: than k yield the whole text as their single shingle. The CASE guard
#: mirrors char_shingles_of's zero/NULL-content rule (no content = no
#: shingles): the unguarded comprehension fabricated a [''] shingle for
#: empty text — round-7 advisor finding.
_CHAR_SHINGLES_SQL = f"""
    SELECT doc_id,
           CASE WHEN coalesce(len(n), 0) = 0 THEN []::VARCHAR[]
                ELSE list_distinct([n[i:i+4]
                          for i in generate_series(1, greatest(len(n)-4, 1))])
           END AS s
    FROM (SELECT doc_id, {_NORM_SQL} AS n FROM documents)
"""


@register(
    "q54_char_shingle_jaccard",
    sql=f"""
    WITH sh AS ({_CHAR_SHINGLES_SQL}),
    p AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               round(len(list_intersect(a.s, b.s))::DOUBLE
                     / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))),
                     6) AS jaccard
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, jaccard FROM p WHERE jaccard >= 0.75
    """,
)
def q54_char_shingle_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT char-5-gram Jaccard near-dup pairs (J ≥ 0.75): robust to
    word-boundary edits (typo-level near-dups that word shingles miss).
    Uses the AllPairs/PPJoin prefix-filtered plan rather than q32's
    plain inverted index: char shingles are heavy-tailed (2k distinct
    5-grams across the sf0.1 corpus, Σdf² ≈ 769M co-occurrences), so
    the plain index join is un-runnable there while the rarest-first
    prefix index stays bounded. Same exact result by the prefix-filter
    theorem — the sf0.01 oracle checks it value-for-value.

    Threshold 0.75, not 0.5: prefix length scales with (1-t)·n, so the
    candidate-join mass scales with (1-t)² — measured 4x at sf0.1 —
    and the corpus's true near-dup pairs all sit at J ≥ 0.75 anyway
    (the 0.5 setting found nothing extra, it only paid for it)."""
    cat = Catalog(spark, sf_dir)
    return jaccard_pairs_prefix(
        cat.documents, "doc_id", "text", k=5, threshold=0.75, shingle_fn=char_shingles
    )


@register(
    "q56_benchmark_decontamination",
    sql=f"""
    WITH sh AS ({_SHINGLES_SQL}),
    b AS (SELECT doc_id AS bench_id, s FROM sh WHERE doc_id % 20 = 0),
    c AS (SELECT doc_id AS corpus_id, s FROM sh WHERE doc_id % 20 <> 0),
    p AS (
        SELECT b.bench_id, c.corpus_id,
               round(len(list_intersect(b.s, c.s))::DOUBLE / len(b.s), 6)
                   AS containment
        FROM b CROSS JOIN c
    )
    SELECT bench_id, corpus_id, containment FROM p WHERE containment >= 0.5
    """,
)
def q56_benchmark_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination sweep: treat every 20th document as a held-out
    benchmark set and flag corpus documents that CONTAIN ≥ half of a
    benchmark doc's word-3-gram shingles. The oracle brute-forces the
    cross join; the engine runs the two-relation inverted index
    (cost ∝ shared-shingle mass, broadcastable bench side)."""
    cat = Catalog(spark, sf_dir)
    bench = cat.documents.filter(F.col("doc_id") % 20 == 0)
    corpus = cat.documents.filter(F.col("doc_id") % 20 != 0)
    return cross_corpus_containment(corpus, bench, "doc_id", "text", k=3, threshold=0.5)


@register(
    "q57_hash_split_stats",
    sql=f"""
    WITH s AS (
        SELECT CASE
                 WHEN substr(md5(doc_id::VARCHAR), 1, 4) < 'cccc' THEN 'train'
                 WHEN substr(md5(doc_id::VARCHAR), 1, 4) < 'e666' THEN 'val'
                 ELSE 'test'
               END AS split,
               len({_TOKS_SQL}) AS n_toks
        FROM documents
    )
    SELECT split, count(*) AS n_docs, round(avg(n_toks), 4) AS avg_tokens
    FROM s GROUP BY split
    """,
)
def q57_hash_split_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-deterministic 80/10/10 train/val/test assignment
    (bucket = first 4 hex chars of md5(doc_id)) with per-split token
    stats — the split is a pure projection (no shuffle) and identical
    on any cluster layout, which ``randomSplit`` cannot guarantee."""
    cat = Catalog(spark, sf_dir)
    return (
        hash_split(cat.documents)
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg(token_count("text")), 4).alias("avg_tokens"),
        )
    )


@register(
    "q58_near_dup_clusters",
    sql=f"""
    WITH RECURSIVE sh AS ({_SHINGLES_SQL}),
    p AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE round(len(list_intersect(a.s, b.s))::DOUBLE
                    / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))),
                    6) >= 0.5
    ),
    e AS (
        SELECT id_a AS u, id_b AS v FROM p
        UNION
        SELECT id_b AS u, id_a AS v FROM p
    ),
    r(id, comp) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.u, r.comp FROM e JOIN r ON r.id = e.v
    )
    SELECT id AS doc_id, min(comp) AS cluster_id, id = min(comp) AS is_kept
    FROM r GROUP BY id
    """,
)
def q58_near_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTER collapse — the step after pair detection in
    every dedup pipeline: connected components over the exact-Jaccard
    pair graph (q32's edges), labeling each doc with its cluster's min
    id and keeping exactly one representative per cluster. Singletons
    keep themselves. Oracle = DuckDB recursive-CTE reachability."""
    from flight_delays_progetto_big_data_2024_spark.graph.algorithms import (
        connected_components,
    )

    cat = Catalog(spark, sf_dir)
    pairs = jaccard_pairs(cat.documents, "doc_id", "text", k=3, threshold=0.5)
    cc = connected_components(
        pairs,
        "id_a",
        "id_b",
        vertices=cat.documents.select(F.col("doc_id").alias("id")),
    )
    return cc.select(
        F.col("id").alias("doc_id"),
        F.col("component").alias("cluster_id"),
        (F.col("id") == F.col("component")).alias("is_kept"),
    )


@register(
    "q59_tfidf_top_terms",
    sql=f"""
    WITH tok AS (
        SELECT doc_id, unnest({_TOKS_SQL}) AS term FROM documents
    ),
    tf AS (
        SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term
    ),
    dfreq AS (
        SELECT term, count(*) AS df FROM tf GROUP BY term
    ),
    n AS (SELECT count(*) AS n_docs FROM documents),
    w AS (
        SELECT tf.doc_id, tf.term, tf.tf,
               round(tf.tf * ln(n_docs::DOUBLE / df), 6) AS tfidf
        FROM tf JOIN dfreq USING (term) CROSS JOIN n
    ),
    r AS (
        -- hex(term), not term: DuckDB's SORT-KEY paths (window sort,
        -- large external sort, list_sort) treat an embedded NUL byte
        -- as a terminator — 'nul' || chr(0) nondeterministically
        -- ranks before 'nul' (round-11 strings-axis probe; plain
        -- comparisons and min/max are byte-correct). hex() is
        -- NUL-free and its lexicographic order IS byte order, so this
        -- is a pure comparator-encoding swap: identical ranking on
        -- every input, matching Spark's unsigned-byte window sort.
        SELECT *, row_number() OVER (
            PARTITION BY doc_id ORDER BY tfidf DESC, hex(term) ASC
        ) AS rank
        FROM w
    )
    SELECT doc_id, term, tf, tfidf, rank FROM r WHERE rank <= 3
    """,
)
def q59_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per document by classic TF-IDF
    (tf · ln(N/df)) — SURVEY.md §7 step 7's 'tokenize/TF-IDF' text op.
    One explode per doc; df reuses the tf relation; N is a broadcast
    1-row aggregate. Rank order = rounded weight desc, term asc (total,
    engine-stable)."""
    cat = Catalog(spark, sf_dir)
    return tfidf_topk_terms(cat.documents, "doc_id", "text", k=3)


@register(
    "q60_bm25_keyword_search",
    sql=f"""
    WITH tok AS (
        SELECT doc_id, unnest({_TOKS_SQL}) AS term FROM documents
    ),
    tf AS (
        SELECT doc_id, term, count(*) AS tf FROM tok
        WHERE term IN ('spark', 'join', 'stream')
        GROUP BY doc_id, term
    ),
    dfreq AS (
        SELECT term, count(*) AS df FROM tf GROUP BY term
    ),
    dl AS (
        SELECT doc_id, len({_TOKS_SQL})::DOUBLE AS dl FROM documents
    ),
    stats AS (
        SELECT count(*) AS n_docs, avg(len({_TOKS_SQL})) AS avgdl
        FROM documents
    )
    SELECT tf.doc_id,
           round(sum(ln(1 + (n_docs - df + 0.5) / (df + 0.5))
                     * tf * (1.2 + 1)
                     / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))),
                 6) AS bm25
    FROM tf
    JOIN dfreq USING (term)
    JOIN dl USING (doc_id)
    CROSS JOIN stats
    GROUP BY tf.doc_id
    ORDER BY bm25 DESC, tf.doc_id ASC
    LIMIT 25
    """,
)
def q60_bm25_keyword_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-25 for the query bag {spark, join, stream} — the
    lexical-retrieval baseline beside the embedding searches (q30/q35/
    q44). Term filter lands on the tf relation before any join, so the
    scored set is O(matching docs); corpus scalars (N, avgdl) travel as
    a broadcast 1-row cross join."""
    cat = Catalog(spark, sf_dir)
    return bm25_search(
        cat.documents, ["spark", "join", "stream"], "doc_id", "text", k=25
    )


@register(
    "q61_curation_funnel",
    sql=f"""
    WITH base AS (
        SELECT text,
               {_TOKS_SQL} AS toks,
               len(text) AS n,
               len(text) - len(regexp_replace(text, '[.,!?;:''"]', '', 'g')) AS n_punct,
               md5({_NORM_SQL}) AS fp,
               {lang_id_sql("text")} AS plang
        FROM documents
    ),
    m AS (
        SELECT fp, plang,
               len(toks) AS n_tokens,
               CASE WHEN len(toks) > 0
                    THEN list_aggregate(list_transform(toks, t -> len(t)), 'sum')::DOUBLE
                         / len(toks) END AS atl,
               CASE WHEN len(toks) > 0
                    THEN len(list_distinct(toks))::DOUBLE / len(toks) END AS diversity,
               CASE WHEN n > 0 THEN n_punct::DOUBLE / n ELSE 0.0 END AS pr
        FROM base
    ),
    f AS (
        SELECT (plang <> 'unknown') AS lang_known,
               (n_tokens BETWEEN 20 AND 80) AS length_ok,
               (CASE WHEN n_tokens = 0 THEN 0.0
                     ELSE round(0.6 * diversity
                                + 0.4 * (CASE WHEN atl >= 3.0 AND atl <= 8.0
                                              THEN 1.0 ELSE 0.5 END)
                                - pr, 6) END) >= 0.62 AS quality_ok,
               fp
        FROM m
    ),
    a AS (
        SELECT count(*) AS raw,
               sum(CASE WHEN lang_known THEN 1 ELSE 0 END)::BIGINT AS lang_known,
               sum(CASE WHEN lang_known AND length_ok THEN 1 ELSE 0 END)::BIGINT
                   AS length_ok,
               sum(CASE WHEN lang_known AND length_ok AND quality_ok
                        THEN 1 ELSE 0 END)::BIGINT AS quality_ok,
               count(DISTINCT CASE WHEN lang_known AND length_ok AND quality_ok
                                   THEN fp END) AS deduped
        FROM f
    )
    SELECT 1 AS stage_id, 'raw' AS stage, raw AS docs_kept FROM a
    UNION ALL SELECT 2, 'lang_known', lang_known FROM a
    UNION ALL SELECT 3, 'length_ok', length_ok FROM a
    UNION ALL SELECT 4, 'quality_ok', quality_ok FROM a
    UNION ALL SELECT 5, 'deduped', deduped FROM a
    """,
)
def q61_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pretraining-corpus curation funnel — cumulative survivor counts
    for raw → lang-known → length-window → quality → exact-dedup, all in
    ONE scan + ONE aggregate (k count-actions would be k scans of a
    100 TB corpus). Thresholds chosen to discriminate on the synthetic
    corpus (token count 20-80, quality ≥0.62): every stage drops
    documents, so the parity check exercises each flag."""
    cat = Catalog(spark, sf_dir)
    return curation_funnel(
        cat.documents, "text", min_tokens=20, max_tokens=80, min_quality=0.62
    )


@register(
    "q62_stratified_sample_by_source",
    sql="""
    WITH r AS (
        SELECT source, doc_id,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY substr(md5(doc_id::VARCHAR), 1, 4), doc_id
               ) AS rn,
               count(*) OVER (PARTITION BY source) AS n
        FROM documents
    )
    SELECT source, doc_id FROM r WHERE rn <= ceil(0.2 * n)
    """,
)
def q62_stratified_sample_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-size 20% stratified sample per `source`: each stratum keeps
    exactly ceil(0.2·n) docs — rare sources are never rounded away, and
    the kept set is content-deterministic (stable across any physical
    layout), unlike df.sampleBy."""
    cat = Catalog(spark, sf_dir)
    return stratified_sample(
        cat.documents, "source", 0.2, id_col="doc_id"
    ).select("source", "doc_id")


@register(
    "q63_pmi_term_pairs",
    sql=f"""
    WITH tok AS (
        SELECT doc_id AS _doc, unnest(list_distinct({_TOKS_SQL})) AS term
        FROM documents
    ),
    tc AS (
        SELECT term, count(*) AS c FROM tok GROUP BY term
        HAVING count(*) >= 10
    ),
    tok_f AS (
        SELECT _doc, tok.term, c FROM tok JOIN tc USING (term)
    ),
    pairs AS (
        SELECT a.term AS t1, b.term AS t2, a.c AS c1, b.c AS c2
        FROM tok_f a JOIN tok_f b ON a._doc = b._doc AND a.term < b.term
    ),
    n AS (SELECT count(*) AS n_docs FROM documents)
    SELECT t1, t2, count(*) AS c12,
           round(ln(count(*) * n_docs / (c1 * c2)), 6) AS pmi
    FROM pairs CROSS JOIN n
    GROUP BY t1, t2, c1, c2, n_docs
    ORDER BY pmi DESC, t1 ASC, t2 ASC
    LIMIT 25
    """,
)
def q63_pmi_term_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-25 document-level PMI term pairs (collocation mining /
    boilerplate detection). The min_df=10 prefilter lands before the
    per-doc pair expansion; both self-join inputs reuse one exchange."""
    cat = Catalog(spark, sf_dir)
    return pmi_pairs(cat.documents, "doc_id", "text", min_df=10, k=25)


@register(
    "q64_sequence_packing_stats",
    sql=f"""
    WITH d AS (
        SELECT doc_id,
               len({_TOKS_SQL})::BIGINT AS length,
               substr(md5(doc_id::VARCHAR), 1, 4) AS bkt
        FROM documents
    ),
    s AS (
        SELECT doc_id, length, bkt,
               ('0x' || bkt)::BIGINT % 8 AS shard
        FROM d
        -- mirrors pack_sequences' corrupt-metadata drop: NULL/negative
        -- lengths are filtered on the Spark side, so the oracle must
        -- not keep a NULL-bin group on dirty corpora (round-6 advisor)
        WHERE length IS NOT NULL AND length >= 0
    ),
    w AS (
        SELECT shard, length,
               sum(length) OVER (
                   PARTITION BY shard ORDER BY bkt, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS running
        FROM s
    )
    SELECT shard,
           floor((running - length) / 512)::BIGINT AS bin,
           count(*) AS n_docs,
           sum(length)::BIGINT AS n_tokens,
           round(sum(length) / 512.0, 6) AS fill_ratio
    FROM w
    GROUP BY shard, bin
    """,
)
def q64_sequence_packing_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concatenate-then-chunk sequence packing (GPT-style pretraining
    batches): documents hash-sharded into 8 independent token streams,
    each chunked into 512-token bins by a running-sum window — no
    sequential driver loop. Per-bin fill accounting."""
    cat = Catalog(spark, sf_dir)
    packed = pack_sequences(
        cat.documents.select("doc_id", token_count("text").alias("length")),
        budget=512,
        length_col="length",
        n_shards=8,
    )
    return pack_stats(packed, budget=512)


@register(
    "q33_minhash_lsh_near_dups",
    sql=f"""
    WITH sh AS ({_SHINGLES_SQL}),
    p AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               round(len(list_intersect(a.s, b.s))::DOUBLE
                     / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))),
                     6) AS jaccard
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, jaccard FROM p WHERE jaccard >= 0.5
    """,
)
def q33_minhash_lsh_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(64)+LSH(16 bands) candidates verified by exact Jaccard —
    the sub-quadratic near-dedup path. The oracle is the IDEAL output
    (brute-force exact Jaccard ≥ 0.5): precision is 1.0 by construction
    (candidates are re-verified exactly), so a value match additionally
    certifies recall = 1.0 on this corpus — every real near-dup pair
    here has J ≥ 0.88, where the 16-band/4-row collision probability is
    1-(1-J⁴)¹⁶ > 0.9998. A hash mismatch against this oracle is a
    banding-recall regression, which is exactly what it should flag."""
    cat = Catalog(spark, sf_dir)
    return minhash_near_dups(cat.documents, "doc_id", "text", k=3, threshold=0.5)


def _simhash_portable_oracle_sql(max_hamming: int = 7) -> str:
    """DuckDB SQL replaying the ENTIRE portable-hash SimHash pipeline:
    tokenize → 60-bit md5 token hash → per-bit majority votes → 64-bit
    signature → brute-force Hamming pairs. Brute force is fine for the
    oracle (sf0.01 = 125k pairs); the Spark side's pigeonhole block join
    is exact at this radius, so outputs must agree value-for-value."""
    tok_hash = "('0x' || substr(md5(tok), 1, 15))::BIGINT"
    counts = ",\n               ".join(
        f"sum((h >> {j}) & 1) AS c{j}" for j in range(60)
    )
    bits = "\n               | ".join(
        f"(CASE WHEN 2 * c{j} > n THEN (1::BIGINT << {j}) ELSE 0::BIGINT END)"
        for j in range(60)
    )
    return f"""
    WITH t AS (
        SELECT doc_id, unnest({_TOKS_SQL}) AS tok FROM documents
    ),
    h AS (SELECT doc_id, {tok_hash} AS h FROM t),
    c AS (
        SELECT doc_id, count(*) AS n,
               {counts}
        FROM h GROUP BY doc_id
    ),
    sig AS (
        SELECT doc_id,
               {bits} AS sh
        FROM c
        UNION ALL
        SELECT doc_id, 0::BIGINT AS sh
        FROM documents WHERE coalesce(len({_TOKS_SQL}), 0) = 0
    ),
    p AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               bit_count(xor(a.sh, b.sh)) AS hamming
        FROM sig a JOIN sig b ON a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, CAST(hamming AS INTEGER) AS hamming
    FROM p WHERE hamming <= {max_hamming}
    """


@register("q34_simhash_near_dups", sql=_simhash_portable_oracle_sql(7))
def q34_simhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash-64 pairs within Hamming ≤ 7 via pigeonhole block join —
    exact for that radius by construction. Registered with the
    engine-portable md5-60-bit token hash (PORTABLE_TOKEN_HASH_SQL) so
    DuckDB replays signatures bit-for-bit and the driver value-checks
    the WHOLE pipeline, not just row counts; the xxhash64 default
    (~2-3x faster hashing) stays the 100 TB path and is cross-checked
    against the expression form in pytest."""
    cat = Catalog(spark, sf_dir)
    return simhash_near_dups(
        cat.documents, "doc_id", "text", token_hash_sql=PORTABLE_TOKEN_HASH_SQL
    ).withColumn("hamming", F.col("hamming").cast("int"))


def _lsh_topk_oracle_sql(k: int = 5, n_planes: int = 4) -> str:
    """DuckDB SQL replaying hyperplane-LSH top-k exactly: the seeded
    hyperplanes are inlined as float literals (repr round-trips), bucket
    bits from the same sign tests, multi-probe = bucket + all 1-bit
    flips, exact-cosine re-rank. Deterministic end to end, so this is a
    full value oracle even though LSH recall < 1 vs brute force."""
    planes = _hyperplanes(64, n_planes, 42)
    lits = ["[" + ", ".join(repr(float(x)) for x in p) + "]" for p in planes]
    bucket = "\n             | ".join(
        f"(CASE WHEN list_dot_product(v, {lit}) > 0 THEN {1 << i} ELSE 0 END)"
        for i, lit in enumerate(lits)
    )
    probes = ", ".join(
        ["qbucket"] + [f"xor(qbucket, {1 << i})" for i in range(n_planes)]
    )
    return f"""
    WITH n AS ({_EMB_PREP_SQL}),
    b AS (
        -- len(v) = 64 mirrors lsh_topk's NULL-bucket dimension guard
        -- (round-10 probe): a vector outside the hyperplane dimension
        -- has no bucket and leaves the candidate space (DuckDB's
        -- list_dot_product would RAISE on it; Spark's zip_with would
        -- silently alias it into bucket 0)
        SELECT vec_id, v, nrm,
               ({bucket})::BIGINT AS bucket
        FROM n WHERE len(v) = 64
    ),
    q AS (
        SELECT vec_id AS query_id, v AS qv, nrm AS qn, bucket AS qbucket
        FROM b WHERE vec_id < 5
    ),
    probes AS (
        SELECT query_id, qv, qn, unnest([{probes}]) AS bucket FROM q
    ),
    scored AS (
        SELECT p.query_id, c.vec_id AS candidate_id,
               round(list_dot_product(p.qv, c.v) / (p.qn * c.nrm), 6) AS cosine
        FROM probes p JOIN b c USING (bucket)
        WHERE c.vec_id <> p.query_id
    )
    SELECT query_id, candidate_id, cosine, CAST(rnk AS INTEGER) AS rank
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, candidate_id
        ) AS rnk FROM scored
    ) WHERE rnk <= {k}
    """


@register("q35_embedding_lsh_topk", sql=_lsh_topk_oracle_sql(5, 4))
def q35_embedding_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH approximate top-k (multi-probe) — the scale path
    for similarity search. Fully deterministic under the fixed seed, so
    the oracle replays the SAME LSH (inlined plane literals) in DuckDB
    and value-checks candidates + re-ranked scores; pytest separately
    measures recall against exact q30."""
    cat = Catalog(spark, sf_dir)
    emb = cat.embeddings
    return lsh_topk(emb, emb.filter(F.col("vec_id") < 5), k=5, n_planes=4)


@register(
    "q36_event_dedup_earliest",
    sql="""
    SELECT event_type, count(*) AS num_rows
    FROM (
        SELECT event_type,
               row_number() OVER (
                   PARTITION BY user_id, event_type
                   ORDER BY ts, event_id
               ) AS rn
        FROM events
    ) WHERE rn = 1
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q36_event_dedup_earliest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic keep-earliest dedup per (user, event_type) — the
    row_number form of dropDuplicates (which keeps an arbitrary row)."""
    cat = Catalog(spark, sf_dir)
    # asc_nulls_last: a NULL-ts event must not win "earliest" (Spark's
    # bare asc is NULLS FIRST; the DuckDB oracle's ASC is NULLS LAST)
    deduped = keep_first(
        cat.events,
        ["user_id", "event_type"],
        [F.col("ts").asc_nulls_last(), F.col("event_id").asc_nulls_last()],
    )
    return (
        deduped.groupBy("event_type")
        .agg(F.count("*").alias("num_rows"))
        .orderBy("event_type")
    )


@register(
    "q71_doc_repetition_quality",
    sql=f"""
    WITH per_doc AS (
        SELECT source,
               CASE WHEN len(t) > 0
                    THEN 1.0 - len(list_distinct(t)) / len(t)
                    ELSE 0.0 END AS dup_token_frac,
               CASE WHEN len(b) > 0
                    THEN 1.0 - len(list_distinct(b)) / len(b)
                    ELSE 0.0 END AS dup_bigram_frac
        FROM (
            SELECT source, t,
                   list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1]) AS b
            FROM (SELECT source, {_TOKS_SQL} AS t FROM documents)
        )
    )
    SELECT source,
           count(*) AS n_docs,
           round(avg(dup_token_frac), 6) AS avg_dup_token_frac,
           round(avg(dup_bigram_frac), 6) AS avg_dup_bigram_frac,
           round(max(dup_bigram_frac), 6) AS max_dup_bigram_frac
    FROM per_doc GROUP BY source ORDER BY source
    """,
)
def q71_doc_repetition_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals per source: duplicate-token and
    duplicate-bigram fractions (boilerplate / degenerate-loop
    detectors). Pure array expressions — tokens and bigrams never
    explode into rows, so the only shuffle is the final per-source
    aggregate; everything else is embarrassingly parallel codegen."""
    from flight_delays_progetto_big_data_2024_spark.functions.text import (
        bigrams_of,
        repetition_fraction,
        tokens,
    )

    cat = Catalog(spark, sf_dir)
    per_doc = cat.documents.select(
        "source", tokens("text").alias("t")
    ).select(
        "source",
        repetition_fraction(F.col("t")).alias("dup_token_frac"),
        repetition_fraction(bigrams_of(F.col("t"))).alias("dup_bigram_frac"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("dup_token_frac"), 6).alias("avg_dup_token_frac"),
            F.round(F.avg("dup_bigram_frac"), 6).alias("avg_dup_bigram_frac"),
            F.round(F.max("dup_bigram_frac"), 6).alias("max_dup_bigram_frac"),
        )
        .orderBy("source")
    )


@register(
    "q72_heavy_hitter_terms",
    sql=f"""
    WITH toks AS (
        SELECT unnest({_TOKS_SQL}) AS term FROM documents
    ),
    tot AS (SELECT count(*) AS n FROM toks),
    counts AS (SELECT term, count(*) AS occurrences FROM toks GROUP BY term)
    SELECT term, occurrences,
           round(occurrences / n, 6) AS freq
    FROM counts, tot
    WHERE occurrences > 0.005 * n
    ORDER BY occurrences DESC, term
    """,
)
def q72_heavy_hitter_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact corpus heavy hitters (freq > 0.5%) via the two-pass
    Misra-Gries plan (operators.ranking.heavy_hitter_terms): pass 1
    generates a candidate superset per partition without shuffling the
    vocabulary tail, pass 2 recounts candidates exactly. The oracle is
    the naive count-everything form — results must be identical."""
    from flight_delays_progetto_big_data_2024_spark.operators.ranking import (
        heavy_hitter_terms,
    )

    cat = Catalog(spark, sf_dir)
    return heavy_hitter_terms(cat.documents, phi=0.005)


@register(
    "q73_label_centroid_cohesion",
    sql="""
    WITH e AS (
        SELECT vec_id, label,
               unnest(embedding::DOUBLE[]) AS val,
               generate_subscripts(embedding, 1) AS pos
        FROM embeddings
    ),
    cent AS (SELECT label, pos, avg(val) AS cval FROM e GROUP BY label, pos),
    pm AS (
        SELECT e.vec_id, e.label,
               sum(e.val * c.cval) AS dot,
               sqrt(sum(e.val * e.val)) AS member_norm
        FROM e JOIN cent c USING (label, pos)
        GROUP BY e.vec_id, e.label
    ),
    cn AS (SELECT label, sqrt(sum(cval * cval)) AS centroid_norm
           FROM cent GROUP BY label)
    SELECT pm.label AS label,
           count(*) AS n_members,
           round(avg(dot / (member_norm * centroid_norm)), 6) AS avg_cosine,
           round(min(dot / (member_norm * centroid_norm)), 6) AS min_cosine
    FROM pm JOIN cn USING (label)
    GROUP BY pm.label ORDER BY label
    """,
)
def q73_label_centroid_cohesion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster cohesion per embedding label: mean/min cosine of members
    to their label centroid, computed by positional explode + (label,
    pos) aggregation (operators.similarity.label_centroid_cohesion) —
    no crossJoin, no driver-side matrix, shuffle keyed on the dimension
    index."""
    from flight_delays_progetto_big_data_2024_spark.operators.similarity import (
        label_centroid_cohesion,
    )

    cat = Catalog(spark, sf_dir)
    return label_centroid_cohesion(cat.embeddings)


@register(
    "q74_quality_percentile_curation",
    sql=f"""
    WITH base AS (
        SELECT doc_id, lang,
               {_TOKS_SQL} AS toks,
               len(text) AS n,
               len(text) - len(regexp_replace(text, '[.,!?;:''"]', '', 'g')) AS n_punct
        FROM documents
    ),
    m AS (
        SELECT doc_id, lang,
               CAST(len(toks) AS BIGINT) AS n_tokens,
               CASE WHEN len(toks) > 0
                    THEN list_aggregate(list_transform(toks, t -> len(t)), 'sum')::DOUBLE
                         / len(toks) END AS atl,
               CASE WHEN len(toks) > 0
                    THEN len(list_distinct(toks))::DOUBLE / len(toks) END AS diversity,
               CASE WHEN n > 0 THEN n_punct::DOUBLE / n ELSE 0.0 END AS pr
        FROM base
    ),
    scored AS (
        SELECT doc_id, lang,
               CASE WHEN n_tokens = 0 THEN 0.0
                    ELSE round(0.6 * diversity
                               + 0.4 * (CASE WHEN atl >= 3.0 AND atl <= 8.0
                                             THEN 1.0 ELSE 0.5 END)
                               - pr, 6) END AS quality
        FROM m
    ),
    ranked AS (
        -- unmeasured quality (NULL text) can't be ranked: one NULL row
        -- per lang shifts every percent_rank, and Spark orders NULLS
        -- FIRST where DuckDB orders NULLS LAST (round-7 dirty sweep)
        SELECT lang, quality,
               percent_rank() OVER (
                   PARTITION BY lang ORDER BY quality, doc_id
               ) AS prk
        FROM scored WHERE quality IS NOT NULL
    )
    SELECT lang,
           count(*) AS n_kept,
           round(min(quality), 6) AS cutoff_quality,
           round(avg(quality), 6) AS avg_kept_quality
    FROM ranked WHERE prk >= 0.25
    GROUP BY lang ORDER BY lang
    """,
)
def q74_quality_percentile_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative-threshold curation: drop the bottom quartile of docs BY
    LANGUAGE (absolute cutoffs over-prune low-resource languages). The
    percent_rank window ranks the already-rounded quality score with
    doc_id as total-order tiebreak, so the kept set is deterministic
    and engine-portable. Partitioned by lang — each language ranks in
    parallel; no global sort."""
    from pyspark.sql.window import Window

    from flight_delays_progetto_big_data_2024_spark.functions.text import (
        quality_score,
    )

    cat = Catalog(spark, sf_dir)
    scored = cat.documents.select(
        "doc_id", "lang", quality_score("text").alias("quality")
    ).filter(F.col("quality").isNotNull())  # unmeasured can't be ranked
    w = Window.partitionBy("lang").orderBy("quality", "doc_id")
    kept = scored.withColumn("prk", F.percent_rank().over(w)).filter(
        F.col("prk") >= 0.25
    )
    return (
        kept.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.round(F.min("quality"), 6).alias("cutoff_quality"),
            F.round(F.avg("quality"), 6).alias("avg_kept_quality"),
        )
        .orderBy("lang")
    )


@register(
    "q75_token_length_histogram",
    sql=f"""
    WITH counted AS (
        SELECT source, len({_TOKS_SQL}) AS n_tokens FROM documents
    )
    SELECT source,
           CASE WHEN n_tokens = 0 THEN -1
                ELSE CAST(floor(log2(n_tokens)) AS INTEGER) END AS log2_bucket,
           count(*) AS n_docs,
           CAST(min(n_tokens) AS BIGINT) AS min_tokens,
           CAST(max(n_tokens) AS BIGINT) AS max_tokens
    FROM counted
    GROUP BY source, log2_bucket
    ORDER BY source, log2_bucket
    """,
)
def q75_token_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-length distribution (log2 buckets) per source — the
    standard pre-packing diagnostic (how much of the corpus fits a
    context window; feeds q64's packing-budget choice). Empty docs get
    bucket -1. Pure expressions + one aggregate."""
    cat = Catalog(spark, sf_dir)
    n = token_count("text")
    return (
        cat.documents.select(
            "source",
            F.when(n == 0, F.lit(-1))
            .otherwise(F.floor(F.log2(n)).cast("int"))
            .alias("log2_bucket"),
            n.cast("long").alias("n_tokens"),
        )
        .groupBy("source", "log2_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_tokens").alias("min_tokens"),
            F.max("n_tokens").alias("max_tokens"),
        )
        .orderBy("source", "log2_bucket")
    )


@register(
    "q76_top_terms_per_source",
    sql=f"""
    WITH toks AS (
        SELECT source, unnest({_TOKS_SQL}) AS term FROM documents
    ),
    counts AS (
        SELECT source, term, count(*) AS occurrences
        FROM toks GROUP BY source, term
    )
    SELECT source, term, occurrences, CAST(rnk AS INTEGER) AS rank
    FROM (
        -- hex(term): DuckDB window sort is NUL-blind (see q59)
        SELECT *, row_number() OVER (
            PARTITION BY source ORDER BY occurrences DESC, hex(term)
        ) AS rnk FROM counts
    ) WHERE rnk <= 3
    ORDER BY source, rank
    """,
)
def q76_top_terms_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 terms per source: explode → two-key hash aggregate (map-side
    combine carries (source, term) partials) → windowed top-k
    partitioned by source. The window input is one row per DISTINCT
    (source, term) — vocabulary-sized, not corpus-sized."""
    from flight_delays_progetto_big_data_2024_spark.operators.relational import (
        top_k_per_group,
    )

    cat = Catalog(spark, sf_dir)
    counts = (
        cat.documents.select("source", F.explode(tokens("text")).alias("term"))
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).alias("occurrences"))
    )
    return top_k_per_group(
        counts, ["source"], [F.desc("occurrences"), F.col("term")], 3
    ).orderBy("source", "rank")


@register(
    "q77_embedding_quantization_error",
    sql="""
    WITH q AS (
        SELECT vec_id, label,
               embedding::DOUBLE[] AS v,
               list_min(embedding::DOUBLE[]) AS lo,
               list_max(embedding::DOUBLE[]) AS hi
        FROM embeddings
    ),
    err AS (
        SELECT vec_id, label,
               CASE WHEN hi > lo THEN
                   list_aggregate(
                       list_transform(v, x ->
                           pow(x - (lo + round((x - lo) / ((hi - lo) / 255.0))
                                    * ((hi - lo) / 255.0)), 2)),
                       'sum') / len(v)
               ELSE 0.0 END AS mse
        FROM q
    )
    SELECT label,
           count(*) AS n_vectors,
           round(avg(mse) * 1e6, 4) AS avg_mse_ppm,
           round(max(mse) * 1e6, 4) AS max_mse_ppm
    FROM err GROUP BY label ORDER BY label
    """,
)
def q77_embedding_quantization_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar int8 quantization diagnostic: per-vector min/max range
    mapped to 256 levels, reconstruction MSE aggregated per label (the
    go/no-go check before shipping a quantized ANN index). All
    higher-order array expressions over the vector column — the
    quantize-reconstruct round trip never leaves the JVM and the only
    shuffle is the per-label rollup."""
    from flight_delays_progetto_big_data_2024_spark.functions.vectors import (
        as_double_array,
    )

    cat = Catalog(spark, sf_dir)
    v = as_double_array("embedding")
    lo, hi = F.array_min(v), F.array_max(v)
    step = (hi - lo) / 255.0
    q = cat.embeddings.select(
        "vec_id",
        "label",
        v.alias("v"),
        lo.alias("lo"),
        hi.alias("hi"),
        step.alias("step"),
    )
    recon_err = F.aggregate(
        F.transform(
            F.col("v"),
            lambda x: F.pow(
                x
                - (
                    F.col("lo")
                    + F.round((x - F.col("lo")) / F.col("step")) * F.col("step")
                ),
                F.lit(2.0),
            ),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    ) / F.size("v")
    err = q.select(
        "label",
        F.when(F.col("hi") > F.col("lo"), recon_err).otherwise(F.lit(0.0)).alias(
            "mse"
        ),
    )
    return (
        err.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.round(F.avg("mse") * 1e6, 4).alias("avg_mse_ppm"),
            F.round(F.max("mse") * 1e6, 4).alias("max_mse_ppm"),
        )
        .orderBy("label")
    )


@register(
    "q78_bpe_ish_token_budget",
    sql=f"""
    WITH per_doc AS (
        SELECT source,
               len({_TOKS_SQL}) AS ws_tokens,
               -- negated class spells Java's \\s out (RE2 \\s has no
               -- VT — see _WS_SQL): [^...\\s'] must EXCLUDE the same
               -- whitespace set in both engines
               len(regexp_extract_all(text,
                   '''(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 \\t\\n\\x0b\\f\\r'']+'
               )) AS bpe_tokens
        FROM documents
    )
    SELECT source,
           CAST(sum(ws_tokens) AS BIGINT) AS total_ws_tokens,
           CAST(sum(bpe_tokens) AS BIGINT) AS total_bpe_tokens,
           round(sum(bpe_tokens) / nullif(sum(ws_tokens), 0), 6) AS fertility
    FROM per_doc GROUP BY source ORDER BY source
    """,
)
def q78_bpe_ish_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget estimate per source: whitespace words vs BPE-ish
    pretokens (functions.text.bpe_ish_tokens — the RE2-compatible
    GPT-2-style split) and the fertility ratio between them. Both
    tokenizations are single regex expressions in codegen; one
    aggregate shuffle."""
    from flight_delays_progetto_big_data_2024_spark.functions.text import (
        bpe_ish_tokens,
    )

    cat = Catalog(spark, sf_dir)
    per_doc = cat.documents.select(
        "source",
        token_count("text").cast("long").alias("ws_tokens"),
        F.size(bpe_ish_tokens("text")).cast("long").alias("bpe_tokens"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.sum("ws_tokens").alias("total_ws_tokens"),
            F.sum("bpe_tokens").alias("total_bpe_tokens"),
            F.round(
                F.sum("bpe_tokens")
                / F.nullif(F.sum("ws_tokens"), F.lit(0)),
                6,
            ).alias("fertility"),
        )
        .orderBy("source")
    )


@register(
    "q79_winnowing_fingerprints",
    sql=f"""
    WITH base AS (
        -- NULL text has no grams and therefore no fingerprints: the
        -- engine's winnow pass drops such docs entirely, so the oracle
        -- must not count them in n_docs (round-7 dirty sweep: the
        -- unguarded form fabricated a [NULL] fingerprint per NULL doc)
        SELECT doc_id, source, {_NORM_SQL} AS nm FROM documents
        WHERE {_NORM_SQL} IS NOT NULL
    ),
    g AS (
        SELECT doc_id, source,
               CASE WHEN len(nm) >= 5
                    THEN list_transform(range(1, len(nm) - 3),
                                        i -> substr(md5(nm[i:i+4]), 1, 8))
                    ELSE [substr(md5(nm), 1, 8)] END AS h
        FROM base
    ),
    fp AS (
        SELECT doc_id, source,
               CASE WHEN len(h) >= 4
                    THEN list_distinct(list_transform(range(1, len(h) - 2),
                                       j -> list_aggregate(h[j:j+3], 'min')))
                    ELSE [list_aggregate(h, 'min')] END AS fps
        FROM g
    ),
    stats AS (
        SELECT source, count(*) AS n_docs,
               round(avg(len(fps)), 4) AS avg_fingerprints
        FROM fp GROUP BY source
    ),
    dist AS (
        SELECT source, CAST(count(DISTINCT fpp) AS BIGINT) AS distinct_fingerprints
        FROM (SELECT source, unnest(fps) AS fpp FROM fp) GROUP BY source
    )
    SELECT source, n_docs, avg_fingerprints, distinct_fingerprints
    FROM stats JOIN dist USING (source)
    ORDER BY source
    """,
)
def q79_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al.: rolling k-gram
    hashes, sliding-window minima) — the plagiarism/containment-grade
    fingerprint at ~2/(w+1) the density of full k-gram hashing.
    Row-based implementation (operators.dedup.winnowing_fingerprints);
    the oracle states the array form — results must be identical."""
    from flight_delays_progetto_big_data_2024_spark.operators.dedup import (
        winnowing_fingerprints,
    )

    cat = Catalog(spark, sf_dir)
    fps = winnowing_fingerprints(cat.documents, extra_cols=["source"])
    return (
        fps.groupBy("source")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.round(
                F.count(F.lit(1)) / F.countDistinct("doc_id"), 4
            ).alias("avg_fingerprints"),
            F.countDistinct("fingerprint").alias("distinct_fingerprints"),
        )
        .orderBy("source")
    )


@register(
    "q80_kmeans_clusters",
    sql="""
    WITH e AS (
        SELECT vec_id, unnest(embedding::DOUBLE[]) AS val,
               generate_subscripts(embedding, 1) AS pos
        FROM embeddings
        -- kmeans_lloyd's vector domain (wave-5 Inf-probe finding)
        WHERE embedding IS NOT NULL
          AND len(list_filter(embedding, x -> x IS NULL)) = 0
          AND isfinite(list_aggregate(list_transform(embedding::DOUBLE[],
               x -> x * x), 'sum'))
          -- round-8 norm ceiling (similarity.EUCLID_NORM_BOUND): past
          -- it, round(d2, 6) tie-breaks stop collapsing cross-engine
          -- ulp noise (grid coarser than ulp) and codebooks diverge
          AND sqrt(list_aggregate(list_transform(embedding::DOUBLE[],
               x -> x * x), 'sum')) < 10000.0
    ),
    c0 AS (SELECT vec_id AS cid, pos, val AS cval FROM e WHERE vec_id < 8),
    a1 AS (
        SELECT vec_id, cid FROM (
            SELECT vec_id, cid,
                   row_number() OVER (
                       PARTITION BY vec_id ORDER BY round(d2, 6), cid
                   ) AS rn
            FROM (
                SELECT e.vec_id, c.cid, sum((e.val - c.cval) ^ 2) AS d2
                FROM e JOIN c0 c USING (pos) GROUP BY e.vec_id, c.cid
            )
        ) WHERE rn = 1
    ),
    c1 AS (
        SELECT a1.cid, e.pos, avg(e.val) AS cval
        FROM e JOIN a1 USING (vec_id) GROUP BY a1.cid, e.pos
    ),
    a2 AS (
        SELECT vec_id, cid, d2 FROM (
            SELECT vec_id, cid, d2,
                   row_number() OVER (
                       PARTITION BY vec_id ORDER BY round(d2, 6), cid
                   ) AS rn
            FROM (
                SELECT e.vec_id, c.cid, sum((e.val - c.cval) ^ 2) AS d2
                FROM e JOIN c1 c USING (pos) GROUP BY e.vec_id, c.cid
            )
        ) WHERE rn = 1
    )
    SELECT cid AS cluster_id,
           count(*) AS n_members,
           round(avg(d2), 4) AS avg_dist2,
           round(max(d2), 4) AS max_dist2
    FROM a2 GROUP BY cid ORDER BY cluster_id
    """,
)
def q80_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two Lloyd iterations of k-means (k=8, deterministic lowest-id
    seeds) as an iterative DataFrame program
    (operators.similarity.kmeans_lloyd); the oracle unrolls both
    iterations as CTEs, so cluster membership and distances are
    value-checked, not just shaped."""
    from flight_delays_progetto_big_data_2024_spark.operators.similarity import (
        kmeans_lloyd,
    )

    cat = Catalog(spark, sf_dir)
    assign = kmeans_lloyd(cat.embeddings, k=8, iterations=2)
    return (
        assign.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.round(F.avg("dist2"), 4).alias("avg_dist2"),
            F.round(F.max("dist2"), 4).alias("max_dist2"),
        )
        .orderBy("cluster_id")
    )


@register(
    "q81_conversion_funnel",
    sql="""
    WITH v AS (
        SELECT user_id, min(ts) AS first_view
        FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, min(e.ts) AS first_click
        FROM events e JOIN v USING (user_id)
        WHERE e.event_type = 'click' AND e.ts >= v.first_view
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, min(e.ts) AS first_purchase
        FROM events e JOIN c USING (user_id)
        WHERE e.event_type = 'purchase' AND e.ts >= c.first_click
        GROUP BY e.user_id
    )
    SELECT (SELECT count(*) FROM v) AS viewed,
           (SELECT count(*) FROM c) AS clicked_after_view,
           (SELECT count(*) FROM p) AS purchased_after_click,
           round((SELECT count(*) FROM c) * 1.0 / (SELECT count(*) FROM v), 6)
               AS view_to_click,
           round((SELECT count(*) FROM p) * 1.0 / (SELECT count(*) FROM c), 6)
               AS click_to_purchase
    """,
)
def q81_conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (view -> click after it -> purchase
    after that) per user, then stage totals + rates. Each stage is one
    equi-join + min-aggregate on user_id — three co-partitioned
    shuffles on the same key, no windows over raw events, no
    driver-side state."""
    cat = Catalog(spark, sf_dir)
    ev = cat.events
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") >= F.col("first_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") >= F.col("first_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase"))
    )
    counts = (
        v.agg(F.count(F.lit(1)).alias("viewed"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("clicked_after_view")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("purchased_after_click")))
    )
    # try_divide: an empty funnel stage makes the next rate 0/0 —
    # DuckDB yields NULL where ANSI '/' aborts the whole query
    # (round-12 degenerate-relation sweep: empty corpus, and a
    # single-event corpus with no clicks)
    return counts.select(
        "viewed",
        "clicked_after_view",
        "purchased_after_click",
        F.round(F.try_divide("clicked_after_view", "viewed"), 6).alias(
            "view_to_click"
        ),
        F.round(
            F.try_divide("purchased_after_click", "clicked_after_view"), 6
        ).alias("click_to_purchase"),
    )


@register(
    "q85_winnowing_containment_pairs",
    sql=f"""
    WITH base AS (SELECT doc_id, {_NORM_SQL} AS nm FROM documents),
    g AS (
        SELECT doc_id,
               CASE WHEN len(nm) >= 5
                    THEN list_transform(range(1, len(nm) - 3),
                                        i -> substr(md5(nm[i:i+4]), 1, 8))
                    ELSE [substr(md5(nm), 1, 8)] END AS h
        FROM base
    ),
    fp AS (
        SELECT doc_id, unnest(
               CASE WHEN len(h) >= 4
                    THEN list_distinct(list_transform(range(1, len(h) - 2),
                                       j -> list_aggregate(h[j:j+3], 'min')))
                    ELSE [list_aggregate(h, 'min')] END) AS fingerprint
        FROM g
    ),
    sizes AS (SELECT doc_id, count(*) AS n_fp FROM fp GROUP BY doc_id),
    pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
        FROM fp a JOIN fp b ON a.fingerprint = b.fingerprint
                           AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT p.doc_a, p.doc_b, p.shared,
           round(p.shared / least(sa.n_fp, sb.n_fp), 6) AS containment
    FROM pairs p
    JOIN sizes sa ON sa.doc_id = p.doc_a
    JOIN sizes sb ON sb.doc_id = p.doc_b
    WHERE p.shared / least(sa.n_fp, sb.n_fp) >= 0.8
    ORDER BY doc_a, doc_b
    """,
)
def q85_winnowing_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment candidates from winnowing fingerprints: doc pairs
    whose shared-fingerprint count covers >= 80% of the smaller doc's
    fingerprint set (the copy/quote detector — asymmetric, unlike
    Jaccard, so a short doc embedded in a long one still scores 1.0).

    Candidate generation is a RAREST-PREFIX PROBE (the AllPairs/PPJoin
    principle, adapted to the containment metric), not a full postings
    self-join. Correctness: containment >= t against the smaller set S
    (|S| = n) means at most n - ceil(t·n) of S's fingerprints are
    unshared, so under ANY global fingerprint order the pair must share
    at least k of S's first n - ceil(t·n) + k fingerprints (pigeonhole;
    k=1 is the classic prefix filter, k=2 here); rarest-first
    (df, fingerprint) makes that prefix the cheapest possible probe.
    Only the SMALLER side's prefix is indexed (n_a < n_b, id
    tie-break) against the larger side's full postings, candidates are
    verified by exact intersection of the per-doc fingerprint arrays.

    Why not the plain Σdf² self-join (this query's former shape, still
    q32's — appropriate there for word-3-grams): winnowing mins are
    biased toward globally small hash values, so a corpus with a
    stationary stopword head (ALL real text) concentrates df in a few
    head fingerprints — on the 50k-doc Heaps corpus single stopword-
    pair fingerprints reach df ≈ 35k docs, putting ~10⁹ rows through
    the join for a LINEAR true-pair count. The head fingerprints are
    exactly the ones the rarest-first prefix never indexes.

    Measured regime note (round-8 sf1 decade, SCALING.md): on the fixed
    ~31-type testdata vocabulary df ~ n/V for every fingerprint — even
    the prefix's candidate space grows as n²/V there (alpha measured
    within the documented degenerate ceiling 2.4); the realistic-text
    sub-quadratic claim is MEASURED on the Heaps-law decade
    (SCALING.md round 12)."""
    from pyspark.sql.window import Window

    from flight_delays_progetto_big_data_2024_spark.operators.dedup import (
        winnowing_fingerprints,
    )

    t_eff = 0.8 - 1e-6  # match the rounded >= 0.8 admit rule at the edge
    k_pf = 6  # generalized pigeonhole: among S's rarest u+k fps (u =
    # allowed unshared), at most u are unshared, so >= k must be
    # shared. Each +1 of k costs ONE extra prefix posting per doc and
    #(on tiny-vocab corpora, where random rare-fp overlap is common)
    # roughly halves the candidate mass: measured at sf0.1, k=1 -> 6.6M
    # candidate pairs, k=2 -> 3.4M, k=4 -> 759k, k=6 -> 140k at equal
    # join+aggregate cost. On Heaps-law text candidates are near-linear
    # for any k >= 1; k=6 is for the degenerate regime's verify bill.
    cat = Catalog(spark, sf_dir)
    # fingerprints are 8 hex chars: convert LOSSLESSLY to int64 before
    # anything joins/aggregates/intersects on them — long compares in
    # the posting join and the array verify, ~4x less data (the q54
    # convention; unlike q54's xxhash64 this is collision-free, and the
    # global (df, fingerprint) rank order just becomes numeric order,
    # any total order works for the prefix theorem)
    fp = (
        winnowing_fingerprints(cat.documents)
        .select(
            "doc_id",
            F.conv("fingerprint", 16, 10).cast("long").alias("fingerprint"),
        )
        .persist()
    )
    sizes = fp.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_fp"))
    dfreq = fp.groupBy("fingerprint").agg(F.count(F.lit(1)).alias("df"))
    ranked = (
        fp.join(dfreq, "fingerprint")
        .join(sizes, "doc_id")
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy("df", "fingerprint")
            ),
        )
    )
    prefix = ranked.filter(
        F.col("rk")
        <= F.col("n_fp") - F.ceil(F.lit(t_eff) * F.col("n_fp")) + k_pf
    ).select(
        F.col("doc_id").alias("id_s"),
        F.col("n_fp").alias("n_s"),
        F.col("rk").alias("rk_s"),
        "fingerprint",
    )
    full = ranked.select(
        F.col("doc_id").alias("id_l"),
        F.col("n_fp").alias("n_l"),
        F.col("rk").alias("rk_l"),
        "fingerprint",
    )
    # smaller-side prefix ⋈ larger-side full postings; ties on n fall to
    # the lower id so every unordered pair probes exactly one direction.
    # Positional filter, GROUPED form (q54's pruning, containment
    # bound): shared fingerprints uncounted by the probe come AFTER
    # every counted match in the global (df, fingerprint) order — in
    # BOTH docs' rank sequences — so O ≤ o_pf + min(n_s - p_s,
    # n_l - p_l) with p the last matched ranks; admit only pairs whose
    # bound reaches ceil(t·n_s). On tiny-vocab degenerate corpora this
    # aggregate (not the array verify) is what absorbs the ~n²
    # candidate mass, exactly as in q54.
    cands = (
        prefix.join(full, "fingerprint")
        .filter(
            (F.col("n_s") < F.col("n_l"))
            | ((F.col("n_s") == F.col("n_l")) & (F.col("id_s") < F.col("id_l")))
        )
        .groupBy("id_s", "id_l")
        .agg(
            F.count(F.lit(1)).alias("o_pf"),
            F.max("rk_s").alias("p_s"),
            F.max("rk_l").alias("p_l"),
            F.first("n_s").alias("n_s"),
            F.first("n_l").alias("n_l"),
        )
        .filter(
            # pigeonhole count: shared-in-prefix >= min(k, ceil(t·n_s))
            # (the min handles prefixes that cover the whole small set)
            (
                F.col("o_pf")
                >= F.least(
                    F.lit(k_pf), F.ceil(F.lit(t_eff) * F.col("n_s"))
                )
            )
            # positional bound: counted matches + joint suffix allowance
            # must reach the required shared count
            & (
                F.col("o_pf")
                + F.least(
                    F.col("n_s") - F.col("p_s"), F.col("n_l") - F.col("p_l")
                )
                >= F.ceil(F.lit(t_eff) * F.col("n_s"))
            )
        )
        .select(
            F.least("id_s", "id_l").alias("doc_a"),
            F.greatest("id_s", "id_l").alias("doc_b"),
        )
    )
    # exact verification on per-doc fingerprint arrays (distinct within
    # a doc by construction, so array_intersect == the shared count).
    # shuffle_hash, never broadcast: one row per corpus document with
    # its full fingerprint array — the jaccard_pairs_prefix verify-join
    # OOM class (default-width estimates hide the array volume).
    arrs = fp.groupBy("doc_id").agg(F.collect_list("fingerprint").alias("arr"))
    aa = arrs.select(F.col("doc_id").alias("doc_a"), F.col("arr").alias("arr_a"))
    ab = arrs.select(F.col("doc_id").alias("doc_b"), F.col("arr").alias("arr_b"))
    shared = F.size(F.array_intersect("arr_a", "arr_b"))
    n_min = F.least(F.size("arr_a"), F.size("arr_b"))
    return (
        cands.join(aa.hint("shuffle_hash"), "doc_a")
        .join(ab.hint("shuffle_hash"), "doc_b")
        .withColumn("shared", shared.cast("long"))
        .filter(F.col("shared") / n_min >= 0.8)
        .withColumn("containment", F.round(F.col("shared") / n_min, 6))
        .select("doc_a", "doc_b", "shared", "containment")
        .orderBy("doc_a", "doc_b")
    )


@register(
    "q97_vocabulary_table",
    sql=f"""
    WITH toks AS (
        SELECT unnest({_TOKS_SQL}) AS term FROM documents
    ),
    counts AS (SELECT term, count(*) AS occurrences FROM toks GROUP BY term)
    -- hex(term): DuckDB window sort is NUL-blind (see q59)
    SELECT CAST(row_number() OVER (ORDER BY occurrences DESC, hex(term)) - 1
                AS INTEGER) AS token_id,
           term, occurrences
    FROM counts
    WHERE occurrences >= 5
    ORDER BY token_id
    """,
)
def q97_vocabulary_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-ranked vocabulary with dense token ids (the tokenizer-
    training output): count per term (shuffle is O(V)), min-count
    filter BEFORE the ranking window so the global-sort window only
    ever sees the kept vocabulary. Ties rank lexically — ids are
    deterministic across engines and runs."""
    from pyspark.sql.window import Window

    cat = Catalog(spark, sf_dir)
    counts = (
        cat.documents.select(F.explode(tokens("text")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("occurrences"))
        .filter(F.col("occurrences") >= 5)
    )
    w = Window.orderBy(F.desc("occurrences"), "term")
    return counts.select(
        (F.row_number().over(w) - 1).cast("int").alias("token_id"),
        "term",
        "occurrences",
    ).orderBy("token_id")


@register(
    "q98_training_mixture_plan",
    sql=f"""
    WITH per_source AS (
        SELECT source, sum(len({_TOKS_SQL})) AS src_tokens
        FROM documents GROUP BY source
    ),
    weighted AS (
        SELECT source, src_tokens,
               CASE WHEN source IN ('src0', 'src1', 'src2') THEN 3.0
                    ELSE 1.0 END AS weight
        FROM per_source
    ),
    tot AS (SELECT sum(weight) AS wsum FROM weighted)
    SELECT source,
           CAST(src_tokens AS BIGINT) AS src_tokens,
           round(weight / wsum, 6) AS mixture_share,
           CAST(round(1000000 * weight / wsum) AS BIGINT) AS target_tokens,
           round(1000000 * weight / wsum / src_tokens, 4) AS epochs_needed
    FROM weighted, tot
    ORDER BY source
    """,
)
def q98_training_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture planner: given per-source upsampling weights and
    a 1M-token budget, each source's share, target tokens, and the
    epochs (repeat factor) needed to supply them — the over-epoching
    diagnostic (epochs >> 1 on a high-weight tiny source means
    memorization risk). One aggregate + a broadcast 1-row weight-sum
    join; weights decode via a when-chain (SURVEY F10 pattern)."""
    cat = Catalog(spark, sf_dir)
    budget = 1_000_000
    per_source = cat.documents.groupBy("source").agg(
        F.sum(token_count("text")).alias("src_tokens")
    )
    weighted = per_source.withColumn(
        "weight",
        F.when(F.col("source").isin("src0", "src1", "src2"), F.lit(3.0)).otherwise(
            F.lit(1.0)
        ),
    )
    tot = weighted.agg(F.sum("weight").alias("wsum"))
    share = F.col("weight") / F.col("wsum")
    return (
        weighted.crossJoin(F.broadcast(tot))
        .select(
            "source",
            F.col("src_tokens").cast("long").alias("src_tokens"),
            F.round(share, 6).alias("mixture_share"),
            F.round(budget * share).cast("long").alias("target_tokens"),
            # try_divide: a source whose surviving docs carry zero
            # tokens has UNDEFINED epochs (DuckDB x/0 -> NULL; ANSI
            # Spark would abort the whole plan on one dirty source)
            F.round(F.try_divide(budget * share, F.col("src_tokens")), 4).alias(
                "epochs_needed"
            ),
        )
        .orderBy("source")
    )


@register(
    "q100_quality_weighted_sample",
    sql=f"""
    WITH base AS (
        SELECT doc_id, source, {_TOKS_SQL} AS toks, len(text) AS n,
               len(text) - len(regexp_replace(text, '[.,!?;:''"]', '', 'g')) AS n_punct
        FROM documents
    ),
    m AS (
        SELECT doc_id, source,
               CAST(len(toks) AS BIGINT) AS n_tokens,
               CASE WHEN len(toks) > 0
                    THEN list_aggregate(list_transform(toks, t -> len(t)), 'sum')::DOUBLE
                         / len(toks) END AS atl,
               CASE WHEN len(toks) > 0
                    THEN len(list_distinct(toks))::DOUBLE / len(toks) END AS diversity,
               CASE WHEN n > 0 THEN n_punct::DOUBLE / n ELSE 0.0 END AS pr
        FROM base
    ),
    scored AS (
        SELECT doc_id, source,
               CASE WHEN n_tokens = 0 THEN 0.0
                    ELSE round(0.6 * diversity
                               + 0.4 * (CASE WHEN atl >= 3.0 AND atl <= 8.0
                                             THEN 1.0 ELSE 0.5 END)
                               - pr, 6) END AS quality
        FROM m
    ),
    kept AS (
        SELECT doc_id, source, quality FROM scored
        WHERE CAST(('0x' || substr(md5(doc_id::VARCHAR || 'w'), 1, 4))::INTEGER
                   AS DOUBLE) / 65536.0
              < least(greatest(quality, 0.0), 1.0)
    )
    SELECT source, count(*) AS n_kept,
           round(avg(quality), 6) AS avg_kept_quality
    FROM kept GROUP BY source ORDER BY source
    """,
)
def q100_quality_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted corpus sampling: each doc's keep probability IS
    its quality score (operators.sampling.weighted_sample) — the
    soft-curation alternative to q74's hard percentile cut. Hash-based
    Bernoulli, so the kept set is deterministic under retries and
    repartitioning; the oracle replays the identical md5 decision."""
    from flight_delays_progetto_big_data_2024_spark.operators.sampling import (
        weighted_sample,
    )

    cat = Catalog(spark, sf_dir)
    scored = cat.documents.select(
        "doc_id", "source", quality_score("text").alias("quality")
    )
    kept = weighted_sample(scored, "quality")
    return (
        kept.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.round(F.avg("quality"), 6).alias("avg_kept_quality"),
        )
        .orderBy("source")
    )


@register(
    "q101_zscore_normalization",
    sql=f"""
    WITH ev AS (
        -- z-scores are defined over real MOMENT measurements only:
        -- one Inf value makes DuckDB's stddev_samp raise OUT OF RANGE
        -- where Spark yields NaN (wave-5 Inf-probe finding), and a
        -- FINITE value past ~1.34e154 overflows the squared deviation
        -- the same way (round-10 measure-axis probe: planted +DBL_MAX
        -- crashed this oracle while Spark returned Inf z-scores) —
        -- both engines share operators.prep.MEASURE_DOMAIN_BOUND,
        -- interpolated here as _MOMENT_VALUE_SQL
        SELECT event_type, value FROM events
        WHERE {_MOMENT_VALUE_SQL}
    ),
    stats AS (
        SELECT event_type,
               avg(value) AS mu,
               stddev_samp(value) AS sigma
        FROM ev GROUP BY event_type
    ),
    normed AS (
        SELECT e.event_type, (e.value - s.mu) / s.sigma AS z
        FROM ev e JOIN stats s USING (event_type)
    )
    SELECT event_type,
           count(*) AS n,
           round(avg(z), 6) + 0.0 AS z_mean,
           round(stddev_samp(z), 6) AS z_std,
           round(max(abs(z)), 4) AS max_abs_z
    FROM normed GROUP BY event_type ORDER BY event_type
    """,
)
def q101_zscore_normalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score feature normalization (train-time stats applied
    back to the data): group stats via ONE aggregate, applied through a
    broadcastable stats join — NOT a window over raw events, which
    would sort every partition of the fact table to compute two
    numbers per group. Output checks mean~0 / std~1 and flags outliers
    via max |z|.

    z_mean adds +0.0 in BOTH engines: round(avg(z), 6) lands exactly on
    IEEE -0.0 in DuckDB for some groups while Spark emits +0.0 —
    numerically equal, but byte-distinguishable by a value hash. The
    explicit +0.0 normalizes negative zero to +0.0 on both sides.

    Measurement domain (round-10 measure-axis probe closed the round-6
    "oracle-side limitation"): second-moment statistics exclude
    |value| >= operators.prep.MEASURE_DOMAIN_BOUND in BOTH engines —
    past ~1.34e154 a squared deviation overflows double and the
    engines diverge (DuckDB stddev_samp raises OUT OF RANGE; Spark's
    M2 accumulator saturates to Inf and every z-score in the group
    turns to garbage). A z-score over such a value is not a defined
    statistic, so the domain bound is the semantics, not a test
    workaround — the EUCLID_NORM_BOUND resolution applied to the
    measure axis."""
    from flight_delays_progetto_big_data_2024_spark.operators.prep import (
        is_moment_measurement,
    )

    cat = Catalog(spark, sf_dir)
    # defined moment measurements only (see oracle comment)
    ev = cat.events.filter(is_moment_measurement("value"))
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sigma")
    )
    # try_divide: a ZERO-VARIANCE group (every measurement identical —
    # the round-11 constant-valued event_type probe) has sigma = 0 and
    # an UNDEFINED z; DuckDB's double x/0 yields NULL, ANSI Spark's
    # plain '/' aborts the whole query on one such group. NULL z rows
    # still count toward n (count(*) semantics in both engines).
    normed = ev.join(F.broadcast(stats), "event_type").select(
        "event_type",
        F.try_divide(F.col("value") - F.col("mu"), F.col("sigma")).alias("z"),
    )
    return (
        normed.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.round(F.avg("z"), 6) + F.lit(0.0)).alias("z_mean"),
            F.round(F.stddev_samp("z"), 6).alias("z_std"),
            F.round(F.max(F.abs("z")), 4).alias("max_abs_z"),
        )
        .orderBy("event_type")
    )


@register(
    "q102_cluster_best_representative",
    sql=f"""
    WITH base AS (
        SELECT doc_id, {_TOKS_SQL} AS toks, len(text) AS n,
               len(text) - len(regexp_replace(text, '[.,!?;:''"]', '', 'g')) AS n_punct,
               md5({_NORM_SQL}) AS h
        FROM documents
    ),
    m AS (
        SELECT doc_id, h,
               CAST(len(toks) AS BIGINT) AS n_tokens,
               CASE WHEN len(toks) > 0
                    THEN list_aggregate(list_transform(toks, t -> len(t)), 'sum')::DOUBLE
                         / len(toks) END AS atl,
               CASE WHEN len(toks) > 0
                    THEN len(list_distinct(toks))::DOUBLE / len(toks) END AS diversity,
               CASE WHEN n > 0 THEN n_punct::DOUBLE / n ELSE 0.0 END AS pr
        FROM base
    ),
    scored AS (
        SELECT doc_id, h,
               CASE WHEN n_tokens = 0 THEN 0.0
                    ELSE round(0.6 * diversity
                               + 0.4 * (CASE WHEN atl >= 3.0 AND atl <= 8.0
                                             THEN 1.0 ELSE 0.5 END)
                               - pr, 6) END AS quality
        FROM m
    ),
    ranked AS (
        SELECT doc_id, h, quality,
               row_number() OVER (
                   PARTITION BY h ORDER BY quality DESC, doc_id
               ) AS rn,
               count(*) OVER (PARTITION BY h) AS cluster_size
        FROM scored
    )
    SELECT CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
           CAST(max(cluster_size) AS BIGINT) AS largest_cluster,
           round(avg(CASE WHEN rn = 1 THEN quality END), 6) AS avg_kept_quality
    FROM ranked
    """,
)
def q102_cluster_best_representative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup with QUALITY-AWARE survivor selection: within each
    exact-duplicate cluster (normalized-text hash) keep the highest-
    quality copy, not an arbitrary one — `dropDuplicates` keeps
    whichever row a partition happened to see first, which silently
    biases the kept corpus. One window over (hash) with a
    deterministic (quality desc, doc_id) order; same pattern plugs
    into q58's near-dup components as the cluster key."""
    from pyspark.sql.window import Window

    cat = Catalog(spark, sf_dir)
    scored = cat.documents.select(
        "doc_id",
        fingerprint("text").alias("h"),
        quality_score("text").alias("quality"),
    )
    w = Window.partitionBy("h").orderBy(F.desc("quality"), "doc_id")
    ranked = scored.select(
        "quality",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("h")).alias("cluster_size"),
    )
    return ranked.agg(
        F.sum(F.when(F.col("rn") == 1, 1).otherwise(0)).cast("long").alias("n_kept"),
        F.sum(F.when(F.col("rn") > 1, 1).otherwise(0)).cast("long").alias("n_dropped"),
        F.max("cluster_size").cast("long").alias("largest_cluster"),
        F.round(F.avg(F.when(F.col("rn") == 1, F.col("quality"))), 6).alias(
            "avg_kept_quality"
        ),
    )


@register(
    "q103_corpus_snapshot_diff",
    sql=f"""
    -- NULL is not a key: an unkeyed doc can't be matched across
    -- snapshots, and a USING-join leaves BOTH sides' key NULL for it,
    -- double-counting it as added AND removed (round-7 dirty sweep)
    WITH v1 AS (SELECT doc_id, md5({_NORM_SQL}) AS h FROM documents
                WHERE doc_id IS NOT NULL),
    v2 AS (
        SELECT doc_id,
               CASE WHEN doc_id % 7 = 0
                    THEN md5(trim(regexp_replace(translate(text || ' rev2', 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'),
                                                 '{_WS_SQL}+', ' ', 'g')))
                    ELSE md5({_NORM_SQL}) END AS h
        FROM documents WHERE doc_id % 10 <> 0 AND doc_id IS NOT NULL
    )
    SELECT CAST(sum(CASE WHEN v1.doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS added,
           CAST(sum(CASE WHEN v2.doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS removed,
           CAST(sum(CASE WHEN v1.doc_id IS NOT NULL AND v2.doc_id IS NOT NULL
                          AND v1.h <> v2.h THEN 1 ELSE 0 END) AS BIGINT)
               AS changed,
           CAST(sum(CASE WHEN v1.h = v2.h THEN 1 ELSE 0 END) AS BIGINT)
               AS unchanged
    FROM v1 FULL OUTER JOIN v2 USING (doc_id)
    """,
)
def q103_corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus snapshot diff (the data-versioning primitive: what changed
    between two corpus builds): FULL OUTER join on doc_id, rows
    classified added/removed/changed/unchanged by comparing content
    fingerprints — so a re-crawl that rewrote bytes but not normalized
    content counts as unchanged. One co-partitioned join + a 1-row
    rollup; v2 is simulated deterministically (every 10th doc dropped,
    every 7th edited) so the oracle replays it exactly."""
    cat = Catalog(spark, sf_dir)
    # explicit presence markers: a NULL-TEXT doc has a NULL fingerprint
    # (md5(NULL)), so "h IS NULL" conflated 'row absent from this
    # snapshot' with 'row present with unreadable content' and counted
    # every NULL-text doc as added AND removed (round-7 dirty sweep);
    # the oracle classifies by side-key nullness, which markers mirror.
    # A NULL-h doc present in BOTH snapshots lands in NO bucket: its
    # content can't be compared, the same rule in both engines (NULL
    # <> NULL and NULL = NULL are both unknown). NULL doc_ids are
    # dropped at the scan — NULL is not a key, a row no join can match
    # is in neither snapshot's key space.
    v1 = cat.documents.filter(F.col("doc_id").isNotNull()).select(
        "doc_id", fingerprint("text").alias("h"), F.lit(1).alias("__in_v1")
    )
    v2 = (
        cat.documents.filter(
            (F.col("doc_id") % 10 != 0) & F.col("doc_id").isNotNull()
        )
        .select(
            "doc_id",
            F.when(
                F.col("doc_id") % 7 == 0,
                fingerprint(F.concat(F.col("text"), F.lit(" rev2"))),
            )
            .otherwise(fingerprint("text"))
            .alias("h"),
            F.lit(1).alias("__in_v2"),
        )
    )
    j = v1.alias("a").join(v2.alias("b"), "doc_id", "full_outer")
    ah, bh = F.col("a.h"), F.col("b.h")
    in1, in2 = F.col("a.__in_v1"), F.col("b.__in_v2")
    return j.agg(
        F.sum(F.when(in1.isNull(), 1).otherwise(0)).cast("long").alias("added"),
        F.sum(F.when(in2.isNull(), 1).otherwise(0)).cast("long").alias("removed"),
        F.sum(
            F.when(in1.isNotNull() & in2.isNotNull() & (ah != bh), 1).otherwise(0)
        ).cast("long").alias("changed"),
        F.sum(F.when(ah == bh, 1).otherwise(0)).cast("long").alias("unchanged"),
    )


@register(
    "q104_sliding_window_chunks",
    sql=f"""
    WITH docs AS (
        SELECT source, len({_TOKS_SQL}) AS n FROM documents
    ),
    chunks AS (
        SELECT source, n,
               unnest(list_transform(
                   list_filter(range(0, n, 32), s -> s = 0 OR s - 32 + 40 < n),
                   s -> least(40, n - s))) AS n_chunk_tokens
        FROM docs WHERE n > 0
    )
    SELECT source,
           count(*) AS n_chunks,
           round(avg(n_chunk_tokens), 4) AS avg_chunk_tokens,
           round(sum(CASE WHEN n_chunk_tokens = 40 THEN 1 ELSE 0 END) * 1.0
                 / count(*), 6) AS full_chunk_frac
    FROM chunks GROUP BY source ORDER BY source
    """,
)
def q104_sliding_window_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking (chunk 40 tokens, stride 32)
    through a Python UDTF in a LATERAL join —
    operators.sampling.chunk_documents_udtf; the variable-rows-per-doc
    generator shape that neither explode-of-expression nor mapInPandas
    states as directly. The oracle replays the chunk-start rule in
    pure SQL, so the UDTF's Python is value-checked row for row."""
    from flight_delays_progetto_big_data_2024_spark.operators.sampling import (
        chunk_documents_udtf,
    )

    cat = Catalog(spark, sf_dir)
    chunk_documents_udtf(spark)
    cat.documents.createOrReplaceTempView("v_docs_chunking")
    return spark.sql(
        """
        SELECT source,
               count(*) AS n_chunks,
               round(avg(c.n_chunk_tokens), 4) AS avg_chunk_tokens,
               round(sum(CASE WHEN c.n_chunk_tokens = 40 THEN 1 ELSE 0 END)
                     / count(*), 6) AS full_chunk_frac
        FROM v_docs_chunking, LATERAL chunk_doc(text, 40, 32) c
        GROUP BY source ORDER BY source
        """
    )


@register(
    "q108_source_kl_divergence",
    sql=f"""
    WITH toks AS (
        SELECT source, unnest({_TOKS_SQL}) AS term FROM documents
    ),
    src_counts AS (
        SELECT source, term, count(*) AS c FROM toks GROUP BY source, term
    ),
    src_totals AS (
        SELECT source, sum(c) AS n FROM src_counts GROUP BY source
    ),
    corpus AS (
        SELECT term, sum(c) AS cc FROM src_counts GROUP BY term
    ),
    corpus_total AS (SELECT sum(cc) AS nn FROM corpus)
    SELECT s.source,
           CAST(count(*) AS BIGINT) AS vocab_used,
           round(sum((s.c / t.n) * ln((s.c / t.n) / (q.cc / ct.nn))), 6)
               AS kl_from_corpus
    FROM src_counts s
    JOIN src_totals t USING (source)
    JOIN corpus q USING (term)
    CROSS JOIN corpus_total ct
    GROUP BY s.source
    ORDER BY s.source
    """,
)
def q108_source_kl_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution drift per source: KL(source unigram dist ‖ corpus
    unigram dist) — the standard check that one slice of a training mix
    isn't lexically alien (or duplicated boilerplate). Finite without
    smoothing because every source term exists in the corpus
    distribution by construction. Shuffles carry (source, term) counts
    — vocabulary-sized; corpus totals ride broadcast joins."""
    cat = Catalog(spark, sf_dir)
    src_counts = (
        cat.documents.select("source", F.explode(tokens("text")).alias("term"))
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).alias("c"))
    ).persist()
    src_totals = src_counts.groupBy("source").agg(F.sum("c").alias("n"))
    corpus = src_counts.groupBy("term").agg(F.sum("c").alias("cc"))
    corpus_total = corpus.agg(F.sum("cc").alias("nn"))
    p = F.col("c") / F.col("n")
    q = F.col("cc") / F.col("nn")
    return (
        src_counts.join(src_totals, "source")
        .join(corpus, "term")
        .crossJoin(F.broadcast(corpus_total))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("vocab_used"),
            F.round(F.sum(p * F.log(p / q)), 6).alias("kl_from_corpus"),
        )
        .orderBy("source")
    )


@register(
    "q109_customer_revenue_gini",
    sql="""
    WITH per_cust AS (
        SELECT o_custkey, sum(o_totalprice) AS revenue
        FROM orders
        -- NULL is not a customer; and a customer whose revenue is
        -- undefined cannot be ranked (Spark ranks NULLs FIRST, DuckDB
        -- LAST — every index i would shift differently)
        WHERE o_custkey IS NOT NULL
        GROUP BY o_custkey
        HAVING sum(o_totalprice) IS NOT NULL
    ),
    ranked AS (
        SELECT revenue,
               row_number() OVER (ORDER BY revenue, o_custkey) AS i,
               count(*) OVER () AS n,
               sum(revenue) OVER () AS total
        FROM per_cust
    )
    SELECT CAST(any_value(n) AS BIGINT) AS n_customers,
           round(any_value(total), 2) AS total_revenue,
           round(2.0 * sum(i * revenue) / (any_value(n) * any_value(total))
                 - (any_value(n) + 1.0) / any_value(n), 6) AS gini
    FROM ranked
    """,
)
def q109_customer_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration (Gini coefficient) over customers, via the
    rank formula G = 2·Σ(i·x_i)/(n·Σx) - (n+1)/n on revenue sorted
    ascending. The global rank window runs over the per-customer
    AGGREGATE (orders of magnitude smaller than the fact table) —
    the same post-aggregation global-window pattern as q67/q91, with
    o_custkey tiebreaking equal revenues for engine-portable ranks
    (the formula's value is tie-order-invariant, the check is
    belt-and-braces)."""
    from pyspark.sql.window import Window

    cat = Catalog(spark, sf_dir)
    per_cust = (
        # NULL is not a customer; undefined revenue cannot be ranked
        cat.orders.filter(F.col("o_custkey").isNotNull())
        .groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("revenue"))
        .filter(F.col("revenue").isNotNull())
    )
    w = Window.orderBy("revenue", "o_custkey")
    ranked = per_cust.select(
        "revenue",
        F.row_number().over(w).alias("i"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
        F.sum("revenue").over(Window.partitionBy()).alias("total"),
    )
    return ranked.agg(
        F.any_value("n").cast("long").alias("n_customers"),
        F.round(F.any_value("total"), 2).alias("total_revenue"),
        F.round(
            2.0 * F.sum(F.col("i") * F.col("revenue"))
            / (F.any_value("n") * F.any_value("total"))
            - (F.any_value("n") + 1.0) / F.any_value("n"),
            6,
        ).alias("gini"),
    )


@register(
    "q114_cosine_histogram_sampled",
    sql=f"""
    WITH n AS (
        SELECT * FROM ({_EMB_PREP_SQL})
        WHERE substr(md5(CAST(vec_id AS VARCHAR)), 1, 1) < '4'
    ),
    pairs AS (
        SELECT round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) AS cosine
        -- same-dim pairs only (pair-level dimension domain, round-10)
        FROM n a JOIN n b ON a.vec_id < b.vec_id AND len(a.v) = len(b.v)
    )
    SELECT CAST(floor(cosine * 10) AS BIGINT) AS bucket,
           count(*)::BIGINT AS n_sampled,
           (count(*) * 16)::BIGINT AS est_pairs
    FROM pairs GROUP BY bucket ORDER BY bucket
    """,
)
def q114_cosine_histogram_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimated cosine-pair histogram from a deterministic md5 row
    sample (rate 4/16) — the variant of q31 that still runs at 100 TB.
    The exact all-pairs form is quadratic by semantics; this keeps the
    same blocked-GEMM plan but only over the sampled rows (256× less
    GEMM work at rate 1/16... here 1/4 → 16×) and reports both the
    sampled bucket counts and the 1/p²-scaled unbiased estimate. The
    oracle replays the identical md5 row filter, so the comparison is
    exact, not statistical (operators.similarity.sampled_cosine_histogram)."""
    from flight_delays_progetto_big_data_2024_spark.operators.similarity import (
        sampled_cosine_histogram,
    )

    cat = Catalog(spark, sf_dir)
    return sampled_cosine_histogram(cat.embeddings)


@register(
    "q115_embedding_near_dup_clusters",
    sql=f"""
    WITH RECURSIVE n AS ({_EMB_PREP_SQL}),
    p AS (
        -- same-dim pairs only (pair-level dimension domain, round-10):
        -- the len equality rides the JOIN so the dot never evaluates
        -- on a mismatched pair (DuckDB raises there)
        SELECT a.vec_id AS id_a, b.vec_id AS id_b
        FROM n a JOIN n b ON a.vec_id < b.vec_id AND len(a.v) = len(b.v)
        WHERE round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) >= 0.35
    ),
    e AS (
        SELECT id_a AS u, id_b AS v FROM p
        UNION
        SELECT id_b AS u, id_a AS v FROM p
    ),
    r(id, comp) AS (
        SELECT vec_id, vec_id FROM embeddings
        UNION
        SELECT e.u, r.comp FROM e JOIN r ON r.id = e.v
    )
    SELECT id AS vec_id, min(comp) AS cluster_id, id = min(comp) AS is_kept
    FROM r GROUP BY id
    """,
)
def q115_embedding_near_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup collapse — the semantic-dedup analogue
    of q58's lexical version: exact cosine pairs >= 0.35
    (operators.similarity.cosine_pairs, blocked GEMM) become undirected
    edges; connected components label each vector with its cluster's
    min id; one representative (is_kept) survives per cluster. The
    0.35 threshold sits at the ~99.9th percentile of this corpus's pair
    distribution (profiled via q114) — in production the threshold
    comes from exactly that histogram read. Oracle = DuckDB
    recursive-CTE reachability over the same exact pair predicate."""
    from flight_delays_progetto_big_data_2024_spark.graph.algorithms import (
        connected_components,
    )
    from flight_delays_progetto_big_data_2024_spark.operators.similarity import (
        cosine_pairs,
    )

    cat = Catalog(spark, sf_dir)
    pairs = cosine_pairs(cat.embeddings, threshold=0.35)
    cc = connected_components(
        pairs,
        "id_a",
        "id_b",
        vertices=cat.embeddings.select(F.col("vec_id").alias("id")),
    )
    return cc.select(
        F.col("id").alias("vec_id"),
        F.col("component").alias("cluster_id"),
        (F.col("id") == F.col("component")).alias("is_kept"),
    )


@register(
    "q116_token_entropy_by_source",
    sql=f"""
    WITH tok AS (
        SELECT source, doc_id, unnest({_TOKS_SQL}) AS term FROM documents
    ),
    tf AS (
        SELECT source, doc_id, term, count(*) AS c
        FROM tok GROUP BY source, doc_id, term
    ),
    per_doc AS (
        SELECT source, doc_id,
               sum(c)::BIGINT AS n,
               count(*)::BIGINT AS n_types,
               round(ln(sum(c)) - sum(c * ln(c)) / sum(c), 6) AS entropy,
               round(count(*)::DOUBLE / sum(c), 6) AS ttr
        FROM tf GROUP BY source, doc_id
    )
    SELECT source,
           count(*)::BIGINT AS n_docs,
           round(avg(entropy), 6) AS avg_entropy,
           round(avg(ttr), 6) AS avg_ttr
    FROM per_doc GROUP BY source ORDER BY source
    """,
)
def q116_token_entropy_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram token entropy per document (H = ln n - Σc·ln c / n, the
    numerically stable form) and type-token ratio, averaged per source
    — the lexical-diversity quality signal that separates template/spam
    sources from natural text in a curation pipeline. Two keyed
    shuffles (doc×term, then doc), both map-side combinable; per-doc
    values round at 1e-6 before the source average so both engines
    aggregate identical multisets."""
    cat = Catalog(spark, sf_dir)
    # ensure_scan_width (round-12): tokenize + explode + the map-side
    # partial of the (doc, term) count all precede the first exchange —
    # single-task on the narrow scan (1.27s -> 0.82s at sf0.1)
    tf = (
        ensure_scan_width(cat.documents, "doc_id")
        .select("source", "doc_id", F.explode(tokens("text")).alias("term"))
        .groupBy("source", "doc_id", "term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    per_doc = tf.groupBy("source", "doc_id").agg(
        F.sum("c").alias("n"),
        F.count(F.lit(1)).alias("n_types"),
        F.round(
            F.log(F.sum("c")) - F.sum(F.col("c") * F.log("c")) / F.sum("c"), 6
        ).alias("entropy"),
        F.round(F.count(F.lit(1)) / F.sum("c"), 6).alias("ttr"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("entropy"), 6).alias("avg_entropy"),
            F.round(F.avg("ttr"), 6).alias("avg_ttr"),
        )
        .orderBy("source")
    )


@register(
    "q117_zipf_slope",
    sql=f"""
    WITH tok AS (
        SELECT unnest({_TOKS_SQL}) AS term FROM documents
    ),
    tf AS (SELECT term, count(*)::BIGINT AS freq FROM tok GROUP BY term),
    top AS (
        -- hex(term): DuckDB's window AND large top-level sorts are
        -- NUL-blind (see q59) — both the rank and the limit boundary
        -- must use the byte-order encoding
        SELECT term, freq,
               row_number() OVER (ORDER BY freq DESC, hex(term)) AS rnk
        FROM tf ORDER BY freq DESC, hex(term) LIMIT 100
    )
    SELECT count(*)::BIGINT AS n_terms,
           round(regr_slope(ln(freq), ln(rnk)), 6) AS zipf_slope,
           round(regr_intercept(ln(freq), ln(rnk)), 6) AS zipf_intercept
    FROM top
    """,
)
def q117_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law fit over the top-100 term frequencies: OLS slope of
    ln(freq) on ln(rank) — the corpus-health diagnostic (natural text
    sits near -1; template/boilerplate corpora flatten). The top-k is a
    TakeOrderedAndProject (distributed, no full-vocabulary window); the
    rank window then runs over exactly 100 rows, so the unpartitioned
    Window is O(k), not a single-task funnel over the vocabulary."""
    tf = (
        Catalog(spark, sf_dir)
        .documents.select(F.explode(tokens("text")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    top = tf.orderBy(F.desc("freq"), "term").limit(100)
    from pyspark.sql.window import Window

    ranked = top.select(
        "freq", F.row_number().over(Window.orderBy(F.desc("freq"), "term")).alias("rnk")
    )
    return ranked.agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.round(F.regr_slope(F.log("freq"), F.log("rnk")), 6).alias("zipf_slope"),
        F.round(
            F.regr_intercept(F.log("freq"), F.log("rnk")), 6
        ).alias("zipf_intercept"),
    )


@register(
    "q121_dup_rate_by_source",
    sql=f"""
    WITH RECURSIVE sh AS ({_SHINGLES_SQL}),
    p AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE round(len(list_intersect(a.s, b.s))::DOUBLE
                    / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))),
                    6) >= 0.5
    ),
    e AS (
        SELECT id_a AS u, id_b AS v FROM p
        UNION
        SELECT id_b AS u, id_a AS v FROM p
    ),
    r(id, comp) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.u, r.comp FROM e JOIN r ON r.id = e.v
    ),
    comp AS (SELECT id AS doc_id, min(comp) AS cluster_id FROM r GROUP BY id),
    sizes AS (SELECT cluster_id, count(*) AS n FROM comp GROUP BY cluster_id)
    SELECT d.source,
           count(*)::BIGINT AS n_docs,
           sum(CASE WHEN s.n > 1 THEN 1 ELSE 0 END)::BIGINT AS n_in_dup_clusters,
           sum(CASE WHEN c.doc_id <> c.cluster_id THEN 1 ELSE 0 END)::BIGINT
               AS n_removable,
           round(sum(CASE WHEN c.doc_id <> c.cluster_id THEN 1 ELSE 0 END)::DOUBLE
                 / count(*), 6) AS dup_rate
    FROM comp c
    JOIN sizes s ON s.cluster_id = c.cluster_id
    JOIN documents d ON d.doc_id = c.doc_id
    GROUP BY d.source ORDER BY d.source
    """,
)
def q121_dup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup ANALYTICS: which sources are polluting the corpus? Joins
    q58's near-dup clusters back to document provenance and reports,
    per source, how many docs sit in multi-doc clusters and how many a
    keep-min-id collapse would remove — the report that drives
    source-level crawl policy. Cluster labels are O(docs) after the
    pair stage, so the added cost over q58 is two broadcast-sized
    joins and a source rollup."""
    from flight_delays_progetto_big_data_2024_spark.graph.algorithms import (
        connected_components,
    )

    cat = Catalog(spark, sf_dir)
    docs = cat.documents
    pairs = jaccard_pairs(docs, "doc_id", "text", k=3, threshold=0.5)
    cc = connected_components(
        pairs, "id_a", "id_b",
        vertices=docs.select(F.col("doc_id").alias("id")),
    )
    sizes = cc.groupBy("component").agg(F.count(F.lit(1)).alias("n"))
    labeled = (
        cc.join(sizes, "component")
        .join(docs.select("doc_id", "source"), cc["id"] == F.col("doc_id"))
    )
    return (
        labeled.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("n") > 1, 1).otherwise(0)).alias(
                "n_in_dup_clusters"
            ),
            F.sum(
                F.when(F.col("id") != F.col("component"), 1).otherwise(0)
            ).alias("n_removable"),
            F.round(
                F.sum(F.when(F.col("id") != F.col("component"), 1).otherwise(0))
                / F.count(F.lit(1)),
                6,
            ).alias("dup_rate"),
        )
        .orderBy("source")
    )


@register(
    "q122_group_holdout_split",
    sql=f"""
    WITH s AS (
        SELECT CASE
                 WHEN substr(md5(source), 1, 4) < 'cccc' THEN 'train'
                 WHEN substr(md5(source), 1, 4) < 'e666' THEN 'val'
                 ELSE 'test'
               END AS split,
               source,
               len({_TOKS_SQL}) AS n_toks
        FROM documents
    )
    SELECT split,
           count(DISTINCT source)::BIGINT AS n_sources,
           count(*)::BIGINT AS n_docs,
           round(avg(n_toks), 4) AS avg_tokens
    FROM s GROUP BY split ORDER BY split
    """,
)
def q122_group_holdout_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP-level train/val/test assignment: the split key is the
    SOURCE, not the document, so every document of a source lands in
    the same split — the standard defense against near-dup leakage
    across splits when a source re-publishes the same content (row-
    level splits leak; q57 is the row-level variant). Same
    content-deterministic md5 bucketing (operators.sampling.hash_split
    with id_col='source'), still a pure projection — no shuffle."""
    cat = Catalog(spark, sf_dir)
    return (
        hash_split(cat.documents, id_col="source")
        .groupBy("split")
        .agg(
            F.countDistinct("source").alias("n_sources"),
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg(token_count("text")), 4).alias("avg_tokens"),
        )
        .orderBy("split")
    )


@register(
    "q123_cluster_safe_split",
    sql=f"""
    WITH RECURSIVE sh AS ({_SHINGLES_SQL}),
    p AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE round(len(list_intersect(a.s, b.s))::DOUBLE
                    / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))),
                    6) >= 0.5
    ),
    e AS (
        SELECT id_a AS u, id_b AS v FROM p
        UNION
        SELECT id_b AS u, id_a AS v FROM p
    ),
    r(id, comp) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.u, r.comp FROM e JOIN r ON r.id = e.v
    ),
    comp AS (SELECT id AS doc_id, min(comp) AS cluster_id FROM r GROUP BY id),
    s AS (
        SELECT CASE
                 WHEN substr(md5(cluster_id::VARCHAR), 1, 4) < 'cccc' THEN 'train'
                 WHEN substr(md5(cluster_id::VARCHAR), 1, 4) < 'e666' THEN 'val'
                 ELSE 'test'
               END AS split,
               cluster_id, doc_id
        FROM comp
    )
    SELECT split,
           count(DISTINCT cluster_id)::BIGINT AS n_clusters,
           count(*)::BIGINT AS n_docs,
           sum(CASE WHEN doc_id <> cluster_id THEN 1 ELSE 0 END)::BIGINT
               AS n_dup_docs
    FROM s GROUP BY split ORDER BY split
    """,
)
def q123_cluster_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contamination-safe split: the split key is the NEAR-DUP CLUSTER
    id, so a document and its near-duplicates can never straddle
    train/test — the leakage that silently inflates eval scores when
    dedup and splitting are run independently. Composition of q58's
    connected components with q57's deterministic hash split, keyed on
    the cluster label instead of the doc id."""
    from flight_delays_progetto_big_data_2024_spark.graph.algorithms import (
        connected_components,
    )

    docs = Catalog(spark, sf_dir).documents
    pairs = jaccard_pairs(docs, "doc_id", "text", k=3, threshold=0.5)
    cc = connected_components(
        pairs, "id_a", "id_b",
        vertices=docs.select(F.col("doc_id").alias("id")),
    )
    split = hash_split(
        cc.select(
            F.col("id").alias("doc_id"), F.col("component").alias("cluster_id")
        ),
        id_col="cluster_id",
    )
    return (
        split.groupBy("split")
        .agg(
            F.countDistinct("cluster_id").alias("n_clusters"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                F.when(F.col("doc_id") != F.col("cluster_id"), 1).otherwise(0)
            ).alias("n_dup_docs"),
        )
        .orderBy("split")
    )


@register(
    "q124_unigram_surprisal_filter",
    sql=f"""
    WITH dtf AS (
        SELECT doc_id, any_value(source) AS source, term, count(*) AS c_dt
        FROM (SELECT doc_id, source, unnest({_TOKS_SQL}) AS term FROM documents)
        GROUP BY doc_id, term
    ),
    tf AS (SELECT term, sum(c_dt) AS c FROM dtf GROUP BY term),
    n AS (SELECT sum(c) AS total FROM tf),
    doc_s AS (
        SELECT d.doc_id, any_value(d.source) AS source,
               sum(d.c_dt) AS n_toks,
               round(sum(d.c_dt * -ln(tf.c / n.total)) / sum(d.c_dt), 6)
                   AS surprisal
        FROM dtf d JOIN tf ON tf.term = d.term CROSS JOIN n
        GROUP BY d.doc_id
    )
    SELECT source,
           count(*)::BIGINT AS n_docs,
           round(avg(surprisal), 6) AS avg_surprisal,
           sum(CASE WHEN surprisal >= 3.41 THEN 1 ELSE 0 END)::BIGINT
               AS n_flagged
    FROM doc_s GROUP BY source ORDER BY source
    """,
)
def q124_unigram_surprisal_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-style quality filter with a self-trained unigram LM:
    per-document mean surprisal -ln p(token) under the corpus's own
    unigram distribution — the cheap LM-scoring filter every pretraining
    pipeline runs before the expensive model-based one (high surprisal =
    rare-token soup; low = boilerplate). The 3.41 flag threshold is the
    ~90th percentile of this corpus's per-doc surprisal — in production
    it comes from exactly that quantile read.

    Plan: ONE tokenization pass into (doc, term) counts; the unigram
    model is a rollup of those counts (never a second corpus scan), the
    corpus total a 1-row broadcast, and the scoring join runs over the
    count table — both orders of magnitude smaller than the token
    stream. Surprisal is the count-weighted sum, identical in value to
    the per-token mean; rounding at 1e-6 before the source average
    keeps both engines aggregating identical multisets. At 100 TB the
    vocab table is Zipf-bounded (≪ corpus) and broadcasts."""
    # ensure_scan_width (round-12): the tokenize+explode partial-agg
    # pass was single-task on the narrow scan (2.15s -> 1.33s at sf0.1)
    docs = ensure_scan_width(Catalog(spark, sf_dir).documents, "doc_id")
    # the doc-term count relation feeds BOTH the vocab rollup and the
    # scoring join; lineage truncation (the tfidf() pattern) stops
    # Catalyst from planning the explode+groupBy subtree twice
    dtf = (
        docs.select("doc_id", "source", F.explode(tokens("text")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.any_value("source").alias("source"), F.count(F.lit(1)).alias("c_dt"))
        .localCheckpoint(eager=False)
    )
    tf = dtf.groupBy("term").agg(F.sum("c_dt").alias("c"))
    total = tf.agg(F.sum("c").alias("total"))
    doc_s = (
        dtf.join(tf, "term")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.any_value("source").alias("source"),
            F.sum("c_dt").alias("n_toks"),
            F.round(
                F.sum(F.col("c_dt") * -F.log(F.col("c") / F.col("total")))
                / F.sum("c_dt"),
                6,
            ).alias("surprisal"),
        )
    )
    return (
        doc_s.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("surprisal"), 6).alias("avg_surprisal"),
            F.sum(F.when(F.col("surprisal") >= 3.41, 1).otherwise(0)).alias(
                "n_flagged"
            ),
        )
        .orderBy("source")
    )


@register(
    "q126_minhash_calibration",
    sql=f"""
    WITH sh AS ({_SHINGLES_SQL}),
    p AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               round(len(list_intersect(a.s, b.s))::DOUBLE
                     / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))),
                     6) AS jaccard
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE round(len(list_intersect(a.s, b.s))::DOUBLE
                    / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))),
                    6) >= 0.02
    ),
    sig AS (
        SELECT doc_id,
               list_transform(range(0, 16), j ->
                   list_aggregate(
                       list_transform(s, x ->
                           substr(md5(CAST(j AS VARCHAR) || ':' || x), 1, 8)),
                       'min')) AS m
        FROM sh
    ),
    est AS (
        SELECT p.id_a, p.id_b, p.jaccard,
               len(list_filter(range(1, 17), j -> sa.m[j] = sb.m[j])) / 16.0
                   AS est_j
        FROM p
        JOIN sig sa ON sa.doc_id = p.id_a
        JOIN sig sb ON sb.doc_id = p.id_b
    )
    SELECT CAST(floor(jaccard * 10) AS BIGINT) AS bucket,
           count(*)::BIGINT AS n_pairs,
           round(avg(jaccard), 6) AS avg_exact,
           round(avg(est_j), 6) AS avg_est,
           round(avg(abs(est_j - jaccard)), 6) AS mean_abs_err
    FROM est GROUP BY bucket ORDER BY bucket
    """,
)
def q126_minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash CALIBRATION harness — the dedup-side analogue of q120's
    ANN recall eval: over exact-Jaccard pairs >= 0.02, compare the
    16-permutation minhash signature agreement (an unbiased estimator
    of J, sd = sqrt(J(1-J)/16)) against the exact value, bucketed by
    exact J — the report that justifies a chosen band/row LSH config
    before deploying it on a corpus too big for exact verification.
    Signatures use md5-keyed permutations (min over substr(md5(j:x)))
    so the DuckDB oracle replays them bit-for-bit — the same
    engine-portable-hash trick as q34's simhash variant. Signature
    build is one explode + 16 min-aggregates in a single keyed shuffle;
    est_j values are multiples of 1/16, exactly representable."""
    from flight_delays_progetto_big_data_2024_spark.operators.dedup import (
        _shingle_docs,
        word_shingles,
    )

    cat = Catalog(spark, sf_dir)
    docs = cat.documents
    pairs = jaccard_pairs(docs, "doc_id", "text", k=3, threshold=0.02)
    sh = _shingle_docs(docs, "doc_id", "text", 3, word_shingles)
    sig = (
        sh.select("id", F.explode("shingles").alias("s"))
        .groupBy("id")
        .agg(
            *[
                F.min(
                    F.substring(F.md5(F.concat(F.lit(f"{j}:"), F.col("s"))), 1, 8)
                ).alias(f"m{j}")
                for j in range(16)
            ]
        )
    )
    sa = sig.select(F.col("id").alias("id_a"), *[F.col(f"m{j}").alias(f"a{j}") for j in range(16)])
    sb = sig.select(F.col("id").alias("id_b"), *[F.col(f"m{j}").alias(f"b{j}") for j in range(16)])
    matches = sum(
        F.when(F.col(f"a{j}") == F.col(f"b{j}"), 1).otherwise(0) for j in range(16)
    )
    est = (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("est_j", matches / F.lit(16.0))
    )
    return (
        est.groupBy(F.floor(F.col("jaccard") * 10).cast("long").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.avg("jaccard"), 6).alias("avg_exact"),
            F.round(F.avg("est_j"), 6).alias("avg_est"),
            F.round(F.avg(F.abs(F.col("est_j") - F.col("jaccard"))), 6).alias(
                "mean_abs_err"
            ),
        )
        .orderBy("bucket")
    )


@register(
    "q127_corpus_health_report",
    sql=f"""
    WITH RECURSIVE sh AS ({_SHINGLES_SQL}),
    p AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE round(len(list_intersect(a.s, b.s))::DOUBLE
                    / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))),
                    6) >= 0.5
    ),
    e AS (
        SELECT id_a AS u, id_b AS v FROM p
        UNION SELECT id_b, id_a FROM p
    ),
    r(id, comp) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.u, r.comp FROM e JOIN r ON r.id = e.v
    ),
    comp AS (SELECT id AS doc_id, min(comp) AS cluster_id FROM r GROUP BY id),
    dup AS (
        SELECT d.source,
               sum(CASE WHEN c.doc_id <> c.cluster_id THEN 1 ELSE 0 END) AS n_rm,
               count(*) AS n_docs
        FROM comp c JOIN documents d USING (doc_id) GROUP BY d.source
    ),
    tok AS (
        SELECT source, doc_id, unnest({_TOKS_SQL}) AS term FROM documents
    ),
    tf AS (
        SELECT source, doc_id, term, count(*) AS c
        FROM tok GROUP BY source, doc_id, term
    ),
    ent AS (
        SELECT source,
               round(avg(doc_h), 6) AS avg_entropy
        FROM (
            SELECT source, doc_id,
                   round(ln(sum(c)) - sum(c * ln(c)) / sum(c), 6) AS doc_h
            FROM tf GROUP BY source, doc_id
        ) GROUP BY source
    )
    SELECT dup.source,
           dup.n_docs::BIGINT AS n_docs,
           round(dup.n_rm::DOUBLE / dup.n_docs, 6) AS dup_rate,
           ent.avg_entropy
    FROM dup JOIN ent ON ent.source = dup.source
    ORDER BY dup.source
    """,
)
def q127_corpus_health_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composability showcase: the per-source corpus-health dashboard a
    curation team actually reads — near-dup removal rate (q121's
    cluster labels) joined with lexical diversity (q116's entropy) in
    ONE plan, built purely by composing the library operators. The
    per-source sub-aggregates are tiny (one row per source), so the
    final join is broadcast-sized regardless of corpus scale; each
    branch keeps its own documented shuffle profile."""
    from flight_delays_progetto_big_data_2024_spark.graph.algorithms import (
        connected_components,
    )

    docs = Catalog(spark, sf_dir).documents
    pairs = jaccard_pairs(docs, "doc_id", "text", k=3, threshold=0.5)
    cc = connected_components(
        pairs, "id_a", "id_b",
        vertices=docs.select(F.col("doc_id").alias("id")),
    )
    dup = (
        cc.join(docs.select("doc_id", "source"), cc["id"] == F.col("doc_id"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                F.when(F.col("id") != F.col("component"), 1).otherwise(0)
            ).alias("n_rm"),
        )
    )
    tf = (
        docs.select("source", "doc_id", F.explode(tokens("text")).alias("term"))
        .groupBy("source", "doc_id", "term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    ent = (
        tf.groupBy("source", "doc_id")
        .agg(
            F.round(
                F.log(F.sum("c")) - F.sum(F.col("c") * F.log("c")) / F.sum("c"), 6
            ).alias("doc_h")
        )
        .groupBy("source")
        .agg(F.round(F.avg("doc_h"), 6).alias("avg_entropy"))
    )
    return (
        dup.join(ent, "source")
        .select(
            "source",
            "n_docs",
            F.round(F.col("n_rm") / F.col("n_docs"), 6).alias("dup_rate"),
            "avg_entropy",
        )
        .orderBy("source")
    )


_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\d{3}-\d{3}-\d{4}"


@register(
    "q128_pii_redaction_report",
    sql=f"""
    WITH enriched AS (
        SELECT doc_id, source,
               CASE WHEN doc_id % 10 = 0
                    THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
                         || '@example.com now'
                    WHEN doc_id % 17 = 0
                    THEN text || ' call 555-123-4567'
                    ELSE text END AS t
        FROM documents
    ),
    scanned AS (
        SELECT source,
               len(regexp_extract_all(t, '{_EMAIL_RE}')) AS n_email,
               len(regexp_extract_all(t, '{_PHONE_RE}')) AS n_phone,
               len(regexp_replace(regexp_replace(t, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                                  '{_PHONE_RE}', '<PHONE>', 'g')) AS red_len
        FROM enriched
    )
    SELECT source,
           count(*)::BIGINT AS n_docs,
           sum(CASE WHEN n_email + n_phone > 0 THEN 1 ELSE 0 END)::BIGINT
               AS docs_with_pii,
           sum(n_email)::BIGINT AS total_emails,
           sum(n_phone)::BIGINT AS total_phones,
           sum(red_len)::BIGINT AS redacted_chars
    FROM scanned GROUP BY source ORDER BY source
    """,
)
def q128_pii_redaction_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub pass — the mandatory curation stage before text ships
    to training: detect + redact email/phone patterns, report incidence
    per source and the redacted footprint. PII is PLANTED
    deterministically (doc_id-derived emails / a literal phone) so the
    oracle verifies real matches, not vacuous zeros, and both regexes
    stay in the Java∩RE2 common syntax (no lookarounds) so Spark and
    DuckDB match byte-for-byte. Pure narrow projections + one rollup —
    zero extra shuffles at any scale."""
    docs = Catalog(spark, sf_dir).documents
    t = (
        F.when(
            F.col("doc_id") % 10 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com now"),
            ),
        )
        .when(
            F.col("doc_id") % 17 == 0,
            F.concat(F.col("text"), F.lit(" call 555-123-4567")),
        )
        .otherwise(F.col("text"))
    )
    scanned = docs.select(
        "source",
        F.size(F.regexp_extract_all(t, F.lit(_EMAIL_RE), 0)).alias("n_email"),
        F.size(F.regexp_extract_all(t, F.lit(_PHONE_RE), 0)).alias("n_phone"),
        F.length(
            F.regexp_replace(
                F.regexp_replace(t, _EMAIL_RE, "<EMAIL>"),
                _PHONE_RE,
                "<PHONE>",
            )
        ).alias("red_len"),
    )
    return (
        scanned.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                F.when(F.col("n_email") + F.col("n_phone") > 0, 1).otherwise(0)
            ).alias("docs_with_pii"),
            F.sum("n_email").alias("total_emails"),
            F.sum("n_phone").alias("total_phones"),
            F.sum("red_len").alias("redacted_chars"),
        )
        .orderBy("source")
    )


@register(
    "q156_exact_substring_containment",
    sql=f"""
    WITH n AS (SELECT doc_id, {_NORM_SQL} AS nm FROM documents)
    SELECT a.doc_id AS id_contained, b.doc_id AS id_container
    FROM n a JOIN n b
      ON a.doc_id <> b.doc_id AND position(a.nm IN b.nm) > 0
    -- the operator's domain: containment is defined for docs with at
    -- least one full winnowing window (k+w-1 = 8 normalized chars).
    -- Without this the brute force declares the EMPTY normalized text
    -- "contained" in every document (position('' IN x) = 1) — 1000
    -- phantom pairs per empty doc on a dirty corpus (wave-5 finding)
    WHERE length(a.nm) >= 8
    ORDER BY id_contained, id_container
    """,
)
def q156_exact_substring_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT whole-document substring containment (doc A's normalized
    text appears verbatim inside doc B) — the strictest dedup rule, the
    one "remove exact sub-documents" pass pipelines run before fuzzy
    dedup.

    Candidate generation is a RAREST-FINGERPRINTS PROBE, not a full
    fingerprint self-join. Correctness: if A occurs verbatim in B, then
    every w-window of A's k-gram hash sequence is also a window of B's
    sequence, and winnowing (Schleimer et al., SIGMOD 2003) selects the
    min of every window — so every fingerprint of A is selected in B
    too: fp(A) ⊆ fp(B), with NO boundary slack. Verification is an
    exact substring test, so recall only needs candidates to be a
    SUPERSET of true containments; the probe requires B to hold ALL of
    A's k=2 globally rarest fingerprints (min document frequency,
    fingerprint value as tie-break; all of them when A has fewer) —
    each extra required fingerprint multiplies selectivity while the
    subset property keeps recall perfect; len(A) <= len(B) is
    short-circuited ahead of the substring scan. (Sub-window-sized docs — under k+w-1 = 8 normalized chars —
    have no full window and sit outside the guarantee in the probe
    form exactly as they did in the former 0.8-shared-ratio form.)

    Scale: the former self-join enumerated Σ df² fingerprint
    co-occurrences — the measured 15.2s / alpha 0.84 pole of SCALING.md
    round 5 on this deliberately degenerate corpus (1002 distinct
    fingerprints across 5k docs, max df 3891). The probe join
    enumerates Σ_docs Σ_{i<=k} df(rarest_i(doc)) and the k-way AND
    collapses candidates 495k → 65k here; measured 15.2s → ~5.0s
    (warmed medians) with identical output. At 100 TB the probe side
    is k=2 postings per document — the index side stays the only
    corpus-sized relation.

    The oracle brute-forces position() over the cross join —
    affordable at oracle scale only, which is the point of the index.

    Measured regime note (round-8 sf1 decade, SCALING.md): on THIS
    fixed ~31-type vocabulary, df ~ n/V for every fingerprint, so even
    the probe's candidate space grows as n²/V — alpha 2.09 across the
    real 5k→50k decade, within the documented degenerate ceiling (2.4),
    and no posting-intersection algorithm can beat it because the TRUE
    containment-pair count itself grows ~n² here. Real text grows its
    vocabulary (Heaps' law), bounding df; that sub-quadratic claim is
    gated deterministically on the Heaps corpus
    (tests/test_scaling_evidence.py)."""
    from pyspark.sql import Window

    from flight_delays_progetto_big_data_2024_spark.functions.text import (
        normalize_text,
    )
    from flight_delays_progetto_big_data_2024_spark.operators.dedup import (
        winnowing_fingerprints,
    )

    n_probe = 2  # A/B-measured sweet spot: k=1 over-candidates (495k
    # pairs to verify), k=3 pays more in the hit aggregate than the
    # extra selectivity returns; k=2 cuts candidates ~8x for one
    # cheap groupBy (medians 6.2 / 5.0 / 6.2s at sf0.1)
    cat = Catalog(spark, sf_dir)
    # containment domain: the CONTAINED doc needs >= k+w-1 = 8
    # normalized chars (one full winnowing window). Shorter docs carry
    # only the whole-text-hash fallback fingerprint, which vacuously
    # matches any byte-identical short doc — on a dirty corpus every
    # empty doc "contained" every other empty doc (wave-5 finding; the
    # oracle pins the same domain with length(a.nm) >= 8). The length
    # RIDES the fingerprint relation via extra_cols — a filter on the
    # persisted postings, not a join against a second corpus scan.
    docs_nl = cat.documents.withColumn(
        "__nmlen", F.length(normalize_text("text"))
    )
    fp = winnowing_fingerprints(docs_nl, extra_cols=("__nmlen",)).persist()
    nm = cat.documents.select("doc_id", normalize_text("text").alias("nm"))
    dfreq = fp.groupBy("fingerprint").agg(F.count(F.lit(1)).alias("df"))
    fp_elig = fp.filter(F.col("__nmlen") >= 8)
    probe = (
        fp_elig.join(dfreq, "fingerprint")
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy("df", "fingerprint")
            ),
        )
        .filter(F.col("rk") <= n_probe)
        .select(F.col("doc_id").alias("id_contained"), "fingerprint")
    )
    # how many probe hits a true container must show: min(|fp|, k),
    # derived from the PERSISTED postings with a plain groupBy (a
    # window-derived count would re-execute the rank pass)
    need = fp_elig.groupBy("doc_id").agg(
        F.least(F.count(F.lit(1)), F.lit(n_probe)).alias("need")
    )
    cands = (
        probe.join(
            fp.select(F.col("doc_id").alias("id_container"), "fingerprint"),
            "fingerprint",
        )
        .filter(F.col("id_contained") != F.col("id_container"))
        .groupBy("id_contained", "id_container")
        .agg(F.count(F.lit(1)).alias("got"))
        .join(need.withColumnRenamed("doc_id", "id_contained"), "id_contained")
        .filter(F.col("got") == F.col("need"))
        .select("id_contained", "id_container")
    )
    # shuffle_hash, never broadcast: the nm sides carry one row per
    # corpus document with its FULL normalized text; the static size
    # estimate uses the default string width and misses the real
    # volume, so the planner would broadcast a corpus-sized relation
    # (the jaccard_pairs_prefix verify-join OOM class; at 100 TB this
    # side must hash-partition regardless of the estimate).
    verified = cands.join(
        nm.select(
            F.col("doc_id").alias("id_contained"), F.col("nm").alias("nm_in")
        ).hint("shuffle_hash"),
        "id_contained",
    ).join(
        nm.select(
            F.col("doc_id").alias("id_container"), F.col("nm").alias("nm_out")
        ).hint("shuffle_hash"),
        "id_container",
    )
    return (
        verified.filter(
            (F.length("nm_in") <= F.length("nm_out"))
            & (F.instr("nm_out", F.col("nm_in")) > 0)
        )
        .select("id_contained", "id_container")
        .orderBy("id_contained", "id_container")
    )


@register(
    "q159_full_curation_pipeline",
    sql=f"""
    WITH RECURSIVE norm AS (
        SELECT doc_id, source, text, md5({_NORM_SQL}) AS fp, {_TOKS_SQL} AS toks
        FROM documents
    ),
    ex_keep AS (SELECT min(doc_id) AS doc_id FROM norm GROUP BY fp),
    exd AS (SELECT n.* FROM norm n JOIN ex_keep USING (doc_id)),
    sh AS (
        SELECT doc_id,
               list_distinct([array_to_string(toks[i:i+2], ' ')
                              for i in generate_series(1, greatest(len(toks)-2, 1))])
                   AS s
        FROM exd
    ),
    p AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE round(len(list_intersect(a.s, b.s))::DOUBLE
                    / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))),
                    6) >= 0.5
    ),
    e AS (
        SELECT id_a AS u, id_b AS v FROM p
        UNION SELECT id_b, id_a FROM p
    ),
    r(id, comp) AS (
        SELECT doc_id, doc_id FROM exd
        UNION
        SELECT e.u, r.comp FROM e JOIN r ON r.id = e.v
    ),
    comp AS (SELECT id AS doc_id, min(comp) AS cluster FROM r GROUP BY id),
    nd AS (
        SELECT exd.* FROM exd JOIN comp USING (doc_id)
        WHERE comp.doc_id = comp.cluster
    ),
    q AS (
        SELECT doc_id, source, toks,
               CASE WHEN len(toks) = 0 THEN 0.0
                    ELSE round(
                        0.6 * (len(list_distinct(toks))::DOUBLE / len(toks))
                        + 0.4 * (CASE WHEN
                              list_aggregate(list_transform(toks, t -> len(t)),
                                             'sum')::DOUBLE / len(toks)
                              BETWEEN 3.0 AND 8.0 THEN 1.0 ELSE 0.5 END)
                        - (CASE WHEN len(text) > 0
                                THEN (len(text) - len(regexp_replace(text,
                                     '[.,!?;:''"]', '', 'g')))::DOUBLE
                                     / len(text)
                                ELSE 0.0 END), 6) END AS quality
        FROM nd
    ),
    final AS (SELECT * FROM q WHERE quality >= 0.55),
    n_in AS (SELECT source, count(*) AS n_in FROM documents GROUP BY source),
    s1 AS (SELECT source, count(*) AS n_exact FROM exd GROUP BY source),
    s2 AS (SELECT source, count(*) AS n_near FROM nd GROUP BY source),
    s3 AS (
        SELECT source, count(*) AS n_final,
               sum(len(toks))::BIGINT AS tokens_final
        FROM final GROUP BY source
    )
    SELECT i.source, i.n_in,
           coalesce(s1.n_exact, 0)::BIGINT AS n_exact,
           coalesce(s2.n_near, 0)::BIGINT AS n_near,
           coalesce(s3.n_final, 0)::BIGINT AS n_final,
           coalesce(s3.tokens_final, 0)::BIGINT AS tokens_final,
           round(coalesce(s3.n_final, 0)::DOUBLE / i.n_in, 6) AS pct_kept
    FROM n_in i
    LEFT JOIN s1 USING (source)
    LEFT JOIN s2 USING (source)
    LEFT JOIN s3 USING (source)
    ORDER BY i.source
    """,
)
def q159_full_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole nightly curation pipeline as ONE declarative plan —
    exact dedup (min-id per normalized-text fingerprint) → near-dup
    cluster collapse over the exact survivors (inverted-index Jaccard
    pairs → connected components → min-id representative) → quality
    gate (composite score ≥ 0.55) — with per-source stage accounting
    (docs surviving each stage, final token yield, keep rate). Every
    stage reuses a verified operator (dedup_exact's fingerprint,
    jaccard_pairs, connected_components, quality_score); Catalyst fuses
    the stage FILTERS into the shared scans, and the only shuffles are
    the three the stages inherently need (fingerprint group, shingle
    join, component loop). This is the query a platform team actually
    schedules; the oracle replays all three stages in one recursive
    CTE."""
    from flight_delays_progetto_big_data_2024_spark.functions.text import (
        fingerprint,
        quality_score,
        tokens,
    )
    from flight_delays_progetto_big_data_2024_spark.graph.algorithms import (
        connected_components,
    )

    cat = Catalog(spark, sf_dir)
    docs = cat.documents
    ex_keep = (
        docs.withColumn("__fp", fingerprint("text"))
        .groupBy("__fp")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    exd = docs.join(ex_keep, "doc_id").persist()
    pairs = jaccard_pairs(exd, "doc_id", "text", k=3, threshold=0.5)
    cc = connected_components(
        pairs, "id_a", "id_b", vertices=exd.select(F.col("doc_id").alias("id"))
    )
    near_keep = (
        cc.filter(F.col("id") == F.col("component"))
        .select(F.col("id").alias("doc_id"))
    )
    nd = exd.join(near_keep, "doc_id").persist()
    final = nd.filter(quality_score("text") >= 0.55)
    n_in = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_in"))
    s1 = exd.groupBy("source").agg(F.count(F.lit(1)).alias("n_exact"))
    s2 = nd.groupBy("source").agg(F.count(F.lit(1)).alias("n_near"))
    s3 = final.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_final"),
        F.sum(F.size(tokens("text"))).alias("tokens_final"),
    )
    return (
        n_in.join(s1, "source", "left")
        .join(s2, "source", "left")
        .join(s3, "source", "left")
        .select(
            "source",
            "n_in",
            F.coalesce("n_exact", F.lit(0)).alias("n_exact"),
            F.coalesce("n_near", F.lit(0)).alias("n_near"),
            F.coalesce("n_final", F.lit(0)).alias("n_final"),
            F.coalesce("tokens_final", F.lit(0)).alias("tokens_final"),
            F.round(F.coalesce("n_final", F.lit(0)) / F.col("n_in"), 6).alias(
                "pct_kept"
            ),
        )
        .orderBy("source")
    )
# q156/q159 perf note (measured sf0.1, warm): the winnowing / shingle
# candidate self-joins dominate (~7s each, Σ df² co-occurrences over
# 440k fingerprints) — the verify stages are trivial (<2s). At 100 TB
# the same joins stay keyed on fingerprint/shingle hash and scale with
# shared mass; prune Σ df² with a df cap on the posting lists (drop
# fingerprints with df > cap from the INDEX only — containment
# candidates still surface through their rarer fingerprints).
#
# Round-3 measurement (sf0.1): the synthetic corpus is DEGENERATE for
# this operator family — 439,363 postings collapse onto 1,002 distinct
# fingerprints (max df 3,891), and 12,489,351 of the 12,497,500
# possible doc pairs (99.93%) share at least one fingerprint, i.e. the
# candidate graph is effectively all-pairs, the same template-text
# regime documented on q54. A rarest-first prefix filter (Bayardo/
# SSJoin style: per-doc prefix of floor(0.2·n)+1 rarest fingerprints
# joined against the full index — exact recall for the >=0.8
# containment threshold by pigeonhole) was measured: it cuts raw join
# mass 26x (590M -> 22.8M rows) but materializing the DISTINCT
# candidate set costs more than the current streamed partial-agg join
# (7.9s vs 6.2s) because 56% of all pairs survive anyway. On a real
# (diverse) corpus Σ df² << n_docs² and the current plan's cost tracks
# shared mass, which is the scaling property that matters; the prefix
# filter becomes the right tool only if a corpus is BOTH huge and
# near-duplicate-saturated, at which point dedup should run upstream.


@register(
    "q160_lang_id_confusion",
    sql=f"""
    SELECT lang AS labeled,
           {lang_id_sql("text")} AS predicted,
           count(*) AS n_docs
    FROM documents
    GROUP BY labeled, predicted
    ORDER BY labeled, predicted
    """,
)
def q160_lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID confusion matrix: the heuristic classifier
    (functions.text.lang_id — stopword-hit voting) scored against the
    corpus's labeled ``lang`` column. The eval harness every
    lang-filtered pipeline needs before trusting its routing: per
    (labeled, predicted) cell counts, one scan + one grouped aggregate,
    classifier evaluated inline as a column expression (no UDF, no
    second pass)."""
    cat = Catalog(spark, sf_dir)
    return (
        cat.documents.select(
            F.col("lang").alias("labeled"), lang_id("text").alias("predicted")
        )
        .groupBy("labeled", "predicted")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("labeled", "predicted")
    )


@register(
    "q161_knn_label_consistency",
    sql=f"""
    WITH n AS ({_EMB_PREP_SQL}),
    q AS (SELECT * FROM n WHERE vec_id % 20 = 0),
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS candidate_id,
               round(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 6) AS cosine
        -- same-dim pairs only (pair-level dimension domain, round-10)
        FROM q JOIN n c ON c.vec_id <> q.vec_id AND len(q.v) = len(c.v)
    ),
    topk AS (
        SELECT query_id, candidate_id FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY cosine DESC, candidate_id
            ) AS rnk FROM scored
        ) WHERE rnk <= 5
    ),
    votes AS (
        SELECT t.query_id, e.label, count(*) AS c
        FROM topk t JOIN embeddings e ON e.vec_id = t.candidate_id
        GROUP BY t.query_id, e.label
    ),
    pred AS (
        SELECT query_id, label AS predicted FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY c DESC, label
            ) AS rnk FROM votes
        ) WHERE rnk = 1
    )
    SELECT e.label,
           count(*) AS n_queries,
           sum(CASE WHEN p.predicted = e.label THEN 1 ELSE 0 END)::BIGINT
               AS n_correct,
           round(sum(CASE WHEN p.predicted = e.label THEN 1 ELSE 0 END)::DOUBLE
                 / count(*), 4) AS accuracy
    FROM pred p JOIN embeddings e ON e.vec_id = p.query_id
    GROUP BY e.label ORDER BY e.label
    """,
)
def q161_knn_label_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space sanity eval: leave-one-out 5-NN majority-vote
    label prediction on a deterministic 1-in-20 query sample, reported
    as per-label accuracy. This is the task-level check on an embedding
    corpus (do neighbors share labels?) that complements q120's
    retrieval-recall check on the index. Exact kNN runs as
    broadcast(queries) × one corpus pass (cosine_topk — the sample
    keeps it |Q|·N, never N²); votes and the majority pick are keyed
    aggregates with deterministic ties (count desc, label asc)."""
    from flight_delays_progetto_big_data_2024_spark.operators.similarity import (
        cosine_topk,
    )
    from pyspark.sql.window import Window as W

    cat = Catalog(spark, sf_dir)
    emb = cat.embeddings
    queries = emb.filter(F.col("vec_id") % 20 == 0)
    topk = cosine_topk(emb, queries, k=5)
    labels = emb.select("vec_id", "label")
    votes = (
        topk.join(
            labels.select(F.col("vec_id").alias("candidate_id"), "label"),
            "candidate_id",
        )
        .groupBy("query_id", "label")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("c"), F.asc("label"))
    pred = (
        votes.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .select("query_id", F.col("label").alias("predicted"))
    )
    return (
        pred.join(
            labels.select(F.col("vec_id").alias("query_id"), "label"), "query_id"
        )
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_queries"),
            F.sum((F.col("predicted") == F.col("label")).cast("long")).alias(
                "n_correct"
            ),
            F.round(
                F.sum((F.col("predicted") == F.col("label")).cast("long"))
                / F.count(F.lit(1)),
                4,
            ).alias("accuracy"),
        )
        .orderBy("label")
    )


@register(
    "q163_label_centroid_drift",
    sql="""
    WITH m AS (SELECT max(vec_id) AS mx FROM embeddings),
    e AS (
        SELECT label,
               -- id*2 overflows INT64 at the planted LONG_MIN/LONG_MAX
               -- ids (DuckDB raises, Spark ANSI raises); mx >> 1 is
               -- arithmetic shift = floor(mx/2), and for integer ids
               -- vec_id*2 <= mx ⟺ vec_id <= floor(mx/2)
               CASE WHEN vec_id <= (mx >> 1) THEN 0 ELSE 1 END AS half,
               generate_subscripts(embedding, 1) AS pos,
               unnest(embedding::DOUBLE[]) AS val
        FROM embeddings, m
    ),
    cent AS (
        SELECT label, half, pos, avg(val) AS c
        FROM e GROUP BY label, half, pos
    ),
    dots AS (
        SELECT a.label,
               sum(a.c * b.c) AS dot,
               sqrt(sum(a.c * a.c)) AS na,
               sqrt(sum(b.c * b.c)) AS nb,
               count(*) AS n_dims
        FROM (SELECT * FROM cent WHERE half = 0) a
        JOIN (SELECT * FROM cent WHERE half = 1) b
          ON b.label = a.label AND b.pos = a.pos
        GROUP BY a.label
    )
    SELECT label, n_dims::BIGINT AS n_dims,
           -- zero-norm guard (cohesion rule): a half whose centroid is
           -- the zero vector has NO direction — cosine is undefined
           -- (NULL), not an ANSI divide-by-zero abort. Reachable: an
           -- antipodal pair alone in one half cancels exactly.
           -- + 0.0 normalizes IEEE -0.0 (round-4 rule): near-orthogonal
           -- halves round to zero and the tiny dot's sign would
           -- otherwise split +0.0/-0.0 between engines
           round(CASE WHEN na * nb <> 0 THEN dot / (na * nb) END, 6) + 0.0
               AS centroid_cosine
    FROM dots ORDER BY label
    """,
)
def q163_label_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space drift per label: cosine between each label's
    centroid in the first and second corpus halves (vec_id order =
    ingestion order) — the embedding companion to q158's term drift,
    and the canary run before an ANN index or classifier trained on the
    old half serves the new one. All arithmetic is positional
    aggregation ((label, half, dim) means, then a dims-sized join per
    label) — vectors never pairwise-join and nothing exceeds
    |labels|·dims rows after the first aggregate."""
    cat = Catalog(spark, sf_dir)
    mx = cat.embeddings.agg(F.max("vec_id").alias("mx"))
    e = (
        cat.embeddings.crossJoin(F.broadcast(mx))
        .select(
            "label",
            # half-split WITHOUT id arithmetic: vec_id*2 overflows ANSI
            # on the planted LONG_MIN/LONG_MAX ids. shiftright(mx,1) =
            # floor(mx/2) for all longs (arithmetic shift), and for
            # integer vec_id: vec_id*2 <= mx ⟺ vec_id <= floor(mx/2).
            # The oracle runs the IDENTICAL shift form — `vec_id <=
            # (mx >> 1)` — not a *2-via-HUGEINT comparison (round-10
            # advisor: a stale comment here once claimed otherwise).
            F.when(
                F.col("vec_id") <= F.shiftright("mx", 1), 0
            ).otherwise(1).alias("half"),
            F.posexplode(F.col("embedding").cast("array<double>")).alias(
                "pos", "val"
            ),
        )
    )
    cent = e.groupBy("label", "half", "pos").agg(F.avg("val").alias("c"))
    a = cent.filter(F.col("half") == 0).select(
        "label", "pos", F.col("c").alias("ca")
    )
    b = cent.filter(F.col("half") == 1).select(
        "label", "pos", F.col("c").alias("cb")
    )
    # zero-norm guard (cohesion rule): a zero-vector centroid has no
    # direction — cosine is NULL, not an ANSI divide-by-zero abort.
    # NaN norms (non-finite components) flow through unchanged: NaN
    # compares <> 0 under both engines' total orders, and NaN/NaN is
    # the matching DuckDB result.
    den = F.sqrt(F.sum(F.col("ca") * F.col("ca"))) * F.sqrt(
        F.sum(F.col("cb") * F.col("cb"))
    )
    return (
        a.join(b, ["label", "pos"])
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_dims"),
            # + 0.0 normalizes IEEE -0.0 (round-4 rule; reachable since
            # the r9 near-orthogonal id-probe vectors)
            (
                F.round(
                    F.when(den != 0, F.sum(F.col("ca") * F.col("cb")) / den),
                    6,
                )
                + F.lit(0.0)
            ).alias("centroid_cosine"),
        )
        .orderBy("label")
    )


@register(
    "q164_hour_type_independence",
    sql="""
    WITH o AS (
        SELECT hour(ts) AS hr, event_type, count(*) AS obs
        FROM events GROUP BY hr, event_type
    ),
    margins AS (
        SELECT hr, event_type, obs,
               sum(obs) OVER (PARTITION BY hr) AS row_tot,
               sum(obs) OVER (PARTITION BY event_type) AS col_tot,
               sum(obs) OVER () AS n
        FROM o
    )
    SELECT count(*) AS n_cells,
           round(sum(pow(obs - row_tot * col_tot / n, 2)
                     / (row_tot * col_tot / n)), 4) AS chi_square,
           round(sqrt(sum(pow(obs - row_tot * col_tot / n, 2)
                          / (row_tot * col_tot / n))
                      / (any_value(n) * 4)), 6) AS cramers_v
    FROM margins
    """,
)
def q164_hour_type_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence test of event type vs hour of day (plus
    Cramér's V effect size) — the statistical screen for 'does behavior
    actually vary by time' before anyone builds hourly models. The
    contingency table is one grouped aggregate (≤ 24×|types| cells);
    margins are windows OVER THE CELLS, so the statistic costs one fact
    shuffle however large the event table. (Note the windows here are
    cell-table-sized by construction — the unpartitioned sum(n) runs
    over ≤120 rows.)"""
    from pyspark.sql.window import Window

    cat = Catalog(spark, sf_dir)
    o = cat.events.groupBy(
        F.hour("ts").alias("hr"), "event_type"
    ).agg(F.count(F.lit(1)).alias("obs"))
    w_r = Window.partitionBy("hr")
    w_c = Window.partitionBy("event_type")
    w_all = Window.partitionBy()
    m = o.select(
        "obs",
        F.sum("obs").over(w_r).alias("row_tot"),
        F.sum("obs").over(w_c).alias("col_tot"),
        F.sum("obs").over(w_all).alias("n"),
    )
    exp = F.col("row_tot") * F.col("col_tot") / F.col("n")
    term = F.pow(F.col("obs") - exp, 2) / exp
    return m.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.round(F.sum(term), 4).alias("chi_square"),
        F.round(
            F.sqrt(F.sum(term) / (F.any_value("n") * 4)), 6
        ).alias("cramers_v"),
    )


@register(
    "q165_near_dup_edit_distances",
    sql=f"""
    WITH sh AS ({_SHINGLES_SQL}),
    p AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               round(len(list_intersect(a.s, b.s))::DOUBLE
                     / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))),
                     6) AS jaccard
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    ),
    cand AS (SELECT * FROM p WHERE jaccard >= 0.5),
    -- ASCII iff code-point length == byte length: the edit-distance
    -- UNIT domain (see the docstring)
    n AS (SELECT doc_id, {_NORM_SQL} AS nm,
                 len({_NORM_SQL}) = strlen({_NORM_SQL}) AS is_ascii
          FROM documents)
    SELECT c.id_a, c.id_b, c.jaccard,
           (CASE WHEN na.is_ascii AND nb.is_ascii
                 THEN levenshtein(na.nm, nb.nm) END)::BIGINT AS edit_distance,
           round(CASE WHEN na.is_ascii AND nb.is_ascii
                      THEN levenshtein(na.nm, nb.nm)::DOUBLE
                           / greatest(len(na.nm), len(nb.nm)) END,
                 6) AS edit_ratio
    FROM cand c
    JOIN n na ON na.doc_id = c.id_a
    JOIN n nb ON nb.doc_id = c.id_b
    ORDER BY id_a, id_b
    """,
)
def q165_near_dup_edit_distances(
    spark: SparkSession, sf_dir: str, *, include_codepoints: bool = False
) -> DataFrame:
    """Edit-distance enrichment of the exact near-dup pairs (q32's
    J ≥ 0.5 set): Levenshtein distance and length-normalized edit ratio
    per pair — the character-level second opinion that separates
    shuffled-word dups (high Jaccard, HIGH edit distance) from
    typo-level copies (both low). Levenshtein is O(len²) DP per pair,
    which is exactly why it runs only on the inverted-index SURVIVORS
    (a few hundred pairs), never the corpus cross product.

    UNIT domain (round-11 strings-axis finding): the engines count
    edit steps in DIFFERENT units on non-ASCII text — DuckDB's
    levenshtein walks BYTES (an emoji insertion costs 4) while Spark's
    walks code points — so the distance is only engine-defined where
    the units coincide: BOTH normalized texts ASCII (code-point length
    == octet length, a pure codegen predicate). Non-ASCII pairs report
    NULL in the PARITY column in both engines; their character-level
    comparison belongs to the fingerprint/shingle families, which are
    unit-free.

    ``include_codepoints=True`` (round-12 judge item 3) additionally
    returns ``edit_distance_codepoints`` — Spark's native code-point
    Levenshtein with NO domain gate. Spark's unit is well-defined and
    useful on its own (a ZWJ insertion costs exactly 1 step, an emoji
    swap 1, regardless of UTF-8 width); the column is EXCLUDED from the
    oracle comparison because DuckDB cannot express the code-point unit
    (the q29/q188 rows-only split pattern, applied to one column
    instead of a whole query: the registered parity shape omits it, the
    engine surface keeps it, and the unit test pins the ZWJ/emoji
    distances that exposed the unit split)."""
    cat = Catalog(spark, sf_dir)
    pairs = jaccard_pairs(cat.documents, "doc_id", "text", k=3, threshold=0.5)
    nm = cat.documents.select(
        "doc_id",
        normalize_text("text").alias("nm"),
        (
            F.length(normalize_text("text"))
            == F.octet_length(normalize_text("text"))
        ).alias("is_ascii"),
    )
    na = nm.select(
        F.col("doc_id").alias("id_a"),
        F.col("nm").alias("nm_a"),
        F.col("is_ascii").alias("ascii_a"),
    )
    nb = nm.select(
        F.col("doc_id").alias("id_b"),
        F.col("nm").alias("nm_b"),
        F.col("is_ascii").alias("ascii_b"),
    )
    in_unit_domain = F.col("ascii_a") & F.col("ascii_b")
    ed = F.when(in_unit_domain, F.levenshtein("nm_a", "nm_b"))
    cols = [
        F.col("id_a"),
        F.col("id_b"),
        F.col("jaccard"),
        ed.cast("long").alias("edit_distance"),
        # try_divide: two docs that BOTH normalize to '' have an
        # undefined ratio (0/0) — DuckDB yields NULL, ANSI Spark
        # would abort the query on one dirty pair
        F.round(
            F.try_divide(ed, F.greatest(F.length("nm_a"), F.length("nm_b"))),
            6,
        ).alias("edit_ratio"),
    ]
    if include_codepoints:
        # engine-only: ungated code-point distance (see docstring)
        cols.append(
            F.levenshtein("nm_a", "nm_b").cast("long").alias(
                "edit_distance_codepoints"
            )
        )
    # shuffle_hash, never broadcast: na/nb are one row per corpus doc
    # with the full normalized text; default-width size estimates would
    # let the planner broadcast a corpus-sized side (the
    # jaccard_pairs_prefix verify-join OOM class).
    return (
        pairs.join(na.hint("shuffle_hash"), "id_a")
        .join(nb.hint("shuffle_hash"), "id_b")
        .select(*cols)
        .orderBy("id_a", "id_b")
    )


@register(
    "q166_weighted_sample_without_replacement",
    sql="""
    WITH keyed AS (
        SELECT doc_id, source, n_chars,
               ln((('0x' || substr(md5(doc_id::VARCHAR || '#es'), 1, 15))::BIGINT
                   + 1.0) / 1152921504606846977.0) / n_chars AS es_key
        FROM documents
        -- ES sampling is defined for POSITIVE weights only (mirrors
        -- the Spark-side filter; NULLS-LAST vs -FIRST would otherwise
        -- diverge the top-k on dirty metadata)
        WHERE n_chars > 0
    ),
    picked AS (
        SELECT * FROM keyed
        ORDER BY es_key DESC, doc_id LIMIT 50
    )
    SELECT source,
           count(*) AS n_picked,
           sum(n_chars)::BIGINT AS chars_picked
    FROM picked GROUP BY source ORDER BY source
    """,
)
def q166_weighted_sample_without_replacement(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Weighted sampling WITHOUT replacement via Efraimidis-Spirakis
    exponential keys: each doc draws u from its md5 hash (retry-stable,
    engine-portable) and ranks by ln(u)/weight — the top-k IS an exact
    weighted sample without replacement, computed as one projection plus
    a top-k (TakeOrderedAndProject; no per-group state, no sequential
    reservoir). This is how a token-budgeted corpus subset gets drawn at
    100 TB: mergeable across partitions by construction (top-k of
    unions = union of top-ks re-topped). Weight = n_chars, k = 50;
    per-source composition of the sample is the value-checked output.
    (u is shifted by one ulp-of-hash to dodge ln(0); keys are
    continuous, so the cross-engine libm ulp difference cannot flip the
    top-k boundary in practice — gaps between order statistics are ~1e-2,
    15 orders above ulp noise.)"""
    cat = Catalog(spark, sf_dir)
    u = (
        F.expr(
            "cast(conv(substr(md5(concat(cast(doc_id AS STRING), '#es')), 1, 15),"
            " 16, 10) as double)"
        )
        + F.lit(1.0)
    ) / F.lit(1152921504606846977.0)
    # weight domain: ES sampling is defined for POSITIVE weights only —
    # NULL / zero / negative n_chars rows are outside the draw (the
    # sampling.py weighted-sample rule); zero would ANSI-abort the
    # whole query on one corrupt metadata row
    keyed = cat.documents.filter(F.col("n_chars") > 0).select(
        "doc_id", "source", "n_chars", (F.log(u) / F.col("n_chars")).alias("es_key")
    )
    picked = keyed.orderBy(F.desc("es_key"), F.asc("doc_id")).limit(50)
    return (
        picked.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_picked"),
            F.sum("n_chars").alias("chars_picked"),
        )
        .orderBy("source")
    )


@register(
    "q170_jaccard_pair_histogram",
    sql=f"""
    WITH sh AS ({_SHINGLES_SQL}),
    p AS (
        SELECT round(len(list_intersect(a.s, b.s))::DOUBLE
                     / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))),
                     6) AS j
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE len(list_intersect(a.s, b.s)) > 0
    )
    SELECT CAST(floor(j * 10) AS BIGINT) AS bucket,
           count(*) AS n_pairs
    FROM p GROUP BY bucket ORDER BY bucket
    """,
)
def q170_jaccard_pair_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity-threshold calibration: the full histogram of word-3-gram
    Jaccard over every CO-OCCURRING pair (shared shingle > 0 — the only
    pairs any threshold could ever flag), bucketed at 0.1. This is the
    curve a dedup owner reads before picking t: where the near-dup mass
    separates from the background hump. Computed from the same inverted
    index as q32 with the threshold filter REMOVED — cost is the
    co-occurrence mass Σ df², identical to the t>0 case, because exact
    Jaccard never enumerates non-co-occurring pairs anyway."""
    cat = Catalog(spark, sf_dir)
    pairs = jaccard_pairs(cat.documents, "doc_id", "text", k=3, threshold=1e-9)
    return (
        pairs.groupBy(
            F.floor(F.col("jaccard") * 10).cast("long").alias("bucket")
        )
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("bucket")
    )


@register(
    "q172_hard_negative_mining",
    sql=f"""
    WITH n AS ({_EMB_PREP_SQL}),
    lab AS (SELECT vec_id, label FROM embeddings),
    q AS (SELECT n.*, lab.label FROM n JOIN lab USING (vec_id)
          WHERE vec_id % 20 = 0),
    scored AS (
        SELECT q.vec_id AS query_id, q.label AS q_label,
               c.vec_id AS candidate_id, cl.label AS c_label,
               round(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 6) AS cosine
        FROM q
        -- same-dim pairs only (pair-level dimension domain, round-10)
        JOIN n c ON c.vec_id <> q.vec_id AND len(q.v) = len(c.v)
        JOIN lab cl ON cl.vec_id = c.vec_id
        WHERE cl.label <> q.label
    ),
    topk AS (
        SELECT query_id, q_label, candidate_id, c_label, cosine FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY cosine DESC, candidate_id
            ) AS rnk FROM scored
        ) WHERE rnk <= 3
    )
    SELECT q_label AS label,
           count(*) AS n_negatives,
           -- integer micro-unit sum: both engines divide the SAME exact
           -- integer, so the 1e-6 rounding can't flip on association order
           round(sum(CAST(round(cosine * 1000000) AS BIGINT))
                 / (count(*) * 1000000.0), 6) AS avg_neg_cosine,
           round(max(cosine), 6) AS max_neg_cosine
    FROM topk GROUP BY q_label ORDER BY label
    """,
)
def q172_hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: for each sampled
    anchor (1-in-20), the 3 nearest neighbors with a DIFFERENT label —
    the high-similarity wrong-class examples a triplet/contrastive loss
    needs. The label filter applies BEFORE ranking (exclude-then-top-k,
    not top-k-then-filter, which under-delivers negatives near label
    clusters); search is the broadcast-anchors × one-corpus-pass shape
    of cosine_topk with the label anti-predicate pushed into the join.
    Per-label counts and negative-similarity stats are value-checked."""
    from flight_delays_progetto_big_data_2024_spark.operators.similarity import (
        _prep,
        cosine_prenormed,
    )
    from pyspark.sql.window import Window as W

    cat = Catalog(spark, sf_dir)
    emb = cat.embeddings
    labels = emb.select("vec_id", "label")
    # ensure_scan_width (round-12): |anchors| dot products per corpus
    # row ran single-task on the narrow scan (3.5s -> 1.2s at sf0.1);
    # no-op at scale — same guard as cosine_topk's corpus side
    c = _prep(ensure_scan_width(emb, "vec_id"), "vec_id", "embedding").join(
        labels.select(F.col("vec_id").alias("id"), F.col("label").alias("c_label")),
        "id",
    )
    q = (
        _prep(emb.filter(F.col("vec_id") % 20 == 0), "vec_id", "embedding")
        .join(
            labels.select(
                F.col("vec_id").alias("id"), F.col("label").alias("q_label")
            ),
            "id",
        )
        .select(
            F.col("id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("nrm").alias("qn"),
            "q_label",
        )
    )
    scored = (
        c.join(
            F.broadcast(q),
            (F.col("id") != F.col("query_id"))
            & (F.col("c_label") != F.col("q_label")),
        )
        .select(
            "query_id",
            "q_label",
            F.col("id").alias("candidate_id"),
            cosine_prenormed("qv", "v", "qn", "nrm").alias("cosine"),
        )
        # pair-level dimension domain (round-10 probe): a cross-dim
        # pair's cosine is NULL (zip_with pads) — desc sorts NULLs
        # LAST, so junk rows still took rank 2-3 whenever a query had
        # fewer than k same-dim negatives, inflating count(*) in the
        # average's denominator (the oracle's len-equality join never
        # produces them). NULL cannot be ranked — wave-5 rule.
        .filter(F.col("cosine").isNotNull())
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("candidate_id"))
    topk = scored.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= 3
    )
    return (
        topk.groupBy(F.col("q_label").alias("label"))
        .agg(
            F.count(F.lit(1)).alias("n_negatives"),
            # integer micro-unit sum — engine-exact average of rounded
            # cosines (float association order can't flip the 1e-6 round)
            F.round(
                F.sum(F.round(F.col("cosine") * 1000000).cast("long"))
                / (F.count(F.lit(1)) * 1000000.0),
                6,
            ).alias("avg_neg_cosine"),
            F.round(F.max("cosine"), 6).alias("max_neg_cosine"),
        )
        .orderBy("label")
    )


@register(
    "q173_alpha_smoothed_mixture",
    sql=f"""
    WITH toks AS (
        SELECT source, sum(len({_TOKS_SQL}))::BIGINT AS n_tokens
        FROM documents GROUP BY source
    ),
    smoothed AS (
        SELECT source, n_tokens,
               pow(n_tokens, 0.7) AS w
        FROM toks
    )
    SELECT source, n_tokens,
           round(n_tokens / (SELECT sum(n_tokens)::DOUBLE FROM toks), 6)
               AS raw_share,
           round(w / (SELECT sum(w) FROM smoothed), 6) AS alpha_share,
           round((w / (SELECT sum(w) FROM smoothed))
                 / (n_tokens / (SELECT sum(n_tokens)::DOUBLE FROM toks)), 4)
               AS boost
    FROM smoothed ORDER BY source
    """,
)
def q173_alpha_smoothed_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-smoothed sampling mixture (p_s ∝ tokens^0.7 — the
    multilingual/multi-source rebalancing rule): per source, the raw
    token share, the alpha-smoothed sampling share, and the implied
    up/down-sampling boost. One token-count rollup + broadcast scalar
    totals; the table every mixture-weighted dataloader is configured
    from (q98's planner consumes exactly these shares)."""
    cat = Catalog(spark, sf_dir)
    toks = cat.documents.groupBy("source").agg(
        F.sum(F.size(tokens("text"))).alias("n_tokens")
    )
    smoothed = toks.withColumn("w", F.pow("n_tokens", 0.7))
    totals = smoothed.agg(
        F.sum("n_tokens").cast("double").alias("tot_tokens"),
        F.sum("w").alias("tot_w"),
    )
    return (
        smoothed.crossJoin(F.broadcast(totals))
        .select(
            "source",
            "n_tokens",
            F.round(F.col("n_tokens") / F.col("tot_tokens"), 6).alias("raw_share"),
            F.round(F.col("w") / F.col("tot_w"), 6).alias("alpha_share"),
            # try_divide: a zero-token source's boost is 0/0 —
            # undefined (DuckDB NULL; ANSI Spark would abort the plan)
            F.round(
                F.try_divide(
                    F.col("w") / F.col("tot_w"),
                    F.col("n_tokens") / F.col("tot_tokens"),
                ),
                4,
            ).alias("boost"),
        )
        .orderBy("source")
    )


@register(
    "q175_length_quality_heatmap",
    sql=f"""
    WITH q AS (
        SELECT doc_id,
               len({_TOKS_SQL}) AS n_toks,
               CASE WHEN len({_TOKS_SQL}) = 0 THEN 0.0
                    ELSE round(
                        0.6 * (len(list_distinct({_TOKS_SQL}))::DOUBLE
                               / len({_TOKS_SQL}))
                        + 0.4 * (CASE WHEN
                              list_aggregate(list_transform({_TOKS_SQL},
                                             t -> len(t)), 'sum')::DOUBLE
                              / len({_TOKS_SQL})
                              BETWEEN 3.0 AND 8.0 THEN 1.0 ELSE 0.5 END)
                        - (CASE WHEN len(text) > 0
                                THEN (len(text) - len(regexp_replace(text,
                                     '[.,!?;:''"]', '', 'g')))::DOUBLE
                                     / len(text)
                                ELSE 0.0 END), 6) END AS quality
        FROM documents
        -- a doc with NO text has no length or quality to rank: NULL
        -- n_toks sorts FIRST in Spark windows, LAST in DuckDB, which
        -- would shift every quintile boundary (wave-5 finding)
        WHERE text IS NOT NULL
    ),
    tiled AS (
        SELECT ntile(5) OVER (ORDER BY n_toks, doc_id) AS len_q,
               ntile(5) OVER (ORDER BY quality, doc_id) AS qual_q
        FROM q
    )
    SELECT len_q, qual_q, count(*) AS n_docs
    FROM tiled GROUP BY len_q, qual_q ORDER BY len_q, qual_q
    """,
)
def q175_length_quality_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Joint length×quality distribution: docs tiled into quintiles on
    BOTH token count and composite quality, cell counts as the heatmap —
    the diagnostic that shows whether a length filter silently doubles
    as a quality filter (diagonal mass) or cuts orthogonally. ntile
    runs over the doc-level aggregate with doc_id tiebreaks (both
    engines tile identically); at extreme doc counts swap quantile
    cutpoint joins, as q143 documents."""
    from pyspark.sql.window import Window

    cat = Catalog(spark, sf_dir)
    q = cat.documents.filter(F.col("text").isNotNull()).select(
        "doc_id",
        F.size(tokens("text")).alias("n_toks"),
        quality_score("text").alias("quality"),
    )
    tiled = q.select(
        F.ntile(5).over(Window.orderBy("n_toks", "doc_id")).alias("len_q"),
        F.ntile(5).over(Window.orderBy("quality", "doc_id")).alias("qual_q"),
    )
    return (
        tiled.groupBy("len_q", "qual_q")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("len_q", "qual_q")
    )


@register(
    "q181_quality_budget_curve",
    sql=f"""
    WITH q AS (
        SELECT doc_id,
               len({_TOKS_SQL}) AS n_toks,
               CASE WHEN len({_TOKS_SQL}) = 0 THEN 0.0
                    ELSE round(
                        0.6 * (len(list_distinct({_TOKS_SQL}))::DOUBLE
                               / len({_TOKS_SQL}))
                        + 0.4 * (CASE WHEN
                              list_aggregate(list_transform({_TOKS_SQL},
                                             t -> len(t)), 'sum')::DOUBLE
                              / len({_TOKS_SQL})
                              BETWEEN 3.0 AND 8.0 THEN 1.0 ELSE 0.5 END)
                        - (CASE WHEN len(text) > 0
                                THEN (len(text) - len(regexp_replace(text,
                                     '[.,!?;:''"]', '', 'g')))::DOUBLE
                                     / len(text)
                                ELSE 0.0 END), 6) END AS quality
        FROM documents
    ),
    tiled AS (
        SELECT n_toks,
               ntile(10) OVER (ORDER BY quality DESC, doc_id) AS decile
        FROM q
    ),
    per AS (
        SELECT decile, count(*) AS n_docs, sum(n_toks)::BIGINT AS toks
        FROM tiled GROUP BY decile
    ),
    tot AS (SELECT sum(toks)::DOUBLE AS t FROM per)
    SELECT decile, n_docs, toks,
           (sum(toks) OVER (ORDER BY decile
                            ROWS UNBOUNDED PRECEDING))::BIGINT AS cum_tokens,
           round(sum(toks) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING)
                 / tot.t, 6) AS cum_share
    FROM per, tot ORDER BY decile
    """,
)
def q181_quality_budget_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best-first token budget curve: rank documents by quality, bucket
    into deciles, and report cumulative token supply per decile — the
    table that answers 'if the training budget is X tokens, how deep
    into the quality distribution must we reach'. The prefix sum runs
    over the 10-ROW decile aggregate (never the doc table), and decile
    assignment is the deterministic-tie ntile of q143/q175."""
    from pyspark.sql.window import Window

    cat = Catalog(spark, sf_dir)
    q = cat.documents.select(
        "doc_id",
        F.size(tokens("text")).alias("n_toks"),
        quality_score("text").alias("quality"),
    )
    tiled = q.select(
        "n_toks",
        F.ntile(10).over(Window.orderBy(F.desc("quality"), F.asc("doc_id"))).alias(
            "decile"
        ),
    )
    per = tiled.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_toks").alias("toks")
    )
    tot = per.agg(F.sum("toks").cast("double").alias("t"))
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "decile",
            "n_docs",
            "toks",
            F.sum("toks").over(w).alias("cum_tokens"),
            F.round(F.sum("toks").over(w) / F.col("t"), 6).alias("cum_share"),
        )
        .orderBy("decile")
    )


@register(
    "q182_source_vocab_overlap",
    sql=f"""
    WITH counts AS (
        SELECT source, term, count(*) AS c
        FROM (SELECT source, unnest({_TOKS_SQL}) AS term FROM documents)
        GROUP BY source, term
    ),
    top AS (
        SELECT source, term FROM (
            -- hex(term): DuckDB window sort is NUL-blind (see q59); a
            -- NUL-bearing tie at the rank-30 boundary would otherwise
            -- select a different top set than Spark's byte-order sort
            SELECT *, row_number() OVER (PARTITION BY source
                                         ORDER BY c DESC, hex(term)) AS rk
            FROM counts
        ) WHERE rk <= 30
    ),
    pairs AS (
        SELECT a.source AS src_a, b.source AS src_b, count(*) AS shared
        FROM top a JOIN top b ON a.term = b.term AND a.source < b.source
        GROUP BY src_a, src_b
    )
    SELECT src_a, src_b, shared,
           round(shared / (60.0 - shared), 6) AS jaccard_top30
    FROM pairs
    ORDER BY jaccard_top30 DESC, src_a, src_b LIMIT 15
    """,
)
def q182_source_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise source-vocabulary overlap: each source's top-30 terms,
    inverted-index joined on the term (never a source crossJoin), scored
    by top-k Jaccard — the redundancy matrix read before paying to
    ingest 'another' crawl that's lexically the same corpus. All
    relations after the count rollup are (sources × 30)-sized."""
    from pyspark.sql.window import Window

    cat = Catalog(spark, sf_dir)
    counts = (
        cat.documents.select("source", F.explode(tokens("text")).alias("term"))
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.partitionBy("source").orderBy(F.desc("c"), F.asc("term"))
    top = (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 30)
        .select("source", "term")
    )
    a, b = top.alias("a"), top.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.term") == F.col("b.term"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("src_a"), F.col("b.source").alias("src_b")
        )
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    return (
        pairs.select(
            "src_a",
            "src_b",
            "shared",
            F.round(F.col("shared") / (60.0 - F.col("shared")), 6).alias(
                "jaccard_top30"
            ),
        )
        .orderBy(F.desc("jaccard_top30"), "src_a", "src_b")
        .limit(15)
    )


@register(
    "q183_dup_cluster_quality_spread",
    sql=f"""
    WITH RECURSIVE sh AS ({_SHINGLES_SQL}),
    p AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE round(len(list_intersect(a.s, b.s))::DOUBLE
                    / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))),
                    6) >= 0.5
    ),
    e AS (SELECT id_a AS u, id_b AS v FROM p UNION SELECT id_b, id_a FROM p),
    r(id, comp) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.u, r.comp FROM e JOIN r ON r.id = e.v
    ),
    comp AS (SELECT id AS doc_id, min(comp) AS cluster FROM r GROUP BY id),
    q AS (
        SELECT doc_id,
               CASE WHEN len({_TOKS_SQL}) = 0 THEN 0.0
                    ELSE round(
                        0.6 * (len(list_distinct({_TOKS_SQL}))::DOUBLE
                               / len({_TOKS_SQL}))
                        + 0.4 * (CASE WHEN
                              list_aggregate(list_transform({_TOKS_SQL},
                                             t -> len(t)), 'sum')::DOUBLE
                              / len({_TOKS_SQL})
                              BETWEEN 3.0 AND 8.0 THEN 1.0 ELSE 0.5 END)
                        - (CASE WHEN len(text) > 0
                                THEN (len(text) - len(regexp_replace(text,
                                     '[.,!?;:''"]', '', 'g')))::DOUBLE
                                     / len(text)
                                ELSE 0.0 END), 6) END AS quality
        FROM documents
    ),
    clusters AS (
        SELECT c.cluster, count(*) AS size,
               round(max(q.quality) - min(q.quality), 6) AS spread,
               round(max(q.quality)
                     - any_value(q.quality ORDER BY c.doc_id), 6) AS min_id_loss
        FROM comp c JOIN q ON q.doc_id = c.doc_id
        GROUP BY c.cluster HAVING count(*) > 1
    )
    SELECT count(*) AS n_multi_clusters,
           round(avg(spread), 6) AS avg_spread,
           round(max(spread), 6) AS max_spread,
           round(avg(min_id_loss), 6) AS avg_min_id_loss,
           sum(CASE WHEN min_id_loss > 0 THEN 1 ELSE 0 END)::BIGINT
               AS n_suboptimal_keeps
    FROM clusters
    """,
)
def q183_dup_cluster_quality_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does dedup's survivor policy cost quality? For every multi-doc
    near-dup cluster: the quality spread between best and worst copy,
    and the loss incurred by the NAIVE min-id keep (best quality minus
    the min-id doc's quality) — nonzero rows are exactly the clusters
    where q102's quality-aware survivor selection pays over q58's
    arbitrary-but-deterministic keep. Clusters come from the q58
    machinery; quality joins on the cluster relation (cluster-sized
    after the first aggregate)."""
    from flight_delays_progetto_big_data_2024_spark.graph.algorithms import (
        connected_components,
    )

    cat = Catalog(spark, sf_dir)
    pairs = jaccard_pairs(cat.documents, "doc_id", "text", k=3, threshold=0.5)
    cc = connected_components(
        pairs,
        "id_a",
        "id_b",
        vertices=cat.documents.select(F.col("doc_id").alias("id")),
    )
    q = cat.documents.select("doc_id", quality_score("text").alias("quality"))
    joined = cc.select(F.col("id").alias("doc_id"), F.col("component")).join(
        q, "doc_id"
    )
    clusters = (
        joined.groupBy("component")
        .agg(
            F.count(F.lit(1)).alias("size"),
            F.round(F.max("quality") - F.min("quality"), 6).alias("spread"),
            F.round(
                F.max("quality")
                - F.min_by("quality", "doc_id"),
                6,
            ).alias("min_id_loss"),
        )
        .filter(F.col("size") > 1)
    )
    return clusters.agg(
        F.count(F.lit(1)).alias("n_multi_clusters"),
        F.round(F.avg("spread"), 6).alias("avg_spread"),
        F.round(F.max("spread"), 6).alias("max_spread"),
        F.round(F.avg("min_id_loss"), 6).alias("avg_min_id_loss"),
        F.sum((F.col("min_id_loss") > 0).cast("long")).alias("n_suboptimal_keeps"),
    )


@register(
    "q184_dirty_corpus_robustness",
    sql=f"""
    WITH docs_all AS (
        SELECT doc_id, text, lang, source, n_chars FROM documents
        UNION ALL
        SELECT * FROM (VALUES
            (9000000001, NULL,              'xx', 'planted', 0),
            (9000000002, '',                'xx', 'planted', 0),
            (9000000003, '   ',             'xx', 'planted', 3),
            (9000000004, '!!! ??? ,,, ...', 'xx', 'planted', 15)
        ) AS t(doc_id, text, lang, source, n_chars)
    ),
    base AS (
        SELECT source, {_TOKS_SQL} AS toks,
               len(text) AS n,
               len(text) - len(regexp_replace(text, '[.,!?;:''"]', '', 'g')) AS n_punct
        FROM docs_all
    ),
    m AS (
        SELECT source, len(toks) AS tc,
               CASE WHEN len(toks) > 0
                    THEN list_aggregate(list_transform(toks, t -> len(t)), 'sum')::DOUBLE
                         / len(toks) END AS atl,
               CASE WHEN len(toks) > 0
                    THEN len(list_distinct(toks))::DOUBLE / len(toks) END AS diversity,
               CASE WHEN n > 0 THEN n_punct::DOUBLE / n ELSE 0.0 END AS pr
        FROM base
    ),
    q AS (
        SELECT source,
               tc,
               CASE WHEN tc = 0 THEN 0.0
                    ELSE round(0.6 * diversity
                               + 0.4 * (CASE WHEN atl >= 3.0 AND atl <= 8.0
                                             THEN 1.0 ELSE 0.5 END)
                               - pr, 6) END AS quality
        FROM m
    ),
    emb_all AS (
        SELECT vec_id, embedding, label FROM embeddings
        UNION ALL
        SELECT 9000000001, list_transform(range(64), x -> 0.0::FLOAT), 0
        UNION ALL
        SELECT 9000000002, list_transform(range(64), x -> 'NaN'::FLOAT), 0
        UNION ALL
        SELECT 9000000003, NULL, 0
        UNION ALL
        SELECT 9000000004, list_transform(range(64), x -> 'Infinity'::FLOAT), 0
    ),
    prep AS (
        SELECT vec_id, embedding::DOUBLE[] AS v,
               -- norm via transform+sum, NOT list_dot_product: DuckDB's
               -- vectorized list_inner_product evaluates over the whole
               -- chunk and hard-errors on a NULL list in a row the WHERE
               -- already deselected; the lambda form is NULL-safe under
               -- any evaluation order (and bitwise-identical on valid
               -- rows — same left-to-right accumulation)
               sqrt(list_aggregate(list_transform(embedding::DOUBLE[],
                    x -> x * x), 'sum')) AS nrm
        FROM emb_all
        -- NULL lists / NULL elements must drop BEFORE the product:
        -- DuckDB's vectorized list_inner_product hard-errors on them
        -- (Spark's aggregate() yields NULL → dropped in 'defined'
        -- anyway, so the metrics are unchanged on every corpus)
        WHERE embedding IS NOT NULL
          AND len(list_filter(embedding, x -> x IS NULL)) = 0
    ),
    defined AS (
        SELECT * FROM prep
        WHERE nrm IS NOT NULL AND NOT isnan(nrm)
          AND nrm > 0 AND nrm < 'Infinity'::DOUBLE
    ),
    scored AS (
        SELECT qv.vec_id AS query_id, c.vec_id AS candidate_id,
               round(list_dot_product(qv.v, c.v) / (qv.nrm * c.nrm), 6) AS cosine
        FROM (SELECT * FROM defined WHERE vec_id < 5) qv
        -- same-dim pairs only (pair-level dimension domain, round-10)
        JOIN defined c ON c.vec_id <> qv.vec_id AND len(qv.v) = len(c.v)
    ),
    topk AS (
        SELECT * FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY cosine DESC, candidate_id
            ) AS rnk FROM scored
        ) WHERE rnk <= 5
    ),
    ev_all AS (
        SELECT event_id, ts, user_id, event_type, value FROM events
        UNION ALL
        SELECT * FROM (VALUES
            (9000000001, NULL::TIMESTAMP, NULL, NULL, NULL::DOUBLE),
            (9000000002, NULL::TIMESTAMP, 42, 'view', 7.5::DOUBLE),
            (9000000003, TIMESTAMP '2024-01-05 09:00:00', 42, 'view',
             'NaN'::DOUBLE),
            (9000000004, TIMESTAMP '2024-01-06 09:00:00', 42, 'view',
             'Infinity'::DOUBLE)
        ) AS t(event_id, ts, user_id, event_type, value)
    ),
    ev_m AS (
        -- timeline domain: an event without a timestamp joins no
        -- window (ev_timed counts non-null ts). measurement domain:
        -- NaN/Inf are not measurements (isfinite filter) but a
        -- NULL-ts event still measures — the two domains are
        -- independent (wave-5 rules, pinned under the driver hash)
        SELECT count(*)::DOUBLE AS ev_total,
               count(ts)::DOUBLE AS ev_timed,
               -- second moment: MEASURE_DOMAIN_BOUND on top of the
               -- finite filter (round-10 probe — a finite +DBL_MAX
               -- view value overflows the squared deviation: DuckDB
               -- raises, Spark saturates; operators/prep.py). The
               -- FIRST-moment sum below keeps the full finite domain:
               -- same-sign absorption is deterministic in both engines
               round(stddev_samp(value) FILTER (
                   WHERE event_type = 'view' AND {_MOMENT_VALUE_SQL}),
                   6) + 0.0 AS view_sigma,
               round(sum(value) FILTER (
                   WHERE event_type = 'view' AND value IS NOT NULL
                     AND isfinite(value)), 6) + 0.0 AS view_value_sum
        FROM ev_all
    )
    SELECT metric, value FROM (
        SELECT 'docs_total' AS metric, count(*)::DOUBLE AS value FROM docs_all
        UNION ALL SELECT 'docs_token_null', count(*) FILTER (WHERE tc IS NULL)::DOUBLE FROM q
        UNION ALL SELECT 'docs_token_zero', count(*) FILTER (WHERE tc = 0)::DOUBLE FROM q
        UNION ALL SELECT 'planted_quality_sum',
                         round(sum(quality) FILTER (WHERE source = 'planted'), 6) + 0.0 FROM q
        UNION ALL SELECT 'emb_total', count(*)::DOUBLE FROM emb_all
        UNION ALL SELECT 'emb_defined', count(*)::DOUBLE FROM defined
        UNION ALL SELECT 'topk_id_sum', sum(candidate_id)::DOUBLE FROM topk
        UNION ALL SELECT 'topk_cos_sum', round(sum(cosine), 6) + 0.0 FROM topk
        UNION ALL SELECT 'ev_total', ev_total FROM ev_m
        UNION ALL SELECT 'ev_timed', ev_timed FROM ev_m
        UNION ALL SELECT 'view_sigma', view_sigma FROM ev_m
        UNION ALL SELECT 'view_value_sum', view_value_sum FROM ev_m
    ) ORDER BY metric
    """,
)
def q184_dirty_corpus_robustness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dirty-corpus robustness with DRIVER-HASH evidence: plants the
    exact defect classes the round-3 sweep fixed (NULL / empty /
    whitespace-only / punctuation-soup text; zero / NaN / NULL / Inf
    embedding vectors) into the live testdata via unions, then runs the
    text-metric and cosine operator paths over the contaminated corpus.
    The oracle replays the identical planted rows and semantics, so the
    NULL-handling contracts (token_count(NULL) is NULL, quality of
    token-less text is 0.0, quality of NULL text is NULL and is SKIPPED
    by sum, dirty vectors leave the defined-cosine subspace without
    aborting the query or perturbing clean top-k results) are pinned by
    the driver's value hash — not just by pytest on synthetic frames
    (tests/test_dirty_inputs.py remains the fine-grained suite).

    Long format (metric, value) keeps one stable schema across the two
    table families. Rounded sums that can straddle zero carry the
    ``+ 0.0`` negative-zero pin in both engines (q101 lesson). At scale
    the plan is two single-pass conditional aggregates plus the q30
    broadcast top-k — the planted union is constant-size."""
    from flight_delays_progetto_big_data_2024_spark.operators.similarity import (
        _prep,
    )

    cat = Catalog(spark, sf_dir)
    planted_docs = spark.createDataFrame(
        [
            (9000000001, None, "xx", "planted", 0),
            (9000000002, "", "xx", "planted", 0),
            (9000000003, "   ", "xx", "planted", 3),
            (9000000004, "!!! ??? ,,, ...", "xx", "planted", 15),
        ],
        schema=cat.documents.schema,
    )
    docs_all = cat.documents.unionByName(planted_docs)
    doc_m = docs_all.select(
        token_count("text").alias("tc"),
        quality_score("text").alias("quality"),
        "source",
    ).agg(
        F.count(F.lit(1)).cast("double").alias("docs_total"),
        F.sum(F.when(F.col("tc").isNull(), 1).otherwise(0))
        .cast("double")
        .alias("docs_token_null"),
        F.sum(F.when(F.col("tc") == 0, 1).otherwise(0))
        .cast("double")
        .alias("docs_token_zero"),
        (
            F.round(
                F.sum(F.when(F.col("source") == "planted", F.col("quality"))), 6
            )
            + F.lit(0.0)
        ).alias("planted_quality_sum"),
    )

    dim = 64
    zero = [0.0] * dim
    nan_vec = [float("nan")] * dim
    inf_vec = [float("inf")] * dim
    planted_emb = spark.createDataFrame(
        [
            (9000000001, zero, 0),
            (9000000002, nan_vec, 0),
            (9000000003, None, 0),
            (9000000004, inf_vec, 0),
        ],
        schema=cat.embeddings.schema,
    )
    emb_all = cat.embeddings.unionByName(planted_emb)
    emb_m = emb_all.agg(F.count(F.lit(1)).cast("double").alias("emb_total"))
    defined_m = _prep(emb_all, "vec_id", "embedding").agg(
        F.count(F.lit(1)).cast("double").alias("emb_defined")
    )
    topk = cosine_topk(emb_all, emb_all.filter(F.col("vec_id") < 5), k=5)
    topk_m = topk.agg(
        F.sum("candidate_id").cast("double").alias("topk_id_sum"),
        (F.round(F.sum("cosine"), 6) + F.lit(0.0)).alias("topk_cos_sum"),
    )

    import datetime as _dt

    # events family (round-6 wave-5 rules under the driver hash): the
    # timeline domain (NULL ts joins no window) and the measurement
    # domain (NaN/Inf are not measurements) are INDEPENDENT — the
    # NULL-ts event still contributes its finite value
    planted_ev = spark.createDataFrame(
        [
            (9000000001, None, None, None, None, None),
            (9000000002, None, 42, "view", 7.5, None),
            (9000000003, _dt.datetime(2024, 1, 5, 9), 42, "view",
             float("nan"), None),
            (9000000004, _dt.datetime(2024, 1, 6, 9), 42, "view",
             float("inf"), None),
        ],
        schema=cat.events.schema,
    )
    from flight_delays_progetto_big_data_2024_spark.operators.prep import (
        is_moment_measurement,
    )

    ev_all = cat.events.unionByName(planted_ev)
    finite_view = (
        (F.col("event_type") == "view")
        & F.col("value").isNotNull()
        & ~F.isnan("value")
        & (F.abs("value") < F.lit(float("inf")))
    )
    # second moment adds MEASURE_DOMAIN_BOUND (round-10 measure probe:
    # a finite +DBL_MAX view value overflows the squared deviation —
    # DuckDB raises, Spark saturates); the first-moment sum keeps the
    # full finite domain (same-sign absorption is deterministic)
    moment_view = finite_view & is_moment_measurement("value")
    ev_m = ev_all.agg(
        F.count(F.lit(1)).cast("double").alias("ev_total"),
        F.count("ts").cast("double").alias("ev_timed"),
        (
            F.round(F.stddev_samp(F.when(moment_view, F.col("value"))), 6)
            + F.lit(0.0)
        ).alias("view_sigma"),
        (
            F.round(F.sum(F.when(finite_view, F.col("value"))), 6)
            + F.lit(0.0)
        ).alias("view_value_sum"),
    )

    def melt(df: DataFrame) -> DataFrame:
        pairs = ", ".join(f"'{c}', `{c}`" for c in df.columns)
        return df.selectExpr(
            f"stack({len(df.columns)}, {pairs}) AS (metric, value)"
        )

    return (
        melt(doc_m)
        .unionByName(melt(emb_m))
        .unionByName(melt(defined_m))
        .unionByName(melt(topk_m))
        .unionByName(melt(ev_m))
        .orderBy("metric")
    )


@register(
    "q185_per_domain_mixture_cap",
    sql="""
    WITH ranked AS (
        SELECT doc_id, source, n_chars,
               row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rk
        FROM documents
    )
    SELECT source,
           count(*)::BIGINT AS docs_kept,
           sum(doc_id)::BIGINT AS kept_id_sum,
           sum(n_chars)::BIGINT AS kept_chars
    FROM ranked WHERE rk <= 15
    GROUP BY source
    ORDER BY source
    """,
)
def q185_per_domain_mixture_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture cap: at most 15 documents per source (CCNet /
    RefinedWeb keep-N-per-host), deterministic by doc_id, then the kept
    mix summarized per source. One window shuffle on the domain key —
    operators.curation.cap_per_group carries the hot-domain skew
    analysis (broadcast hash-quantile pre-filter) for the 100 TB tier,
    and tests/test_skew_bucketing.py measures it on a Zipf corpus."""
    from flight_delays_progetto_big_data_2024_spark.operators.curation import (
        cap_per_group,
    )

    cat = Catalog(spark, sf_dir)
    kept = cap_per_group(cat.documents, "source", 15, order_cols=("doc_id",))
    return (
        kept.groupBy("source")
        .agg(
            F.count("*").alias("docs_kept"),
            F.sum("doc_id").alias("kept_id_sum"),
            F.sum("n_chars").alias("kept_chars"),
        )
        .orderBy("source")
    )


from flight_delays_progetto_big_data_2024_spark.functions.text import (  # noqa: E402
    canonicalize_url_sql,
)

_URL_VARIANT_SQL = """
    CASE doc_id % 5
        WHEN 0 THEN 'https://WWW.Example.COM/' || source || '/'
                     || CAST(doc_id // 5 AS BIGINT) || '/page/'
        WHEN 1 THEN 'https://www.example.com:443/' || source || '/'
                     || CAST(doc_id // 5 AS BIGINT) || '/page'
        WHEN 2 THEN 'https://www.example.com/' || source || '/'
                     || CAST(doc_id // 5 AS BIGINT)
                     || '/page?utm_source=crawl&utm_medium=cpc'
        WHEN 3 THEN 'https://www.example.com/' || source || '/'
                     || CAST(doc_id // 5 AS BIGINT) || '/page#section-2'
        ELSE        'https://www.example.com/' || source || '/'
                     || CAST(doc_id // 5 AS BIGINT)
                     || '/page?id=1&utm_campaign=x'
    END
"""


@register(
    "q186_url_canonical_dedup",
    sql=f"""
    WITH crawl AS (
        SELECT doc_id, source, {_URL_VARIANT_SQL} AS url FROM documents
    ),
    canon AS (
        SELECT doc_id, source, url,
               {canonicalize_url_sql('url')} AS canonical_url
        FROM crawl
    ),
    survivors AS (
        SELECT canonical_url, min(doc_id) AS keep_doc_id,
               count(*) AS family_size
        FROM canon GROUP BY canonical_url
    )
    SELECT c.source,
           count(*)::BIGINT AS raw_urls,
           count(DISTINCT c.url)::BIGINT AS distinct_raw,
           count(DISTINCT c.canonical_url)::BIGINT AS distinct_canonical,
           sum(CASE WHEN c.doc_id = s.keep_doc_id THEN 1 ELSE 0 END)::BIGINT
               AS docs_kept
    FROM canon c JOIN survivors s ON c.canonical_url = s.canonical_url
    GROUP BY c.source
    ORDER BY c.source
    """,
)
def q186_url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-canonicalization dedup — the cheapest web-crawl curation
    pass: canonicalize (host case, default port, fragment, utm/gclid
    tracking params, trailing slash), keep min-doc_id per canonical
    family, report per-source collapse stats. URLs are synthesized
    deterministically from the documents table (five dirty variants of
    a base URL keyed by ``doc_id % 5``, so variants 0/1/3 and the bare
    form collapse into one family and the ``?id=1`` form stays its own
    key). The canonicalizer is pure codegen'd column expressions
    (functions.text.canonicalize_url) and its oracle twin
    (canonicalize_url_sql) shares the same RE2 patterns — driver-hash
    parity pins both the regex semantics and the dedup.

    Scale (round-13 rewrite): the former single groupBy carried two
    grouped count(DISTINCT)s, which plan as an Expand that triples
    every row ahead of the shuffle, plus a survivor decorate-back join.
    Rewritten as four independent branches over one checkpointed crawl
    relation (canonicalize runs once): per-source row counts; distinct
    (source, url) pairs then a count; distinct (source, canonical_url)
    pairs then a count; and the kept count via a min-over-family window
    + filter (exactly the oracle's ``doc_id = keep_doc_id`` row
    semantics, no join). Each branch shuffles ~N narrow rows once with
    no expansion, the branches schedule concurrently, and the decorate
    join is gone — strictly fewer shuffled rows at any scale (guide
    §2.3/§2.4; same mechanism as the r12 q28/q174/q188 unrolls, grouped
    form). Rows whose canonical_url is NULL (only reachable via a NULL
    source/doc_id making the synthesized url NULL) are filtered once up
    front — the oracle's equality join drops them from every aggregate,
    so the filter is the join's exact NULL semantics.
    """
    from pyspark.sql.window import Window

    from flight_delays_progetto_big_data_2024_spark.functions.text import (
        canonicalize_url,
    )

    cat = Catalog(spark, sf_dir)
    bucket = F.floor(F.col("doc_id") / 5).cast("long").cast("string")
    base = F.concat(F.lit("https://www.example.com/"), F.col("source"),
                    F.lit("/"), bucket)
    url = (
        F.when(F.col("doc_id") % 5 == 0,
               F.concat(F.lit("https://WWW.Example.COM/"), F.col("source"),
                        F.lit("/"), bucket, F.lit("/page/")))
        .when(F.col("doc_id") % 5 == 1,
              F.concat(F.lit("https://www.example.com:443/"), F.col("source"),
                       F.lit("/"), bucket, F.lit("/page")))
        .when(F.col("doc_id") % 5 == 2,
              F.concat(base, F.lit("/page?utm_source=crawl&utm_medium=cpc")))
        .when(F.col("doc_id") % 5 == 3,
              F.concat(base, F.lit("/page#section-2")))
        .otherwise(F.concat(base, F.lit("/page?id=1&utm_campaign=x")))
    )
    crawl = (
        cat.documents.select("doc_id", "source", url.alias("url"))
        .withColumn("canonical_url", canonicalize_url("url"))
        .filter(F.col("canonical_url").isNotNull())
        .localCheckpoint(eager=False)
    )
    raw = crawl.groupBy("source").agg(F.count("*").alias("raw_urls"))
    distinct_raw = (
        crawl.select("source", "url")
        .distinct()
        .groupBy("source")
        .agg(F.count("url").alias("distinct_raw"))
    )
    distinct_canonical = (
        crawl.select("source", "canonical_url")
        .distinct()
        .groupBy("source")
        .agg(F.count("canonical_url").alias("distinct_canonical"))
    )
    kept = (
        crawl.withColumn(
            "__keep", F.min("doc_id").over(Window.partitionBy("canonical_url"))
        )
        .filter(F.col("doc_id") == F.col("__keep"))
        .groupBy("source")
        .agg(F.count("*").alias("docs_kept"))
    )
    return (
        raw.join(distinct_raw, "source", "left")
        .join(distinct_canonical, "source", "left")
        .join(kept, "source", "left")
        .select(
            "source",
            "raw_urls",
            "distinct_raw",
            "distinct_canonical",
            F.coalesce(F.col("docs_kept"), F.lit(0).cast("long")).alias(
                "docs_kept"
            ),
        )
        .orderBy("source")
    )
