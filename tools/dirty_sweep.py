"""Wave-5 dirty-corpus parity sweep (ad-hoc evidence tool, not CI).

Builds a COPY of a testdata SF directory with adversarial rows planted
in every table (NULL keys, NULL measures, NaN doubles, empty strings,
negative counts, empty embedding arrays), then runs EVERY SQL-backed
registered query (``__spark_entry__.queries()``) on the dirty copy in
both engines — the Spark plan and its own DuckDB oracle — and reports
every crash and every value divergence.

The clean-corpus driver sweep can never see these defects: the driver
testdata has no NULLs. Prior waves (rounds 3-5) probed operators one
family at a time; this sweep closes the gap by probing the FULL
registered surface mechanically. Findings get pinned as regression
tests in tests/test_dirty_inputs.py (the wave-1..4 pattern).

Run ALONE (Spark local[32]):  python tools/dirty_sweep.py [--only q65,q66]
"""
from __future__ import annotations

import argparse
import math
import shutil
import sys
import tempfile
from pathlib import Path

import duckdb
import pandas as pd

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SRC_SF = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# Planted rows per table: same schema, adversarial values. IDs live far
# outside the clean key ranges so they join to nothing real; the point
# is NULL/NaN/degenerate handling, where the two engines can disagree.
NAN = float("nan")
INF = float("inf")
TS0 = pd.Timestamp("1997-06-15 12:00:00")
#: in-corpus-range timestamp so Inf probes flow through every window
TS1 = pd.Timestamp("2024-01-05 09:00:00")
DIRTY: dict[str, list[dict]] = {
    "region": [
        {"r_regionkey": None, "r_name": None},
    ],
    "nation": [
        {"n_nationkey": None, "n_name": None, "n_regionkey": None},
        {"n_nationkey": 990001, "n_name": "", "n_regionkey": None},
    ],
    "customer": [
        {"c_custkey": None, "c_name": None, "c_nationkey": None,
         "c_acctbal": None, "c_mktsegment": None},
        {"c_custkey": 990002, "c_name": "", "c_nationkey": None,
         "c_acctbal": NAN, "c_mktsegment": ""},
        {"c_custkey": 990014, "c_name": "inf", "c_nationkey": None,
         "c_acctbal": -INF, "c_mktsegment": "BUILDING"},
    ],
    "supplier": [
        {"s_suppkey": None, "s_name": None, "s_nationkey": None,
         "s_acctbal": None},
        {"s_suppkey": 990003, "s_name": "", "s_nationkey": None,
         "s_acctbal": -0.0},
    ],
    "part": [
        {"p_partkey": None, "p_name": None, "p_brand": None,
         "p_type": None, "p_size": None, "p_retailprice": None},
        {"p_partkey": 990004, "p_name": "", "p_brand": "",
         "p_type": "", "p_size": -1, "p_retailprice": NAN},
    ],
    "orders": [
        {"o_orderkey": None, "o_custkey": None, "o_orderstatus": None,
         "o_totalprice": None, "o_orderdate": None,
         "o_orderpriority": None},
        {"o_orderkey": 990005, "o_custkey": None, "o_orderstatus": "",
         "o_totalprice": NAN, "o_orderdate": TS0, "o_orderpriority": ""},
        {"o_orderkey": 990011, "o_custkey": 990011, "o_orderstatus": "O",
         "o_totalprice": INF, "o_orderdate": TS1,
         "o_orderpriority": "1-URGENT"},
    ],
    "lineitem": [
        {"l_orderkey": None, "l_partkey": None, "l_suppkey": None,
         "l_linenumber": None, "l_quantity": None,
         "l_extendedprice": None, "l_discount": None, "l_tax": None,
         "l_returnflag": None, "l_linestatus": None, "l_shipdate": None},
        {"l_orderkey": 990006, "l_partkey": None, "l_suppkey": None,
         "l_linenumber": 1, "l_quantity": -1.0,
         "l_extendedprice": NAN, "l_discount": 0.0, "l_tax": 0.0,
         "l_returnflag": "", "l_linestatus": "", "l_shipdate": TS0},
        {"l_orderkey": 990012, "l_partkey": None, "l_suppkey": None,
         "l_linenumber": 1, "l_quantity": 1.0,
         "l_extendedprice": INF, "l_discount": 0.0, "l_tax": 0.0,
         "l_returnflag": "N", "l_linestatus": "O", "l_shipdate": TS1},
    ],
    "events": [
        {"event_id": None, "ts": None, "user_id": None,
         "event_type": None, "value": None, "props": None},
        {"event_id": 990007, "ts": TS0, "user_id": None,
         "event_type": "", "value": NAN, "props": ""},
        {"event_id": 990013, "ts": TS1, "user_id": 990013,
         "event_type": "view", "value": INF, "props": "{}"},
        # round-7 tie probes: tied (user_id, ts) rows are the input
        # class where a ts-only window sort is nondeterministic — the
        # q41/q130 gaps-and-islands decompositions split one session
        # into two under load before the (ts, event_id) total-order
        # fix. A 3-way same-user tie exercises flag+running-sum,
        # sequence (lag/lead), and rank paths; the cluster also ties
        # with 990013 ACROSS users for global sweep-line windows.
        {"event_id": 990022, "ts": TS1, "user_id": 990022,
         "event_type": "view", "value": 1.0, "props": "{}"},
        {"event_id": 990023, "ts": TS1, "user_id": 990022,
         "event_type": "click", "value": 2.0, "props": "{}"},
        {"event_id": 990024, "ts": TS1, "user_id": 990022,
         "event_type": "purchase", "value": 3.0, "props": "{}"},
        # two undated events for the SAME user — the pairing form of
        # "undated rows have no timeline place": they must not order,
        # session, or interval-pair with each other
        {"event_id": 990025, "ts": None, "user_id": 990025,
         "event_type": "view", "value": 1.0, "props": "{}"},
        {"event_id": 990026, "ts": None, "user_id": 990025,
         "event_type": "click", "value": 2.0, "props": "{}"},
        # session-gap boundary trio: a gap of EXACTLY 2h merges (the
        # contract is strictly-greater), 2h + 1 microsecond splits.
        # Probes the double-cast-seconds arithmetic (Spark plans)
        # against microsecond-integer INTERVAL comparison (DuckDB) at
        # the representability edge.
        {"event_id": 990027, "ts": TS1, "user_id": 990027,
         "event_type": "view", "value": 1.0, "props": "{}"},
        {"event_id": 990028,
         "ts": TS1 + pd.Timedelta(hours=2), "user_id": 990027,
         "event_type": "view", "value": 1.0, "props": "{}"},
        {"event_id": 990029,
         "ts": TS1 + pd.Timedelta(hours=4, microseconds=1),
         "user_id": 990027, "event_type": "view", "value": 1.0,
         "props": "{}"},
        # negative zero as the ONLY measurement of its (user, type)
        # group: the driver's value hash distinguishes IEEE -0.0 from
        # +0.0, so any rounded aggregate landing on this group must
        # normalize the zero sign in BOTH engines (the q101 rule)
        {"event_id": 990030, "ts": TS1, "user_id": 990030,
         "event_type": "error", "value": -0.0, "props": "{}"},
    ],
    "documents": [
        {"doc_id": None, "text": None, "lang": None, "source": None,
         "n_chars": None},
        {"doc_id": 990008, "text": "", "lang": "", "source": "",
         "n_chars": -1},
        {"doc_id": 990009, "text": "   \n\t  ", "lang": "xx",
         "source": "dirty://", "n_chars": 0},
        # TWO NULL-text docs with REAL ids: one NULL-text row alone can
        # never exercise the near-dup PAIRING path, which is where the
        # round-7 [NULL]-shingle defect lived (two NULL-text docs were
        # phantom J=1.0 near-dups in Spark while the oracle emitted no
        # pair — xxhash64/array_intersect treat NULL as a value)
        {"doc_id": 990017, "text": None, "lang": "xx",
         "source": "dirty://", "n_chars": None},
        {"doc_id": 990018, "text": None, "lang": None,
         "source": "dirty://", "n_chars": 0},
        # unicode case-folding / width probes: dotted capital I, sharp
        # s (and capital sharp s), final sigma, ligature, astral-plane
        # letters + emoji, combining mark, NBSP and zero-width space
        {"doc_id": 990016,
         "text": ("\u0130stanbul STRASSE stra\u00dfe \u1e9e "
                  "\u03a3\u0399\u03a3\u03a5\u03a6\u039f\u03a3 "
                  "ef\ufb03cient \U0001d4bd\U0001d4ee\U0001d4f5 "
                  "\U0001f30d\U0001f30d caf\u00e9 cafe\u0301 "
                  "a\u00a0b c\u200bd"),
         "lang": "xx", "source": "unicode", "n_chars": 60},
        # round-7 POSITIVE controls: planted TRUE duplicate pairs. The
        # negative controls only prove degenerate rows stay OUT of the
        # pairing paths; these prove real pairs come THROUGH them
        # identically in both engines (exact dedup keep-first, J=1.0
        # near-dups, cluster membership). Vocabulary is the corpus
        # pool, so the planted shingles share df mass with real docs
        # and travel the inverted-index/prefix-filter paths at
        # realistic selectivity. 990034 differs from the pair by ONE
        # middle token (J ~ 0.6 on 3-word shingles) to exercise
        # below-threshold scoring without fabricating a near-dup.
        {"doc_id": 990030,
         "text": "spark window merge join filter table scan batch "
                 "stream data key order sort",
         "lang": "en", "source": "web", "n_chars": 77},
        {"doc_id": 990031,
         "text": "spark window merge join filter table scan batch "
                 "stream data key order sort",
         "lang": "en", "source": "dirty://", "n_chars": 77},
        {"doc_id": 990034,
         "text": "spark window merge join vector table scan batch "
                 "stream data key order sort",
         "lang": "en", "source": "web", "n_chars": 77},
        # identical twins of the 990016 unicode probe -> a 3-clique:
        # hashing/case-folding parity must hold on the PAIRING path
        # for non-ASCII bytes, not just per-row
        {"doc_id": 990032,
         "text": ("\u0130stanbul STRASSE stra\u00dfe \u1e9e "
                  "\u03a3\u0399\u03a3\u03a5\u03a6\u039f\u03a3 "
                  "ef\ufb03cient \U0001d4bd\U0001d4ee\U0001d4f5 "
                  "\U0001f30d\U0001f30d caf\u00e9 cafe\u0301 "
                  "a\u00a0b c\u200bd"),
         "lang": "xx", "source": "unicode", "n_chars": 60},
        {"doc_id": 990033,
         "text": ("\u0130stanbul STRASSE stra\u00dfe \u1e9e "
                  "\u03a3\u0399\u03a3\u03a5\u03a6\u039f\u03a3 "
                  "ef\ufb03cient \U0001d4bd\U0001d4ee\U0001d4f5 "
                  "\U0001f30d\U0001f30d caf\u00e9 cafe\u0301 "
                  "a\u00a0b c\u200bd"),
         "lang": "xx", "source": "unicode", "n_chars": 60},
    ],
    "embeddings": [
        {"vec_id": None, "embedding": None, "label": None},
        {"vec_id": 990010, "embedding": [], "label": None},
        {"vec_id": 990015, "embedding": [0.25] * 63 + [INF], "label": 3},
        # TWO of each degenerate kind with REAL ids (round-7 principle:
        # one degenerate row can never exercise the PAIRING path —
        # two NULL/empty/non-finite vectors must not become cosine-1
        # neighbors, semantic-dup pairs, or shared k-means/PQ cells)
        {"vec_id": 990019, "embedding": None, "label": 1},
        {"vec_id": 990020, "embedding": [], "label": 2},
        {"vec_id": 990021, "embedding": [0.5] * 63 + [NAN], "label": 3},
        # round-7 POSITIVE controls: an identical pair (cosine exactly
        # 1.0 — the >= threshold boundary) and its antipodal twin
        # (cosine exactly -1.0). Components are exact binary quarters,
        # so dot products and norms are bit-identical in both engines
        # regardless of summation order; the pair must surface in
        # every cosine/semantic-dup/ANN family identically.
        {"vec_id": 990030,
         "embedding": [((i % 7) + 1) / 4.0 for i in range(64)],
         "label": 1},
        {"vec_id": 990031,
         "embedding": [((i % 7) + 1) / 4.0 for i in range(64)],
         "label": 2},
        {"vec_id": 990032,
         "embedding": [-((i % 7) + 1) / 4.0 for i in range(64)],
         "label": 1},
    ],
}


def _sql_lit(v, typ: str) -> str:
    """DuckDB literal for a planted value. NaN/Inf must go through SQL
    literals: pandas->parquet silently rewrites float NaN as NULL
    (nan_as_null), which un-plants the NaN probes entirely."""
    if v is None:
        return f"NULL::{typ}"
    if isinstance(v, float) and math.isnan(v):
        return f"'NaN'::{typ}"
    if isinstance(v, float) and math.isinf(v):
        return f"'{'-' if v < 0 else ''}Infinity'::{typ}"
    if isinstance(v, float) and str(v) == "-0.0":
        return f"(-0.0)::{typ}"
    if isinstance(v, pd.Timestamp):
        return f"TIMESTAMP '{v}'"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, list):
        elem = typ[:-2] if typ.endswith("[]") else "DOUBLE"
        inner = ", ".join(_sql_lit(float(x), elem) for x in v)
        return f"[{inner}]::{typ}"
    return f"{v}::{typ}"


def build_dirty(dst: Path) -> None:
    con = duckdb.connect()
    for t in TABLES:
        src = Path(SRC_SF) / f"{t}.parquet"
        schema = con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{src}')"
        ).fetchall()
        cols = [c[0] for c in schema]
        types = {c[0]: c[1] for c in schema}
        rows_sql = " UNION ALL ".join(
            "SELECT " + ", ".join(
                f"{_sql_lit(row.get(c), types[c])} AS {c}" for c in cols
            )
            for row in DIRTY[t]
        )
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}') UNION ALL "
            f"{rows_sql}) TO '{dst / (t + '.parquet')}' (FORMAT parquet)"
        )


def _manifest_lit(v) -> str:
    """Canonical string form of a planted value for the manifest digest
    (repr is stable for None/int/str/list; NaN/Inf and Timestamps need
    explicit spelling so the digest is platform-independent)."""
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if isinstance(v, float) and math.isinf(v):
        return "-Inf" if v < 0 else "Inf"
    if isinstance(v, pd.Timestamp):
        return f"TS({v})"
    if isinstance(v, list):
        return "[" + ",".join(_manifest_lit(x) for x in v) + "]"
    return repr(v)


def manifest_digest() -> str:
    """Deterministic digest of the planted-row manifest. The committed
    DIRTY_SWEEP_r*.json artifact records this; the staleness gate
    (tests/test_dirty_sweep_evidence.py) recomputes it, so any edit to
    the DIRTY rows invalidates old sweep evidence and forces a re-run —
    the same committed-evidence-must-match-current-inputs pattern as
    the scaling gate."""
    import hashlib

    canon = ";".join(
        f"{t}:" + "|".join(
            ",".join(f"{c}={_manifest_lit(row[c])}" for c in sorted(row))
            for row in DIRTY[t]
        )
        for t in TABLES
    )
    return hashlib.md5(canon.encode()).hexdigest()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="", help="comma-separated qNN prefixes")
    ap.add_argument("--skip-slow", action="store_true")
    ap.add_argument(
        "--out",
        default="",
        help="write a DIRTY_SWEEP_r*.json evidence artifact (full sweeps "
        "only — refused with --only, a partial sweep is not evidence)",
    )
    ap.add_argument(
        "--hostile",
        action="store_true",
        help="run under the hostile partition layout (shuffle.partitions"
        "=7, 64 KB input splits, AQE off — test_partition_invariance's "
        "regime). Composes the three adversarial axes: dirty values x "
        "tied sort keys x unstable partitioning; tie-order defects like "
        "the q41/q130 session split only manifest under layouts that "
        "actually permute ties.",
    )
    args = ap.parse_args()
    only = [s for s in args.only.split(",") if s]
    if args.out and only:
        ap.error("--out requires a FULL sweep (drop --only)")

    tmp = Path(tempfile.mkdtemp(prefix="dirty_sf_"))
    try:
        build_dirty(tmp)
        import __spark_entry__ as entry
        from flight_delays_progetto_big_data_2024_spark.session import get_spark
        from tests.oracle_utils import assert_pandas_parity

        spark = get_spark("dirty-sweep")
        if args.hostile:
            spark.conf.set("spark.sql.shuffle.partitions", "7")
            spark.conf.set("spark.sql.files.maxPartitionBytes", "65536")
            spark.conf.set("spark.sql.adaptive.enabled", "false")
        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * "
                f"FROM read_parquet('{tmp}/{t}.parquet')"
            )
        qs, osql = entry.queries(), entry.oracle_sql()
        crash, mism, ok, skipped = [], [], [], []
        for name, fn in qs.items():
            if only and not any(name.startswith(p) for p in only):
                continue
            if name not in osql:
                skipped.append(name)
                continue
            try:
                got = fn(spark, str(tmp)).toPandas()
            except Exception as ex:
                crash.append((name, "spark", repr(ex)[:300]))
                print(f"{name}: SPARK-CRASH {repr(ex)[:200]}", flush=True)
                continue
            try:
                want = con.execute(osql[name]).fetchdf()
            except Exception as ex:
                crash.append((name, "duckdb", repr(ex)[:300]))
                print(f"{name}: ORACLE-CRASH {repr(ex)[:200]}", flush=True)
                continue
            try:
                assert_pandas_parity(got, want)
                ok.append(name)
                print(f"{name}: MATCH rows={len(got)}", flush=True)
            except AssertionError as ex:
                mism.append((name, str(ex)[:400]))
                print(f"{name}: MISMATCH {str(ex)[:250]}", flush=True)
        print("\n==== SUMMARY ====")
        print(f"match={len(ok)} mismatch={len(mism)} crash={len(crash)} "
              f"rows-only-skipped={len(skipped)}")
        for name, eng, ex in crash:
            print(f"CRASH {name} [{eng}]: {ex}")
        for name, ex in mism:
            print(f"MISMATCH {name}: {ex}")
        if args.out:
            import json

            record = {
                "sf": SRC_SF,
                "hostile_layout": bool(args.hostile),
                "manifest_digest": manifest_digest(),
                "planted_rows": {t: len(DIRTY[t]) for t in TABLES},
                "totals": {
                    "match": len(ok),
                    "mismatch": len(mism),
                    "crash": len(crash),
                    "rows_only_skipped": len(skipped),
                },
                "queries": {
                    **{n: {"status": "match"} for n in ok},
                    **{n: {"status": "mismatch", "detail": ex}
                       for n, ex in mism},
                    **{n: {"status": "crash", "engine": eng, "detail": ex}
                       for n, eng, ex in crash},
                    **{n: {"status": "rows_only_skipped"} for n in skipped},
                },
            }
            Path(args.out).write_text(json.dumps(record, indent=1) + "\n")
            print(f"wrote {args.out}")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
