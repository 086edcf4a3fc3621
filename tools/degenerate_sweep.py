"""Degenerate-relation parity sweep (round-12 judge item 6).

Round 3 pinned empty-input behavior for the dedup/ANN operator family
only; the 0/0 class round 11 kept finding one query at a time
(q101/q167/q168 zero-variance groups) is exactly what EMPTY and
SINGLE-ROW relations produce systematically: empty aggregates, n=1
groups (sample variance's 0/0), one-node graphs, single-element
windows, empty join sides. This sweep runs EVERY SQL-backed registered
query (``__spark_entry__.queries()``) on two derived corpora — every
table truncated to zero rows, and every table cut to exactly one
deterministic row — in both engines, and reports every crash and every
value divergence.

Variants:

* ``empty``  — each table is its parquet schema with ZERO rows (built
  with ``LIMIT 0`` so column types are exactly the testdata types).
* ``single`` — each table holds exactly ONE row: the lowest-key row
  (ORDER BY the table's first column NULLS LAST, deterministic). Key
  relationships between tables are whatever the lowest keys imply —
  broken referential integrity is part of the probe (empty join sides,
  groups of one).

Run ALONE (Spark local[32]):

    python tools/degenerate_sweep.py [--only q101,q167] \
        [--out DEGENERATE_SWEEP_r12.json]

The committed artifact is gated by
tests/test_dirty_sweep_evidence.py::test_degenerate_sweep_artifact —
registering a query means re-running this sweep.
"""
from __future__ import annotations

import argparse
import json
import sys
import tempfile
from pathlib import Path

import duckdb

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SRC_SF = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

#: deterministic single-row pick: lowest value of the table's FIRST
#: column (every testdata table leads with its key)
FIRST_COL = {
    "region": "r_regionkey", "nation": "n_nationkey",
    "customer": "c_custkey", "supplier": "s_suppkey",
    "part": "p_partkey", "orders": "o_orderkey",
    "lineitem": "l_orderkey", "events": "event_id",
    "documents": "doc_id", "embeddings": "vec_id",
}


def build_variant(dst: Path, variant: str) -> None:
    """Write the degenerate corpus: parquet per table, derived from the
    clean sf0.001 testdata through DuckDB so column types are exactly
    the testdata types (an empty pandas round-trip would widen them)."""
    dst.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    try:
        for t in TABLES:
            src = f"{SRC_SF}/{t}.parquet"
            if variant == "empty":
                sel = f"SELECT * FROM read_parquet('{src}') LIMIT 0"
            elif variant == "single":
                sel = (
                    f"SELECT * FROM read_parquet('{src}') "
                    f"ORDER BY {FIRST_COL[t]} NULLS LAST LIMIT 1"
                )
            else:  # pragma: no cover - caller bug
                raise ValueError(variant)
            con.execute(f"COPY ({sel}) TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
    finally:
        con.close()


def spec_digest() -> str:
    """Digest of the corpus-derivation spec: editing the variant rules
    (source SF, tables, single-row pick) invalidates committed
    evidence, mirroring dirty_sweep.manifest_digest."""
    import hashlib

    canon = json.dumps(
        {"src": SRC_SF, "tables": TABLES, "first_col": FIRST_COL,
         "variants": ["empty", "single"]},
        sort_keys=True,
    )
    return hashlib.md5(canon.encode()).hexdigest()


def sweep_variant(spark, variant: str, only: list[str]) -> dict:
    import __spark_entry__ as entry
    from tests.oracle_utils import assert_pandas_parity

    tmp = Path(tempfile.mkdtemp(prefix=f"degen_{variant}_"))
    build_variant(tmp, variant)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * "
            f"FROM read_parquet('{tmp}/{t}.parquet')"
        )
    qs, osql = entry.queries(), entry.oracle_sql()
    queries: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and not any(name.startswith(p) for p in only):
            continue
        if name not in osql:
            queries[name] = {"status": "rows_only_skipped"}
            continue
        try:
            got = fn(spark, str(tmp)).toPandas()
        except Exception as ex:
            queries[name] = {"status": "crash", "side": "spark",
                             "detail": repr(ex)[:300]}
            print(f"[{variant}] {name}: SPARK-CRASH {repr(ex)[:200]}", flush=True)
            continue
        try:
            want = con.execute(osql[name]).fetchdf()
        except Exception as ex:
            queries[name] = {"status": "crash", "side": "duckdb",
                             "detail": repr(ex)[:300]}
            print(f"[{variant}] {name}: ORACLE-CRASH {repr(ex)[:200]}", flush=True)
            continue
        try:
            assert_pandas_parity(got, want)
            queries[name] = {"status": "match", "rows": len(got)}
            print(f"[{variant}] {name}: MATCH rows={len(got)}", flush=True)
        except AssertionError as ex:
            queries[name] = {"status": "mismatch", "detail": str(ex)[:300]}
            print(f"[{variant}] {name}: MISMATCH {str(ex)[:200]}", flush=True)
    con.close()
    totals = {"match": 0, "mismatch": 0, "crash": 0, "rows_only_skipped": 0}
    for q in queries.values():
        totals[q["status"]] += 1
    return {"queries": queries, "totals": totals}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="", help="comma-separated qNN prefixes")
    ap.add_argument(
        "--variants", default="empty,single",
        help="comma-separated subset of {empty,single}",
    )
    ap.add_argument(
        "--out", default="",
        help="write a DEGENERATE_SWEEP_r*.json evidence artifact (full "
        "sweeps only — refused with --only)",
    )
    args = ap.parse_args()
    only = [s for s in args.only.split(",") if s]
    if args.out and only:
        ap.error("--out requires a FULL sweep (drop --only)")

    from flight_delays_progetto_big_data_2024_spark.session import get_spark

    spark = get_spark("degenerate-sweep")
    results = {
        v: sweep_variant(spark, v, only)
        for v in args.variants.split(",")
        if v
    }

    total_bad = sum(
        r["totals"]["mismatch"] + r["totals"]["crash"]
        for r in results.values()
    )
    print("\n==== SUMMARY ====")
    for v, r in results.items():
        t = r["totals"]
        print(
            f"{v}: match={t['match']} mismatch={t['mismatch']} "
            f"crash={t['crash']} rows-only-skipped={t['rows_only_skipped']}"
        )
    if args.out:
        with open(REPO / args.out, "w") as fh:
            json.dump(
                {
                    "source_sf": SRC_SF,
                    "spec_digest": spec_digest(),
                    "variants": results,
                    "clean": total_bad == 0,
                },
                fh,
                indent=1,
            )
        print(f"wrote {args.out} (clean={total_bad == 0})")
    sys.exit(1 if total_bad else 0)


if __name__ == "__main__":
    main()
