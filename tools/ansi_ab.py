#!/usr/bin/env python
"""A/B the ANSI-mode tax on the 21 headline queries (round-9 judge
item 1): round 8 pinned ``spark.sql.ansi.enabled=true`` in the session
bootstrap AND recorded a +16.5% headline total vs round 7, spread
nearly uniformly across unchanged plans. COVERAGE.md attributed the
slowdown to ambient box load — plausible, but the ANSI pin touches
EVERY compiled plan (overflow/cast checks in generated code), and a
uniform per-plan tax is exactly what an ambient-slowdown story cannot
exclude. This harness separates them.

Design: one warmed session (bench.py's warmup: noop-write every table,
one query end-to-end, Arrow pool spin-up), then per query an
INTERLEAVED sample schedule — ansi=true, ansi=false, repeated
``--reps`` times (A B A B ...). Interleaving means any ambient drift
during the run hits both arms equally; flipping the conf between
samples forces a fresh compile under the new mode (which is the thing
being measured), and caches are released between samples exactly as
bench.py does. Reported per query: median(A), median(B), ratio.

Interpretation: ratios ~1.00 → ANSI costs nothing at this scale and
the ambient-slowdown attribution stands (record it in COVERAGE.md);
ratios uniformly >1 → the r8 slowdown is the documented price of the
guard-correctness fix that motivated the pin.

Run ALONE (same rule as bench.py — concurrent load poisons both arms'
absolute numbers, though the ratio is still protected by
interleaving).
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from bench import BENCH_OVERRIDES, HEADLINE  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3, help="samples per arm")
    ap.add_argument("--out", default="", help="optional JSON artifact path")
    args = ap.parse_args()

    from flight_delays_progetto_big_data_2024_spark.plans import registry
    from flight_delays_progetto_big_data_2024_spark.session import (
        get_spark,
        release_caches,
    )
    from flight_delays_progetto_big_data_2024_spark.sources.readers import (
        TESTDATA_TABLES,
        Catalog,
    )

    spark = get_spark("ansi-ab", cpus="32")
    spark.sparkContext.setLogLevel("ERROR")

    cat = Catalog(spark, args.sf_dir)
    for table in TESTDATA_TABLES:
        cat.table(table).write.format("noop").mode("overwrite").save()
    registry.QUERIES[HEADLINE[0]](spark, args.sf_dir).collect()
    spark.range(2).mapInPandas(lambda it: it, "id long").collect()
    # warm BOTH modes' codegen caches on the first query so neither
    # arm's first timed sample pays one-time JIT the other arm skipped
    spark.conf.set("spark.sql.ansi.enabled", "false")
    registry.QUERIES[HEADLINE[0]](spark, args.sf_dir).collect()
    spark.conf.set("spark.sql.ansi.enabled", "true")

    results: dict[str, dict] = {}
    for name in HEADLINE:
        fn = BENCH_OVERRIDES.get(name, registry.QUERIES[name])
        arms: dict[str, list[float]] = {"ansi": [], "legacy": []}
        for _ in range(args.reps):
            for mode, key in (("true", "ansi"), ("false", "legacy")):
                spark.conf.set("spark.sql.ansi.enabled", mode)
                start = time.perf_counter()
                fn(spark, args.sf_dir).collect()
                arms[key].append(time.perf_counter() - start)
                release_caches(spark)
        a = statistics.median(arms["ansi"])
        b = statistics.median(arms["legacy"])
        results[name] = {
            "ansi_median_s": round(a, 3),
            "legacy_median_s": round(b, 3),
            "ratio_ansi_over_legacy": round(a / b, 3) if b else None,
            "samples": {
                k: [round(s, 3) for s in v] for k, v in arms.items()
            },
        }
        print(
            f"{name:38s} ansi={a:7.3f}s legacy={b:7.3f}s "
            f"ratio={a / b:5.3f}",
            flush=True,
        )
    spark.conf.set("spark.sql.ansi.enabled", "true")  # restore the pin

    tot_a = sum(r["ansi_median_s"] for r in results.values())
    tot_b = sum(r["legacy_median_s"] for r in results.values())
    summary = {
        "total_ansi_s": round(tot_a, 3),
        "total_legacy_s": round(tot_b, 3),
        "total_ratio": round(tot_a / tot_b, 3),
        "reps_per_arm": args.reps,
        "sf_dir": args.sf_dir,
        "queries": results,
    }
    print(
        f"\nTOTAL ansi={tot_a:.3f}s legacy={tot_b:.3f}s "
        f"ratio={tot_a / tot_b:.3f}"
    )
    if args.out:
        Path(args.out).write_text(json.dumps(summary, indent=1))
        print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
