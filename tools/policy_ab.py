#!/usr/bin/env python
"""Same-session A/B of the two bench sampling policies (round-10 judge
item 1): attribute the un-allowlisted ``BENCH_r10.json`` warnings —
q32 0.89s -> 2.08s (2.3x), allowlist-masked q34 1.10s -> 2.46s (2.2x),
and the streaming section's 1.5-1.8x — to either the round-10
measurement-policy change or a real regression.

The two policies differ in exactly one mechanism:

* **r9 rep-block**: a query's samples run BACK-TO-BACK, so samples
  2..k execute immediately after sample 1 of the SAME query — OS page
  cache (parquet pages), JVM JIT tiers, and Arrow worker state are all
  still hot for that query. The recorded median is a warm number.
* **r10 interleaved**: every sample of a query runs AFTER a full pass
  of the OTHER ~20 headline queries — each sample re-reads its parquet
  pages into a page cache the other queries just churned through, on
  JIT state perturbed by ~20 other compiled plans. Combined with the
  >=2s tier's 3-sample cutoff, the lower median never reached steady
  state (BENCH_SAMPLES_r10.json: q32 [2.19, 2.09, 1.56], still
  falling).

So the attribution experiment is POSITIONAL, inside one session: for
each target query run R rounds of [perturb with filler queries, then K
back-to-back timed samples]. Within each round, sample position 0 is
the "interleaved-like" measurement (immediately after other queries)
and positions 1..K-1 are "rep-block-like" (back-to-back). Both
position classes interleave through the whole run, so ambient drift
hits them equally — the classic same-session A/B shape of
tools/ansi_ab.py. If median(position 0) / median(positions 1+)
reproduces the ~2x movement on plans that did not change between r9
and r10, the warnings are the policy discontinuity, not a regression;
a ratio near 1.0 with position-1+ times still at ~2s would instead
mean the regression is real and needs a bisect.

Caches are released between every sample exactly as bench.py does —
the warm/cold split under test is the OS/JIT state bench.py does NOT
control, which is precisely what changed between the two policies.

Run ALONE (bench rule: concurrent load poisons absolute numbers; the
positional ratio is protected by interleaving the two classes).
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

from bench import BENCH_OVERRIDES, _streaming_runners  # noqa: E402

#: The queries the round-10 gate flagged (directly or via the streaming
#: section's un-gated movement).
TARGETS = ["q32_ngram_jaccard_pairs", "q34_simhash_near_dups"]
STREAM_TARGETS = ["stream_tumbling_availablenow", "stream_session_availablenow"]

#: Filler queries run UNTIMED before each sample block to reproduce the
#: interleave's state churn: they cover the same tables the targets
#: read (documents) plus the big fact table, so the position-0 sample
#: sees the page-cache / JIT environment an interleaved pass produces.
FILLERS = [
    "q23_dedup_exact_documents",
    "q59_tfidf_top_terms",
    "q01_popular_nations_avg_delay",
    "q30_embedding_topk_cosine",
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--rounds", type=int, default=4, help="perturb+block rounds per target")
    ap.add_argument("--block", type=int, default=4, help="back-to-back samples per block")
    ap.add_argument("--out", default="", help="optional JSON artifact path")
    args = ap.parse_args()

    import shutil
    import tempfile

    from flight_delays_progetto_big_data_2024_spark.plans import registry
    from flight_delays_progetto_big_data_2024_spark.session import (
        get_spark,
        release_caches,
    )
    from flight_delays_progetto_big_data_2024_spark.sources.readers import (
        TESTDATA_TABLES,
        Catalog,
    )

    spark = get_spark("policy-ab", cpus="32")
    spark.sparkContext.setLogLevel("ERROR")

    # bench.py's untimed warmup, verbatim
    cat = Catalog(spark, args.sf_dir)
    for table in TESTDATA_TABLES:
        cat.table(table).write.format("noop").mode("overwrite").save()
    registry.QUERIES[FILLERS[0]](spark, args.sf_dir).collect()
    spark.range(2).mapInPandas(lambda it: it, "id long").collect()

    def batch_runner(name):
        fn = BENCH_OVERRIDES.get(name, registry.QUERIES[name])

        def run(_idx: int) -> float:
            start = time.perf_counter()
            fn(spark, args.sf_dir).collect()
            elapsed = time.perf_counter() - start
            release_caches(spark)
            return elapsed

        return run

    tmp = tempfile.mkdtemp(prefix="policy_ab_stream_")
    try:
        runners = {name: batch_runner(name) for name in TARGETS}
        runners.update(dict(_streaming_runners(spark, args.sf_dir, tmp)))
        # one untimed cold run per target so one-time codegen JIT lands
        # outside BOTH position classes (both policies amortize it)
        for name, run in runners.items():
            run(900 + 0)

        results: dict[str, dict] = {}
        sample_counter = 0
        for name, run in runners.items():
            blocks: list[list[float]] = []
            for _ in range(args.rounds):
                for f in FILLERS:
                    registry.QUERIES[f](spark, args.sf_dir).collect()
                    release_caches(spark)
                block = []
                for _k in range(args.block):
                    sample_counter += 1
                    block.append(round(run(sample_counter), 3))
                blocks.append(block)
            interleaved_like = [b[0] for b in blocks]
            block_like = [s for b in blocks for s in b[1:]]
            med_i = statistics.median(interleaved_like)
            med_b = statistics.median(block_like)
            results[name] = {
                "interleaved_like_median_s": round(med_i, 3),
                "rep_block_like_median_s": round(med_b, 3),
                "ratio_interleaved_over_block": round(med_i / med_b, 3) if med_b else None,
                "blocks": blocks,
            }
            print(
                f"{name:34s} interleaved-like={med_i:6.3f}s "
                f"rep-block-like={med_b:6.3f}s ratio={med_i / med_b:5.3f}",
                flush=True,
            )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    summary = {
        "design": (
            "positional same-session A/B: per round, filler queries "
            "perturb OS/JIT state, then a back-to-back sample block; "
            "position 0 = interleaved-policy conditions, positions 1+ "
            "= r9 rep-block conditions"
        ),
        "rounds": args.rounds,
        "block": args.block,
        "fillers": FILLERS,
        "sf_dir": args.sf_dir,
        "queries": results,
    }
    if args.out:
        Path(args.out).write_text(json.dumps(summary, indent=1))
        print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
