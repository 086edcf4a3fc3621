"""Capture ``.explain("formatted")`` output for registered queries.

Optimization-round evidence tool (guide §1.2 / §7.2): writes one
``<query>_<tag>.txt`` file per query under an output directory so plan
claims ("2 Exchange -> 1", "SortMergeJoin -> BroadcastHashJoin") are
checkable without running Spark. The judge reads these files beside the
code; they are committed, never regenerated silently.

Usage::

    python -m tools.plan_capture --out plans/r12 --tag before [q32 q34 ...]

With no query arguments, captures the full bench HEADLINE set. Plans
are captured at $SPARK_GRAFT_SF_DIR (default sf0.1) — the same relation
statistics the bench runs under, so join-strategy choices match what
the bench times.
"""

from __future__ import annotations

import argparse
import io
import os
import sys
from contextlib import redirect_stdout


def capture(spark, sf_dir: str, names: list[str], out_dir: str, tag: str) -> None:
    from flight_delays_progetto_big_data_2024_spark.plans import registry

    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = registry.QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(f"-- {name} @ {sf_dir} --\n")
            fh.write(buf.getvalue())
        print(f"wrote {path}", file=sys.stderr)


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--out", required=True, help="output directory")
    parser.add_argument("--tag", required=True, help="suffix: before/after")
    parser.add_argument("queries", nargs="*", help="query names (default: bench HEADLINE)")
    args = parser.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from bench import HEADLINE

    from flight_delays_progetto_big_data_2024_spark.session import get_spark

    spark = get_spark("plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    capture(spark, sf_dir, args.queries or list(HEADLINE), args.out, args.tag)
    return 0


if __name__ == "__main__":
    sys.exit(main())
