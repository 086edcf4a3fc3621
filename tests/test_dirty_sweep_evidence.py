"""Dirty-sweep evidence gate (round-7): the committed DIRTY_SWEEP_r*.json
is the full-surface dirty-corpus parity sweep — every SQL-backed
registered query replayed against its own DuckDB oracle on sf0.001 plus
the planted NULL/NaN/±Inf/empty/Unicode rows (tools/dirty_sweep.py
--out). This gate keeps that claim honest the same way the scaling gate
does for growth exponents:

- the newest committed artifact must report ZERO mismatches and crashes;
- its planted-row manifest digest must match the CURRENT tools.dirty_sweep
  DIRTY rows — editing the corpus invalidates old evidence and forces a
  re-run;
- its query set must cover the CURRENT registered SQL-backed surface —
  registering a query without sweeping it is a coverage regression.
"""

import glob
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _newest_artifact():
    paths = glob.glob(os.path.join(REPO, "DIRTY_SWEEP_r*.json"))
    assert paths, (
        "no DIRTY_SWEEP_r*.json committed — run "
        "`python tools/dirty_sweep.py --out DIRTY_SWEEP_r<N>.json` (alone, "
        "~8 min) and commit the result; the 182/182 dirty-parity claim "
        "needs committed evidence"
    )
    def rnd(p):
        return int(re.search(r"_r(\d+)\.json$", p).group(1))
    path = max(paths, key=rnd)
    with open(path) as fh:
        return path, json.load(fh)


def test_committed_sweep_is_clean():
    path, rec = _newest_artifact()
    assert rec["totals"]["mismatch"] == 0 and rec["totals"]["crash"] == 0, (
        f"{os.path.basename(path)} records divergences — fix them and "
        f"re-run the sweep: "
        f"{[n for n, q in rec['queries'].items() if q['status'] not in ('match', 'rows_only_skipped')]}"
    )
    assert rec["totals"]["match"] > 0


def test_committed_sweep_matches_current_corpus():
    """Editing the planted rows (tools.dirty_sweep.DIRTY) must invalidate
    old sweep evidence — the artifact's manifest digest is recomputed
    from the live module here."""
    from tools.dirty_sweep import manifest_digest

    path, rec = _newest_artifact()
    assert rec["manifest_digest"] == manifest_digest(), (
        f"{os.path.basename(path)} was produced against a DIFFERENT dirty "
        "corpus than the current tools/dirty_sweep.py plants — re-run the "
        "sweep and commit a fresh artifact"
    )


def test_committed_sweep_covers_registered_surface():
    """Every currently-registered SQL-backed query must appear in the
    sweep with status 'match'; rows-only queries (no oracle) must be the
    only skips."""
    import __spark_entry__ as entry

    _, rec = _newest_artifact()
    qs, osql = entry.queries(), entry.oracle_sql()
    missing = [n for n in qs if n in osql and rec["queries"].get(n, {}).get("status") != "match"]
    assert not missing, f"registered SQL-backed queries not dirty-swept clean: {missing}"
    bad_skips = [
        n for n, q in rec["queries"].items()
        if q["status"] == "rows_only_skipped" and n in osql
    ]
    assert not bad_skips, f"oracle-backed queries recorded as rows-only skips: {bad_skips}"
