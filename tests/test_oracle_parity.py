"""Every registered (query, oracle_sql) pair must agree with DuckDB —
the local mirror of the driver's t2 correctness gate, at sf0.001."""

import pytest

from flight_delays_progetto_big_data_2024_spark.plans import registry
from tests.oracle_utils import assert_parity


@pytest.mark.parametrize("name", sorted(registry.ORACLE))
def test_query_matches_oracle(spark, sf_dir, name):
    result = registry.QUERIES[name](spark, sf_dir)
    assert_parity(result, registry.ORACLE[name], sf_dir)


def test_comparator_distinguishes_negative_zero():
    """Round-3 q101 passed the in-repo sweep but failed the driver:
    DuckDB's round(avg(z),6) emitted IEEE -0.0 where Spark emitted
    +0.0, and Python float equality cannot tell them apart while the
    driver's byte-level value hash can. The comparator must now fail
    on exactly that drift — and still pass when signs agree."""
    import pandas as pd

    from tests.oracle_utils import assert_pandas_parity

    spark_side = pd.DataFrame({"k": ["a", "b"], "v": [0.0, 1.5]})
    oracle_side = pd.DataFrame({"k": ["a", "b"], "v": [-0.0, 1.5]})
    with pytest.raises(AssertionError, match="negative-zero drift"):
        assert_pandas_parity(spark_side, oracle_side)
    # matching signs (both -0.0, both +0.0) are fine
    assert_pandas_parity(
        pd.DataFrame({"v": [-0.0, 0.0]}), pd.DataFrame({"v": [-0.0, 0.0]})
    )


def test_every_query_returns_rows(spark, sf_dir):
    # the driver's rows-only gate; every registered query is known to be
    # non-empty at every shipped SF — a zero here is a regression
    for name, fn in registry.QUERIES.items():
        assert fn(spark, sf_dir).count() > 0, name


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())


def test_coverage_doc_references_match_registry():
    """Every qNN referenced in COVERAGE.md must exist in the registry and
    every registered query must appear in COVERAGE.md — the doc the
    judge reads can't drift from the code."""
    import re

    text = open("COVERAGE.md").read()
    # lines declaring ids as intentionally unused are exempt from the
    # must-be-registered direction (they document numbering gaps)
    exempt: set[str] = set()
    for line in text.splitlines():
        if "intentionally unused" in line:
            exempt |= set(re.findall(r"\bq(\d+)\b", line))
    doc_ids = {m for m in re.findall(r"\bq(\d+)\b", text)} - exempt
    for lo, hi in re.findall(r"\bq(\d+)-q(\d+)\b", text):
        doc_ids |= {str(i) for i in range(int(lo), int(hi) + 1)}
    reg_ids = {name.split("_")[0][1:] for name in registry.QUERIES}
    missing_in_registry = {f"q{i}" for i in doc_ids - reg_ids}
    missing_in_doc = {f"q{i}" for i in reg_ids - doc_ids}
    assert not missing_in_registry, f"COVERAGE.md cites unknown queries: {missing_in_registry}"
    assert not missing_in_doc, f"registered but undocumented: {missing_in_doc}"


def test_driver_verified_record_semantics(tmp_path):
    """_driver_verified classifies fixture records exactly: full green
    and documented rows-only count as verified; hash-fails and errors
    rotate back. Driven entirely from synthesized records in tmp_path
    so the suite stays green no matter which live CORRECTNESS_r*.json
    rounds the driver has committed to the repo root."""
    import json

    import __spark_entry__ as e

    green = {"rows_match": True, "schema_match": True, "hash_match": True,
             "spark_rows": 5, "oracle_rows": 5, "err": None}
    hashfail = dict(green, hash_match=False)
    rows_only = {"rows_match": True, "schema_match": None, "hash_match": None,
                 "spark_rows": 5, "oracle_rows": None, "err": "no_oracle"}
    errored = dict(green, rows_match=False, err="boom")
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps({
        "q_green": green, "q_fail_then_pass": hashfail,
        "q_rows_only": rows_only, "q_errored": errored,
    }))
    # a later round fixing the failed row must flip it to verified
    (tmp_path / "CORRECTNESS_r02.json").write_text(json.dumps({
        "q_fail_then_pass": green,
    }))
    ver = e._driver_verified(str(tmp_path))
    assert ver == {"q_green", "q_fail_then_pass", "q_rows_only"}
    # empty/absent directory -> nothing verified
    assert e._driver_verified(str(tmp_path / "nowhere")) == set()


def test_plan_changed_after_literal_has_unique_keys():
    """Round-11 advisor (low): PLAN_CHANGED_AFTER accumulated repeated
    keys across rounds — later-wins gave the intended value, but the
    earlier entries were dead code (editing one silently did nothing,
    and an accidental ordering inversion would silently SHRINK a
    recheck window). Lint the source AST: one entry per query."""
    import ast
    import collections
    import inspect

    import __spark_entry__ as e

    tree = ast.parse(inspect.getsource(e))
    for node in ast.walk(tree):
        if (
            isinstance(node, (ast.Assign, ast.AnnAssign))
            and isinstance(node.value, ast.Dict)
        ):
            targets = node.targets if isinstance(node, ast.Assign) else [node.target]
            if any(
                isinstance(t, ast.Name) and t.id == "PLAN_CHANGED_AFTER"
                for t in targets
            ):
                keys = [
                    k.value
                    for k in node.value.keys
                    if isinstance(k, ast.Constant)
                ]
                dupes = [k for k, c in collections.Counter(keys).items() if c > 1]
                assert not dupes, (
                    f"PLAN_CHANGED_AFTER has duplicate keys {dupes}: collapse "
                    "to one entry per query (later-wins hides the earlier one)"
                )
                return
    raise AssertionError("PLAN_CHANGED_AFTER dict literal not found")


def test_rotation_puts_unverified_queries_first():
    """The driver records only the FIRST 50 queries() entries; the
    rotation must spend that window on queries without green driver
    evidence. Asserts the partition INVARIANT against whatever live
    records exist (not any particular round's contents)."""
    import __spark_entry__ as e

    newest = e._newest_green_round()
    # evidence certifying a since-rewritten plan is stale, not green
    ver = {
        n
        for n in e._driver_verified()
        if newest[n] > e.PLAN_CHANGED_AFTER.get(n, -1)
    }
    order = list(e.queries())
    n_unv = sum(1 for n in order if n not in ver)
    assert all(n not in ver for n in order[:n_unv])
    assert all(n in ver for n in order[n_unv:])
    # among the unverified, curated priority order is respected
    prio = {n: i for i, n in enumerate(e.VERIFY_FIRST + e.VERIFY_NEXT)}
    unv_prio = [prio[n] for n in order[:n_unv] if n in prio]
    assert unv_prio == sorted(unv_prio)
    # the verified tail refreshes stalest evidence first: newest-green
    # round numbers must be non-decreasing down the tail (round-3 judge
    # item — without this, recheck windows re-pin the same prefix)
    ages = [newest[n] for n in order[n_unv:]]
    assert ages == sorted(ages)


def test_plan_change_invalidates_stale_evidence():
    """A query listed in PLAN_CHANGED_AFTER with evidence no newer than
    the listed round re-enters the verification window as if unverified
    (round-6 advisor: q156's r4 green record certified the pre-rewrite
    plan, so the rewrite's 'identical output' claim had no committed
    driver evidence). Once a newer green record lands, the entry stops
    mattering — asserted against live records so this self-retires."""
    import __spark_entry__ as e

    newest = e._newest_green_round()
    order = list(e.queries())
    for name, stale_round in e.PLAN_CHANGED_AFTER.items():
        assert name in order
        if newest.get(name, 0) <= stale_round:
            assert order.index(name) < 50, (
                f"{name} plan changed after r{stale_round} but is outside "
                f"the driver's 50-query window"
            )


def test_newest_green_round_tracks_latest_record(tmp_path):
    """Evidence age = the newest round with a green row, and LATEST
    EVIDENCE WINS: a query whose newest record is a failed re-check is
    no longer verified (rotates back), while a re-verified query's age
    advances."""
    import json

    import __spark_entry__ as e

    green = {"rows_match": True, "schema_match": True, "hash_match": True,
             "spark_rows": 5, "oracle_rows": 5, "err": None}
    hashfail = dict(green, hash_match=False)
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps({"q_regressed": green, "q_refreshed": green, "q_stale": green})
    )
    (tmp_path / "CORRECTNESS_r03.json").write_text(
        json.dumps({"q_refreshed": green, "q_regressed": hashfail})
    )
    newest = e._newest_green_round(str(tmp_path))
    assert newest == {"q_stale": 1, "q_refreshed": 3}
    assert e._driver_verified(str(tmp_path)) == {"q_stale", "q_refreshed"}
