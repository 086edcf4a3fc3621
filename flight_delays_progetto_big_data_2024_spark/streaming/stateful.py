"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState``.

``F.session_window`` covers the aggregate case (streaming.windowed /
operators.temporal); this module is the template for session logic the
built-in can't express (arbitrary per-session state, early emission of
in-progress sessions, custom close rules). State is one small tuple per
key — bounded by key cardinality, not event volume — and event-time
timeouts close idle sessions exactly when the watermark passes
``last_event + gap``.

Rows arrive as Arrow batches (pandas), state lives in the state store;
both survive micro-batch boundaries and executor recovery through the
checkpoint. Output mode "update": closed sessions are emitted exactly
once (``closed=true``); the currently-open session is re-emitted each
time it grows (``closed=false``) so downstream sinks can show live
session state.
"""

from __future__ import annotations

from collections.abc import Iterator
from contextlib import contextmanager

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

def round_like_engines(x: float, scale: int = 6) -> float:
    """Round the way BOTH SQL engines do, for Python-side processor
    emissions that are compared against engine aggregates.

    Spark's ``round(double, s)`` is HALF_UP over the double's SHORTEST
    DECIMAL representation (Scala ``BigDecimal(double)`` goes through
    ``Double.toString``), and DuckDB agrees — so the double nearest
    0.0000005 (= 4.99999999999999977e-7, BELOW the decimal tie) rounds
    to 1e-6 in both engines, while Python's ``round``/numpy round the
    exact binary value to 0.0. The round-10 measure-axis probe planted
    exactly that value and the streaming processors (this module) were
    the odd engine out: sessionize and running-totals emitted 0.0
    against both batch analogs' 1e-6. Python ``repr`` is the same
    shortest-round-trip decimal, so quantizing it HALF_UP reproduces
    the engines' result. Non-finite totals pass through (Decimal
    quantize raises on Inf/NaN; the engines keep them verbatim too)."""
    import math
    from decimal import ROUND_HALF_UP, Decimal, localcontext

    if not math.isfinite(x):
        return x
    # default context precision (28) makes quantize raise on huge
    # magnitudes (a DBL_MAX quantized to 1e-6 needs ~315 digits — the
    # measure-axis probes plant exactly that); widen locally
    with localcontext() as ctx:
        ctx.prec = 400
        # + 0.0 normalizes signed zero: a tiny negative total (-1e-7)
        # quantizes to Decimal -0E-6 -> float -0.0, but Spark's round
        # goes through BigDecimal which has no signed zero and yields
        # +0.0 (IEEE: -0.0 + 0.0 = +0.0; every other value unchanged)
        return 0.0 + float(
            Decimal(repr(float(x))).quantize(
                Decimal(1).scaleb(-scale), rounding=ROUND_HALF_UP
            )
        )


OUTPUT_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "num_events bigint, total_value double, closed boolean"
)

#: (session_start_us, last_event_us, num_events, total_value,
#:  non_null_value_count)
STATE_SCHEMA = "start bigint, last bigint, n bigint, total double, nn bigint"

_US_PER_MS = 1_000


def _to_micros(ts: pd.Series) -> pd.Series:
    return pd.to_datetime(ts).astype("datetime64[ns]").astype("int64") // 1_000


def _row(
    user_id: int,
    start_us: int,
    last_us: int,
    n: int,
    total: float,
    nn: int,
    closed: bool,
) -> dict:
    # nn == 0 → every value in the session was NULL → F.sum semantics
    # say the total is NULL, not 0.0 (the batch analog's behavior; a
    # fillna-only implementation emitted 0.0 here — round-6 advisor)
    return {
        "user_id": user_id,
        "session_start": pd.to_datetime(start_us, unit="us"),
        "session_end": pd.to_datetime(last_us, unit="us"),
        "num_events": n,
        "total_value": None if nn == 0 else round_like_engines(total, 6),
        "closed": closed,
    }


def _emit(rows: list[dict]) -> pd.DataFrame:
    out = pd.DataFrame(rows)
    # a plain float64 column renders None as NaN, which Arrow ships to
    # Spark as double-NaN, NOT as NULL; the nullable Float64 extension
    # array round-trips a true NULL
    out["total_value"] = out["total_value"].astype("Float64")
    return out


def sessionize_stream(
    events: DataFrame,
    gap_seconds: int = 1800,
    watermark: str = "30 minutes",
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Sessionize a watermarked event stream: sessions close when a new
    event for the key arrives MORE than gap later (same boundary rule as
    ``F.session_window``), or when the watermark passes
    ``last_event + gap`` (event-time timeout).

    Pre-epoch event times are dropped by the initial watermark (epoch 0)
    — see streaming.joins module docstring (r9 platform semantic).
    """
    gap_us = gap_seconds * 1_000_000

    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key

        if state.hasTimedOut:
            start, last, n, total, nn = state.get
            state.remove()
            yield _emit([_row(user_id, start, last, n, total, nn, True)])
            return

        # Collect ALL Arrow chunks before sorting: a key's rows can span
        # chunks, and per-chunk sorting would interleave out-of-order
        # timestamps into wrong sessions.
        chunks = [pdf[[ts_col, value_col]] for pdf in pdfs]
        rows = pd.concat(chunks) if chunks else pd.DataFrame(columns=[ts_col, value_col])
        # NULL event times CAN reach the stateful function (the
        # watermark does not filter them) and arrive as NaT, whose
        # int64 view is min-int64 — one such event crashed the whole
        # query with a datetime overflow when the session start was
        # converted back. An event with no event-time belongs to no
        # session (F.session_window drops it too). NULL values keep
        # their row (the batch analog's count counts it) and
        # contribute 0 to the total; the per-session NON-NULL value
        # count travels in state so a session whose values are ALL
        # NULL emits a NULL total — exactly F.sum's skip-all
        # semantics, not a fabricated 0.0.
        rows = rows[rows[ts_col].notna()]
        ts_us = _to_micros(rows[ts_col])
        notnull = rows[value_col].notna()
        vals = rows[value_col].fillna(0.0)
        events = sorted(zip(ts_us, vals, notnull))

        # The open session from state joins the sorted stream as an
        # INTERVAL item, so a late-but-within-watermark event earlier
        # than the session start either forms its own (immediately
        # closed) earlier session or extends the session backward —
        # instead of being silently folded in with a wrong start.
        items = [
            (int(t), int(t), 1, float(v), int(k)) for t, v, k in events
        ]
        if state.exists:
            items.append(state.get)
            items.sort(key=lambda it: (it[0], it[1]))

        out: list[dict] = []
        current = None
        for start, last, n, total, nn in items:
            if current is None:
                current = (start, last, n, total, nn)
            elif start - current[1] > gap_us:
                out.append(_row(user_id, *current, True))
                current = (start, last, n, total, nn)
            else:
                current = (
                    current[0],
                    max(last, current[1]),
                    current[2] + n,
                    current[3] + total,
                    current[4] + nn,
                )

        if current is not None:
            state.update(current)
            # event-time timeout fires once the watermark passes this
            # (milliseconds epoch, must lead the current watermark)
            state.setTimeoutTimestamp((current[1] + gap_us) // _US_PER_MS)
            out.append(_row(user_id, *current, False))
        if out:
            yield _emit(out)

    # NaN -> NULL BEFORE the stateful function: the Arrow->pandas
    # bridge renders BOTH SQL NULL and double NaN as float64 NaN, so
    # the stateful code cannot tell a missing value from a corrupt one
    # — making "NaN is not a measurement" (the wave-5 rule) the DEFINED
    # streaming semantics keeps the conflation from silently deciding.
    # (The batch analog's F.sum propagates NaN; a session fed NaN is
    # the one documented stream/batch difference, chosen over emitting
    # a value that depends on pandas dtype internals.)
    events = events.withColumn(
        value_col,
        F.when(~F.isnan(F.col(value_col)), F.col(value_col)),
    )
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


# ---------------------------------------------------------------------------
# transformWithStateInPandas (Spark 4.x arbitrary-state API)
# ---------------------------------------------------------------------------

try:  # the TWS API landed in Spark 4.0; gate so 3.5 sessions still import
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    _HAS_TWS = True
except ImportError:  # pragma: no cover
    StatefulProcessor = object  # type: ignore[assignment,misc]
    _HAS_TWS = False

RUNNING_SCHEMA = "user_id bigint, n bigint, total double, batches bigint"

#: NULL-grouping-key handling for TWS (round-9, found by the first
#: hostile-layout sweep of the live transport): after the Python worker
#: processes a NULL-key group, its implicit state binding sticks — every
#: LATER key group in the same state partition reads and updates the
#: NULL key's state row (cross-key running totals chained 2 → 77 → 129
#: under shuffle.partitions=7; invisible at 32 partitions where the NULL
#: key had no same-partition followers). Until the runtime handles NULL
#: keys, the key is encoded BEFORE groupBy as the COMPOSITE
#: ``(coalesce(key, 0), key IS NULL)`` — total and collision-free on
#: all 2^64 longs plus NULL (the first cut used a LONG_MIN sentinel,
#: which a snowflake-style id space genuinely contains; the r9
#: id-domain probe planted one and merged a real user into the NULL
#: group) — and decoded inside the processor at emission. NOTE: a
#: grouping-KEY schema change invalidates existing checkpoints
#: (standard Spark stateful-upgrade semantics — drain before upgrade);
#: only the VALUE schema has an in-place migration path (agg → agg2).


class RunningTotalsProcessor(StatefulProcessor):
    """Per-key running aggregate via the ``transformWithStateInPandas``
    arbitrary-state API (Spark 4's successor to applyInPandasWithState):
    typed ValueState holding (n, total, batches), re-emitted per key on
    every micro-batch that touches it. The same merge shape as a
    streaming materialized view, but with explicit state — the template
    for logic aggregation can't express (per-key model state, decayed
    counters, dedup rings).

    State is one fixed tuple per key — bounded by key cardinality; the
    RocksDB state store (required by TWS) spills it off-heap, so key
    cardinality can exceed executor memory at 100 TB scale.

    Environment gate: TWS's Python driver worker speaks protobuf to the
    JVM (``google.protobuf`` import at query-plan time); containers
    without the protobuf wheel can import and PLAN this operator but the
    stream fails at start — the parity test importorskips accordingly
    (same honest-gate policy as multimodal codecs / Kafka transport).
    """

    def init(self, handle: "StatefulProcessorHandle") -> None:
        # State-schema evolution (round-8 advisor): the running tuple
        # widened from 3 fields to 4 when the non-null count ``nn`` was
        # added (round-7 NULL contract). Re-declaring the ORIGINAL
        # ``agg`` variable with the wider schema would make any
        # pre-change checkpoint fail at state binding (schema
        # incompatibility) — so the widened tuple lives under a NEW
        # state name, and the legacy 3-field variable is kept readable
        # for one-touch migration in ``handleInputRows`` (seeding
        # ``nn = n``, the pre-change always-emit semantics). Fresh
        # checkpoints simply never populate the legacy variable.
        self._agg = handle.getValueState(
            "agg2", "n bigint, total double, batches bigint, nn bigint"
        )
        self._legacy = handle.getValueState(
            "agg", "n bigint, total double, batches bigint"
        )

    def handleInputRows(self, key, rows, timerValues):
        """NULL contract (round-7, mirroring the batch analog
        ``groupBy(key).agg(count(*), sum(value))`` and the sessionize
        fix): a NULL key is its OWN group, emitted with a NULL user_id
        — ``int(None)`` crashed the whole query on one dirty row; a
        NULL/NaN value counts toward ``n`` but not the total (the
        Arrow→pandas bridge conflates NULL and NaN, so "NaN is not a
        measurement" is the defined semantics); a key whose EVERY value
        is NULL has a NULL total (``F.sum`` over nothing), carried by a
        non-null-count in state and a nullable Float64 column — a bare
        float64 would re-conflate the NULL with NaN on the way out."""
        import pandas as pd

        n, total, batches, nn = 0, 0.0, 0, 0
        if self._agg.exists():
            n, total, batches, nn = self._agg.get()
        elif self._legacy.exists():
            # pre-``nn`` checkpoint: migrate on first touch. The old
            # processor emitted a (possibly 0.0) total unconditionally,
            # i.e. it behaved as if every counted value were a
            # measurement — ``nn = n`` preserves that for carried keys.
            n, total, batches = self._legacy.get()
            nn = n
            self._legacy.clear()
        for pdf in rows:
            n += len(pdf)
            vals = pd.to_numeric(pdf["value"], errors="coerce")
            nn += int(vals.notna().sum())
            s = vals.sum(skipna=True)
            total += float(0.0 if pd.isna(s) else s)
        batches += 1
        self._agg.update((n, total, batches, nn))
        # key shapes: the composite (key_enc, is_null) 2-tuple from
        # running_totals_stream's collision-free NULL encoding, or a
        # raw 1-tuple when tests drive the processor directly. The TWS
        # key tuple renders a NULL bigint key as float NaN, not None
        # (Arrow->pandas grouping bridge) — int(NaN) killed the whole
        # query on the first dirty micro-batch; pd.isna covers None,
        # NaN and pd.NA alike (round-9, found by the sweep's first
        # real end-to-end TWS run).
        if len(key) == 2:
            user_id, is_null = key
            null_key = bool(is_null) or pd.isna(user_id)
        else:
            (user_id,) = key
            null_key = pd.isna(user_id)
        yield pd.DataFrame(
            {
                "user_id": pd.array(
                    [None if null_key else int(user_id)], dtype="Int64"
                ),
                "n": [n],
                "total": pd.array(
                    [None if nn == 0 else round_like_engines(total, 6)],
                    dtype="Float64",
                ),
                "batches": [batches],
            }
        )

    def close(self) -> None:
        pass


@contextmanager
def rocksdb_state_store(spark):
    """Scope the RocksDB state-store provider onto ``spark`` for a TWS
    run and restore the previous provider on exit. TWS requires multiple
    column families, which the default HDFSBackedStateStoreProvider
    rejects at query start — and the provider is a SESSION conf read at
    stream start, not a ``writeStream`` option (an ``.option()`` with
    this key is silently ignored). RocksDB ships in the Spark
    distribution (rocksdbjni), so this needs no extra dependency."""
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        yield
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def running_totals_stream(events: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Running per-key (count, total, batches-touched) over a stream via
    ``transformWithStateInPandas``. Update mode: each micro-batch emits
    the new running row for every key it touched.

    The NULL-key contract (a NULL key is its OWN group, emitted with a
    NULL user_id) is carried by the composite ``(coalesce(key, 0),
    key IS NULL)`` grouping key: a raw NULL grouping key wedges the TWS
    worker's implicit state binding, bleeding state into every later
    key in the partition, and any single-bigint sentinel collides with
    a real id somewhere in the int64 space (the r9 probe's LONG_MIN
    user) — see the module note above RunningTotalsProcessor for the
    measured failures."""
    if not _HAS_TWS:  # pragma: no cover
        raise NotImplementedError(
            "transformWithStateInPandas requires Spark >= 4.0"
        )
    events = events.withColumn(
        "__key_null", F.col(key_col).isNull()
    ).withColumn(key_col, F.coalesce(F.col(key_col), F.lit(0).cast("long")))
    return events.groupBy(key_col, "__key_null").transformWithStateInPandas(
        statefulProcessor=RunningTotalsProcessor(),
        outputStructType=RUNNING_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
