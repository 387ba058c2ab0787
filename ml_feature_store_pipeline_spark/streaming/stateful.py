"""Custom stateful streaming operators (SURVEY §2.I — beyond-reference).

The reference has no stream processing (its "real-time" is asyncio
request/response, ``ML Feature Store Pipeline.py:363-446``); this module
adds the two stateful shapes a streaming feature pipeline needs and that
Spark's built-in windowed aggregation can't express:

- **session windows with arbitrary per-session aggregates** — gap-based
  sessions via ``applyInPandasWithState`` (Arrow-batched, event-time
  timeout closes idle sessions, watermark bounds state);
- **streaming exact dedup** — ``dropDuplicatesWithinWatermark`` so the
  dedup state is bounded by the watermark horizon instead of growing
  forever.

The batch twin of the sessionizer is ``operators.windows.sessionize``;
``tests/test_stateful_streaming.py`` checks they agree on closed sessions.

Scale notes: state lives in the executor state store partitioned by the
grouping key, so it shards across a cluster like any keyed shuffle. Per-key
state here is ONE open session row (4 scalars) — not the event history —
and event-time timeout + watermark guarantee idle keys are evicted, so
state size is O(active keys), independent of stream length.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

if TYPE_CHECKING:  # pragma: no cover
    pass

SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("total_amount", DoubleType()),
    ]
)

# open-session state: epoch-second floats avoid tz round-trips through Arrow
_SESSION_STATE_SCHEMA = StructType(
    [
        StructField("start_s", DoubleType()),
        StructField("last_s", DoubleType()),
        StructField("n_events", LongType()),
        StructField("total_amount", DoubleType()),
    ]
)


def _session_fn_factory(gap_seconds: float, ts_col: str, amount_col: str):
    """Build the per-key state function. Emits a row per CLOSED session:
    closed either by a later event arriving past the gap, or by event-time
    timeout once the watermark passes last_event + gap."""

    def fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key

        def emit(start_s: float, end_s: float, n: int, total: float) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "user_id": pd.array([user_id], dtype="Int64"),
                    "session_start": [pd.Timestamp(start_s, unit="s")],
                    "session_end": [pd.Timestamp(end_s, unit="s")],
                    "n_events": pd.array([n], dtype="Int64"),
                    "total_amount": [total],
                }
            )

        if state.hasTimedOut:
            start_s, last_s, n, total = state.get
            state.remove()
            yield emit(start_s, last_s, n, total)
            return

        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values(ts_col)
        ts_s = pdf[ts_col].astype("int64") / 1e9  # datetime64[ns] → epoch seconds
        amounts = pdf[amount_col].fillna(0.0).astype("float64")

        if state.exists:
            start_s, last_s, n, total = state.get
        else:
            start_s = last_s = float(ts_s.iloc[0])
            n, total = 0, 0.0

        for t, a in zip(ts_s.to_numpy(), amounts.to_numpy()):
            if n > 0 and t - last_s > gap_seconds:
                yield emit(start_s, last_s, n, total)
                start_s, n, total = t, 0, 0.0
            elif n == 0:
                start_s = t
            last_s = max(last_s, t)
            n += 1
            total += float(a)

        state.update((start_s, last_s, n, total))
        # close the open session when the watermark passes last event + gap
        state.setTimeoutTimestamp(int((last_s + gap_seconds) * 1000))

    return fn


def sessionize_stream(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    amount_col: str = "value",
    gap_seconds: float = 1800.0,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Gap-based session windows over a streaming DataFrame.

    Batch twin: ``operators.windows.sessionize`` (same gap semantics); this
    version emits a session row as soon as the session provably closed —
    either a same-key event past the gap, or event-time timeout when the
    watermark passes ``last_event + gap``. Output mode must be ``append``.
    """
    fn = _session_fn_factory(gap_seconds, ts_col, amount_col)
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(user_col)
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=_SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def dedup_stream(
    events: DataFrame,
    keys: list[str],
    *,
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact deduplication with bounded state.

    ``dropDuplicatesWithinWatermark`` keeps a key in the dedup state only
    until the watermark passes its event time + delay — the streaming twin
    of ``operators.dedup.exact_dedup``. Plain ``dropDuplicates`` on a
    stream would grow state forever; this is the 100 TB-safe form.
    """
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def join_streams(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str,
    left_ts: str,
    right_ts: str,
    max_delay: str = "30 minutes",
    watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream interval join: right rows within ``(left_ts,
    left_ts + max_delay]`` for the same key (attribution shape: purchase
    follows impression within the window).

    Both sides are watermarked and the join condition is time-bounded in
    BOTH directions — that's what lets Spark evict buffered state once the
    watermark passes a row's match window; an unbounded condition would
    buffer the streams forever. Matches emit as soon as both rows arrive
    (inner); outer variants wait for the watermark to prove no match."""
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (lw[key] == rw[key])
        & (rw[right_ts] > lw[left_ts])
        & (rw[right_ts] <= lw[left_ts] + F.expr(f"INTERVAL {max_delay}"))
    )
    return lw.join(rw, cond, how)
