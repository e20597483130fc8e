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
