"""Custom stateful streaming operators via ``applyInPandasWithState``.

Extends the reference's batch-incremental vocabulary (SURVEY §2.12) with
true arbitrary-state streaming: per-key state lives in the state store,
survives across micro-batches and restarts (checkpointed), and expires by
processing-time timeout. Each function also works on a static DataFrame
through a batch-equivalent fallback so results stay oracle-checkable.

Two operators:
- ``stateful_running_counts``: per-key running count + sum across
  micro-batches (the canonical GroupState example, and the streaming form
  of the reference's incremental aggregation).
- ``stateful_stream_dedup``: drop rows whose key was already seen in any
  earlier micro-batch — streaming exact dedup with a state TTL, the
  streaming arm of ops/dedup.py::exact_duplicates.
"""

from __future__ import annotations

from typing import Iterable, Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

COUNTS_SCHEMA = "key string, count long, value_sum double"
_COUNT_STATE_SCHEMA = "count long, value_sum double"


def stateful_running_counts(
    df: DataFrame,
    key_col: str,
    value_col: str,
    timeout_ms: int | None = None,
) -> DataFrame:
    """Running (count, sum) per key, maintained in the state store.

    Streaming: emits the UPDATED totals for every key seen in each
    micro-batch (update output mode). Batch fallback: plain groupBy —
    identical totals, which is exactly the oracle for the streaming path.
    ``timeout_ms`` expires idle keys' state (processing-time timeout) so
    state size tracks the ACTIVE key set, not the all-time key set —
    the knob that keeps this viable at 100 TB key cardinality.
    """
    if not df.isStreaming:
        return (
            df.groupBy(F.col(key_col).cast("string").alias("key"))
            .agg(
                F.count(F.lit(1)).alias("count"),
                F.sum(F.col(value_col).cast("double")).alias("value_sum"),
            )
        )

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        count, value_sum = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            count += len(pdf)
            value_sum += float(pdf[value_col].fillna(0.0).sum())
        state.update((count, value_sum))
        if timeout_ms:
            state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(
            {"key": [str(key[0])], "count": [count], "value_sum": [value_sum]}
        )

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_ms
        else GroupStateTimeout.NoTimeout
    )
    return df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=COUNTS_SCHEMA,
        stateStructType=_COUNT_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )


def stateful_stream_dedup(
    df: DataFrame,
    key_cols: Sequence[str],
    timeout_ms: int | None = None,
) -> DataFrame:
    """First-occurrence-only pass-through: a key emits rows only the first
    micro-batch it appears in; later occurrences drop.

    This is streaming exact dedup with explicit, bounded state (vs
    ``dropDuplicates`` on a stream, whose state without a watermark grows
    forever): ``timeout_ms`` bounds how long a key stays remembered.
    Batch fallback: keep one arbitrary-deterministic first row per key
    (row_number over key ordering) — the oracle shape.
    """
    keys = list(key_cols)
    if not df.isStreaming:
        from metadata_etl_framework_spark.incremental.merge import keep_latest

        return keep_latest(df, keys, keys, descending=False)

    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )

    def dedup(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            for _ in pdfs:  # drain; key already emitted
                pass
            if timeout_ms:
                state.setTimeoutDuration(timeout_ms)
            return
        first: pd.DataFrame | None = None
        for pdf in pdfs:
            if first is None and len(pdf):
                first = pdf.head(1)
        state.update((True,))
        if timeout_ms:
            state.setTimeoutDuration(timeout_ms)
        if first is not None:
            yield first

    return df.groupBy(*[F.col(k) for k in keys]).applyInPandasWithState(
        dedup,
        outputStructType=out_schema,
        stateStructType="seen boolean",
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if timeout_ms
            else GroupStateTimeout.NoTimeout
        ),
    )


def tws_running_counts(
    df: DataFrame,
    key_col: str,
    value_col: str,
    configure_state_store: bool = True,
) -> DataFrame:
    """Running (count, sum) per key on Spark 4's ``transformWithState``
    processor API — the successor to applyInPandasWithState: named state
    variables (ValueState/ListState/MapState), explicit timers, and
    schema-evolvable state instead of one opaque tuple. Functionally the
    twin of ``stateful_running_counts``; both are kept because the
    GroupState API remains the compatibility surface and this one the
    forward path.

    Streaming: update-mode totals for each key seen in the micro-batch,
    state checkpoint-durable across restarts. Batch fallback: plain
    groupBy (the oracle shape for the streaming result).

    Environment gate: the transformWithState Python worker speaks
    protobuf to the JVM state server; without the ``protobuf`` package
    the streaming arm raises ImportError with an install hint (the
    GroupState twin ``stateful_running_counts`` has no such dependency).

    State-store provider: transformWithState requires RocksDB, and the
    provider conf is read at QUERY START — a library function that only
    builds the DataFrame cannot scope it per-query. With
    ``configure_state_store=True`` (default) this function sets
    ``spark.sql.streaming.stateStore.providerClass`` to RocksDB on the
    session — a SESSION-WIDE effect: every streaming query started
    afterwards in this session uses RocksDB too (a strict upgrade for
    most workloads, but an observable change). Callers managing the
    provider themselves pass ``configure_state_store=False``; the query
    then fails at start unless the session is already RocksDB-configured.
    """
    if not df.isStreaming:
        return (
            df.groupBy(F.col(key_col).cast("string").alias("key"))
            .agg(
                F.count(F.lit(1)).cast("long").alias("count"),
                F.sum(F.col(value_col).cast("double")).alias("value_sum"),
            )
        )

    try:
        from google.protobuf import descriptor as _  # noqa: F401
    except ImportError as exc:  # pragma: no cover - env-dependent
        raise ImportError(
            "transformWithState requires the 'protobuf' package "
            "(pip install protobuf); use stateful_running_counts "
            "(applyInPandasWithState) where it is unavailable"
        ) from exc

    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    rocksdb = (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    )
    if configure_state_store:
        # session-wide by necessity (read at query start, not DF build);
        # documented in the docstring, no-op when already configured
        conf = df.sparkSession.conf
        if conf.get("spark.sql.streaming.stateStore.providerClass", None) != rocksdb:
            conf.set("spark.sql.streaming.stateStore.providerClass", rocksdb)

    value_name = value_col  # capture for the processor closure

    class _RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState(
                "totals", _COUNT_STATE_SCHEMA
            )

        def handleInputRows(self, key, rows, timerValues):
            if self._totals.exists():
                cnt, total = self._totals.get()
            else:
                cnt, total = 0, 0.0
            for pdf in rows:
                cnt += len(pdf)
                total += float(pdf[value_name].astype("float64").sum())
            self._totals.update((cnt, total))
            yield pd.DataFrame(
                {"key": [str(key[0])], "count": [cnt], "value_sum": [total]}
            )

        def close(self) -> None:
            pass

    keyed = df.withColumn("__k", F.col(key_col).cast("string"))
    return keyed.groupBy("__k").transformWithStateInPandas(
        statefulProcessor=_RunningTotals(),
        outputStructType=COUNTS_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
