"""Custom stateful streaming operators via ``applyInPandasWithState``.

Spark's built-in streaming aggs (window/session_window) cover the
windowed shapes (streaming/ingest.py); this module is the escape hatch
for operator state that windows can't express — running per-key
aggregates that never close, cross-batch dedup, custom eviction.

State is kept in the state store (RocksDB/HDFS-backed on a cluster),
keyed by the group key — each executor holds only its key range, so
state scales horizontally with the shuffle; the per-batch Python cost
is Arrow-batched per key group, not per row.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_user_stats(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-key RUNNING totals across the whole stream lifetime
    → (user_id, n_events, sum_value, last_ts), one updated row per key
    per micro-batch the key appears in.

    Unlike a windowed agg this state never finalizes — the canonical
    applyInPandasWithState use case (a watermark would eventually close
    any window; a lifetime counter must not close). Works on batch
    DataFrames too via the groupBy fallback in :func:`batch_user_stats`
    — pin equivalence in tests.
    """
    import pandas as pd

    out_schema = (
        f"{key_col} long, n_events long, sum_value double, last_ts timestamp"
    )
    state_schema = "n long, s double, last timestamp"

    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator["pd.DataFrame"],
        state: GroupState,
    ) -> Iterator["pd.DataFrame"]:
        if state.exists:
            n, s, last = state.get
        else:
            n, s, last = 0, 0.0, None
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf[value_col].sum())
            mx = pdf[ts_col].max()
            if last is None or mx > last:
                last = mx
        state.update((n, s, last))
        yield pd.DataFrame(
            {
                key_col: [key[0]],
                "n_events": [n],
                "sum_value": [s],
                "last_ts": [last],
            }
        )

    return events.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_first_seen(
    df: DataFrame,
    key_cols: list[str],
    order_col: str = "id",
) -> DataFrame:
    """Streaming dedup gate: emit each key's FIRST-seen row, once, for
    the lifetime of the stream — every later row with the same key is
    dropped. The in-flight half of a training-data dedup pipeline
    (batch half: operators/dedup; key with ``F.md5(content)`` for exact
    dedup, a winnow fingerprint or SimHash for near-dup gating).

    Semantics: within one micro-batch, the min-``order_col`` row wins
    (deterministic under replay — micro-batch composition may differ
    across restarts); across batches, first batch wins. State per key
    is ONE BOOLEAN — the state store holds |distinct keys| bits, not
    rows, and is RocksDB-spillable and key-range-sharded on a cluster.

    Output rows: ``key_cols + [order_col]`` — the gate passes
    identities, not payloads (append-mode friendly, and the winner row
    can be joined back by key downstream). Batch twin:
    :func:`batch_first_seen`."""
    import pandas as pd

    def gate(
        key: Tuple[Any, ...],
        pdfs: Iterator["pd.DataFrame"],
        state: GroupState,
    ) -> Iterator["pd.DataFrame"]:
        if state.exists:
            return
        best = None
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            cand = pdf.loc[pdf[order_col].idxmin()]
            if best is None or cand[order_col] < best[order_col]:
                best = cand
        if best is None:
            return
        state.update((True,))
        yield pd.DataFrame([{**{c: key[i] for i, c in enumerate(key_cols)},
                             order_col: best[order_col]}])

    fields = df.select(*key_cols, order_col).schema
    out_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in fields)
    return df.groupBy(*key_cols).applyInPandasWithState(
        gate,
        outputStructType=out_schema,
        stateStructType="seen boolean",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def batch_first_seen(
    df: DataFrame,
    key_cols: list[str],
    order_col: str = "id",
) -> DataFrame:
    """Batch twin of :func:`stream_first_seen`: min-``order_col`` row
    per key — one shuffle, map-side-combined min_by."""
    from pyspark.sql import functions as F

    return df.groupBy(*key_cols).agg(
        F.min(F.col(order_col)).alias(order_col)
    )


def batch_user_stats(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Batch twin of :func:`running_user_stats` (end-of-stream totals)."""
    from pyspark.sql import functions as F

    return events.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col(value_col).cast("double")).alias("sum_value"),
        F.max(ts_col).alias("last_ts"),
    )
