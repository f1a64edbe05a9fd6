"""Custom stateful streaming operators (applyInPandasWithState).

The reference's triggers are stateless per-timestamp threshold checks
(T5); an always-on deployment wants *stateful* semantics — fire once on
crossing, stay silent while the condition persists, re-arm when it
clears (hysteresis), plus running per-entity aggregates.  Structured
Streaming's ``applyInPandasWithState`` is the Spark-native home for
that state (per-key, fault-tolerant via checkpoint).

Batch twin: every stateful operator here also ships a batch
(window-based) equivalent so the same semantics are testable and usable
in the micro-batch engine — the streaming path is the deployment shape,
the batch path the verification shape.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EDGE_SCHEMA = "entity_id bigint, timestamp timestamp, value double, edge string"
EDGE_STATE_SCHEMA = "above boolean"


def edge_trigger_stream(
    events,
    threshold: float,
    key_col: str = "entity_id",
    ts_col: str = "timestamp",
    value_col: str = "value",
):
    """Streaming edge-detector: emit 'rising' when a key's value crosses
    above ``threshold`` and 'falling' when it drops back (hysteresis:
    no repeats while the condition holds).
    """

    def fn(
        key: tuple,
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        above = state.get[0] if state.exists else False
        rows = []
        pdf = pd.concat(list(batches)).sort_values(ts_col)
        for _, row in pdf.iterrows():
            now_above = row[value_col] > threshold
            if now_above and not above:
                rows.append((key[0], row[ts_col], row[value_col], "rising"))
            elif not now_above and above:
                rows.append((key[0], row[ts_col], row[value_col], "falling"))
            above = now_above
        state.update((above,))
        if rows:
            yield pd.DataFrame(
                rows, columns=[key_col, ts_col, value_col, "edge"]
            )

    return events.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=EDGE_SCHEMA,
        stateStructType=EDGE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def edge_trigger_batch(
    events: DataFrame,
    threshold: float,
    key_col: str = "entity_id",
    ts_col: str = "timestamp",
    value_col: str = "value",
) -> DataFrame:
    """Batch twin of :func:`edge_trigger_stream`: lag-window edge
    detection (first row counts as an edge if already above)."""
    w = Window.partitionBy(key_col).orderBy(ts_col)
    above = F.col(value_col) > threshold
    prev_above = F.lag(above).over(w)
    edge = (
        F.when(above & ~F.coalesce(prev_above, F.lit(False)), F.lit("rising"))
        .when(~above & F.coalesce(prev_above, F.lit(False)), F.lit("falling"))
    )
    return (
        events.withColumn("edge", edge)
        .filter(F.col("edge").isNotNull())
        .select(key_col, ts_col, value_col, "edge")
    )
