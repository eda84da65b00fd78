"""Custom stateful streaming operator via applyInPandasWithState.

Per-user running aggregates over an unbounded event stream: for each
user_id the operator keeps (n_events, sum_value, last_ts) as explicit
state and emits the updated row per micro-batch. This is the engine's
"custom stateful operator" surface — anything the built-in windowed
aggregations can't express (decaying counters, per-entity models,
session objects) plugs in at the same seam by changing the state schema
and the update function.

Parity contract (tested): draining a closed input with availableNow and
taking each user's last update equals the batch groupBy over the same
data.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, sum_value double"
STATE_SCHEMA = "n_events long, sum_value double"


def _update_user(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, total = state.get
    else:
        n, total = 0, 0.0
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].fillna(0.0).sum())
    state.update((n, total))
    yield pd.DataFrame({"user_id": [user_id], "n_events": [n], "sum_value": [total]})


def streaming_user_totals(
    spark: SparkSession, source_dir: str, schema_from: str
) -> DataFrame:
    """readStream → groupBy(user_id).applyInPandasWithState → running
    per-user totals (update mode)."""
    schema = spark.read.parquet(schema_from).schema
    stream = spark.readStream.schema(schema).parquet(source_dir)
    return (
        stream.groupBy("user_id")
        .applyInPandasWithState(
            _update_user,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def batch_user_totals(events: DataFrame) -> DataFrame:
    return events.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.sum(F.coalesce("value", F.lit(0.0))).alias("sum_value"),
    )
