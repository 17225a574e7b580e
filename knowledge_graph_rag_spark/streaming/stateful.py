"""Custom stateful streaming operator: per-key EWMA anomaly detection via
``applyInPandasWithState`` (the task brief's sanctioned escape hatch for
stateful semantics the built-in windowed aggregations can't express).

Shape: events stream → groupBy(key) → per-key state (ewma mean, ewma
variance, count) carried across micro-batches; each event is flagged when it
deviates from the PRIOR state by more than ``z_thresh`` standard deviations,
then folded into the state. This is the streaming twin of the batch
detectors' mean+2σ rule (A6) — but *online*, order-dependent, and with
exponential forgetting, which no combination of window aggs reproduces.

Rows inside each group are processed in (ts, tiebreak) order; persistent
state is three doubles per key, so state memory is O(distinct keys)
regardless of stream length (one key's micro-batch is buffered transiently
to establish total order across Arrow chunks — bound it with the trigger
interval / maxFilesPerTrigger, not with state config).
The same update kernel (:func:`ewma_update`) is pure Python over numpy rows
and is reused by the batch-parity test — stream(availableNow) must equal the
kernel applied per key in timestamp order.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

STATE_SCHEMA = T.StructType(
    [
        T.StructField("mean", T.DoubleType()),
        T.StructField("var", T.DoubleType()),
        T.StructField("n", T.LongType()),
    ]
)


def ewma_update(rows, mean: float, var: float, n: int,
                alpha: float, z_thresh: float, warmup: int):
    """Pure kernel: fold (ts-ordered) values into EWMA state, yielding
    (value, ewma_before, flagged) per row. Used by both the stateful stream
    operator and the batch-parity oracle."""
    out = []
    for v in rows:
        flagged = False
        if n >= warmup and var > 0:
            flagged = abs(v - mean) > z_thresh * (var ** 0.5)
        out.append((v, mean, flagged))
        if n == 0:
            mean, var = v, 0.0
        else:
            d = v - mean
            mean = mean + alpha * d
            var = (1 - alpha) * (var + alpha * d * d)
        n += 1
    return out, mean, var, n


def ewma_anomalies(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    alpha: float = 0.2,
    z_thresh: float = 3.0,
    warmup: int = 5,
) -> DataFrame:
    """Streaming per-key EWMA anomaly flags. ``events`` must be a streaming
    DataFrame; state persists across micro-batches via GroupState."""
    out_schema = T.StructType(
        [
            T.StructField("key", T.StringType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("ewma", T.DoubleType()),
            T.StructField("flagged", T.BooleanType()),
        ]
    )

    def fn(key, pdf_iter, state):
        if state.exists:
            mean, var, n = state.get
        else:
            mean, var, n = 0.0, 0.0, 0
        # A key's micro-batch arrives as MULTIPLE Arrow chunks with no
        # cross-chunk ordering guarantee (split at arrow.maxRecordsPerBatch):
        # concatenate first, sort ONCE, then fold — sorting chunks
        # independently would feed the order-dependent kernel out of ts
        # order for keys with >batch-size events.
        chunks = [pdf for pdf in pdf_iter]
        pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
        pdf = pdf.sort_values([ts_col, value_col])
        rows, mean, var, n = ewma_update(
            pdf[value_col].astype(float).tolist(),
            mean, var, n, alpha, z_thresh, warmup,
        )
        yield pd.DataFrame(
            {
                "key": [str(key[0])] * len(pdf),
                "ts": pdf[ts_col].to_numpy(),
                "value": [r[0] for r in rows],
                "ewma": [round(r[1], 6) for r in rows],
                "flagged": [r[2] for r in rows],
            }
        )
        state.update((float(mean), float(var), int(n)))

    return (
        events.select(key_col, ts_col, value_col)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf="NoTimeout",
        )
    )
