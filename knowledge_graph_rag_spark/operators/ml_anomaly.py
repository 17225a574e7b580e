"""Optional ML anomaly scoring (IsolationForest parity, sklearn-gated).

The reference fits an IsolationForest on the in-memory batch and falls back to
rule-based scoring when sklearn is unavailable or the batch is small
(``anomaly_detector.py:127-199``). This engine's contract path is the
rule-based scorer (operators/network.score_connections — native columns); this
module adds the ML path when sklearn exists, mirroring the reference's
fit-on-driver / predict-distributed split:

- feature extraction is a native-column projection (same 7 features,
  ``anomaly_detector.py:60-99``)
- fit happens on the driver over a bounded sample (the reference fits on the
  whole ≤5k batch; at 100 TB you fit on a sample, never the corpus)
- the fitted model is closure-broadcast into an Arrow-batched pandas UDF for
  distributed scoring
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:
    from sklearn.ensemble import IsolationForest  # noqa: F401

    SKLEARN_AVAILABLE = True
except ImportError:  # container has no sklearn — rule-based path is used
    SKLEARN_AVAILABLE = False


def feature_frame(scored_conns: DataFrame) -> DataFrame:
    """The reference's 7-feature projection (anomaly_detector.py:60-99) as
    native columns: bytes, ports, duration, suspicious flag, port rarity,
    time-of-day score."""
    port = F.col("dest_port")
    common = port.isin(80, 443, 22, 21, 25, 53, 110, 143, 993, 995, 3306, 5432, 8080)
    port_rarity = (
        F.when(common, 0.0)
        .when(port < 1024, 0.3)
        .when(port < 49152, 0.5)
        .otherwise(0.8)
    )
    hour = F.hour("timestamp")
    time_score = (
        F.when(F.col("timestamp").isNull(), 0.5)
        .when((hour >= 2) & (hour <= 5), 1.0)
        .when((hour >= 23) | (hour <= 1), 0.7)
        .when(((hour >= 6) & (hour <= 8)) | ((hour >= 18) & (hour <= 22)), 0.3)
        .otherwise(0.1)
    )
    return scored_conns.select(
        "conn_id",
        F.col("bytes_sent").cast("double").alias("f_bytes_sent"),
        F.col("bytes_received").cast("double").alias("f_bytes_received"),
        port.cast("double").alias("f_dest_port"),
        F.col("duration").cast("double").alias("f_duration"),
        F.col("is_suspicious_port").cast("double").alias("f_suspicious"),
        port_rarity.alias("f_port_rarity"),
        time_score.alias("f_time_score"),
    )


_FEATURES = [
    "f_bytes_sent", "f_bytes_received", "f_dest_port", "f_duration",
    "f_suspicious", "f_port_rarity", "f_time_score",
]


def ml_scores(scored_conns: DataFrame, sample_rows: int = 10000,
              contamination: float = 0.1, seed: int = 42) -> DataFrame:
    """(conn_id, ml_score, ml_anomaly) via IsolationForest. Raises
    ImportError when sklearn is absent — callers keep the rule-based scores
    (exactly the reference's fallback, anomaly_detector.py:134-135)."""
    if not SKLEARN_AVAILABLE:
        raise ImportError("sklearn unavailable — use rule-based score_connections")

    import pandas as pd
    from sklearn.ensemble import IsolationForest
    from sklearn.preprocessing import StandardScaler

    feats = feature_frame(scored_conns)
    sample = feats.limit(sample_rows).toPandas()
    scaler = StandardScaler().fit(sample[_FEATURES].to_numpy())
    model = IsolationForest(contamination=contamination, random_state=seed).fit(
        scaler.transform(sample[_FEATURES].to_numpy())
    )

    out_schema = "conn_id string, ml_score double, ml_anomaly boolean"

    def score(batches):
        for pdf in batches:
            x = scaler.transform(pdf[_FEATURES].to_numpy())
            s = -model.score_samples(x)
            yield pd.DataFrame(
                {
                    "conn_id": pdf["conn_id"],
                    "ml_score": s,
                    "ml_anomaly": model.predict(x) == -1,
                }
            )

    return feats.mapInPandas(score, schema=out_schema)
