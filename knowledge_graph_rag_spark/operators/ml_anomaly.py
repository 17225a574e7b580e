"""ML anomaly scoring (IsolationForest parity).

The reference fits an IsolationForest on the in-memory batch and falls back to
rule-based scoring when sklearn is unavailable or the batch is small
(``anomaly_detector.py:127-199``). This engine's contract path is the
rule-based scorer (operators/network.score_connections — native columns); this
module adds the ML path mirroring the reference's fit-on-driver /
predict-distributed split:

- feature extraction is a native-column projection (same 7 features,
  ``anomaly_detector.py:60-99``)
- fit happens on the driver over a bounded sample (the reference fits on the
  whole ≤5k batch; at 100 TB you fit on a sample, never the corpus)
- the fitted model is closure-broadcast into an Arrow-batched pandas UDF for
  distributed scoring

Backend: sklearn's IsolationForest when importable; otherwise a pure-numpy
implementation of the same algorithm (Liu, Ting, Zhou — "Isolation Forest",
ICDM 2008: random-split trees over a ψ-sample, score 2^(−E[h]/c(ψ))), so the
ML path executes and is testable in environments without sklearn.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:
    from sklearn.ensemble import IsolationForest  # noqa: F401

    SKLEARN_AVAILABLE = True
except ImportError:  # no sklearn — the numpy backend below is used
    SKLEARN_AVAILABLE = False

_EULER = 0.5772156649015329


def _c(n) -> float:
    """Average unsuccessful-search path length in a BST of n nodes."""
    if n <= 1:
        return 0.0
    return 2.0 * (np.log(n - 1.0) + _EULER) - 2.0 * (n - 1.0) / n


class NumpyIsolationForest:
    """Minimal, deterministic isolation forest (fit on ≤max_samples rows).

    Trees are stored as flat arrays (feature / threshold / child indices /
    leaf size); scoring walks index partitions per node, so a batch of rows
    descends each tree in O(depth) vectorized steps, not per-row Python."""

    def __init__(self, n_estimators: int = 100, max_samples: int = 256,
                 seed: int = 42):
        self.n_estimators = n_estimators
        self.max_samples = max_samples
        self.seed = seed
        self.trees: list[dict] = []
        self.psi = 0

    def fit(self, X: np.ndarray) -> "NumpyIsolationForest":
        rng = np.random.default_rng(self.seed)
        n = X.shape[0]
        if n == 0:
            raise ValueError("cannot fit an isolation forest on 0 rows")
        self.psi = min(self.max_samples, n)
        depth_limit = int(np.ceil(np.log2(max(self.psi, 2))))
        self.trees = []
        for _ in range(self.n_estimators):
            idx = rng.choice(n, size=self.psi, replace=False)
            tree = {"feature": [], "thresh": [], "left": [], "right": [], "size": []}
            self._build(X[idx], tree, 0, depth_limit, rng)
            self.trees.append({k: np.asarray(v) for k, v in tree.items()})
        return self

    def _build(self, X: np.ndarray, t: dict, depth: int, limit: int, rng) -> int:
        node = len(t["feature"])
        for k in t:
            t[k].append(0)
        lo, hi = X.min(axis=0), X.max(axis=0)
        splittable = np.nonzero(hi > lo)[0]
        if depth >= limit or X.shape[0] <= 1 or splittable.size == 0:
            t["feature"][node] = -1
            t["size"][node] = X.shape[0]
            return node
        f = int(rng.choice(splittable))
        s = float(rng.uniform(lo[f], hi[f]))
        mask = X[:, f] < s
        t["feature"][node] = f
        t["thresh"][node] = s
        t["left"][node] = self._build(X[mask], t, depth + 1, limit, rng)
        t["right"][node] = self._build(X[~mask], t, depth + 1, limit, rng)
        return node

    def _path_lengths(self, tree: dict, X: np.ndarray) -> np.ndarray:
        out = np.zeros(X.shape[0])
        stack = [(0, np.arange(X.shape[0]), 0.0)]
        feature, thresh = tree["feature"], tree["thresh"]
        left, right, size = tree["left"], tree["right"], tree["size"]
        while stack:
            node, idx, depth = stack.pop()
            if idx.size == 0:
                continue
            f = feature[node]
            if f < 0:
                out[idx] = depth + _c(size[node])
                continue
            mask = X[idx, f] < thresh[node]
            stack.append((left[node], idx[mask], depth + 1.0))
            stack.append((right[node], idx[~mask], depth + 1.0))
        return out

    def score_samples(self, X: np.ndarray) -> np.ndarray:
        """Anomaly score in (0, 1]; higher = more anomalous (2^(−E[h]/c(ψ)))."""
        if self.psi <= 1:  # degenerate 1-row fit: c(ψ)=0, no signal
            return np.full(X.shape[0], 0.5)
        h = np.zeros(X.shape[0])
        for tree in self.trees:
            h += self._path_lengths(tree, X)
        h /= len(self.trees)
        return 2.0 ** (-h / _c(self.psi))


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
              contamination: float = 0.1, seed: int = 42,
              backend: str = "auto") -> DataFrame:
    """(conn_id, ml_score, ml_anomaly) via IsolationForest.

    backend='auto' uses sklearn when importable, else the pure-numpy forest;
    'sklearn' / 'numpy' force one (ImportError if sklearn is forced but
    absent). ml_anomaly flags the top-``contamination`` quantile of the
    training sample's scores — the reference's contamination semantics."""
    if backend == "auto":
        backend = "sklearn" if SKLEARN_AVAILABLE else "numpy"
    if backend == "sklearn" and not SKLEARN_AVAILABLE:
        raise ImportError("sklearn unavailable — use backend='numpy'")

    import pandas as pd

    feats = feature_frame(scored_conns)
    sample = feats.limit(sample_rows).toPandas()
    xs = sample[_FEATURES].to_numpy(dtype=float)
    if xs.shape[0] < 2:
        raise ValueError(
            f"ml_scores needs ≥2 training rows, got {xs.shape[0]} — "
            "use the rule-based score_connections path for tiny batches "
            "(the reference's own small-batch fallback, anomaly_detector.py:134)"
        )
    mean, std = xs.mean(axis=0), xs.std(axis=0)
    std[std == 0.0] = 1.0

    if backend == "sklearn":  # pragma: no cover — container has no sklearn
        from sklearn.ensemble import IsolationForest

        model = IsolationForest(contamination=contamination, random_state=seed).fit(
            (xs - mean) / std
        )

        def score_and_flag(x):
            return -model.score_samples(x), model.predict(x) == -1
    else:
        model = NumpyIsolationForest(seed=seed).fit((xs - mean) / std)
        threshold = float(
            np.quantile(model.score_samples((xs - mean) / std), 1.0 - contamination)
        )

        def score_and_flag(x):
            s = model.score_samples(x)  # one forest walk per batch
            return s, s > threshold

    out_schema = "conn_id string, ml_score double, ml_anomaly boolean"

    def score(batches):
        for pdf in batches:
            x = (pdf[_FEATURES].to_numpy(dtype=float) - mean) / std
            s, flags = score_and_flag(x)
            yield pd.DataFrame(
                {
                    "conn_id": pdf["conn_id"],
                    "ml_score": s,
                    "ml_anomaly": flags,
                }
            )

    return feats.mapInPandas(score, schema=out_schema)
