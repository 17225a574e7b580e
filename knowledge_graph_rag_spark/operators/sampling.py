"""Deterministic sampling for training-data curation.

``DataFrame.sample`` is seed-dependent per partition layout — repartition the
input and the sample changes, which poisons reproducibility of curated
corpora. These samplers decide membership from a content hash of a stable
key, so the same row is in or out regardless of partitioning, cluster size,
or engine (DuckDB's md5 agrees bit-for-bit — the oracle entry pins it).

Shape at scale: a pure row-level filter — no shuffle, no state; composes
with column pruning (only the key column is hashed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: buckets for the md5-prefix modulus; 16^4 = 65536 gives 0.0015% granularity
_BUCKETS = 65536


def hash_bucket(key_col):
    """Stable bucket in [0, 65536) from the md5 prefix of the key."""
    return F.conv(F.substring(F.md5(key_col.cast("string")), 1, 4), 16, 10).cast(
        "long"
    )


def hash_sample(df: DataFrame, key_col: str, fraction: float) -> DataFrame:
    """Keep rows whose hash bucket falls below fraction — deterministic,
    partition-independent, idempotent."""
    return df.filter(hash_bucket(F.col(key_col)) < int(fraction * _BUCKETS))


def stratified_hash_sample(
    df: DataFrame, key_col: str, strata_col: str, fractions: dict[str, float],
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downsample 'en' to 5%, keep
    all 'de'). Strata missing from ``fractions`` get ``default_fraction``."""
    thresh = F.lit(int(default_fraction * _BUCKETS))
    for value, frac in sorted(fractions.items()):
        thresh = F.when(
            F.col(strata_col) == value, F.lit(int(frac * _BUCKETS))
        ).otherwise(thresh)
    return df.filter(hash_bucket(F.col(key_col)) < thresh)
