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


def token_budget_sample(
    df: DataFrame, key_col: str, tokens_col: str,
    budgets: dict[str, int], strata_col: str,
) -> DataFrame:
    """Deterministic TOKEN-BUDGET sampling: per stratum (language), keep
    docs in md5(key) priority order until the running token total reaches
    the stratum's budget — the training-mix operation as it is actually
    specified ("300 B tokens of English, all of the German"), which a
    row-fraction sampler can only approximate when doc lengths vary.

    Membership rule: a doc is kept iff the EXCLUSIVE running sum of
    ``tokens_col`` over docs of its stratum with smaller (hash, key) is
    still below the budget — so the first doc to cross the budget line is
    kept (budget is a lower bound on kept tokens) and everything after it
    is cut. Hash-priority makes the kept set a pure function of content
    keys: partition-, cluster-, and engine-independent (same guarantee as
    hash_sample), and ADDING docs to the corpus only replaces tail docs
    near the budget line, never reshuffles the whole sample. Strata absent
    from ``budgets`` are kept whole.

    Precondition: ``key_col`` must be unique per row within a stratum
    (doc ids). Duplicate keys tie in the priority order and their relative
    placement — hence which of them lands inside the budget — is not
    deterministic; run dedup_exact (or any key dedup) first.

    Scale shape (r06): the exact per-stratum window only ever sees ~one
    budget's worth of rows. A bucket-granular pre-filter runs first: one
    map-side-combinable aggregation of token totals per (stratum,
    hash-bucket) — at most 65,536 rows per stratum regardless of corpus
    size — a tiny cumulative window over it finds, per stratum, the first
    bucket whose cumulative token total reaches the budget, and rows in
    later buckets are dropped before the exact window. This is EXACT, not
    approximate: the window priority IS the bucket value (ties broken by
    key), so every dropped row sorts strictly after every survivor and the
    survivors' exclusive running sums are unchanged; a doc in a bucket
    past the cut has prior-tokens ≥ the cut bucket's cumulative total ≥
    budget. Overshoot is ≤ one bucket (~1/65536 of the stratum). The cut
    table is one row per BUDGETED stratum — bounded by the budget dict the
    caller wrote, safe to broadcast. The one-reducer-per-stratum sort of
    the naive form (an English stratum at 100 TB = one task sorting 10^11
    rows) becomes a sort of ~budget-line survivors only."""
    from pyspark.sql import Window

    pr = hash_bucket(F.col(key_col))
    budget = F.lit(None).cast("long")
    for value, b in sorted(budgets.items()):
        budget = F.when(F.col(strata_col) == value, F.lit(b)).otherwise(budget)

    # --- bucket-granular pre-cut (exact; see docstring). NULL keys hash to
    # a NULL bucket which sorts FIRST in the exact window; map them to -1 so
    # the cut arithmetic and the window agree on their position.
    if not budgets:  # nothing budgeted → nothing to cut (and isin() needs args)
        return df
    cs, cc = "_tbs_s", "_tbs_cut"  # collision-proof vs caller columns
    while cs in df.columns:
        cs += "_"
    while cc in df.columns:
        cc += "_"
    sb = F.lit(None).cast("long")
    for value, b in sorted(budgets.items()):
        sb = F.when(F.col(cs) == value, F.lit(b)).otherwise(sb)
    per_bucket = (
        # only BUDGETED strata need a cut — unbudgeted ones are kept whole,
        # so their rows skip the bucket aggregation entirely
        df.filter(F.col(strata_col).isin(*budgets.keys()))
        .select(
            F.col(strata_col).alias(cs),
            F.coalesce(pr, F.lit(-1)).alias("_pb"),
            F.col(tokens_col).alias("_pt"),
        )
        .groupBy(cs, "_pb")
        .agg(F.sum("_pt").alias("_bt"))
    )
    wcum = (
        Window.partitionBy(cs)
        .orderBy("_pb")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cuts = (
        per_bucket.withColumn("_cum", F.sum("_bt").over(wcum))
        .filter(F.col("_cum") >= sb)  # NULL budget -> no cut row (keep all)
        .groupBy(cs)
        .agg(F.min("_pb").alias(cc))
    )
    pre = (
        df.join(
            F.broadcast(cuts), F.col(strata_col) == F.col(cs), "left"
        )
        .filter(
            F.col(cc).isNull()
            | (F.coalesce(pr, F.lit(-1)) <= F.col(cc))
        )
        .drop(cs, cc)
    )

    w = (
        Window.partitionBy(strata_col)
        .orderBy(pr, F.col(key_col).cast("string"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    running = F.coalesce(
        F.sum(F.col(tokens_col)).over(w), F.lit(0).cast("long")
    )
    # collision-proof temp name: withColumn would silently REPLACE (and the
    # drop then delete) a caller column of the same name
    tmp = "_prior_tokens"
    while tmp in df.columns:
        tmp += "_"
    return (
        pre.withColumn(tmp, running)
        .filter(budget.isNull() | (F.col(tmp) < budget))
        .drop(tmp)
    )


def train_val_test_split(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float] | None = None,
    split_col: str = "split",
    salt: str = "",
) -> DataFrame:
    """Deterministic n-way corpus split: every row gets a ``split_col`` label
    ('train'/'val'/'test' by default) decided purely by the md5 bucket of
    (salt + key) against cumulative-weight thresholds.

    Properties a training pipeline actually needs and ``randomSplit`` lacks:
    - partition/cluster-size independent (randomSplit reshuffles assignment
      when the partition layout changes);
    - append-stable: adding documents later never reassigns existing ones,
      so the eval set stays fixed across corpus versions;
    - engine-agnostic (DuckDB md5 agrees bit-for-bit — oracle-pinned);
    - re-rollable via ``salt`` without touching the key.

    Weights are assigned cumulatively in dict order; the LAST split absorbs
    the rounding remainder (all 65536 buckets are always covered). Rows with
    a NULL key (unhashable — likely upstream junk) are routed to the FIRST
    split explicitly: junk may contaminate training, never the held-out
    eval sets. A pure row-level projection: no shuffle, no state.
    """
    if weights is None:
        weights = {"train": 0.9, "val": 0.05, "test": 0.05}
    if len(weights) < 2:
        raise ValueError("need at least two splits")
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {total}")
    bucket = hash_bucket(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    names = list(weights)
    # NULL keys first: a NULL bucket makes every `<` condition NULL (falsy),
    # which would silently dump those rows into the last split — the eval
    # set. Route them to train instead.
    expr = F.when(F.col(key_col).isNull(), names[0])
    cum = 0.0
    for name in names[:-1]:
        cum += weights[name]
        expr = expr.when(bucket < int(cum * _BUCKETS), name)
    return df.withColumn(split_col, expr.otherwise(names[-1]))


def pack_sequences(
    df: DataFrame,
    key_col: str,
    tokens_col: str,
    budget: int,
    salt: str = "",
    partition_col: str | None = None,
) -> DataFrame:
    """Doc-atomic greedy sequence packing: documents are laid out in
    deterministic md5(salt+key) order and grouped into training sequences
    of ~``budget`` tokens — the standard "pack short documents into
    fixed-length training rows" step. Adds ``seq_id`` (which sequence the
    doc belongs to) and ``seq_pos`` (its 0-based position inside it).

    Assignment rule (ONE window, engine-reproducible — the oracle pins it):
    ``seq_id = floor(exclusive_running_sum(tokens) / budget)`` over the
    hash order — a document belongs to the sequence its FIRST token lands
    in, never split mid-document, so a sequence can overflow the budget by
    at most its last document (and a doc longer than the budget spans its
    own sequence ids without splitting; the window it spills into may
    underfill — the CUMULATIVE token stream always tiles the budget grid,
    which is the invariant the pytest pins). Deterministic and partition-
    independent (same hash-priority machinery as token_budget_sample), but
    NOT append-stable — packing is inherently order-global, so adding docs
    re-cuts sequences; pack per frozen corpus snapshot.

    Default is ONE global sort (the running-sum window) — fine for a
    corpus snapshot that fits one reducer's spill budget, and the shape
    the driver oracle pins. At 100 TB pass ``partition_col`` (language /
    shard): both windows partition by it, the sort distributes across
    shards, and ``seq_id`` becomes LOCAL to its shard — a sequence is
    identified by ``(partition_col, seq_id)`` and never crosses shards
    (which is what a training mix wants anyway: shard-local sequence
    files). Same types, same per-shard semantics as the global form run
    on each shard alone.
    """
    from pyspark.sql import Window

    pri = F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    order = [pri, F.col(key_col).cast("string")]
    if partition_col is None:
        w = Window.orderBy(*order)
        wseq_keys = ["seq_id"]
    else:
        w = Window.partitionBy(partition_col).orderBy(*order)
        wseq_keys = [partition_col, "seq_id"]
    cum_excl = F.coalesce(
        F.sum(tokens_col).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    seq = F.floor(cum_excl / F.lit(budget)).cast("long")
    wseq = Window.partitionBy(*wseq_keys).orderBy(*order)
    return (
        df.withColumn("seq_id", seq)
        .withColumn("seq_pos", F.row_number().over(wseq) - 1)
    )
