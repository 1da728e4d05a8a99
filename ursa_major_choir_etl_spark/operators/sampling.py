"""Sampling operators for training-data curation.

Both are thin, deliberately: Spark's native sampling is already
distributed and reproducible-with-seed; what a pipeline needs on top
is the contract. Results are SAMPLES — not oracle-checkable against
SQL — so the tests assert statistical properties (per-stratum rates,
determinism, disjointness) rather than value hashes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    seed: int = 42,
) -> DataFrame:
    """Per-stratum Bernoulli sample (e.g. downweight one language to
    rebalance a corpus). ``fractions`` maps stratum value -> keep
    probability; strata absent from the map are DROPPED (explicit
    allowlist, so a new surprise stratum can't flood the sample).
    Same seed + same input => same sample (reproducible curation).
    """
    return df.sampleBy(strata_col, fractions, seed=seed)


def split_train_eval(
    df: DataFrame,
    eval_fraction: float = 0.01,
    id_col: str | None = None,
    seed: int = 42,
) -> tuple[DataFrame, DataFrame]:
    """Deterministic train/eval split.

    With ``id_col``: HASH-based split — membership depends only on the
    id value, so it is stable across runs, re-partitioning, AND
    incremental data growth (a doc never migrates between splits when
    new data arrives; the property that keeps eval sets uncontaminated
    as the corpus grows). Without it: randomSplit with a seed (stable
    only for identical input partitioning).

    Returns (train, eval).
    """
    if id_col is not None:
        bucket = F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(1_000_000))
        thresh = int(eval_fraction * 1_000_000)
        is_eval = bucket < thresh
        return df.filter(~is_eval), df.filter(is_eval)
    train, ev = df.randomSplit([1.0 - eval_fraction, eval_fraction], seed=seed)
    return train, ev
