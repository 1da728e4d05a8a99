"""Materialize-once warehouse artifacts for shared pipeline stages.

The candidate-pair table (n-gram Jaccard pairs, SimHash Hamming
pairs, embedding cosine pairs) heads every fuzzy-dedup consumer:
connected components (q55/q77), representative election (q122),
triangle counts (q124), consensus voting (q116), threshold tuning
(q130). Recomputing it per consumer is both the measured perf tail
(q124/q116 re-ran the full shingle->index->verify pipeline
internally, ~9s/~7s warm at sf0.1) and the wrong 100 TB layout — in
production the pair table is a PERSISTED dataset built once per
corpus snapshot and read by every downstream job, exactly like the
incremental-dedup fingerprint index (operators/dedup.py
incremental_dedup_probe docstring).

:func:`materialize_once` is that layout in miniature: build the
DataFrame once, write it as parquet under the warehouse, and hand
every caller a plain parquet scan. Properties:

- **Keyed by inputs, version, and parameters.** The key embeds an
  fingerprint of the source files (size + mtime), so a regenerated
  testdata directory — the round-4 fixture-drift postmortem — can
  never serve a stale pair set; it also embeds a caller-supplied
  version token so operator-semantics changes invalidate explicitly.
- **Atomic publish.** The build writes to a pid-suffixed temp dir and
  ``os.rename``s into place; a lost race (concurrent bench + test
  run) discards the duplicate build and reads the winner's output.
- **Self-pruning.** Superseded generations of the same artifact
  (older fingerprints/versions) are removed on publish, so the
  warehouse holds one generation per (artifact, scale).
- **Oracle-independent.** DuckDB oracles keep recomputing from raw
  tables — the driver's value-hash compare therefore certifies the
  artifact contents themselves every round.

Storage root: ``$SPARK_GRAFT_ARTIFACTS``, default
``<repo>/spark-warehouse/artifacts`` (gitignored).
"""

from __future__ import annotations

import hashlib
import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession

# (storage root, key) pairs verified present on disk during THIS
# process — skips the stat calls on repeat reads inside one bench/test
# session. The root is part of the cache key because the storage root
# is env-resolved per call: a process that switches
# $SPARK_GRAFT_ARTIFACTS (the determinism tests do) must not let a
# key verified under one root suppress the existence check — and
# therefore the build — under another.
_VERIFIED: set[tuple[str, str]] = set()

# Inferred schema per verified (root, key) (round 13): the first read
# of an artifact runs Spark's footer-inference job; every later read
# in the process passes the cached schema so plan CONSTRUCTION over an
# existing artifact runs zero jobs — with 16 tokens_table consumers
# (and the pair/IVF/LSH artifacts), that is one small job saved per
# consumer per session, and it makes explain-only callers truly free.
_SCHEMAS: dict[tuple[str, str], "object"] = {}


def base_dir() -> str:
    return os.environ.get(
        "SPARK_GRAFT_ARTIFACTS",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "spark-warehouse",
            "artifacts",
        ),
    )


def _input_fingerprint(paths: list[str]) -> str:
    """Cheap content proxy for the artifact's source files: size +
    mtime_ns per path (works for files and parquet directories — a
    regenerated dataset touches both). Stat-only, no data read."""
    parts = []
    for p in sorted(paths):
        try:
            st = os.stat(p)
            parts.append(f"{p}:{st.st_size}:{st.st_mtime_ns}")
        except OSError:
            parts.append(f"{p}:missing")
    return hashlib.md5("|".join(parts).encode()).hexdigest()[:12]


def _slug(s: str) -> str:
    return re.sub(r"[^A-Za-z0-9.]+", "_", s.strip("/"))


def materialize_once(
    spark: SparkSession,
    name: str,
    scope: str,
    version: int,
    inputs: list[str],
    builder,
) -> DataFrame:
    """Return ``name``'s artifact for ``scope`` (e.g. the sf_dir),
    building it via ``builder() -> DataFrame`` only if no current
    generation exists. The returned DataFrame is always a parquet
    scan — downstream plans never embed the build pipeline.
    """
    prefix = f"{name}__{_slug(scope)}__"
    key = f"{prefix}v{version}_{_input_fingerprint(inputs)}"
    root = base_dir()
    path = os.path.join(root, key)
    cache_key = (root, key)
    if cache_key not in _VERIFIED and not os.path.isdir(path):
        os.makedirs(root, exist_ok=True)
        tmp = f"{path}.tmp-{os.getpid()}"
        from ursa_major_choir_etl_spark.caching import release_staged

        try:
            builder().write.mode("overwrite").parquet(tmp)
        except BaseException:
            # A failed build must not leave its half-written tmp
            # behind: same-key tmps are deliberately excluded from
            # _prune_superseded (a LIVE concurrent build owns one),
            # so an orphan would linger in the warehouse forever.
            shutil.rmtree(tmp, ignore_errors=True)
            raise
        finally:
            # The builder may have staged (persisted) intermediates —
            # jaccard_pairs persists its shingle index; the write
            # above was their one consumer. Release on BOTH paths: a
            # failed build must not leave them pinned in executor
            # storage for the rest of the session.
            release_staged()
        try:
            os.rename(tmp, path)
        except OSError:
            # Concurrent builder won the rename; its output is
            # equivalent by construction (same key == same inputs,
            # version, params). Drop ours.
            shutil.rmtree(tmp, ignore_errors=True)
        _prune_superseded(root, prefix, key)
    _VERIFIED.add(cache_key)
    cached = _SCHEMAS.get(cache_key)
    if cached is not None:
        return spark.read.schema(cached).parquet(path)
    out = spark.read.parquet(path)
    _SCHEMAS[cache_key] = out.schema
    return out


def _prune_superseded(root: str, prefix: str, keep_key: str) -> None:
    """Best-effort removal of older generations of one artifact
    (same name+scope prefix, different version/fingerprint)."""
    try:
        for entry in os.listdir(root):
            if (
                entry.startswith(prefix)
                and entry != keep_key
                and not entry.startswith(keep_key + ".tmp")
            ):
                shutil.rmtree(
                    os.path.join(root, entry), ignore_errors=True
                )
    except OSError:
        pass
