"""Intra-document paragraph dedup (text.remove_repeated_paragraphs):
keep-first semantics on normalized paragraphs, blank-structure
preservation, idempotency, and the zero-shuffle plan contract."""

from __future__ import annotations

from pyspark.sql import functions as F


def _run(spark, rows, **kw):
    from ursa_major_choir_etl_spark.operators.text import (
        remove_repeated_paragraphs,
    )

    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        r["doc_id"]: r
        for r in remove_repeated_paragraphs(df, **kw).collect()
    }


class TestRemoveRepeatedParagraphs:
    def test_keep_first_preserves_order_and_raw_form(self, spark):
        got = _run(
            spark,
            [
                (1, "intro\nbody\nintro\noutro"),
                (2, "Header \nheader\ncontent"),  # normalized match,
                # first RAW form ("Header ") survives
            ],
        )
        assert got[1]["text"] == "intro\nbody\noutro"
        assert (got[1]["n_paragraphs"], got[1]["n_removed"]) == (4, 1)
        assert got[2]["text"] == "Header \ncontent"
        assert got[2]["n_removed"] == 1

    def test_blank_lines_and_short_paragraphs_survive(self, spark):
        got = _run(
            spark,
            [(1, "a b\n\na b\n\nend"), (2, "-\n-\n-\nreal")],
            min_chars=2,
        )
        # both blank separators kept; only the repeated "a b" dropped
        assert got[1]["text"] == "a b\n\n\nend"
        assert got[1]["n_removed"] == 1
        # "-" is below min_chars: repeated but never dedup-eligible
        assert got[2]["text"] == "-\n-\n-\nreal"
        assert got[2]["n_removed"] == 0

    def test_no_repeats_is_identity(self, spark):
        text = "alpha\nbeta\ngamma"
        got = _run(spark, [(1, text)])
        assert got[1]["text"] == text and got[1]["n_removed"] == 0

    def test_idempotent(self, spark):
        from ursa_major_choir_etl_spark.operators.text import (
            remove_repeated_paragraphs,
        )

        df = spark.createDataFrame(
            [(1, "x\ny\nx\nz\ny\nx")], "doc_id long, text string"
        )
        once = remove_repeated_paragraphs(df)
        twice = remove_repeated_paragraphs(once.select("doc_id", "text"))
        r1 = once.collect()[0]
        r2 = twice.collect()[0]
        assert r1["text"] == r2["text"] == "x\ny\nz"
        assert r2["n_removed"] == 0

    def test_custom_separator_with_regex_metachars(self, spark):
        got = _run(
            spark,
            [(1, "p1|p1|p2")],
            sep="|",  # '|' is a regex metachar — must be escaped
        )
        assert got[1]["text"] == "p1|p2" and got[1]["n_removed"] == 1

    def test_plan_is_a_pure_projection(self, spark):
        from ursa_major_choir_etl_spark.operators.text import (
            remove_repeated_paragraphs,
        )

        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        )
        plan = (
            remove_repeated_paragraphs(docs)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan  # zero shuffles at any scale
        assert "BatchEvalPython" not in plan  # no Python in the row path

    def test_real_documents_survive_and_counts_are_consistent(self, spark):
        from ursa_major_choir_etl_spark.operators.text import (
            remove_repeated_paragraphs,
        )

        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        )
        out = remove_repeated_paragraphs(docs)
        row = out.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("n_removed") < 0).cast("int")).alias("neg"),
            F.sum(
                (F.col("n_removed") >= F.col("n_paragraphs")).cast("int")
            ).alias("overfull"),
        ).collect()[0]
        assert row["n"] == docs.count()
        assert row["neg"] == 0 and row["overfull"] == 0
