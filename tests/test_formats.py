"""Source/sink format round-trips beyond parquet: ORC, JSON-lines,
CSV. The engine boundary is format-agnostic (`spark.read.<fmt>` /
`df.write.<fmt>`); these tests pin the loss-free paths — same rows,
same values after a write+read cycle — so a reference user can land
data in whichever format their upstream produces.

CSV carries no types, so the read back goes through the declared
schema (the same discipline the wide-sheet ingest uses,
sources/io.py); JSON preserves types for the primitives used here;
ORC is the columnar alternative with the same pushdown properties as
parquet.
"""

from __future__ import annotations

SF_DIR = "/root/testdata/sf0.001"


def _same_rows(a, b) -> bool:
    return a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


class TestFormatRoundTrips:
    def test_orc(self, spark, tmp_path_factory):
        src = spark.read.parquet(f"{SF_DIR}/customer.parquet")
        p = str(tmp_path_factory.mktemp("fmt") / "cust_orc")
        src.write.mode("overwrite").orc(p)
        assert _same_rows(src, spark.read.orc(p))

    def test_orc_pushdown(self, spark, tmp_path_factory):
        src = spark.read.parquet(f"{SF_DIR}/customer.parquet")
        p = str(tmp_path_factory.mktemp("fmt") / "cust_orc")
        src.write.mode("overwrite").orc(p)
        plan = (
            spark.read.orc(p)
            .filter("c_nationkey = 3")
            .select("c_custkey")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "PushedFilters: [" in plan and "c_nationkey" in plan

    def test_jsonl(self, spark, tmp_path_factory):
        src = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        p = str(tmp_path_factory.mktemp("fmt") / "docs_json")
        src.write.mode("overwrite").json(p)
        back = spark.read.schema(src.schema).json(p)
        assert _same_rows(src, back)

    def test_csv_with_schema(self, spark, tmp_path_factory):
        src = spark.read.parquet(f"{SF_DIR}/customer.parquet")
        p = str(tmp_path_factory.mktemp("fmt") / "cust_csv")
        # escape-quote so free-text columns (comments with commas)
        # survive; header carried for humans, schema declared on read.
        src.write.mode("overwrite").option("header", "true").csv(p)
        back = spark.read.schema(src.schema).option("header", "true").csv(p)
        assert _same_rows(src, back)
