"""Property-based tests: the Spark Column date parser agrees with the
driver-side Python mirror on arbitrary inputs (both implement the
reference's C1 semantics: serial / ISO-prefix / d.m.yy with the <50
century window; unparseable -> "")."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from ursa_major_choir_etl_spark.functions.columns import normalize_date_to_iso
from ursa_major_choir_etl_spark.operators.facts import _py_normalize_date

date_like = st.one_of(
    st.integers(min_value=-1000, max_value=80000).map(str),
    st.dates().map(lambda d: d.isoformat()),
    st.dates().map(lambda d: d.strftime("%d.%m.%y")),
    st.dates().map(lambda d: d.strftime("%d.%m.%Y")),
    st.dates().map(lambda d: d.strftime("%-d.%-m.%y")),
    st.text(
        alphabet="0123456789.-/ ab", min_size=0, max_size=12
    ),
    st.sampled_from(["", "  ", "31.02.24", "00.00.00", "5.10.24", "2024-10-05T12:00:00"]),
)


class TestDateParserProperties:
    @settings(max_examples=30, deadline=None)
    @given(st.lists(date_like, min_size=1, max_size=40))
    def test_spark_matches_python_mirror(self, spark, values):
        df = spark.createDataFrame([(v,) for v in values], "raw string")
        got = [
            r["iso"]
            for r in df.select(normalize_date_to_iso("raw").alias("iso"))
            .collect()
        ]
        expected = [_py_normalize_date(v) for v in values]
        assert got == expected

    def test_reference_examples(self, spark):
        """The exact example set from the reference's branches
        (serial epoch, ISO prefix, century window both sides)."""
        cases = {
            "45460": "2024-06-17",
            "2024-10-05": "2024-10-05",
            "2024-10-05T12:00:00": "2024-10-05",
            "05.10.24": "2024-10-05",
            "5.10.24": "2024-10-05",
            "16.06.2024": "2024-06-16",
            "01.01.49": "2049-01-01",   # <50 -> 20xx
            "01.01.50": "1950-01-01",   # >=50 -> 19xx
            "31.02.24": "",             # impossible date
            "garbage": "",
            "": "",
        }
        df = spark.createDataFrame([(k,) for k in cases], "raw string")
        got = {
            r["raw"]: r["iso"]
            for r in df.select(
                "raw", normalize_date_to_iso("raw").alias("iso")
            ).collect()
        }
        assert got == cases
