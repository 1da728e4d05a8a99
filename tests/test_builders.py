"""Golden tests for dims/facts/marts on the raw_wide fixture — the
layers the reference never tested (SURVEY §5 strategy item b). Every
contract rule from docs/data_contract.md:95-177 gets an assertion."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ursa_major_choir_etl_spark.operators.dims import (
    build_dim_chorister,
    build_dim_chorister_assignment,
    build_dim_song,
    chorister_id_by_key,
)
from ursa_major_choir_etl_spark.operators.facts import (
    build_fact_attendance,
    build_fact_song_time,
    date_columns_iso,
)
from ursa_major_choir_etl_spark.operators.marts import (
    build_mart_attendance,
    build_mart_chorister_song,
    build_mart_song_rehearsal,
)
from ursa_major_choir_etl_spark.operators.quality import build_bad_cells

TS = "2026-08-13T00:00:00+00:00"


@pytest.fixture(scope="module")
def dims(raw):
    dc = build_dim_chorister(raw, TS).cache()
    ds = build_dim_song(raw, TS).cache()
    asg = build_dim_chorister_assignment(raw, dc).cache()
    return dc, ds, asg


@pytest.fixture(scope="module")
def facts(raw, dims):
    dc, ds, _ = dims
    fa = build_fact_attendance(raw, chorister_id_by_key(dc), TS).cache()
    fst = build_fact_song_time(raw, ds, TS).cache()
    return fa, fst


class TestDimChorister:
    def test_row_count_and_filters(self, dims):
        dc, _, _ = dims
        # 8 chorister rows: empty-Tag and empty-Who rows are skipped.
        assert dc.count() == 8

    def test_duplicate_name_disambiguation(self, dims):
        dc, _, _ = dims
        ids = [r["chorister_id"] for r in dc.orderBy("input_row_id").collect()]
        assert "Иван Петров" in ids
        assert "Иван Петров | 45460" in ids

    def test_run_ts_stamped(self, dims):
        dc, _, _ = dims
        assert dc.filter(F.col("created_at") != TS).count() == 0


class TestDimSong:
    def test_duplicate_title_suffix(self, dims):
        _, ds, _ = dims
        ids = [r["song_id"] for r in ds.orderBy("song_ordinal").collect()]
        assert ids == ["Калинка", "Катюша", "Калинка (2)", "Ой мороз"]


class TestAssignments:
    def test_override_fanout(self, dims):
        _, _, asg = dims
        maria = asg.filter(F.col("chorister_id") == "Мария Дидуренко").orderBy(
            "valid_from"
        ).collect()
        assert [(r["voice_part"], r["valid_from"], r["valid_to"]) for r in maria] == [
            ("alto", "02.10.24", ""),
            ("soprano", "16.06.24", "01.10.24"),
        ]

    def test_ex_prefix_inactive(self, dims):
        _, _, asg = dims
        olga = asg.filter(F.col("chorister_id") == "Ольга Иванова").collect()
        assert olga[0]["voice_part"] == "alto"
        assert olga[0]["is_active"] == "FALSE"
        petr = asg.filter(F.col("chorister_id") == "Пётр Сидоров").collect()
        assert petr[0]["voice_part"] == "tenor"

    def test_assignment_id_shape(self, dims):
        _, _, asg = dims
        r = asg.filter(F.col("chorister_id") == "Анна Соколова").collect()[0]
        assert r["assignment_id"] == "Анна Соколова | soprano | 23.06.24"


class TestFactAttendance:
    def test_dense_grain(self, facts):
        fa, _ = facts
        # 8 choristers x 7 date columns, every pair present.
        assert fa.count() == 56
        assert fa.select("rehearsal_date", "chorister_id").distinct().count() == 56

    def test_empty_cell_is_miss(self, facts):
        fa, _ = facts
        r = fa.filter(
            (F.col("chorister_id") == "Мария Дидуренко")
            & (F.col("rehearsal_date") == "2024-07-07")
        ).collect()[0]
        assert r["hours_attended"] == 0.0
        assert r["missed_flag"] == 1

    def test_comma_decimal(self, facts):
        fa, _ = facts
        r = fa.filter(
            (F.col("chorister_id") == "Мария Дидуренко")
            & (F.col("rehearsal_date") == "2024-06-30")
        ).collect()[0]
        assert r["hours_attended"] == 2.5
        assert r["missed_flag"] == 0

    def test_header_dates_normalized(self, facts):
        fa, _ = facts
        dates = sorted(
            r["rehearsal_date"]
            for r in fa.select("rehearsal_date").distinct().collect()
        )
        assert dates == [
            "2024-06-16",
            "2024-06-23",
            "2024-06-30",
            "2024-07-07",
            "2024-07-14",
            "2024-07-21",  # serial 45494
            "2024-07-28",
        ]

    def test_strict_parse_raises_with_context(self, spark, raw):
        bad = raw.withColumn(
            "16.06.24",
            F.when(F.col("Who") == "Анна Соколова", F.lit("oops")).otherwise(
                F.col("`16.06.24`")
            ),
        )
        dc = build_dim_chorister(bad, TS)
        with pytest.raises(RuntimeError, match="Анна Соколова.*oops"):
            build_fact_attendance(bad, chorister_id_by_key(dc), TS)

    def test_duplicate_date_header_raises(self, spark):
        from ursa_major_choir_etl_spark.sources.io import INPUT_ROW_ID

        df = spark.createDataFrame(
            [("Bass", "16.06.24", "", "X", "1", "2", 0)],
            f"Tag string, Joined string, tgid string, Who string,"
            f" `05.10.24` string, `2024-10-05` string, {INPUT_ROW_ID} int",
        )
        with pytest.raises(RuntimeError, match="Duplicate rehearsal_date"):
            date_columns_iso(df)


class TestFactSongTime:
    def test_sparse_grain_and_junk_skipped(self, facts):
        _, fst = facts
        # Only numeric cells become rows; the "x" cell is skipped.
        assert fst.count() == 12
        assert fst.filter(F.col("song_id") == "Ой мороз").count() == 2

    def test_raw_dates_not_normalized(self, facts):
        _, fst = facts
        dates = {r["rehearsal_date"] for r in fst.select("rehearsal_date").collect()}
        assert "16.06.24" in dates  # kept raw (U1/U2 asymmetry)
        assert "45494" in dates

    def test_positional_zip_duplicate_title(self, facts):
        _, fst = facts
        # Second "Калинка" row pairs with song_id "Калинка (2)".
        k2 = fst.filter(F.col("song_id") == "Калинка (2)").collect()
        assert {r["rehearsal_date"] for r in k2} == {"16.06.24", "2024-07-14"}


class TestMarts:
    def test_mart_attendance_asof_voice_part(self, dims, facts):
        dc, _, asg = dims
        fa, _ = facts
        mart = build_mart_attendance(dc, asg, fa).cache()
        # Maria's override: soprano until 01.10.24 — all fixture dates.
        maria = mart.filter(F.col("chorister_id") == "Мария Дидуренко")
        assert {r["voice_part"] for r in maria.collect()} == {"soprano"}
        # Ольга (ex Alto): assignment exists, is_active FALSE.
        olga = mart.filter(F.col("chorister_id") == "Ольга Иванова").collect()
        assert all(r["voice_part"] == "alto" for r in olga)
        assert all(r["is_active"] is False for r in olga)

    def test_mart_attendance_available_flag(self, dims, facts):
        dc, _, asg = dims
        fa, _ = facts
        mart = build_mart_attendance(dc, asg, fa)
        ivan = {
            r["rehearsal_date"]: r["available_flag"]
            for r in mart.filter(F.col("chorister_id") == "Иван Петров").collect()
        }
        # joined 07.07.24: earlier rehearsals unavailable.
        assert ivan["2024-06-16"] == 0
        assert ivan["2024-06-30"] == 0
        assert ivan["2024-07-07"] == 1
        assert ivan["2024-07-28"] == 1

    def test_mart_attendance_invalid_joined_raises(self, spark, dims, facts):
        dc, _, asg = dims
        fa, _ = facts
        bad_dc = dc.withColumn(
            "joined_date",
            F.when(F.col("chorister_id") == "Анна Соколова", "not-a-date").otherwise(
                F.col("joined_date")
            ),
        )
        with pytest.raises(RuntimeError, match="Invalid joined_date.*Анна Соколова"):
            build_mart_attendance(bad_dc, asg, fa)

    def test_mart_song_rehearsal_normalizes_dates(self, dims, facts):
        _, ds, _ = dims
        _, fst = facts
        mart = build_mart_song_rehearsal(ds, fst)
        dates = {r["rehearsal_date"] for r in mart.select("rehearsal_date").collect()}
        assert all(d.startswith("2024-") for d in dates)
        r = mart.filter(
            (F.col("song_id") == "Калинка") & (F.col("rehearsal_date") == "2024-07-07")
        ).collect()[0]
        assert r["minutes_spent"] == 45.5
        assert abs(r["hours_spent"] - 45.5 / 60) < 1e-9

    def test_mart_chorister_song_cross_product(self, dims, facts):
        dc, ds, asg = dims
        fa, fst = facts
        mart = build_mart_chorister_song(dc, asg, ds, fa, fst).cache()
        # On 2024-06-16: attendees x songs rehearsed that day.
        day = mart.filter(F.col("rehearsal_date") == "2024-06-16")
        attendees = {r["chorister_id"] for r in day.select("chorister_id").collect()}
        songs = {r["song_id"] for r in day.select("song_id").collect()}
        assert songs == {"Калинка", "Калинка (2)"}
        assert "Мария Дидуренко" in attendees
        # grain: attendees(4) x songs(2)
        assert day.count() == day.select("chorister_id").distinct().count() * 2


class TestBadCells:
    def test_song_junk_quarantined(self, raw):
        bad = build_bad_cells(raw, TS)
        rows = bad.collect()
        assert any(
            r["entity_type"] == "song" and r["raw_value"] == "x" for r in rows
        )
