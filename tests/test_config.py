"""Env-config bootstrap parity (reference etl/main.py:111-168)."""

from __future__ import annotations

import os

import pytest

from ursa_major_choir_etl_spark.config import (
    alerts_config_from_env,
    bootstrap_env,
    parse_dotenv,
    required_id,
)

ALERT_VARS = [
    "ALERTS_ENABLED", "ALERTS_DRY_RUN", "ALERTS_LOOKBACK_WEEKS",
    "ALERTS_STREAK_THRESHOLD", "TELEGRAM_BOT_TOKEN", "TELEGRAM_CHAT_ID",
]


@pytest.fixture(autouse=True)
def clean_env(monkeypatch):
    for v in ALERT_VARS + ["RAW_SPREADSHEET_ID", "TARGET_SPREADSHEET_ID", "SOME_KEY"]:
        monkeypatch.delenv(v, raising=False)
    yield


class TestDotenvParsing:
    def test_quotes_comments_export(self, tmp_path):
        p = tmp_path / ".env"
        p.write_text(
            "# comment\n"
            "A=1\n"
            'B="quoted"\n'
            "C='single'\n"
            "export D=4\n"
            "BROKEN LINE\n"
            "E=has=equals\n"
        )
        assert parse_dotenv(p) == {
            "A": "1", "B": "quoted", "C": "single", "D": "4", "E": "has=equals",
        }

    def test_missing_file_empty(self, tmp_path):
        assert parse_dotenv(tmp_path / "nope.env") == {}


class TestBootstrapPrecedence:
    def test_root_env_overrides_process(self, tmp_path, monkeypatch):
        """Reference: load_dotenv(root, override=True) - the file wins."""
        (tmp_path / ".env").write_text("SOME_KEY=from_file\nALERTS_ENABLED=1\n")
        monkeypatch.setenv("SOME_KEY", "from_process")
        monkeypatch.chdir(tmp_path)
        bootstrap_env(project_root=tmp_path)
        assert os.environ["SOME_KEY"] == "from_file"
        assert os.environ["ALERTS_ENABLED"] == "1"

    def test_cwd_env_fills_but_does_not_override(self, tmp_path, monkeypatch):
        root = tmp_path / "root"
        cwd = tmp_path / "cwd"
        root.mkdir(); cwd.mkdir()
        (root / ".env").write_text("SOME_KEY=root\n")
        (cwd / ".env").write_text("SOME_KEY=cwd\nALERTS_DRY_RUN=1\n")
        monkeypatch.chdir(cwd)
        bootstrap_env(project_root=root)
        assert os.environ["SOME_KEY"] == "root"      # root wins
        assert os.environ["ALERTS_DRY_RUN"] == "1"   # cwd fills the gap


class TestAlertsGatingMatrix:
    def test_disabled_by_default_with_message(self):
        cfg = alerts_config_from_env()
        assert not cfg.enabled
        assert cfg.skip_reason == (
            "Alerts disabled (ALERTS_ENABLED=None). "
            "Set ALERTS_ENABLED=1 in .env (no spaces around =)."
        )

    def test_disabled_when_not_exactly_1(self, monkeypatch):
        for bad in ["0", "true", "yes", " 1x"]:
            monkeypatch.setenv("ALERTS_ENABLED", bad)
            cfg = alerts_config_from_env()
            assert not cfg.enabled
            assert f"ALERTS_ENABLED={bad!r}" in cfg.skip_reason

    def test_enabled_needs_telegram_ids(self, monkeypatch):
        monkeypatch.setenv("ALERTS_ENABLED", "1")
        cfg = alerts_config_from_env()
        assert not cfg.enabled
        assert cfg.skip_reason == (
            "Alerts skipped: TELEGRAM_BOT_TOKEN or TELEGRAM_CHAT_ID not set."
        )
        monkeypatch.setenv("TELEGRAM_BOT_TOKEN", "t")
        assert not alerts_config_from_env().enabled
        monkeypatch.setenv("TELEGRAM_CHAT_ID", "c")
        cfg = alerts_config_from_env()
        assert cfg.enabled and cfg.skip_reason is None

    def test_defaults_and_overrides(self, monkeypatch):
        monkeypatch.setenv("ALERTS_ENABLED", " 1 ")  # reference strips
        monkeypatch.setenv("TELEGRAM_BOT_TOKEN", "t")
        monkeypatch.setenv("TELEGRAM_CHAT_ID", "c")
        cfg = alerts_config_from_env()
        assert (cfg.lookback_weeks, cfg.streak_threshold, cfg.dry_run) == (3, 3, False)
        monkeypatch.setenv("ALERTS_LOOKBACK_WEEKS", " 8 ")
        monkeypatch.setenv("ALERTS_STREAK_THRESHOLD", "")  # blank -> default
        monkeypatch.setenv("ALERTS_DRY_RUN", "1")
        cfg = alerts_config_from_env()
        assert (cfg.lookback_weeks, cfg.streak_threshold, cfg.dry_run) == (8, 3, True)

    def test_required_id_raises_keyerror_with_name(self):
        with pytest.raises(KeyError, match="RAW_SPREADSHEET_ID"):
            required_id("RAW_SPREADSHEET_ID")
