"""Environment-driven configuration, reference-parity.

Mirrors the reference's bootstrap (etl/main.py:150-168) exactly:

1. ``<project root>/.env`` is loaded with OVERRIDE semantics (a value
   there beats an inherited process variable — load_dotenv(env_path,
   override=True));
2. ``<cwd>/.env`` is loaded WITHOUT override (fills gaps only —
   the bare load_dotenv() call);
3. the root .env is re-scanned for ``ALERTS_*`` keys with setdefault
   (the reference's "dotenv can miss them when run as package"
   fallback — harmless but observable, so reproduced).

Alert gating (etl/main.py:111-143 _run_alerts_if_enabled):
- ALERTS_ENABLED must be exactly "1" after strip, else alerts are
  skipped with the reference's message;
- ALERTS_LOOKBACK_WEEKS (default 3), ALERTS_STREAK_THRESHOLD
  (default 3); blank values fall back to defaults;
- ALERTS_DRY_RUN == "1" -> print, don't send;
- TELEGRAM_BOT_TOKEN / TELEGRAM_CHAT_ID both required to send.

Engine mapping for the storage ids (the reference's Google-Sheet ids;
this engine's storage is a filesystem/parquet warehouse — DEVIATIONS
§gsheets): RAW_SPREADSHEET_ID -> RAW csv path,
TARGET_SPREADSHEET_ID -> warehouse directory. Both are validated as
required exactly like the reference's os.environ[...] lookups
(etl/main.py:167-168).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from pathlib import Path


def parse_dotenv(path: str | Path) -> dict[str, str]:
    """Minimal .env parser: KEY=VALUE lines, #-comments skipped,
    surrounding single/double quotes stripped (what python-dotenv does
    for the reference's simple files)."""
    out: dict[str, str] = {}
    p = Path(path)
    if not p.exists():
        return out
    for line in p.read_text(encoding="utf-8").splitlines():
        line = line.strip()
        if not line or line.startswith("#") or "=" not in line:
            continue
        key, _, value = line.partition("=")
        key = key.strip()
        if key.startswith("export "):
            key = key[len("export ") :].strip()
        value = value.strip().strip('"').strip("'")
        if key:
            out[key] = value
    return out


def bootstrap_env(project_root: str | Path | None = None) -> None:
    """Load .env files with the reference's precedence (see module
    docstring). Mutates os.environ, like load_dotenv does."""
    root = Path(project_root) if project_root else Path(__file__).resolve().parent.parent
    root_env = root / ".env"
    for key, value in parse_dotenv(root_env).items():
        os.environ[key] = value  # override=True
    cwd_env = Path.cwd() / ".env"
    if cwd_env.resolve() != root_env.resolve():
        for key, value in parse_dotenv(cwd_env).items():
            os.environ.setdefault(key, value)  # no override
    # reference's manual ALERTS_* fallback (setdefault semantics)
    for key, value in parse_dotenv(root_env).items():
        if key.startswith("ALERTS_"):
            os.environ.setdefault(key, value)


def _int_env(name: str, default: int) -> int:
    # reference: int(os.environ.get(NAME, "3").strip() or "3")
    return int(os.environ.get(name, str(default)).strip() or str(default))


@dataclass
class AlertsConfig:
    enabled: bool
    skip_reason: str | None  # reference's printed message when not running
    lookback_weeks: int
    streak_threshold: int
    dry_run: bool
    telegram_token: str
    telegram_chat_id: str


def alerts_config_from_env() -> AlertsConfig:
    """Reference gating matrix (etl/main.py:111-126), byte-identical
    skip messages."""
    lookback_weeks = _int_env("ALERTS_LOOKBACK_WEEKS", 3)
    streak_threshold = _int_env("ALERTS_STREAK_THRESHOLD", 3)
    dry_run = os.environ.get("ALERTS_DRY_RUN", "").strip() == "1"
    token = os.environ.get("TELEGRAM_BOT_TOKEN", "").strip()
    chat_id = os.environ.get("TELEGRAM_CHAT_ID", "").strip()

    if os.environ.get("ALERTS_ENABLED", "").strip() != "1":
        raw_val = os.environ.get("ALERTS_ENABLED")
        reason = (
            f"Alerts disabled (ALERTS_ENABLED={raw_val!r}). "
            "Set ALERTS_ENABLED=1 in .env (no spaces around =)."
        )
        return AlertsConfig(False, reason, lookback_weeks, streak_threshold,
                            dry_run, token, chat_id)
    if not token or not chat_id:
        return AlertsConfig(
            False,
            "Alerts skipped: TELEGRAM_BOT_TOKEN or TELEGRAM_CHAT_ID not set.",
            lookback_weeks, streak_threshold, dry_run, token, chat_id,
        )
    return AlertsConfig(True, None, lookback_weeks, streak_threshold,
                        dry_run, token, chat_id)


def required_id(name: str) -> str:
    """Reference's required-id validation: os.environ[NAME] raises
    KeyError with the variable name (etl/main.py:167-168)."""
    return os.environ[name]
