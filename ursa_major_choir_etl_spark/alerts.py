"""Driver-side alert formatting and the Telegram HTTP sink (S10, C12).

Pure Python by design: violators are a person-scale DataFrame collected
to the driver; message text and the HTTP POST are side effects outside
Spark (reference: etl/alerts.py:177-230). Message text matches the
reference byte-for-byte — it is part of the observable contract
(tests/test_alerts.py:136-174 asserts on fragments of it).
"""

from __future__ import annotations

from typing import Any

DASHBOARD_URL = (
    "https://lookerstudio.google.com/reporting/0a0ee2af-cb64-42ca-bc16-c312a3d27f1e"
    "/page/p_v5isym300d/edit?s=hs0hEMSZUdg"
)


def format_alert_message(
    violators: list[dict[str, Any]],
    lookback_weeks: int,
    streak_threshold: int = 3,
    attendance_rate: float | None = None,
) -> str:
    """Render the alert text: rate line, blank line, violator list (or
    the all-clear line), dashboard link."""
    lines: list[str] = []
    if attendance_rate is not None:
        pct = round(attendance_rate * 100)
        icon = "\U0001f534" if pct < 50 else ("\U0001f7e1" if pct <= 65 else "\U0001f7e2")
        lines.append(
            f"{icon} Доходимость до репетиций (за последние {lookback_weeks} недели): {pct}%"
        )
        lines.append("")
    if not violators:
        lines.append(
            f"✅ Нет хористов с пропусками {streak_threshold}+ подряд "
            f"(за последние {lookback_weeks} недели)."
        )
    else:
        lines.append(
            f"⚠️ Хористы с {streak_threshold}+ пропусками подряд "
            f"(за последние {lookback_weeks} недели):"
        )
        lines.append("")
        for i, v in enumerate(violators, 1):
            name = v.get("full_name", "—")
            part = v.get("voice_part", "—")
            streak = v.get("streak_len", 0)
            last_att = v.get("last_attended_date") or "—"
            handle = (v.get("tgid") or "").strip().lstrip("@")
            mention = f"@{handle}" if handle else "—"
            lines.append(
                f"{i}. {name} ({part}) — пропусков: {streak}, "
                f"последняя явка: {last_att}, {mention}"
            )
    lines.append("")
    lines.append(f'<a href="{DASHBOARD_URL}">Ссылка на дашборд</a>')
    return "\n".join(lines)


def send_telegram_message(token: str, chat_id: str, text: str) -> None:
    """POST the alert to the Telegram Bot API; raise on HTTP/API error.

    Import is deferred so environments without ``requests`` can run the
    batch pipeline with alerts disabled or in dry-run.
    """
    import requests  # deferred: HTTP sink only

    resp = requests.post(
        f"https://api.telegram.org/bot{token}/sendMessage",
        json={
            "chat_id": chat_id,
            "text": text,
            "parse_mode": "HTML",
            "disable_web_page_preview": True,
        },
        timeout=30,
    )
    resp.raise_for_status()
    data = resp.json()
    if not data.get("ok"):
        raise RuntimeError(f"Telegram API error: {data}")
