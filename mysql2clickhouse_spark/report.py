"""Run reporting + secret redaction (SURVEY §2.1 S8, §2.3 P12).

The reference posts a success/error summary to Telegram after each run
(notification sink, _settings.py:347-375; gating matomo2clickhouse.py:
951-981) and masks ``*token*`` / ``*passw*`` values in every log line
(matomo2clickhouse.py:108-114). The engine keeps both as driver-side
hooks — no data-plane involvement: the report is built from the
``RunReport`` the runner already returns, and redaction is a pure
string function applied to anything operator-facing.
"""

from __future__ import annotations

import re

#: key=value (or key: value) pairs whose key smells like a secret;
#: mirrors the reference's token/passw masks (matomo2clickhouse.py:108-114)
_SECRET_RE = re.compile(
    r"(?i)([\"']?\w*(?:token|passw|secret|api_?key)\w*[\"']?\s*[=:]\s*)"
    r"([\"']?)[^\s,;\"']+(\2)"
)


def redact_secrets(text: str) -> str:
    """P12 — mask secret-looking values in an operator-facing string."""
    return _SECRET_RE.sub(r"\1\2***\3", text)


def format_run_report(report, error: str | None = None) -> str:
    """S8 — the notification text for one run: success/error status plus
    the counters the reference reports (rows applied, rejected deletes,
    position range; matomo2clickhouse.py:951-981). Redacted."""
    status = "ERROR" if error else ("DRY-RUN" if report.dry_run else "SUCCESS")
    lines = [
        f"[{status}] replication run",
        f"positions: {report.start_seq} -> {report.end_seq}",
        f"rows applied: {report.rows_applied}",
        f"old-DELETEs rejected: {report.rows_rejected_old_delete}",
        f"rows quarantined: {report.rows_quarantined}",
    ]
    for tbl, info in sorted(report.tables.items()):
        lines.append(f"  {tbl}: mode={info['mode']} rows={info['rows']}")
    if error:
        lines.append(f"error: {error}")
    return redact_secrets("\n".join(lines))


def should_notify(success: bool, hours_since_last_success_note: float) -> bool:
    """S8 rate limit: errors always notify; successes at most every 4 h
    (the reference's success-message throttle,
    matomo2clickhouse.py:959-968)."""
    if not success:
        return True
    return hours_since_last_success_note >= 4.0
