"""robots.txt fetch-and-parse (S4).

Reference semantics re-expressed (vendor/PHPCrawl_083/libs/
PHPCrawlerRobotsTxtParser.class.php:29-151): split into lines; a
``User-agent:`` line opens a section; lines apply when the section's agent
is ``*`` or equals ours case-insensitively; ``Disallow:`` values become
path-prefix rules (leading slash enforced).  ``Crawl-delay`` (widely used,
not in the reference parser) maps onto the engine's per-host delay budget
(T7) as seconds → ms.

The output shape equals one entry of the pre-parsed sidecar
(``{"delay_ms": float, "disallow": tuple[str, ...]}``), so the two robots
sources are interchangeable everywhere downstream (CandidateFilter T5,
politeness ledger T7).
"""

from __future__ import annotations

import re

_UA_RE = re.compile(r"^user-agent:\s*(.*)$", re.IGNORECASE)
_DISALLOW_RE = re.compile(r"^disallow:\s*(.*)$", re.IGNORECASE)
_DELAY_RE = re.compile(r"^crawl-delay:\s*([0-9.]+)", re.IGNORECASE)


def parse_robots_txt(content: str, user_agent: str = "*") -> dict:
    """→ {"delay_ms": float, "disallow": tuple[str, ...]} for our agent."""
    disallow: list[str] = []
    delay_ms = 0.0
    current: str | None = None
    for raw in content.replace("\r", "\n").split("\n"):
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        m = _UA_RE.match(line)
        if m:
            current = m.group(1).strip()
            continue
        if current is None:
            continue
        if not (current == "*" or current.lower() == user_agent.lower()):
            continue
        m = _DISALLOW_RE.match(line)
        if m:
            path = m.group(1).strip()
            if path:
                if not path.startswith("/"):
                    path = "/" + path
                disallow.append(path)
            continue
        m = _DELAY_RE.match(line)
        if m:
            delay_ms = float(m.group(1)) * 1000.0
    return {"delay_ms": delay_ms, "disallow": tuple(disallow)}


def render_robots_txt(rules: dict, user_agent: str = "*") -> str:
    """Inverse of :func:`parse_robots_txt` — used by fixtures to synthesize
    robots.txt bodies from sidecar rules."""
    lines = [f"User-agent: {user_agent}"]
    if rules.get("delay_ms"):
        lines.append(f"Crawl-delay: {rules['delay_ms'] / 1000.0:g}")
    for p in rules.get("disallow", ()):
        lines.append(f"Disallow: {p}")
    return "\n".join(lines) + "\n"
