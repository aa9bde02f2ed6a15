"""robots.txt (Robots Exclusion Protocol, RFC 9309) — pure-Python
kernel, no Spark imports (same layering contract as the rest of
``functions/``: runs inside Arrow batches, unit-tested directly).

Semantics implemented (the RFC rules that matter for filtering):
- groups: one or more consecutive ``User-agent`` lines followed by
  ``Allow``/``Disallow`` rules; later ``User-agent`` lines start a new
  group only after rules have been seen;
- group selection: all groups whose agent token is a case-insensitive
  prefix of the product token are candidates; the longest such token
  wins, and ``*`` groups apply only when no specific group matched;
- rule matching: patterns match from the start of the URL path,
  ``*`` matches any span, ``$`` anchors the end; the LONGEST matching
  pattern wins and on equal length ``Allow`` beats ``Disallow``;
- an empty ``Disallow:`` permits everything (it matches nothing);
  no matching rule means allowed.
"""

from __future__ import annotations

import re


def _pattern_regex(pattern: str) -> "re.Pattern[str]":
    parts = []
    i = 0
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    while i < len(body):
        c = body[i]
        if c == "*":
            parts.append(".*")
        else:
            parts.append(re.escape(c))
        i += 1
    return re.compile("^" + "".join(parts) + ("$" if anchored else ""))


def parse_robots(text: str, agent: str) -> list[tuple[bool, str, "re.Pattern[str]"]]:
    """robots.txt content -> the (allow, pattern, compiled) rules of
    the group governing ``agent`` (RFC group-selection semantics)."""
    groups: list[tuple[list[str], list[tuple[bool, str]]]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[bool, str]] = []
    seen_rule = False
    for raw in (text or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if seen_rule:
                groups.append((cur_agents, cur_rules))
                cur_agents, cur_rules, seen_rule = [], [], False
            cur_agents.append(val.lower())
        elif key in ("allow", "disallow"):
            seen_rule = True
            if val == "":
                continue  # empty Disallow/Allow matches nothing
            cur_rules.append((key == "allow", val))
    if cur_agents or cur_rules:
        groups.append((cur_agents, cur_rules))

    agent_l = agent.lower()
    best_len = max(
        (
            len(a)
            for agents, _ in groups
            for a in agents
            if a != "*" and agent_l.startswith(a)
        ),
        default=-1,
    )
    # RFC 9309 merges the rules of EVERY group naming the winning
    # (longest-matching) token — a second "User-agent: sparkbot" group
    # later in the file extends the first, exactly like '*' groups do.
    best_rules: list[tuple[bool, str]] = []
    star_rules: list[tuple[bool, str]] = []
    star_seen = False
    for agents, rules in groups:
        if best_len >= 0 and any(
            a != "*" and agent_l.startswith(a) and len(a) == best_len
            for a in set(agents)
        ):
            best_rules.extend(rules)
        if "*" in agents:
            star_rules.extend(rules)
            star_seen = True
    chosen = best_rules if best_len >= 0 else (star_rules if star_seen else [])
    return [(allow, pat, _pattern_regex(pat)) for allow, pat in chosen]


def url_allowed(
    rules: list[tuple[bool, str, "re.Pattern[str]"]], path: str
) -> bool:
    """Longest-match wins; equal length -> Allow wins; no match ->
    allowed."""
    best: tuple[int, bool] | None = None
    for allow, pattern, rx in rules:
        if rx.match(path):
            key = (len(pattern), allow)
            if best is None or key > best:
                best = key
    return True if best is None else best[1]
