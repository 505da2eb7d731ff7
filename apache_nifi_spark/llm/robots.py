"""robots.txt URL filtering (RFC 9309, the Robots Exclusion Protocol) —
the crawl-etiquette gate between WARC acquisition and the curation
tiers (§2.12): a pipeline re-filtering a crawl against current robots
rules must apply the SAME longest-match semantics every major crawler
implements.

From the public RFC:

- group selection: the group whose ``User-agent`` line is the LONGEST
  match for the product token wins; ``*`` groups apply only when no
  specific group matches; multiple user-agent lines may share a group,
- rule matching: the rule (allow or disallow) with the LONGEST matching
  path-pattern wins; on a length tie allow wins; no matching rule means
  allowed; an empty-pattern disallow means allowed,
- patterns support ``*`` (any run) and the ``$`` end anchor; matching
  is against the percent-decoded path + query.

Spark-first shape: rules parse ONCE driver-side (a robots.txt is KBs —
control-plane, the BPE-merge-table precedent) and compile into a single
Catalyst boolean via ``rlike``-free prefix/wildcard algebra — the URL
column never leaves the JVM, no UDF, no shuffle; the filter pushes to
the scan like any other predicate.  For per-host robots at crawl scale,
parse per host and broadcast-join the (host, rules) table — the same
plan with a key.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["parse_robots", "robots_is_allowed", "robots_filter"]


def parse_robots(text: str, agent: str = "*") -> list[tuple[bool, str]]:
    """RFC 9309 parse + group selection for ``agent``: returns the
    applicable [(is_allow, path_pattern)] rules, longest-user-agent
    group winning, ``*`` as fallback.  Driver-side control plane —
    robots files are KBs by spec recommendation."""
    agent_l = agent.lower()
    groups: list[tuple[list[str], list[tuple[bool, str]]]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[bool, str]] = []
    rules_seen = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if rules_seen and cur_agents:
                groups.append((cur_agents, cur_rules))
                cur_agents, cur_rules, rules_seen = [], [], False
            cur_agents.append(value.lower())
        elif field in ("allow", "disallow"):
            rules_seen = True
            if cur_agents:
                cur_rules.append((field == "allow", value))
    if cur_agents:
        groups.append((cur_agents, cur_rules))

    best_len, best_rules = -1, []
    star_rules: list[tuple[bool, str]] = []
    for agents, rules in groups:
        for a in agents:
            if a == "*":
                star_rules = star_rules or rules
            # RFC 9309 §2.2.1: the group token matches when it is a
            # (case-insensitive) substring of the crawler's product token
            # — one way only.  The reverse test would let a group for a
            # longer unrelated bot ('superdatabot') capture agent
            # 'databot' and win the longest-match tie (ADVICE r11).
            elif a in agent_l:
                if len(a) > best_len:
                    best_len, best_rules = len(a), rules
    return best_rules if best_len >= 0 else star_rules


def _pattern_matches(pattern: str) -> "re.Pattern[str] | None":
    if not pattern:
        return None
    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    rx = ".*".join(re.escape(p) for p in pattern.split("*"))
    return re.compile("^" + rx + ("$" if anchored else ""))


def robots_is_allowed(rules: list[tuple[bool, str]], path: str) -> bool:
    """Reference longest-match evaluation (driver-side twin of the
    column form; property-tested against it)."""
    best: tuple[int, bool] | None = None
    for is_allow, pattern in rules:
        rx = _pattern_matches(pattern)
        if rx is None:
            continue  # empty pattern: no effect (empty disallow = allow)
        if rx.match(path):
            key = (len(pattern), is_allow)
            if best is None or key > (best[0], best[1]):
                best = key
    return True if best is None else best[1]


def robots_filter(
    df: DataFrame,
    robots_text: str,
    path_col: str = "path",
    agent: str = "*",
    out_col: str = "allowed",
) -> DataFrame:
    """Append ``out_col``: RFC 9309 longest-match verdict for every
    path, evaluated ENTIRELY JVM-side.  The parsed rule list compiles to
    one CASE chain ordered by (pattern length DESC, allow DESC) — the
    first matching arm IS the longest match, so the column needs no
    per-row sort.  Wildcard patterns compile to anchored Java-regex via
    ``rlike`` (quoted literals, ``\\Q…\\E``); plain prefixes stay as
    ``startswith``, which Catalyst can push further."""
    rules = parse_robots(robots_text, agent)
    ordered = sorted(
        [(len(p), allow, p) for allow, p in rules if p],
        key=lambda t: (t[0], t[1]),
        reverse=True,
    )
    col = F.col(path_col)
    verdict: Column = F.lit(True)  # no matching rule → allowed
    for _, allow, pattern in reversed(ordered):
        anchored = pattern.endswith("$")
        pat = pattern[:-1] if anchored else pattern
        if "*" in pat or anchored:
            segs = pat.split("*")
            rx = "".join(
                ("\\Q" + s + "\\E" if s else "") + ".*" for s in segs[:-1]
            ) + ("\\Q" + segs[-1] + "\\E" if segs[-1] else "")
            rx = "^" + rx + ("$" if anchored else "")
            cond = col.rlike(rx)
        else:
            cond = col.startswith(F.lit(pat))
        verdict = F.when(cond, F.lit(allow)).otherwise(verdict)
    return df.withColumn(out_col, verdict)
