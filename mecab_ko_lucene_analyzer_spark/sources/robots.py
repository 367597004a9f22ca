"""robots.txt politeness: parse per-host rule files, filter a URL set
by the RFC 9309 longest-match allow decision.

The reference's plugin serves an engine whose corpus arrives from a
crawl (``HttpMigrator.java`` pulls pages host-by-host); a web-scale
ingest MUST honor robots.txt before a page may be indexed — the
crawl-side sibling of the robots META handling already in
``sources/webpages.py`` (``noindex_of``: may not be SHOWN) — robots.txt
says the page may not be FETCHED.

Two layers, split exactly on the oracle boundary:

* :func:`parse_robots` — robots.txt TEXT → ``(host, path_prefix,
  allow, match_regex, spec)`` rules for one user-agent. Group-state
  line parsing is per-FILE work over the hosts relation (orders of
  magnitude smaller than the URL set), so it runs as one Arrow
  ``mapInPandas`` pass; gated by pytest goldens over real-shape files
  (UA groups, grouped UA lines, case-insensitivity, comments, empty
  Disallow, ``*``/``$`` wildcards, multi-group merge).
* :func:`robots_allowed` — the per-URL decision, Catalyst
  expressions over the joined (url, rule) pairs: most-specific
  (longest-pattern) matching rule wins, ties break toward allow, no
  match ⇒ allowed (RFC 9309 §2.2.2). The winner is selected with ONE
  integer aggregate via the law::

      decision = max(2·spec(rule) + (allow ? 1 : 0))

  longest pattern dominates (×2), and at equal length the +1 makes
  allow beat disallow — no window, no struct max, identical
  arithmetic in any engine. ``spec`` is the raw pattern's length (the
  RFC's "most specific = longest" measured in pattern octets, so a
  wildcard rule competes by its written length).

RFC 9309 §2.2.3 path matching: ``*`` in a rule matches any character
run and a trailing ``$`` anchors the match at path end. Rules using
neither compile to a plain prefix test (``startswith`` — the hot
path, pure Catalyst); wildcard rules compile once at parse time to an
anchored Java regex evaluated with ``regexp_like``.

Plan at 10^12 URLs: the rules relation is NOT force-broadcast — a
CC-scale crawl has 10^8+ hosts, so "hosts-bounded" is not
"driver-bounded". The decision is one projection (host/path
extraction) + one plain equi-join on ``host`` (AQE broadcasts the
rules side only when it actually fits, else a shuffle hash join; a
mega-host's URL skew is handled by AQE skew-join splitting, since the
rules side of any one host is small enough to replicate) + one
per-doc aggregate + the no-match left join back (both doc_id-keyed).
"""

from __future__ import annotations

import re as _re
from collections.abc import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..functions.curation import _URL_HOSTPORT_RE, _URL_PATH_RE

__all__ = [
    "compile_rules",
    "parse_robots",
    "parse_robots_text",
    "robots_allowed",
    "rule_regex",
]


def rule_regex(pattern: str) -> str | None:
    """RFC 9309 §2.2.3 rule path → anchored Java-compatible regex, or
    ``None`` when the pattern is a plain prefix (no ``*``, no trailing
    ``$``) and the caller should use the cheap ``startswith`` path.

    ``*`` matches any character run; a single TRAILING ``$`` anchors
    at path end (the only position the RFC grammar gives it meaning —
    elsewhere it is a literal octet). Everything else is escaped, so
    ``.`` in ``/*.pdf$`` stays literal."""
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    if not anchored and "*" not in body:
        return None
    rx = ".*".join(_re.escape(part) for part in body.split("*"))
    return "^" + rx + ("$" if anchored else "")


def parse_robots_text(
    text: str, user_agent: str = "*"
) -> list[tuple[str, bool]]:
    """One robots.txt → ``[(path_pattern, allow)]`` for ``user_agent``.

    RFC 9309 group semantics: consecutive ``User-agent:`` lines open
    one group; a group applies when it names ``user_agent``
    (case-insensitive product-token match — a UA string's version
    suffix after ``/`` is ignored) or ``*``. The exact-UA tier beats
    the ``*`` tier, but WITHIN the winning tier rules from ALL
    matching groups are combined in file order (§2.2.1 — two
    ``User-agent: *`` groups contribute both their rule lists).
    ``Disallow:`` with an empty value means allow-everything and emits
    no rule. Comments (``#``) and unknown directives are ignored.
    Pure function — shared by the Arrow batch path and the tests."""
    ua = user_agent.lower().split("/", 1)[0].strip()
    groups: list[tuple[list[str], list[tuple[str, bool]]]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[str, bool]] = []
    in_agent_run = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if not in_agent_run:
                if cur_agents:
                    groups.append((cur_agents, cur_rules))
                cur_agents, cur_rules = [], []
                in_agent_run = True
            cur_agents.append(val.lower().split("/", 1)[0].strip())
        elif key in ("allow", "disallow"):
            in_agent_run = False
            if cur_agents and val:
                cur_rules.append((val, key == "allow"))
        else:
            in_agent_run = False
    if cur_agents:
        groups.append((cur_agents, cur_rules))
    exact = [r for agents, rules in groups if ua in agents for r in rules]
    if exact or any(ua in agents for agents, _ in groups):
        return exact
    return [r for agents, rules in groups if "*" in agents for r in rules]


def parse_robots(
    robots: DataFrame,
    user_agent: str = "*",
    host: str = "host",
    text: str = "robots_txt",
) -> DataFrame:
    """``(host, robots_txt)`` → ``(host, path_prefix, allow,
    match_regex, spec)`` rules for ``user_agent`` (see
    :func:`parse_robots_text`). ``path_prefix`` is the raw rule
    pattern; ``match_regex`` is its compiled RFC 9309 regex (NULL for
    plain-prefix rules — the ``startswith`` fast path); ``spec`` is
    the pattern length, the longest-match specificity key. One Arrow
    pass over the hosts relation; hosts whose file yields no
    applicable rules emit no rows (⇒ everything allowed downstream)."""
    ua = user_agent

    def parse(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            hosts, pats, allows, rxs, specs = [], [], [], [], []
            for h, t in zip(pdf[host], pdf[text]):
                for pat, allow in parse_robots_text(t or "", ua):
                    hosts.append(h)
                    pats.append(pat)
                    allows.append(allow)
                    rxs.append(rule_regex(pat))
                    specs.append(len(pat))
            yield pd.DataFrame(
                {
                    "host": pd.Series(hosts, dtype="object"),
                    "path_prefix": pd.Series(pats, dtype="object"),
                    "allow": pd.Series(allows, dtype="bool"),
                    "match_regex": pd.Series(rxs, dtype="object"),
                    "spec": pd.Series(specs, dtype="int32"),
                }
            )

    return robots.select(host, text).mapInPandas(
        parse,
        "host string, path_prefix string, allow boolean, "
        "match_regex string, spec int",
    )


def compile_rules(rules: DataFrame) -> DataFrame:
    """Backfill ``match_regex``/``spec`` onto a bare ``(host,
    path_prefix, allow)`` rules relation (e.g. a user-curated table
    that never went through :func:`parse_robots`). Same Arrow pass;
    rules already carrying both columns are returned unchanged."""
    if {"match_regex", "spec"} <= set(rules.columns):
        return rules

    def add(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            pats = pdf["path_prefix"]
            pdf = pdf.assign(
                match_regex=pd.Series(
                    [rule_regex(p) for p in pats],
                    index=pdf.index,
                    dtype="object",
                ),
                spec=pats.str.len().astype("int32"),
            )
            yield pdf[
                ["host", "path_prefix", "allow", "match_regex", "spec"]
            ]

    return rules.select("host", "path_prefix", "allow").mapInPandas(
        add,
        "host string, path_prefix string, allow boolean, "
        "match_regex string, spec int",
    )


def robots_allowed(
    urls: DataFrame,
    rules: DataFrame,
    url: str = "url",
) -> DataFrame:
    """Per-URL robots decision: ``(doc_id, allowed)`` — RFC 9309
    longest-match over ``rules``; no matching rule ⇒ allowed. The
    winning rule is ``max(2·spec + allow)`` (longest pattern wins,
    allow wins ties); parity of the max decides. Plain-prefix rules
    match with ``startswith``; ``*``/``$`` rules with their
    parse-time-compiled regex (``regexp_like``). The rules side rides
    a plain equi-join on host — never force-broadcast (10^8+ hosts at
    crawl scale); AQE picks broadcast only when the relation actually
    fits and splits mega-host skew otherwise."""
    rules = compile_rules(rules)
    u = F.col(url)
    host = F.lower(F.regexp_extract(u, _URL_HOSTPORT_RE, 1))
    path_raw = F.regexp_extract(u, _URL_PATH_RE, 1)
    path = F.when(path_raw == "", F.lit("/")).otherwise(path_raw)
    projected = urls.select("doc_id", host.alias("host"), path.alias("path"))
    hit = F.when(
        F.col("match_regex").isNull(),
        F.col("path").startswith(F.col("path_prefix")),
    ).otherwise(F.regexp_like(F.col("path"), F.col("match_regex")))
    matched = (
        projected.join(rules, "host")
        .filter(hit)
        .groupBy("doc_id")
        .agg(
            F.max(
                F.col("spec") * 2 + F.col("allow").cast("int")
            ).alias("_best")
        )
    )
    return (
        projected.select("doc_id")
        .join(matched, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("_best") % 2 == 1, F.lit(True)).alias(
                "allowed"
            ),
        )
    )
