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
  allow)`` rules for one user-agent. Group-state line parsing is
  per-FILE work over the hosts relation (orders of magnitude smaller
  than the URL set), so it runs as one Arrow ``mapInPandas`` pass;
  gated by pytest goldens over real-shape files (UA groups, grouped
  UA lines, case-insensitivity, comments, empty Disallow).
* :func:`robots_allowed` — the per-URL decision, pure Catalyst and
  exactly SQL-replicable: most-specific (longest) matching rule wins,
  ties break toward allow, no match ⇒ allowed (RFC 9309 §2.2.2).
  The winner is selected with ONE integer aggregate via the law::

      decision = max(2·len(rule) + (allow ? 1 : 0))

  longest rule dominates (×2), and at equal length the +1 makes allow
  beat disallow — no window, no struct max, identical arithmetic in
  any engine.

Plan at 10^12 URLs: the rules relation is hosts-bounded (tiny) and
BROADCASTS; the URL side is one projection (host/path extraction, the
``canonical_url`` regexes) + one broadcast equi-join on host with a
``startswith`` post-filter + one per-doc aggregate. The URL relation
never shuffles except that final doc_id aggregate.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..functions.curation import _URL_HOSTPORT_RE, _URL_PATH_RE

__all__ = ["parse_robots", "parse_robots_text", "robots_allowed"]


def parse_robots_text(
    text: str, user_agent: str = "*"
) -> list[tuple[str, bool]]:
    """One robots.txt → ``[(path_prefix, allow)]`` for ``user_agent``.

    RFC 9309 group semantics: consecutive ``User-agent:`` lines open
    one group; a group applies when it names ``user_agent`` exactly
    (case-insensitive) or ``*``; the most specific applicable group
    wins (exact UA beats ``*`` — rules from BOTH are not merged).
    ``Disallow:`` with an empty value means allow-everything and emits
    no rule. Comments (``#``) and unknown directives are ignored.
    Pure function — shared by the Arrow batch path and the tests."""
    ua = user_agent.lower()
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
            cur_agents.append(val.lower())
        elif key in ("allow", "disallow"):
            in_agent_run = False
            if cur_agents and val:
                cur_rules.append((val, key == "allow"))
        else:
            in_agent_run = False
    if cur_agents:
        groups.append((cur_agents, cur_rules))
    exact = [r for agents, r in groups if ua in agents]
    if exact:
        return exact[0]
    wild = [r for agents, r in groups if "*" in agents]
    return wild[0] if wild else []


def parse_robots(
    robots: DataFrame,
    user_agent: str = "*",
    host: str = "host",
    text: str = "robots_txt",
) -> DataFrame:
    """``(host, robots_txt)`` → ``(host, path_prefix, allow)`` rules
    for ``user_agent`` (see :func:`parse_robots_text`). One Arrow pass
    over the hosts relation; hosts whose file yields no applicable
    rules emit no rows (⇒ everything allowed downstream)."""
    ua = user_agent

    def parse(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            hosts, prefixes, allows = [], [], []
            for h, t in zip(pdf[host], pdf[text]):
                for prefix, allow in parse_robots_text(t or "", ua):
                    hosts.append(h)
                    prefixes.append(prefix)
                    allows.append(allow)
            yield pd.DataFrame(
                {
                    "host": pd.Series(hosts, dtype="object"),
                    "path_prefix": pd.Series(prefixes, dtype="object"),
                    "allow": pd.Series(allows, dtype="bool"),
                }
            )

    return robots.select(host, text).mapInPandas(
        parse, "host string, path_prefix string, allow boolean"
    )


def robots_allowed(
    urls: DataFrame,
    rules: DataFrame,
    url: str = "url",
) -> DataFrame:
    """Per-URL robots decision: ``(doc_id, allowed)`` — RFC 9309
    longest-match over ``rules`` ``(host, path_prefix, allow)``; no
    matching rule ⇒ allowed. The winning rule is
    ``max(2·len + allow)`` (longest wins, allow wins ties); parity of
    the max decides. Rules broadcast (hosts-bounded); the URL side is
    one projection + one broadcast join + one per-doc aggregate."""
    u = F.col(url)
    host = F.lower(F.regexp_extract(u, _URL_HOSTPORT_RE, 1))
    path_raw = F.regexp_extract(u, _URL_PATH_RE, 1)
    path = F.when(path_raw == "", F.lit("/")).otherwise(path_raw)
    projected = urls.select("doc_id", host.alias("host"), path.alias("path"))
    matched = (
        projected.join(F.broadcast(rules), "host")
        .filter(F.col("path").startswith(F.col("path_prefix")))
        .groupBy("doc_id")
        .agg(
            F.max(
                F.length("path_prefix") * 2
                + F.col("allow").cast("int")
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
