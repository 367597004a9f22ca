"""robots.txt politeness (sources/robots.py): group-state parsing and
the RFC 9309 longest-match allow decision."""

from __future__ import annotations

import pytest

from mecab_ko_lucene_analyzer_spark.sources.robots import (
    compile_rules,
    parse_robots,
    parse_robots_text,
    robots_allowed,
    rule_regex,
)

SAMPLE = """\
# crawler policy
User-agent: megabot
Disallow: /private/
Allow: /private/ok/

User-agent: *
Disallow: /tmp/
Disallow:
Allow: /tmp/keep/
Sitemap: https://example.com/sitemap.xml
"""


def test_parse_groups_and_ua_selection():
    # exact UA group wins over * and is NOT merged with it
    assert parse_robots_text(SAMPLE, "MegaBot") == [
        ("/private/", False),
        ("/private/ok/", True),
    ]
    # wildcard group for everyone else; empty Disallow emits no rule
    assert parse_robots_text(SAMPLE, "otherbot") == [
        ("/tmp/", False),
        ("/tmp/keep/", True),
    ]


def test_parse_grouped_ua_lines_share_rules():
    txt = "User-agent: a\nUser-agent: b\nDisallow: /x/\n"
    assert parse_robots_text(txt, "b") == [("/x/", False)]
    # a later User-agent line starts a NEW group (not an agent run)
    txt2 = "User-agent: a\nDisallow: /x/\nUser-agent: b\nDisallow: /y/\n"
    assert parse_robots_text(txt2, "b") == [("/y/", False)]


def test_parse_no_applicable_group_is_empty():
    assert parse_robots_text("User-agent: x\nDisallow: /a/\n", "y") == []
    assert parse_robots_text("", "y") == []


def test_parse_merges_all_matching_groups():
    # RFC 9309 §2.2.1: two groups naming the same UA combine — the
    # second '*' group's Disallow must NOT be silently lost
    txt = (
        "User-agent: *\nDisallow: /a/\n\n"
        "User-agent: *\nDisallow: /b/\nAllow: /b/ok\n"
    )
    assert parse_robots_text(txt, "anybot") == [
        ("/a/", False),
        ("/b/", False),
        ("/b/ok", True),
    ]
    # exact tier merges too, and still shadows the '*' tier entirely
    txt2 = (
        "User-agent: megabot\nDisallow: /m1/\n\n"
        "User-agent: *\nDisallow: /w/\n\n"
        "User-agent: megabot\nDisallow: /m2/\n"
    )
    assert parse_robots_text(txt2, "megabot") == [
        ("/m1/", False),
        ("/m2/", False),
    ]


def test_parse_exact_group_with_no_rules_allows_everything():
    # a matched (empty) exact group means "allow all" — it must NOT
    # fall through to the '*' tier's Disallow. (Crawl-delay closes the
    # UA run without emitting rules; a blank line alone would NOT —
    # consecutive UA lines form one group under the RFC grammar.)
    txt = (
        "User-agent: megabot\nCrawl-delay: 1\n\n"
        "User-agent: *\nDisallow: /\n"
    )
    assert parse_robots_text(txt, "megabot") == []


def test_parse_ua_product_token_match():
    txt = "User-agent: MegaBot\nDisallow: /x/\n"
    # version suffix on the caller's UA string is ignored
    assert parse_robots_text(txt, "megabot/2.1") == [("/x/", False)]


def test_rule_regex_translation():
    # plain prefixes stay on the startswith fast path
    assert rule_regex("/private/") is None
    assert rule_regex("/p") is None
    # '*' → '.*', everything else escaped
    assert rule_regex("/private*") == "^/private.*"
    assert rule_regex("/*.pdf$") == "^/.*\\.pdf$"
    # trailing '$' anchors; '.' is literal
    assert rule_regex("/exact$") == "^/exact$"
    # '$' not at the end is a literal octet
    assert rule_regex("/a$b*") == "^/a\\$b.*"


def test_parse_robots_dataframe(spark):
    robots = spark.createDataFrame(
        [("h1", SAMPLE), ("h2", ""), ("h3", None)],
        "host string, robots_txt string",
    )
    rows = sorted(
        (r["host"], r["path_prefix"], r["allow"])
        for r in parse_robots(robots, "otherbot").collect()
    )
    assert rows == [("h1", "/tmp/", False), ("h1", "/tmp/keep/", True)]


@pytest.fixture(scope="module")
def decision(spark):
    rules = spark.createDataFrame(
        [
            ("a.com", "/private/", False),
            ("a.com", "/private/ok/", True),
            ("a.com", "/p", False),
            ("a.com", "/page", True),  # longer than /p → wins under it
        ],
        "host string, path_prefix string, allow boolean",
    )
    urls = spark.createDataFrame(
        [
            (0, "https://a.com/private/x"),  # disallowed
            (1, "https://a.com/private/ok/x"),  # deeper allow wins
            (2, "https://a.com/other"),  # no match → allowed
            (3, "https://b.com/private/x"),  # host without rules
            (4, "https://a.com/page/1"),  # /page (allow,5) beats /p (2)
            (5, "https://a.com/pq"),  # only /p matches → disallowed
            (6, "https://a.com"),  # bare host → path "/" → no match
        ],
        "doc_id long, url string",
    )
    return {
        r["doc_id"]: r["allowed"]
        for r in robots_allowed(urls, rules).collect()
    }


def test_longest_match_decision(decision):
    assert decision[0] is False
    assert decision[1] is True
    assert decision[2] is True
    assert decision[3] is True
    assert decision[4] is True
    assert decision[5] is False
    assert decision[6] is True


def test_tie_breaks_toward_allow(spark):
    rules = spark.createDataFrame(
        [("a.com", "/x/", False), ("a.com", "/x/", True)],
        "host string, path_prefix string, allow boolean",
    )
    urls = spark.createDataFrame(
        [(0, "https://a.com/x/1")], "doc_id long, url string"
    )
    assert robots_allowed(urls, rules).first()["allowed"] is True


def test_wildcard_and_anchor_rules_decide(spark):
    """RFC 9309 §2.2.3: '*' and trailing '$' in rule paths must match
    (the ADVICE fail-open bug: treated as literal prefixes they never
    match and disallowed pages get fetched)."""
    robots = spark.createDataFrame(
        [
            (
                "w.com",
                "User-agent: *\n"
                "Disallow: /private*\n"
                "Disallow: /*.pdf$\n"
                "Allow: /private/public*\n",
            )
        ],
        "host string, robots_txt string",
    )
    urls = spark.createDataFrame(
        [
            (0, "https://w.com/private/x"),  # /private* → disallowed
            (1, "https://w.com/privateer"),  # '*' run may be mid-word
            (2, "https://w.com/docs/a.pdf"),  # /*.pdf$ → disallowed
            (3, "https://w.com/docs/a.pdfx"),  # $ anchor → NOT matched
            (4, "https://w.com/docs/apdf"),  # '.' literal → allowed
            (5, "https://w.com/private/public/y"),  # longer allow wins
            (6, "https://w.com/other"),  # no match → allowed
        ],
        "doc_id long, url string",
    )
    got = {
        r["doc_id"]: r["allowed"]
        for r in robots_allowed(urls, parse_robots(robots)).collect()
    }
    assert got == {
        0: False,
        1: False,
        2: False,
        3: True,
        4: True,
        5: True,
        6: True,
    }


def test_compile_rules_backfills_bare_relations(spark):
    """A user-curated (host, path_prefix, allow) table without the
    parse-time regex columns gets them backfilled — wildcards in it
    still decide correctly."""
    rules = spark.createDataFrame(
        [("a.com", "/x*", False), ("a.com", "/x/keep$", True)],
        "host string, path_prefix string, allow boolean",
    )
    compiled = compile_rules(rules)
    assert {"match_regex", "spec"} <= set(compiled.columns)
    urls = spark.createDataFrame(
        [(0, "https://a.com/xyz"), (1, "https://a.com/x/keep")],
        "doc_id long, url string",
    )
    got = {
        r["doc_id"]: r["allowed"]
        for r in robots_allowed(urls, rules).collect()
    }
    # /x/keep: allow spec 7 beats /x* spec 3
    assert got == {0: False, 1: True}


def test_robots_mega_host_decisions_correct(spark):
    """Round-5 skew guard: 20k URLs concentrated on ONE host (the
    blogspot shape) through the post-de-broadcast shuffle join — the
    per-doc decisions stay exact; AQE handles the hot join key by
    splitting, since any single host's rule list is replicable."""
    import pyspark.sql.functions as F

    rules = spark.createDataFrame(
        [("mega.com", "/blocked", False), ("mega.com", "/blocked/ok", True)],
        "host string, path_prefix string, allow boolean",
    )
    urls = spark.range(20_000).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("https://mega.com/"),
            F.when(F.col("id") % 3 == 0, F.lit("blocked/p"))
            .when(F.col("id") % 3 == 1, F.lit("blocked/ok/p"))
            .otherwise(F.lit("open/p")),
            F.col("id").cast("string"),
        ).alias("url"),
    )
    out = robots_allowed(urls, rules)
    agg = out.groupBy("allowed").count().collect()
    counts = {r["allowed"]: r["count"] for r in agg}
    n_blocked = sum(1 for i in range(20_000) if i % 3 == 0)
    assert counts[False] == n_blocked
    assert counts[True] == 20_000 - n_blocked


def test_robots_never_broadcasts_the_rules_side(spark):
    """The rules relation is host-keyed and corpus-unbounded (10^8+
    hosts at crawl scale) — the plan must not carry a FORCED broadcast
    hint on it. AQE may still broadcast at runtime when it fits; the
    guard is against the compile-time F.broadcast that OOMs at 100×."""
    rules = spark.createDataFrame(
        [("a.com", "/x/", False)],
        "host string, path_prefix string, allow boolean",
    )
    urls = spark.createDataFrame(
        [(0, "https://a.com/x/1")], "doc_id long, url string"
    )
    plan = robots_allowed(urls, rules)._jdf.queryExecution().optimizedPlan().toString()
    assert "UnresolvedHint" not in plan
    # the only ResolvedHint allowed would be on a literal/tiny side;
    # robots_allowed adds none at all
    assert "ResolvedHint" not in plan


def test_rule_regex_java_python_parity_bulk(spark):
    """The compiled rule regex must mean the same thing to Java
    (regexp_like, the decision path) and Python (re, the test
    reference): 400 generated (pattern, path) pairs over a hostile
    alphabet — wildcards, anchors, regex metachars as literals —
    evaluated on both engines."""
    import re as _re
    import itertools

    import pyspark.sql.functions as F

    pieces = ["/a", "/bb", ".", "*", "$", "+", "(x)", "[y]", "?", "/"]
    pats = set()
    for n in (1, 2, 3):
        for combo in itertools.product(pieces, repeat=n):
            pats.add("/" + "".join(combo).lstrip("/"))
            if len(pats) >= 80:
                break
        if len(pats) >= 80:
            break
    paths = ["/a", "/abb", "/bb.x", "/a.pdf", "/x+y", "/(x)", "/[y]",
             "/a$b", "/aa/bb", "/"]
    pairs = [
        (p, rule_regex(p), path)
        for p in sorted(pats)
        for path in paths
        if rule_regex(p) is not None
    ][:400]
    assert pairs, "generator must produce wildcard patterns"
    df = spark.createDataFrame(
        pairs, "pattern string, rx string, path string"
    ).withColumn("jhit", F.regexp_like(F.col("path"), F.col("rx")))
    for r in df.collect():
        phit = bool(_re.search(r["rx"], r["path"]))
        assert phit == r["jhit"], (r["pattern"], r["rx"], r["path"])
