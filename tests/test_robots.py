"""robots.txt politeness (sources/robots.py): group-state parsing and
the RFC 9309 longest-match allow decision."""

from __future__ import annotations

import pytest

from mecab_ko_lucene_analyzer_spark.sources.robots import (
    parse_robots,
    parse_robots_text,
    robots_allowed,
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
