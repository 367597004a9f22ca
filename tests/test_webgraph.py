"""Web-graph operators: link extraction, host graph, PageRank."""

from __future__ import annotations

import pytest

import pyspark.sql.functions as F

from mecab_ko_lucene_analyzer_spark.functions.webgraph import (
    extract_links,
    host_graph,
    pagerank,
)


def _pages(spark, rows):
    return spark.createDataFrame(
        [(u, h.encode("utf-8") if h is not None else None) for u, h in rows],
        "url string, html binary",
    )


def test_extract_links_matrix(spark):
    rows = [
        (
            "https://src.example/dir/page",
            '<a href="https://abs.example/x">a</a>'
            "<a href='//proto.example/y'>b</a>"
            '<a href="/root/z">c</a>'
            '<a href="rel/skip.html">d</a>'  # path-relative: dropped
            '<a href="mailto:a@b.c">e</a>'  # non-http scheme: dropped
            '<a href="javascript:void(0)">f</a>'
            "<a href=http://unquoted.example/skip>g</a>"  # unquoted: dropped
            '<A HREF="HTTP://CASE.EXAMPLE/K">h</A>',  # case-insensitive tag
        ),
        ("https://empty.example/", "<p>no links</p>"),
        ("https://null.example/", None),
    ]
    got = sorted(
        (r.url, r.href)
        for r in extract_links(_pages(spark, rows)).collect()
    )
    assert got == [
        ("https://src.example/dir/page", "HTTP://CASE.EXAMPLE/K"),
        ("https://src.example/dir/page", "https://abs.example/x"),
        ("https://src.example/dir/page", "https://proto.example/y"),
        ("https://src.example/dir/page", "https://src.example/root/z"),
    ]


def test_host_graph_counts_and_self_loops(spark):
    rows = [
        (
            "https://A.example/p",
            '<a href="https://b.example/1">x</a>'
            '<a href="https://B.EXAMPLE/2">x</a>'  # same host, case-folded
            '<a href="https://a.example/self">x</a>',  # self-loop
        ),
        ("https://a.example/q", '<a href="https://c.example/1">x</a>'),
    ]
    links = extract_links(_pages(spark, rows))
    got = {
        (r.src_host, r.dst_host): r.n_links
        for r in host_graph(links).collect()
    }
    assert got == {
        ("a.example", "b.example"): 2,
        ("a.example", "c.example"): 1,
    }
    with_self = {
        (r.src_host, r.dst_host): r.n_links
        for r in host_graph(links, keep_self=True).collect()
    }
    assert with_self[("a.example", "a.example")] == 1


def _pagerank_reference(edges, iters, damping=0.85, weights=None):
    """Independent dict-based power iteration with the same semantics
    (teleport floor for everyone, dangling mass not redistributed)."""
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    w = weights or {e: 1.0 for e in edges}
    out_w = {}
    for (s, d), wt in w.items():
        out_w[s] = out_w.get(s, 0.0) + wt
    n = len(nodes)
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        incoming = {v: 0.0 for v in nodes}
        for (s, d), wt in w.items():
            incoming[d] += rank[s] * wt / out_w[s]
        rank = {v: (1 - damping) / n + damping * incoming[v] for v in nodes}
    return rank


@pytest.mark.parametrize("iters", [1, 5])
def test_pagerank_matches_reference(spark, iters):
    edges = [
        ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
        ("d", "c"),  # d has no in-links -> teleport floor only
        ("c", "e"),  # e is dangling (no out-links): mass not redistributed
    ]
    df = spark.createDataFrame(edges, "src_host string, dst_host string")
    got = {r.node: r.rank for r in pagerank(df, iters=iters).collect()}
    want = _pagerank_reference(edges, iters)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12), v
    # sanity: c (most in-links) outranks the teleport-only node d
    assert got["c"] > got["d"]


def test_pagerank_weighted(spark):
    edges = {("a", "b"): 3.0, ("a", "c"): 1.0, ("b", "a"): 1.0, ("c", "a"): 1.0}
    df = spark.createDataFrame(
        [(s, d, w) for (s, d), w in edges.items()],
        "src_host string, dst_host string, n_links double",
    )
    got = {
        r.node: r.rank
        for r in pagerank(df, weight="n_links", iters=4).collect()
    }
    want = _pagerank_reference(list(edges), 4, weights=edges)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12), v
    assert got["b"] > got["c"]  # 3x the weight from a


def test_webgraph_job_cli(spark, tmp_path, capsys, monkeypatch):
    """jobs/webgraph.py writes links/, host_graph/, host_ranks/ and the
    ranks equal the library call's."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path("jobs").resolve()))
    import webgraph as webgraph_job

    rows = [
        (f"https://h{i % 3}.example/d{i}",
         f'<a href="https://h{(i + 1) % 4}.example/p{i}">x</a>')
        for i in range(40)
    ]
    src = str(tmp_path / "pages")
    _pages(spark, rows).write.parquet(src)
    out = str(tmp_path / "wg")
    monkeypatch.setattr(
        sys,
        "argv",
        ["webgraph.py", "--input", src, "--output", out, "--iters", "2"],
    )
    monkeypatch.setattr(
        "mecab_ko_lucene_analyzer_spark.plans.get_spark", lambda **kw: spark
    )
    monkeypatch.setattr(spark, "stop", lambda: None)
    webgraph_job.main()
    assert '"status": "written"' in capsys.readouterr().out

    assert spark.read.parquet(f"{out}/links").count() == 40
    edges = spark.read.parquet(f"{out}/host_graph")
    got = {
        r.node: r.rank for r in spark.read.parquet(f"{out}/host_ranks").collect()
    }
    want = {
        r.node: r.rank
        for r in pagerank(edges, weight="n_links", iters=2).collect()
    }
    assert got.keys() == want.keys()
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12)


def test_curate_host_rank_filter(spark):
    """curate(host_ranks=...): low-rank hosts drop; unknown hosts and
    url-less docs are kept (absence of link evidence is not negative
    evidence)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path("jobs").resolve()))
    from curate import curate

    docs = spark.createDataFrame(
        [
            (1, "alpha text one", "ko", "https://good.example/a"),
            (2, "bravo text two", "ko", "https://spam.example/b"),
            (3, "charlie text three", "ko", "https://unranked.example/c"),
            (4, "delta text four", "ko", None),
        ],
        "doc_id bigint, text string, lang string, url string",
    )
    ranks = spark.createDataFrame(
        [("good.example", 0.5), ("spam.example", 0.01)],
        "node string, rank double",
    )
    kept = sorted(
        r.doc_id
        for r in curate(
            docs, dedup="exact", host_ranks=ranks, min_host_rank=0.1
        ).collect()
    )
    assert kept == [1, 3, 4]


def test_pagerank_mega_hub_salted_identical(spark):
    """Round-5 skew guard: a planted mega-hub (one src linking every
    other host — the josa of URLs) trips the out-degree salting path;
    the salted run's ranks must be EXACTLY the unsalted run's (same
    sums, different grouping) against the driver reference."""
    n = 60
    edges = [("mega", f"h{i}") for i in range(n)]  # the hub
    edges += [(f"h{i}", f"h{(i * 3 + 1) % n}") for i in range(n)]
    edges += [(f"h{i}", "mega") for i in range(0, n, 7)]
    edges = [e for e in edges if e[0] != e[1]]
    df = spark.createDataFrame(edges, "src_host string, dst_host string")
    # hot_out_degree=10 << 60 engages salting; unsalted = huge threshold
    hot = {
        r.node: r.rank
        for r in pagerank(
            df, iters=4, hot_out_degree=10, n_salts=4
        ).collect()
    }
    cold = {r.node: r.rank for r in pagerank(df, iters=4).collect()}
    want = _pagerank_reference(edges, 4)
    assert set(hot) == set(cold) == set(want)
    for v in want:
        assert hot[v] == pytest.approx(want[v], abs=1e-12), v
        assert hot[v] == pytest.approx(cold[v], abs=1e-12), v


def test_pagerank_rank_mass_bounds(spark):
    """Ranks stay in (0, 1] and total mass never exceeds 1 (dangling
    mass leaks, it must never be created)."""
    edges = [(f"n{i}", f"n{(i * 7 + 3) % 11}") for i in range(11)]
    df = spark.createDataFrame(
        [e for e in edges if e[0] != e[1]], "src_host string, dst_host string"
    )
    rows = pagerank(df, iters=6, checkpoint_every=2).collect()
    total = sum(r.rank for r in rows)
    assert 0.0 < total <= 1.0 + 1e-9
    assert all(r.rank > 0 for r in rows)
