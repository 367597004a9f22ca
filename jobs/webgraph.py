"""spark-submit job: web-graph build over a crawl corpus.

    spark-submit --py-files mecab_ko_lucene_analyzer_spark.zip \
        jobs/webgraph.py --input /path/webpages_parquet \
        --output /path/webgraph --iters 5

Reads a webpages-shaped table ``(url, html, ...)`` (parquet path or
Iceberg catalog identifier) and writes three artifacts under
``--output``:

* ``links/``        — ``(url, href)`` absolutized anchor targets
* ``host_graph/``   — ``(src_host, dst_host, n_links)`` edge list
* ``host_ranks/``   — ``(node, rank)`` PageRank over the host graph

``host_ranks`` is the centrality/quality signal ``jobs/curate.py
--host-ranks`` consumes for rank-weighted corpus filtering. The edge
relation partitions on src once and persists; each PageRank round
shuffles only the |hosts|-sized rank vector — at crawl scale the link
table is the big thing and it is touched exactly once.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="webpages table (url, html, ...)")
    ap.add_argument("--output", required=True, help="output directory root")
    ap.add_argument("--iters", type=int, default=5, help="PageRank iterations")
    ap.add_argument("--damping", type=float, default=0.85)
    ap.add_argument(
        "--keep-self-links",
        action="store_true",
        help="keep same-host edges in the host graph (dropped by default)",
    )
    ap.add_argument(
        "--checkpoint-dir",
        default=None,
        help="reliable checkpoint dir for rank lineage (recommended at scale)",
    )
    args = ap.parse_args()

    from mecab_ko_lucene_analyzer_spark.functions.webgraph import (
        extract_links,
        host_graph,
        pagerank,
    )
    from mecab_ko_lucene_analyzer_spark.plans import get_spark
    from mecab_ko_lucene_analyzer_spark.sources.catalog import (
        read_table,
        write_table,
    )

    spark = get_spark(app_name="webgraph")
    pages = read_table(spark, args.input)
    links = extract_links(pages)
    # links feed two consumers (the artifact write + the host agg):
    # persist so extraction + the explode run once
    links.persist()
    write_table(links, f"{args.output}/links")
    edges = host_graph(links, keep_self=args.keep_self_links)
    edges.persist()
    write_table(edges, f"{args.output}/host_graph")
    ranks = pagerank(
        edges,
        weight="n_links",
        iters=args.iters,
        damping=args.damping,
        checkpoint_dir=args.checkpoint_dir,
    )
    write_table(ranks, f"{args.output}/host_ranks")
    n_hosts = ranks.count()
    links.unpersist()
    edges.unpersist()
    print(json.dumps({"status": "written", "output": args.output, "hosts": n_hosts}))


if __name__ == "__main__":
    main()
