"""PySpark-native Korean full-text analytics engine.

Rebuilds the capabilities of danawalab/mecab-ko-lucene-analyzer
(tokenization/analysis chain) plus the index/query stack it delegates
to Lucene (postings, BM25, top-k), re-expressed Spark-first:
DataFrame/SQL plans, vectorized Arrow UDFs for the analysis chain, and
explicit partitioning/skew handling for web-scale corpora.
"""

__version__ = "0.1.0"
