from .bm25 import bm25_topk, bm25_oracle, lucene_idf

__all__ = ["bm25_topk", "bm25_oracle", "lucene_idf"]
