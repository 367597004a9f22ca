from .docids import assign_doc_ids
from .build import InvertedIndex, build_index

__all__ = ["assign_doc_ids", "InvertedIndex", "build_index"]
