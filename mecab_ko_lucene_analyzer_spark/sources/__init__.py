from .catalog import publish_index, read_table, write_table
from .webpages import synthesize_webpages, webpages_from_documents

__all__ = [
    "synthesize_webpages",
    "webpages_from_documents",
    "read_table",
    "write_table",
    "publish_index",
]
