from .catalog import publish_index, read_table, write_table
from .warc import read_warc, warc_to_webpages
from .webpages import (
    extract_html_text,
    html_text_column,
    synthesize_webpages,
    webpages_from_documents,
)

__all__ = [
    "extract_html_text",
    "read_warc",
    "warc_to_webpages",
    "html_text_column",
    "synthesize_webpages",
    "webpages_from_documents",
    "read_table",
    "write_table",
    "publish_index",
]
