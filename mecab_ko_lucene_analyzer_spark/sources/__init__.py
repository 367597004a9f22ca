from .catalog import publish_index, read_table, write_table
from .warc import detect_charset_bytes, read_warc, transcode_to_utf8, warc_to_webpages
from .webpages import (
    charset_of,
    extract_html_text,
    html_text_column,
    noindex_of,
    synthesize_webpages,
    webpages_from_documents,
)

__all__ = [
    "charset_of",
    "noindex_of",
    "detect_charset_bytes",
    "transcode_to_utf8",
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
