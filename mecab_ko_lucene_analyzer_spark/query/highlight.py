"""Term highlighting (Q9, ``highlight/TermHighlightingQuery.java:26``).

The reference wraps Lucene's highlighter around its custom query; here
highlighting is a pure function over the analyzer's token offsets: the
document is re-analyzed (offsets are produced by the same chain that
indexed it), tokens matching the query terms are turned into spans, and
overlapping/adjacent spans merge.
"""

from __future__ import annotations

from ..analysis.tokenizer import tokenize

__all__ = ["highlight_spans", "highlight"]


def highlight_spans(
    text: str,
    query_terms: set[str] | list[str],
    mode: str = "standard",
    compound_noun_min_length: int = 3,
) -> list[tuple[int, int]]:
    """Merged (start, end) char spans of tokens whose term matches."""
    lowered = set(t.lower() for t in query_terms)
    spans = []
    for p in tokenize(text, mode, compound_noun_min_length):
        if p.token_string().lower() in lowered or p.surface.lower() in lowered:
            spans.append((p.start_offset, p.end_offset))
    spans.sort()
    merged: list[tuple[int, int]] = []
    for s, e in spans:
        if merged and s <= merged[-1][1]:
            merged[-1] = (merged[-1][0], max(merged[-1][1], e))
        else:
            merged.append((s, e))
    return merged


def highlight(
    text: str,
    query_terms: set[str] | list[str],
    pre: str = "<em>",
    post: str = "</em>",
    mode: str = "standard",
) -> str:
    """Text with match spans wrapped in ``pre``/``post`` tags.

    Offsets are code-point based (the analyzer's convention); the
    reference's Java offsets are UTF-16 units — identical for BMP
    Korean text, and this implementation is the documented
    code-point-offset variant (SURVEY §1.5 offset caveat)."""
    out = []
    last = 0
    for s, e in highlight_spans(text, query_terms, mode):
        out.append(text[last:s])
        out.append(pre)
        out.append(text[s:e])
        out.append(post)
        last = e
    out.append(text[last:])
    return "".join(out)
