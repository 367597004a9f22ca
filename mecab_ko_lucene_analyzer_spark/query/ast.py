"""Boolean retrieval query AST (Q1–Q6).

Re-expresses the reference's ES query construction
(``DanawaSearchQueryBuilder.java``):

* Q1 analyzed AND query — tokens are AND-ed
  (``DanawaSearchQueryBuilder.java:148-216``)
* Q2 synonym OR subquery — token + synonyms under OR; a multi-word
  synonym becomes a phrase (``:326-348``)
* Q3 extra-term subtree — ``OR(original, AND(extra_terms))`` (``:383-426``)
* Q4 phrase — positions-based match with slop, score-neutral
  (boost 0, ``:287-291``)
* Q5 AND/OR combinators (``:471-488``)
* Q6 JSON rendering of the tree (``:221-282``)

Scoring semantics (documented engine spec, mirrored by the oracle):
Term scores BM25; OR scores the max of its matching children (synonyms
behave as one term — Lucene ``SynonymQuery``-style blending is
approximated by max); AND scores the sum of its children and requires
all to match; PHRASE matches when the terms occur at consecutive
positions within ``slop`` and contributes 0 to the score.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

__all__ = [
    "Term",
    "Phrase",
    "And",
    "Or",
    "build_query_ast",
    "ast_terms",
    "to_json",
    "from_json",
]


@dataclass(frozen=True)
class Term:
    term: str


@dataclass(frozen=True)
class Phrase:
    terms: tuple[str, ...]
    slop: int = 0


@dataclass(frozen=True)
class And:
    children: tuple = ()


@dataclass(frozen=True)
class Or:
    children: tuple = ()


def build_query_ast(analyzed_tokens: list[dict]) -> And:
    """Analyzed query tokens → AND over per-token subtrees.

    Each token dict may carry ``synonyms: list[str]`` (Q2) and
    ``extra_terms: list[str]`` (Q3). Multi-word synonyms (space-
    separated) become phrases.
    """
    clauses = []
    for tok in analyzed_tokens:
        node: object = Term(tok["term"])
        syns = tok.get("synonyms") or []
        extras = tok.get("extra_terms") or []
        alts = [node]
        for s in syns:
            words = s.split()
            alts.append(Phrase(tuple(words)) if len(words) > 1 else Term(s))
        if extras:
            alts.append(And(tuple(Term(e) for e in extras)))
        node = alts[0] if len(alts) == 1 else Or(tuple(alts))
        clauses.append(node)
    return And(tuple(clauses))


def ast_terms(node) -> set[str]:
    """All leaf terms mentioned in the tree (for posting prefetch)."""
    if isinstance(node, Term):
        return {node.term}
    if isinstance(node, Phrase):
        return set(node.terms)
    out: set[str] = set()
    for c in node.children:
        out |= ast_terms(c)
    return out


def to_json(node) -> str:
    """Q6: debuggable JSON rendering."""

    def conv(n):
        if isinstance(n, Term):
            return {"term": n.term}
        if isinstance(n, Phrase):
            return {"phrase": list(n.terms), "slop": n.slop}
        if isinstance(n, And):
            return {"and": [conv(c) for c in n.children]}
        if isinstance(n, Or):
            return {"or": [conv(c) for c in n.children]}
        raise TypeError(type(n))

    return json.dumps(conv(node), ensure_ascii=False)


def from_json(spec: str | dict):
    """Q7: parse a JSON query spec (the CLI/REST input format,
    ``DanawaSearchQueryBuilder.java:101-143`` parses the ES analog) back
    into the AST. Accepts the same shape ``to_json`` emits."""
    import json as _json

    node = _json.loads(spec) if isinstance(spec, str) else spec

    def conv(n):
        if "term" in n:
            return Term(n["term"])
        if "phrase" in n:
            return Phrase(tuple(n["phrase"]), int(n.get("slop", 0)))
        if "and" in n:
            return And(tuple(conv(c) for c in n["and"]))
        if "or" in n:
            return Or(tuple(conv(c) for c in n["or"]))
        raise ValueError(f"unknown node: {n}")

    return conv(node)
