"""Runtime dictionaries (SURVEY.md §1.3) + index/query analyzer modes.

The reference's dictionary registry (``ProductNameDictionary.java:151-288``)
holds per-type hash structures; in Spark these are small broadcast
variables rebuilt on reload (dict "hot reload" = new broadcast epoch +
rerun, SURVEY §1.3). Here:

* :class:`SetDictionary` — stopwords/units/user words
  (``dict/analysis/SetDictionary.java:12``)
* :class:`SynonymDictionary` — one-way or two-way synonym expansion
  (``dict/analysis/SynonymDictionary.java:12-46``; two-way closure
  ``ProductNameDictionary.java:530-572``)
* :class:`AnalyzerOption` + :func:`analyze_query` / :func:`analyze_index`
  — the index-vs-query mode switch (A22,
  ``product/analysis/AnalyzerOption.java:3-84``): query mode attaches
  synonyms to tokens (→ OR subtrees, Q2); index mode emits synonyms as
  same-position extra tokens; stopwords are dropped when ``use_stopword``
  (A20, ``ProductNameAnalysisFilter.java:316-332``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .tokenizer import tokenize

__all__ = [
    "SetDictionary",
    "SynonymDictionary",
    "AnalyzerOption",
    "analyze_query",
    "analyze_index_tokens",
]


class SetDictionary(frozenset):
    """Stopword/unit/user word set keyed by surface."""

    @classmethod
    def from_lines(cls, lines) -> "SetDictionary":
        # comment test on the STRIPPED line — an indented '  # note'
        # must not load as the literal word '# note'
        return cls(
            s for w in lines if (s := w.strip()) and not s.startswith("#")
        )


class SynonymDictionary:
    """term → synonyms. ``two_way`` links every member of a group to all
    others (the reference compiles the closure at load,
    ``ProductNameDictionary.java:530-572``); one-way keeps direction
    (test semantics at ``ProductNameDictionaryTest``/:611-623)."""

    def __init__(self, mapping: dict[str, list[str]] | None = None):
        self.mapping = {k: list(v) for k, v in (mapping or {}).items()}

    @classmethod
    def from_groups(cls, groups: list[list[str]], two_way: bool = True) -> "SynonymDictionary":
        m: dict[str, list[str]] = {}
        for group in groups:
            if two_way:
                for w in group:
                    others = [x for x in group if x != w]
                    m.setdefault(w, [])
                    for o in others:
                        if o not in m[w]:
                            m[w].append(o)
            else:
                head, *tail = group
                m.setdefault(head, [])
                for o in tail:
                    if o not in m[head]:
                        m[head].append(o)
        return cls(m)

    def get(self, term: str) -> list[str]:
        return self.mapping.get(term, [])

    def __len__(self) -> int:
        return len(self.mapping)


@dataclass
class AnalyzerOption:
    """``AnalyzerOption.java:3-84`` equivalent."""

    use_for_query: bool = True
    use_synonym: bool = True
    use_stopword: bool = True
    to_uppercase: bool = False  # A21 (highlight consistency)

    synonyms: SynonymDictionary = field(default_factory=SynonymDictionary)
    stopwords: SetDictionary = field(default_factory=SetDictionary)


def _base_tokens(text: str, mode: str, min_len: int, provider=None) -> list[dict]:
    out = []
    position = -1
    for p in tokenize(text, mode, min_len, provider=provider):
        position += p.position_incr
        out.append(
            {
                "term": p.token_string(),
                "type": p.pos_id.name,
                "position": position,
                "start_offset": p.start_offset,
                "end_offset": p.end_offset,
            }
        )
    return out


def _maybe_upper(term: str, option: AnalyzerOption) -> str:
    return term.upper() if option.to_uppercase else term


def analyze_query(
    text: str,
    option: AnalyzerOption,
    mode: str = "standard",
    compound_noun_min_length: int = 3,
    provider=None,
) -> list[dict]:
    """Query-mode analysis: stopwords dropped, synonyms *attached* to
    their token (the query builder turns them into OR subtrees)."""
    tokens = []
    for tok in _base_tokens(text, mode, compound_noun_min_length, provider):
        term = tok["term"]
        if option.use_stopword and term in option.stopwords:
            continue
        tok["term"] = _maybe_upper(term, option)
        if option.use_synonym:
            tok["synonyms"] = [
                _maybe_upper(s, option) for s in option.synonyms.get(term)
            ]
        tokens.append(tok)
    return tokens


def analyze_index_tokens(
    text: str,
    option: AnalyzerOption,
    mode: str = "standard",
    compound_noun_min_length: int = 3,
    provider=None,
) -> list[dict]:
    """Index-mode analysis: stopwords dropped, synonyms *emitted* as
    extra tokens at the same position (posIncr=0 semantics,
    ``ProductNameAnalysisFilter.java:182-193``)."""
    out = []
    for tok in _base_tokens(text, mode, compound_noun_min_length, provider):
        term = tok["term"]
        if option.use_stopword and term in option.stopwords:
            continue
        tok["term"] = _maybe_upper(term, option)
        out.append(tok)
        if option.use_synonym:
            for s in option.synonyms.get(term):
                extra = dict(tok)
                extra["term"] = _maybe_upper(s, option)
                out.append(extra)
    return out
