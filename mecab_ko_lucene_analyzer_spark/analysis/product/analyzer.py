"""Product-name analyzer assembly (A12, A18–A23).

``ProductNameTokenizer`` (char-class runs + dictionary-lattice
extraction + FULL_STRING) feeding ``ProductNameParsingRule`` and the
emission protocol of ``ProductNameAnalysisFilter.java:78-244``:

* query mode: one token per rule entry, synonyms attached
  (``SynonymAttribute``), sub-entries attached as extra terms
  (``ExtraTermAttribute``); UNIT entries drop bare-number sub-entries
  (``:133-145``); synonyms re-analyzed once (``synonymExtract``)
* index mode: sub-entries and synonyms are *emitted* as same-position
  tokens (``:173-230``)
* stopwords: typed STOPWORD and dropped when ``use_stopword``
  (``:162-168,200-206``)
* ``testEntry`` retypes: standalone NUMBER ≥ 5 digits → MODEL_NAME,
  UNIT_ALPHA → UNIT, NUMBER_TRANS → NUMBER with comma-stripped extra
  (``:275-314``)
"""

from __future__ import annotations

from dataclasses import dataclass

from .extractor import KoreanWordExtractor, PosTag
from .parsing_rule import ProductDictionarySet, ProductNameParsingRule, RuleEntry
from .types import (
    ALPHA,
    FULL_STRING,
    FULL_TERM_LENGTH,
    HANGUL,
    MODEL_NAME,
    NUMBER,
    NUMBER_TRANS,
    STOPWORD,
    SYMBOL,
    UNIT,
    UNIT_ALPHA,
    WHITESPACE,
    char_type,
)

__all__ = ["ProductAnalyzerOption", "ProductNameAnalyzer"]


@dataclass
class ProductAnalyzerOption:
    """``AnalyzerOption.java:3-84``."""

    use_for_query: bool = True
    use_synonym: bool = True
    use_stopword: bool = True
    use_full_string: bool = False
    to_uppercase: bool = False


class ProductNameAnalyzer:
    def __init__(self, dicts: ProductDictionarySet, option: ProductAnalyzerOption | None = None):
        self.d = dicts
        self.option = option or ProductAnalyzerOption()
        self.extractor = KoreanWordExtractor(dicts.tag_prob)
        # one rule instance for the analyzer's lifetime: it is
        # stateless across process()/add_entry() calls, and per-call
        # construction allocated a fresh KoreanWordExtractor per
        # document on the product hot path
        self.rule = ProductNameParsingRule(
            dicts, self.option.use_for_query, self.option.use_synonym
        )

    # -- tokenizer stage ---------------------------------------------------

    def _base_entries(self, text: str) -> list[RuleEntry]:
        rule = self.rule
        out: list[RuleEntry] = []
        trimmed = text.rstrip()
        if (
            0 < len(trimmed) < FULL_TERM_LENGTH
            and self.option.use_for_query
            and self.option.use_full_string
        ):
            out.append(RuleEntry(text, 0, len(trimmed), 0, len(trimmed), FULL_STRING))
        # same-type runs (whitespace splits, type change splits)
        i, n = 0, len(text)
        while i < n:
            t = char_type(text[i])
            j = i
            while j < n and char_type(text[j]) == t:
                j += 1
            if t != WHITESPACE:
                for seg in self.extractor.extract(text, i, j - i):
                    rule.add_entry(
                        out, text, seg.start, seg.length, None, seg.tag
                    )
            i = j
        return out

    # -- filter stage --------------------------------------------------------

    def analyze(self, text: str) -> list[dict]:
        """Returns token dicts: term/type/position/offsets (+synonyms,
        extra_terms in query mode)."""
        if self.option.to_uppercase:
            pass  # applied per-term below
        rule = self.rule
        entries = self._base_entries(text)
        queue = rule.process(entries, full_extract=True)
        return (
            self._emit_query(queue)
            if self.option.use_for_query
            else self._emit_index(queue)
        )

    def _case(self, term: str) -> str:
        return term.upper() if self.option.to_uppercase else term

    def _test_entry(self, entry: RuleEntry, parent: RuleEntry | None) -> list[str]:
        """testEntry (:275-314) → list of extra comma-stripped variants."""
        extras: list[str] = []
        if (
            (parent is None or parent.type == MODEL_NAME)
            and entry.type == NUMBER
            and entry.length >= 5
        ):
            entry.type = MODEL_NAME
        elif entry.type == UNIT_ALPHA:
            entry.type = UNIT
        elif entry.type == NUMBER_TRANS:
            entry.type = NUMBER
            stripped = entry.term.replace(",", "")
            if len(stripped) != entry.length:
                extras.append(stripped)
        return extras

    def _synonyms_of(self, term: str) -> list[str]:
        if not self.option.use_synonym:
            return []
        return [self._case(s) for s in self.d.synonym.get(term)]

    def _is_stop(self, term: str) -> bool:
        return term in self.d.stop

    def _emit_query(self, queue: list[RuleEntry]) -> list[dict]:
        out = []
        position = -1
        for entry in queue:
            subs = entry.sub_entries or []
            if entry.type in (UNIT, UNIT_ALPHA):
                # bare numbers are not query extra terms (:136-144)
                subs = [s for s in subs if s.type not in (NUMBER, NUMBER_TRANS)]
            extras_from_test = self._test_entry(entry, None)
            term = self._case(entry.term)
            if self._is_stop(entry.term):
                if self.option.use_stopword:
                    continue
                ttype = STOPWORD
            else:
                ttype = entry.type
            position += 1
            synonyms = self._synonyms_of(entry.term)
            if entry.synonyms:
                synonyms.extend(self._case(s) for s in entry.synonyms)
            extra_terms = []
            for s in subs:
                self._test_entry(s, entry)
                extra_terms.append(
                    {
                        "term": self._case(s.term),
                        "type": s.type,
                        "synonyms": self._synonyms_of(s.term),
                    }
                )
            for x in extras_from_test:
                extra_terms.append({"term": self._case(x), "type": NUMBER, "synonyms": []})
            out.append(
                {
                    "term": term,
                    "type": ttype,
                    "position": position,
                    "start_offset": entry.start_offset,
                    "end_offset": entry.end_offset,
                    "synonyms": synonyms,
                    "extra_terms": extra_terms,
                }
            )
        return out

    def _emit_index(self, queue: list[RuleEntry]) -> list[dict]:
        out = []
        position = -1
        for entry in queue:
            if entry.type == FULL_STRING:
                continue  # not indexed (:100-103)
            emit: list[tuple[RuleEntry, int]] = [(entry, 1)]
            for s in entry.sub_entries or []:
                emit.append((s, 0))
                # rule-attached synonyms ride their sub-entry into the
                # index at the same position (dictionary synonyms stay
                # query-side — ProductNameAnalysisFilter.java:248 gates
                # applySynonym on useForQuery; unit synonyms are built
                # by modifyRuleEntry regardless and were previously
                # attached here but never emitted)
                if s.synonyms and self.option.use_synonym:
                    for syn in s.synonyms:
                        emit.append(
                            (
                                RuleEntry(syn, 0, len(syn), s.start_offset,
                                          s.end_offset, s.type),
                                0,
                            )
                        )
            if entry.synonyms and self.option.use_synonym:
                for syn in entry.synonyms:
                    emit.append(
                        (
                            RuleEntry(syn, 0, len(syn), entry.start_offset,
                                      entry.end_offset, entry.type),
                            0,
                        )
                    )
            first = True
            for e, incr in emit:
                extras = self._test_entry(e, entry if not first else None)
                term = e.term
                if self._is_stop(term):
                    if self.option.use_stopword:
                        first = False
                        continue
                if incr == 1:
                    position += 1
                out.append(
                    {
                        "term": self._case(term),
                        "type": e.type,
                        "position": max(position, 0),
                        "start_offset": e.start_offset,
                        "end_offset": e.end_offset,
                    }
                )
                for x in extras:
                    out.append(
                        {
                            "term": self._case(x),
                            "type": NUMBER,
                            "position": max(position, 0),
                            "start_offset": e.start_offset,
                            "end_offset": e.end_offset,
                        }
                    )
                first = False
        return out
