"""Product-name parsing rules (A17) + rule-entry model.

Re-expresses ``ProductNameParsingRule.java`` (1.9k LoC, no tests in the
reference) as a five-phase pipeline over rule entries. The phases keep
the documented semantics:

1. normalize: split UNCATEGORIZED runs by char type; join adjacent
   attached entries that form a space/stop/user/synonym/compound
   dictionary word (``:180-266``); split dictionary words that are
   number+unit (``:269-302``); retype short hangul-classified terms
   that are really ALPHA/NUMBER/model fragments (``:303-338``)
2. number shaping: NUMBER ∘ [,.:] ∘ NUMBER → NUMBER_TRANS gated by the
   ``PTN_NUMBER`` regex (``:366-402``); adjacent same-type merges
3. unit extraction: NUMBER(_TRANS) + unit-dictionary candidate (longest
   combination ≤ 10 chars, up to 5 entries) → UNIT/UNIT_ALPHA with unit
   synonyms and comma-stripped variants (``:437-581,1087-1163``)
4. model names: runs of attached ALPHA/NUMBER/NUMBER_TRANS/UNIT_ALPHA
   joined by connector symbols merge into MODEL_NAME with the original
   parts kept as sub-entries (``:593-924``); 숫자x숫자 stays dimensional
   (not a model name, ``:683-773``); ``/`` between bare numbers splits;
   ``+`` cancels model joining (``:774-814``)
5. cleanup: drop forbidden/stray symbols (``:929-1028``), ≥5-digit
   standalone numbers become MODEL_NAME (``:1024-1027``), compound-
   dictionary expansion at index time (``:1046-1058``), FULL_STRING
   synonym merge (``:1062-1076``)
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..dictionary import SetDictionary, SynonymDictionary
from .extractor import KoreanWordExtractor, PosTag, TagProbDictionary
from .types import (
    ALPHA,
    ALPHANUM,
    ASCII_TYPE,
    AVAIL_SYMBOLS,
    AVAIL_SYMBOLS_CONNECTOR,
    AVAIL_SYMBOLS_INNUMBER,
    CHINESE,
    COMPOUND,
    FULL_STRING,
    HANGUL,
    JAPANESE,
    MAX_UNIT_LENGTH,
    MODEL_NAME,
    NUMBER,
    NUMBER_TRANS,
    PTN_NUMBER,
    SYMBOL,
    UNCATEGORIZED,
    UNIT,
    UNIT_ALPHA,
    char_type,
    term_type,
    uni_type,
)

__all__ = ["RuleEntry", "ProductDictionarySet", "ProductNameParsingRule"]


@dataclass
class RuleEntry:
    text: str  # backing string (usually the whole source)
    start: int
    length: int
    start_offset: int
    end_offset: int
    type: str | None
    modifiable: bool = True
    sub_entries: list["RuleEntry"] | None = None
    synonyms: list[str] | None = None

    @property
    def term(self) -> str:
        return self.text[self.start : self.start + self.length]

    @property
    def end(self) -> int:
        return self.start + self.length

    def clone(self) -> "RuleEntry":
        return RuleEntry(
            self.text, self.start, self.length, self.start_offset,
            self.end_offset, self.type, self.modifiable, None, None,
        )

    def __repr__(self) -> str:
        return f"{self.term}:{self.type}@{self.start_offset}-{self.end_offset}"


@dataclass
class ProductDictionarySet:
    """The registry of runtime dictionaries (SURVEY §1.3;
    ``ProductNameDictionary.java:151-288``). All members are small and
    broadcast-friendly."""

    tag_prob: TagProbDictionary = field(default_factory=TagProbDictionary)
    user: SetDictionary = field(default_factory=SetDictionary)
    stop: SetDictionary = field(default_factory=SetDictionary)
    unit: SetDictionary = field(default_factory=SetDictionary)
    unit_synonym: SynonymDictionary = field(default_factory=SynonymDictionary)
    synonym: SynonymDictionary = field(default_factory=SynonymDictionary)
    space: dict = field(default_factory=dict)  # word → [parts]
    compound: dict = field(default_factory=dict)  # word → [components]
    maker: SetDictionary = field(default_factory=SetDictionary)
    brand: SetDictionary = field(default_factory=SetDictionary)


def _pos_tag_to_type(pos_tag: PosTag | None) -> str:
    if pos_tag is PosTag.N:
        return HANGUL
    if pos_tag is PosTag.DIGIT:
        return NUMBER
    if pos_tag is PosTag.ALPHA:
        return ALPHA
    if pos_tag is PosTag.SYMBOL:
        return SYMBOL
    return UNCATEGORIZED


class ProductNameParsingRule:
    def __init__(
        self,
        dicts: ProductDictionarySet,
        use_for_query: bool = True,
        use_synonym: bool = True,
    ):
        self.d = dicts
        self.use_for_query = use_for_query
        self.use_synonym = use_synonym
        self.extractor = KoreanWordExtractor(dicts.tag_prob)

    # ---- entry construction (addEntry, :79-113) -------------------------

    def add_entry(
        self,
        out: list[RuleEntry],
        text: str,
        start: int,
        length: int,
        etype: str | None,
        pos_tag: PosTag | None,
    ) -> None:
        if etype != FULL_STRING:
            etype = _pos_tag_to_type(pos_tag) if pos_tag is not None else etype
        term = text[start : start + length]
        if etype != FULL_STRING and term in self.d.space:
            pos = start
            for sinx, part in enumerate(self.d.space[term]):
                if sinx > 0:
                    out.append(RuleEntry(text, pos, 0, pos, pos, SYMBOL))
                out.append(RuleEntry(text, pos, len(part), pos, pos + len(part), HANGUL))
                pos += len(part)
        else:
            out.append(RuleEntry(text, start, length, start, start + length, etype))

    # ---- main pipeline ---------------------------------------------------

    def process(self, queue: list[RuleEntry], full_extract: bool = True) -> list[RuleEntry]:
        # defensive copy only — zero-length entries are handled by
        # phase1 (skip) and phase5 (pop), not filtered here
        queue = list(queue)
        self._phase1(queue, full_extract)
        self._phase2(queue)
        self._phase3(queue, full_extract)
        self._phase4(queue, full_extract)
        self._phase5(queue)
        self._phase_final(queue)
        return queue

    # -- helpers -----------------------------------------------------------

    def _in_any_dict(self, term: str) -> bool:
        """containsDictionary (:1819-1829): system dict, user dict, and
        (query mode only) the compound dict."""
        return (
            self.d.tag_prob.find(term) is not None
            or term in self.d.user
            or (self.use_for_query and term in self.d.compound)
        )

    @staticmethod
    def _attached(a: RuleEntry, b: RuleEntry) -> bool:
        return a.text is b.text and b.start == a.end

    def _split_by_type(self, entry: RuleEntry, queue: list, at: int) -> None:
        """split (:1165-1216): re-split an entry into char-type runs."""
        added = 0
        st = 0
        ptype = None
        for i in range(entry.length):
            ct = char_type(entry.text[entry.start + i])
            if ptype is not None and ct != ptype:
                if ptype != "<WHITESPACE>":
                    queue.insert(
                        at + added,
                        RuleEntry(
                            entry.text, entry.start + st, i - st,
                            entry.start_offset + st, entry.start_offset + i, ptype,
                        ),
                    )
                    added += 1
                st = i
            ptype = ct
        if st < entry.length:
            queue.insert(
                at + added,
                RuleEntry(
                    entry.text, entry.start + st, entry.length - st,
                    entry.start_offset + st, entry.start_offset + entry.length, ptype,
                ),
            )

    # -- phase 1 ------------------------------------------------------------

    def _phase1(self, queue: list[RuleEntry], full_extract: bool) -> None:
        qinx = 0
        while qinx < len(queue):
            e0 = queue[qinx]
            if e0.type == FULL_STRING or e0.length == 0:
                qinx += 1
                continue
            if e0.type == UNCATEGORIZED:
                if e0.term not in self.d.user:
                    queue.pop(qinx)
                    self._split_by_type(e0, queue, qinx)
                    e0 = queue[qinx]
                else:
                    e0.type = HANGUL

            # joined-dictionary check across up to 10 attached entries
            if full_extract:
                merged = False
                for linx in range(min(10, len(queue) - qinx - 1), 0, -1):
                    chain = queue[qinx : qinx + linx + 1]
                    if any(
                        c.length == 0 or c.type == FULL_STRING for c in chain
                    ) or any(
                        not self._attached(chain[i], chain[i + 1])
                        for i in range(len(chain) - 1)
                    ):
                        continue
                    joined = e0.text[e0.start : chain[-1].end]
                    if joined in self.d.space:
                        del queue[qinx : qinx + linx + 1]
                        pos = e0.start
                        off = e0.start_offset
                        for sinx, part in enumerate(self.d.space[joined]):
                            ne = RuleEntry(
                                e0.text, pos, len(part), off, off + len(part), HANGUL
                            )
                            ne.modifiable = False
                            queue.insert(qinx + sinx, ne)
                            pos += len(part)
                            off += len(part)
                        merged = True
                        break
                    if joined in self.d.stop or self._in_any_dict(joined):
                        last = chain[-1]
                        e0.length = last.end - e0.start
                        e0.end_offset = last.end_offset
                        e0.type = HANGUL
                        if joined in self.d.stop:
                            e0.modifiable = False
                        del queue[qinx + 1 : qinx + linx + 1]
                        merged = True
                        break
                if merged:
                    e0 = queue[qinx]

            # dictionary hangul word that is number+unit → split (:269-302)
            if e0.type == HANGUL and e0.modifiable:
                term = e0.term
                if term and char_type(term[0]) == NUMBER:
                    num_len = 1
                    number_trans = False
                    while num_len < len(term):
                        ch = term[num_len]
                        in_num_sym = ch in AVAIL_SYMBOLS_INNUMBER
                        if in_num_sym:
                            number_trans = True
                        if char_type(ch) != NUMBER and not in_num_sym:
                            break
                        num_len += 1
                    unit = term[num_len:]
                    if unit and unit in self.d.unit:
                        e1 = e0.clone()
                        e0.length = num_len
                        e0.end_offset = e0.start_offset + num_len
                        e0.type = NUMBER_TRANS if number_trans else NUMBER
                        e1.start += num_len
                        e1.length -= num_len
                        e1.start_offset += num_len
                        e1.type = term_type(unit)
                        queue.insert(qinx + 1, e1)
                        qinx += 2
                        continue
                elif len(term) <= 3 and e0.modifiable:
                    tt = term_type(term)
                    if term not in self.d.user and all(
                        char_type(c) in (ALPHA, NUMBER) for c in term
                    ):
                        joinable = False
                        if qinx > 0:
                            p = queue[qinx - 1]
                            joinable = self._attached(p, e0) and p.type in (
                                ALPHA, NUMBER, SYMBOL,
                            )
                        if not joinable and qinx + 1 < len(queue):
                            n = queue[qinx + 1]
                            joinable = self._attached(e0, n) and n.type in (
                                ALPHA, NUMBER, SYMBOL,
                            )
                        if joinable:
                            queue.pop(qinx)
                            self._split_by_type(e0, queue, qinx)
                            continue
                    if tt == ALPHA:
                        e0.type = ALPHA
                    elif tt == NUMBER:
                        e0.type = NUMBER
                    elif tt in (ASCII_TYPE, ALPHANUM):
                        e0.type = MODEL_NAME

            # NUMBER . NUMBER with an in-number symbol *between buffers*
            if qinx + 1 < len(queue):
                e1 = queue[qinx + 1]
                if (
                    e0.type in (NUMBER, NUMBER_TRANS)
                    and e1.type == NUMBER
                    and e0.text is e1.text
                    and e0.end < len(e0.text)
                    and e1.start == e0.end + 1
                ):
                    c = e0.text[e0.end]
                    if char_type(c) == SYMBOL and c in AVAIL_SYMBOLS_INNUMBER:
                        queue.pop(qinx + 1)
                        e0.length += 1 + e1.length
                        e0.end_offset = e1.end_offset
                        e0.type = NUMBER_TRANS
                        continue
            qinx += 1

    # -- phase 2 ------------------------------------------------------------

    def _phase2(self, queue: list[RuleEntry]) -> None:
        qinx = 0
        while qinx < len(queue):
            e0 = queue[qinx]
            if e0.type == FULL_STRING:
                qinx += 1
                continue
            if qinx + 2 < len(queue):
                e1, e2 = queue[qinx + 1], queue[qinx + 2]
                if (
                    e0.type in (NUMBER, NUMBER_TRANS)
                    and e1.type == SYMBOL
                    and e1.length == 1
                    and e2.type == NUMBER
                    and self._attached(e0, e1)
                    and self._attached(e1, e2)
                    and e1.term in AVAIL_SYMBOLS_INNUMBER
                ):
                    candidate = e0.text[e0.start : e2.end]
                    if PTN_NUMBER.match(candidate):
                        e0.length = e2.end - e0.start
                        e0.end_offset = e0.start_offset + e0.length
                        e0.type = NUMBER_TRANS
                        del queue[qinx + 1 : qinx + 3]
                        continue
            if qinx + 1 < len(queue):
                e1 = queue[qinx + 1]
                if self._attached(e0, e1) and e0.length > 0 and e1.length > 0:
                    if (e0.type, e1.type) in (
                        (ALPHA, ALPHA),
                        (NUMBER, NUMBER),
                        (JAPANESE, JAPANESE),
                        (CHINESE, JAPANESE),
                        (JAPANESE, CHINESE),
                    ):
                        e0.length += e1.length
                        e0.end_offset = e1.end_offset
                        if JAPANESE in (e0.type, e1.type):
                            e0.type = JAPANESE
                        queue.pop(qinx + 1)
                        continue
            qinx += 1

    # -- phase 3: units ------------------------------------------------------

    def _phase3(self, queue: list[RuleEntry], full_extract: bool) -> None:
        qinx = 0
        while qinx < len(queue):
            e0 = queue[qinx]
            if e0.type not in (NUMBER, NUMBER_TRANS) or qinx + 1 >= len(queue):
                qinx += 1
                continue
            e1 = queue[qinx + 1]
            if not self._attached(e0, e1):
                qinx += 1
                continue
            # longest combination of up to 5 following entries; ALPHA/
            # SYMBOL candidates shrink to their longest dictionary prefix
            # (findUnit, :1708-1732; lookups are case-insensitive)
            found = None
            find_inx = 0
            for linx in range(min(5, len(queue) - 1 - qinx), 0, -1):
                e2 = queue[qinx + linx]
                if e2.length == 0 or (linx > 1 and e2.type == HANGUL):
                    continue
                if e2.text is e1.text:
                    unit_len = e2.end - e1.start
                else:
                    unit_len = e1.length
                if not (0 < unit_len and e1.start + unit_len <= len(e1.text)):
                    continue
                unit_len = min(unit_len, MAX_UNIT_LENGTH)
                candidate = e1.text[e1.start : e1.start + unit_len]
                ct = uni_type(candidate)
                if ct in (ALPHA, SYMBOL):
                    for ln in range(len(candidate), 0, -1):
                        if candidate[:ln].lower() in self.d.unit:
                            found = candidate[:ln]
                            find_inx = linx
                            break
                elif candidate.lower() in self.d.unit:
                    found = candidate
                    find_inx = linx
                if found:
                    break
            if found is None:
                qinx += 1
                continue
            unit_t = uni_type(found)
            # ALPHA unit adjacent to ALPHA text is a model name, skip —
            # EXCEPT an 'x' between numbers/units (숫자x숫자, :491-500)
            prev_ch = e0.text[e0.start - 1] if e0.start > 0 else ""
            if unit_t == ALPHA and prev_ch and char_type(prev_ch) == ALPHA:
                x_between = False
                if prev_ch.lower() == "x" and qinx > 1:
                    e_x, e_b = queue[qinx - 1], queue[qinx - 2]
                    if (
                        e_x.length == 1
                        and self._attached(e_b, e_x)
                        and self._attached(e_x, e0)
                        and e_b.type in (NUMBER, NUMBER_TRANS, UNIT, UNIT_ALPHA)
                    ):
                        x_between = True
                if not x_between:
                    qinx += 1
                    continue
            # shortened match: model-name priority unless remainder is an
            # 'x' followed by a number-ish entry (:529-556)
            span_end = queue[qinx + find_inx].end if queue[qinx + find_inx].text is e1.text else e1.end
            remainder_len = span_end - (e1.start + len(found))
            if remainder_len > 0:
                rem_ch = e1.text[e1.start + len(found)]
                if (
                    (
                        (prev_ch and char_type(prev_ch) == ALPHA)
                        or char_type(rem_ch) == ALPHA
                    )
                    and rem_ch.lower() != "x"
                    and unit_t == ALPHA
                ):
                    qinx += 1
                    continue
            self._apply_unit(e0, found, unit_t, full_extract)
            del queue[qinx + 1 : qinx + find_inx + 1]
            if remainder_len > 0:
                queue.insert(
                    qinx + 1,
                    RuleEntry(
                        e1.text,
                        e1.start + len(found),
                        remainder_len,
                        e1.start_offset + len(found),
                        e1.start_offset + len(found) + remainder_len,
                        e1.type,
                    ),
                )
            qinx += 1

    def _apply_unit(self, e0: RuleEntry, unit: str, unit_t: str, full_extract: bool):
        """modifyRuleEntry (:1087-1163): unit synonyms + comma-stripped
        number variant as sub-entries/synonyms."""
        backup = e0.clone()
        if full_extract:
            e0.sub_entries = [backup]
        synonyms: list[str] = []
        units = self.d.unit_synonym.get(unit)
        if full_extract and units and self.use_for_query:
            synonyms = [e0.term + u for u in units]
        if e0.type == NUMBER_TRANS:
            number = e0.term.replace(",", "")
            if len(number) != backup.length:
                unit_str = number + unit
                sub = RuleEntry(unit_str, 0, len(unit_str), e0.start_offset,
                                e0.end_offset + len(unit), UNIT)
                if self.use_synonym and units:
                    sub.synonyms = [number + u for u in units]
                if e0.sub_entries is None:  # full_extract=False path
                    e0.sub_entries = []
                e0.sub_entries.insert(0, sub)
        if full_extract and synonyms:
            e0.synonyms = synonyms
        e0.length += len(unit)
        e0.end_offset += len(unit)
        e0.type = UNIT_ALPHA if unit_t == ALPHA else UNIT

    # -- phase 4: model names -------------------------------------------------

    _JOINABLE = (ALPHA, NUMBER, NUMBER_TRANS)

    def _phase4(self, queue: list[RuleEntry], full_extract: bool) -> None:
        """Merge attached alphanumeric/connector runs into MODEL_NAME.

        Simplified but behavior-equivalent run detection: a model-name
        run is a maximal chain of attached entries whose types are
        ALPHA/NUMBER/NUMBER_TRANS/UNIT_ALPHA or single connector symbols
        between them; runs of length >= 2 merge. The dimensional
        숫자x숫자(단위) pattern and '+'-joined, '/'-between-numbers
        patterns do not merge (:683-814)."""
        # retype dictionary words that are pure ALPHA (:604-608)
        for e in queue:
            if e.type != FULL_STRING and e.length > 0 and term_type(e.term) == ALPHA:
                e.type = ALPHA

        qinx = 0
        while qinx < len(queue):
            run = self._model_run(queue, qinx)
            if run <= 1:
                qinx += 1
                continue
            chain = queue[qinx : qinx + run]
            if self._is_dimensional(chain):
                # dimensional 숫자x숫자: drop the joining 'x' entries and
                # keep the number/unit parts separate (:757-771)
                for i in range(qinx + run - 1, qinx - 1, -1):
                    e = queue[i]
                    if e.type == ALPHA and e.length == 1 and e.term.lower() == "x":
                        queue.pop(i)
                qinx += 1
                continue
            if self._has_plus(chain):
                qinx += run
                continue
            # drop trailing symbol from the run
            while run > 1 and queue[qinx + run - 1].type == SYMBOL:
                run -= 1
            if run <= 1:
                qinx += 1
                continue
            chain = queue[qinx : qinx + run]
            first, last = chain[0], chain[-1]
            entry = RuleEntry(
                first.text, first.start, last.end - first.start,
                first.start_offset, last.end_offset, MODEL_NAME,
            )
            if full_extract:
                subs = [c for c in chain if c.type != SYMBOL]
                subs = self._merge_alnum_singles(subs)
                for c in subs:
                    c.sub_entries = None
                if len(subs) > 1:
                    entry.sub_entries = subs
            del queue[qinx : qinx + run]
            queue.insert(qinx, entry)
            qinx += 1

    def _model_run(self, queue: list[RuleEntry], qinx: int) -> int:
        run = 0
        prev = None
        for i in range(qinx, len(queue)):
            e = queue[i]
            if e.type == FULL_STRING or e.length == 0:
                break
            if prev is not None and not self._attached(prev, e):
                break
            if e.type in self._JOINABLE or e.type == UNIT_ALPHA:
                pass
            elif (
                e.type == SYMBOL
                and e.length == 1
                and e.term in AVAIL_SYMBOLS_CONNECTOR
                and prev is not None
            ):
                pass
            else:
                break
            prev = e
            run += 1
        return run

    @staticmethod
    def _is_dimensional(chain: list[RuleEntry]) -> bool:
        """숫자x숫자(단위) chains stay dimensional (:683-773)."""
        if len(chain) < 3:
            return False
        for i in range(1, len(chain) - 1):
            e = chain[i]
            if e.type == ALPHA and e.length == 1 and e.term.lower() == "x":
                left, right = chain[i - 1], chain[i + 1]
                if left.type in (NUMBER, NUMBER_TRANS, UNIT, UNIT_ALPHA) and right.type in (
                    NUMBER, NUMBER_TRANS, UNIT, UNIT_ALPHA,
                ):
                    # model-name-capable neighbors cancel the rule
                    before = chain[i - 2] if i - 2 >= 0 else None
                    after = chain[i + 2] if i + 2 < len(chain) else None
                    if (before is None or before.type not in (ALPHA,)) and (
                        after is None or after.type not in (ALPHA,)
                    ):
                        return True
        return False

    @staticmethod
    def _has_plus(chain: list[RuleEntry]) -> bool:
        return any(c.type == SYMBOL and c.term == "+" for c in chain)

    @staticmethod
    def _merge_alnum_singles(subs: list[RuleEntry]) -> list[RuleEntry]:
        """1-char alternating alpha/num pieces merge to ALPHANUM
        (:1332-1458 family of rules, simplified)."""
        out: list[RuleEntry] = []
        i = 0
        while i < len(subs):
            j = i
            while (
                j < len(subs)
                and subs[j].length == 1
                and subs[j].type in (ALPHA, NUMBER)
                and (j == i or subs[j].start == subs[j - 1].end)
            ):
                j += 1
            if j - i > 1:
                first, last = subs[i], subs[j - 1]
                merged = RuleEntry(
                    first.text, first.start, last.end - first.start,
                    first.start_offset, last.end_offset, ALPHANUM,
                )
                out.append(merged)
                i = j
            else:
                out.append(subs[i])
                i += 1
        return out

    # -- phase 5: cleanup -------------------------------------------------------

    def _phase5(self, queue: list[RuleEntry]) -> None:
        qinx = 0
        while qinx < len(queue):
            e0 = queue[qinx]
            if e0.type == FULL_STRING or e0.term in self.d.user:
                qinx += 1
                continue
            if e0.length == 0:
                queue.pop(qinx)
                continue
            if e0.type == SYMBOL:
                # standalone-symbol whitelist is empty in the reference —
                # every surviving lone symbol is dropped unconditionally
                # (:944-1015; AVAIL_SYMBOLS only matters inside model
                # names, so no whitelist test here)
                queue.pop(qinx)
                continue
            if e0.type == MODEL_NAME and e0.length > 2 and char_type(e0.term[-1]) == SYMBOL:
                e0.length -= 1
                e0.end_offset -= 1
            if e0.type == NUMBER and e0.length >= 5:
                e0.type = MODEL_NAME
            qinx += 1

    def _phase_final(self, queue: list[RuleEntry]) -> None:
        for e0 in queue:
            if e0.type == FULL_STRING:
                continue
            token = e0.term
            if not self.use_for_query and token in self.d.compound:
                comps = self.d.compound[token]
                e0.sub_entries = e0.sub_entries or []
                for word in comps:
                    e0.sub_entries.append(
                        RuleEntry(word, 0, len(word), e0.start_offset, e0.end_offset, COMPOUND)
                    )
                e0.type = COMPOUND
        # FULL_STRING synonym merge (:1062-1076)
        if (
            len(queue) > 1
            and queue[0].type == FULL_STRING
            and queue[1].start_offset == queue[0].start_offset
            and queue[1].end_offset == queue[0].end_offset
        ):
            e0, e1 = queue[0], queue[1]
            if e0.synonyms:
                e1.synonyms = (e1.synonyms or []) + e0.synonyms
            queue.pop(0)
