"""Dictionary-lattice word extraction (A13–A15).

Re-expresses ``dict/korean/KoreanWordExtractor.java`` (danawalab
reference): a tabular DP over every substring window (≤ ``tabular_size``
chars), candidate POS/log-prob entries from a TagProb dictionary plus
DIGIT/ALPHA/SYMBOL pseudo-tags and a hardcoded josa set
(``KoreanWordExtractor.java:62``), best-path selection by summed
log-prob with the reference's exact pruning behaviors:

* exact-dict-match fast path skips the DP (``:103-106,131-135``)
* single-char ALPHA never a candidate; multi-char ALPHA only via dict
  (``:121-129``)
* connection rules: no DIGIT+DIGIT / ALPHA+ALPHA / SYMBOL+SYMBOL; josa
  final-consonant agreement (은/이/을/과 need jongseong, 는/가/를/와
  reject it, ``:565-602``); two single-char pieces rejected when the
  combined word is itself a candidate (``:594-599``)
* fast-exit on first completed path when length > 6 (``:24,380-384``),
  QUEUE_MAX=200 abort, RESULT_MAX=10 compaction (``:41-42,386-392``)
* leading-josa results dropped; all-single-char chains only kept when
  they end in a josa (``finalCheck``, ``:612-641``)
* pure-ASCII inputs drop paths ending in UNK (``:291-300``)
* inputs longer than the window are cut at symbol/type boundaries and
  the remainder re-extracted and chained (``setInput``, ``:395-473``)
"""

from __future__ import annotations

import heapq
from dataclasses import dataclass
from enum import Enum

from ..jamo import has_jongseong

__all__ = ["PosTag", "TagProb", "Segment", "KoreanWordExtractor", "TagProbDictionary"]

TABULAR_SIZE = 20
QUEUE_MAX = 200
RESULT_MAX = 10

JOSA_SET = frozenset(
    "은 는 이 가 을 를 에 과 와 의 로 만 께 에게 에서 으로 부터 라서 라고 께서 한테 처럼 같이 라는 하며 하고 까지 이라고 이라는 이라도 이라면 에서도 이기도".split()
)


class PosTag(Enum):
    SOE = "SOE"
    UNK = "UNK"
    N = "N"
    V = "V"
    M = "M"
    IC = "IC"
    J = "J"
    E = "E"
    EP = "EP"
    X = "X"
    ALPHA = "ALPHA"
    XPN = "XPN"
    EOE = "EOE"
    GUESS = "GUESS"
    DIGIT = "DIGIT"
    SYMBOL = "SYMBOL"


@dataclass(frozen=True)
class TagProb:
    tag: PosTag
    prob: float = -16.0  # MIN_PROB

    # probability ladder (``PosTagProbEntry.java:74-87``)
    MAX_PROB = -5.0
    HIGH_PROB = -8.0
    P11_PROB = -11.0
    P12_PROB = -12.0
    MID_PROB = -13.0
    LOW_PROB = -14.0
    MIN_PROB = -16.0


TAG_UNK = TagProb(PosTag.UNK)
TAG_GUESS = TagProb(PosTag.GUESS)
TAG_DIGIT = TagProb(PosTag.DIGIT, TagProb.HIGH_PROB)
TAG_ALPHA = TagProb(PosTag.ALPHA, TagProb.HIGH_PROB)
TAG_SYMBOL = TagProb(PosTag.SYMBOL)
TAG_JOSA = TagProb(PosTag.J, TagProb.MID_PROB)


class TagProbDictionary:
    """word → TagProb candidates (``TagProbDictionary.java:17-27``).
    Single-char nouns get demoted probability at load
    (``TagProbDictionary.java:135-145`` → callers pass demoted probs)."""

    def __init__(self, entries: dict[str, list[TagProb]] | None = None):
        self.entries = dict(entries or {})

    @classmethod
    def from_words(
        cls, words: dict[str, tuple[str, float]] | dict[str, list[TagProb]]
    ) -> "TagProbDictionary":
        out: dict[str, list[TagProb]] = {}
        for w, v in words.items():
            if isinstance(v, list):
                out[w] = v
            else:
                tag, prob = v
                out[w] = [TagProb(PosTag[tag], prob)]
        return cls(out)

    def find(self, word: str) -> list[TagProb] | None:
        return self.entries.get(word)

    def __len__(self) -> int:
        return len(self.entries)


@dataclass
class Segment:
    """One extracted piece: ``text[start:start+length]`` with its tag.
    (≙ ``ExtractedEntry``, flattened to a list instead of a cons chain.)"""

    start: int
    length: int
    tag_prob: TagProb

    @property
    def tag(self) -> PosTag:
        return self.tag_prob.tag


def _is_digit(s: str) -> bool:
    return s.isascii() and s.isdigit()


def _is_alpha(s: str) -> bool:
    return s.isascii() and s.isalpha()


def _is_symbol(s: str) -> bool:
    return all(not ch.isalnum() for ch in s)


class _AnalyzeExceed(Exception):
    pass


@dataclass
class _Path:
    """head-first chain: (row, column, TagProb) + link to the tail path."""

    row: int
    column: int
    tag_prob: TagProb
    next: "_Path | None"
    score: float

    def entries(self):
        cur = self
        while cur is not None:
            yield cur
            cur = cur.next

    def last(self) -> "_Path":
        cur = self
        while cur.next is not None:
            cur = cur.next
        return cur


class KoreanWordExtractor:
    def __init__(self, dictionary: TagProbDictionary, tabular_size: int = TABULAR_SIZE):
        self.dict = dictionary
        self.tabular_size = tabular_size
        self.fast_result_option = True

    # -- public ---------------------------------------------------------

    def extract(self, text: str, start: int = 0, length: int | None = None) -> list[Segment]:
        """Extract the best segmentation of ``text[start:start+length]``
        as a list of Segments (absolute offsets into ``text``)."""
        if length is None:
            length = len(text) - start
        out: list[Segment] = []
        while length > 0:
            use = self._cut_length(text, start, length)
            out.extend(self._extract_window(text, start, use))
            start += use
            length -= use
        return out

    # -- window cutting (setInput, :414-470) -----------------------------

    def _cut_length(self, text: str, start: int, length: int) -> int:
        if length <= self.tabular_size:
            return length
        # prefer a symbol boundary between non-alphanumeric chars (& keeps
        # 존슨&존슨 together)
        tp = pp = None
        cut = length
        for inx in range(start + length, start, -1):
            ppt, pt = pp, tp
            tp = _ctype(text[inx - 1])
            if (
                ppt is not None
                and ppt not in ("ALPHA", "NUMBER")
                and inx < len(text)
                and pt == "SYMBOL"
                and text[inx] != "&"
            ) or (
                ppt is not None
                and inx < len(text)
                and pt == "SYMBOL"
                and text[inx] != "&"
                and tp not in ("ALPHA", "NUMBER")
            ):
                if inx - start <= self.tabular_size:
                    return inx - start
            pp = pt  # shift the lookahead window (pp = ppt was a no-op
            # that left ppt None forever, disabling this whole branch —
            # every long name got the hard tabular_size cut, splitting
            # dictionary words mid-window)
        # fall back: first ascii/non-ascii class flip from the left
        t = None
        cut = length
        for inx in range(start, start + length):
            pt = t
            t = _ctype(text[inx])
            asc = t in ("ALPHA", "NUMBER", "SYMBOL")
            pasc = pt in ("ALPHA", "NUMBER", "SYMBOL") if pt else None
            if pt is not None and asc != pasc:
                cut = inx - start
                break  # FIRST flip, per the contract above
        if cut <= self.tabular_size and cut > 0:
            return cut
        return self.tabular_size

    # -- DP ---------------------------------------------------------------

    def _extract_window(self, text: str, offset: int, length: int) -> list[Segment]:
        whole = text[offset : offset + length]
        # fast paths (doSegment :86-106)
        if length == 1:
            tags = self.dict.find(whole)
            if tags:
                return [Segment(offset, length, tags[0])]
            if _is_digit(whole):
                return [Segment(offset, length, TAG_DIGIT)]
            if _is_symbol(whole):
                return [Segment(offset, length, TAG_SYMBOL)]
            return [Segment(offset, length, TAG_UNK)]
        tags = self.dict.find(whole)
        if tags:
            return [Segment(offset, length, tags[0])]

        # tabular[row][column]: candidates for substring ending at char
        # `row` (inclusive) of length `column`
        tabular: list[list[list[TagProb] | None]] = [
            [None] * (row + 2) for row in range(length)
        ]
        status = [0] * length
        is_unicode = any(ord(c) > 127 for c in whole)

        exact: list[Segment] | None = None
        for row in range(length - 1, -1, -1):
            for column in range(row + 1, 0, -1):
                s = whole[row - column + 1 : row + 1]
                if _is_digit(s):
                    tabular[row][column] = [TAG_DIGIT]
                    status[row] += 1
                    continue
                if _is_symbol(s):
                    tabular[row][column] = [TAG_SYMBOL]
                    status[row] += 1
                    continue
                alpha = _is_alpha(s)
                if alpha and column == 1:
                    tabular[row][column] = [TAG_ALPHA]
                    continue  # not counted as a discovery (:121-126)
                tag_list = self.dict.find(s)
                if tag_list is not None:
                    if column == length:
                        return [Segment(offset, length, tag_list[0])]
                    tabular[row][column] = list(tag_list)
                    status[row] += 1
                elif alpha:
                    tabular[row][column] = [TAG_ALPHA]
                if column < 3 and s in JOSA_SET:
                    cell = tabular[row][column]
                    tabular[row][column] = [TAG_JOSA] + (cell or [])
                    status[row] += 1

        best = self._make_result(whole, tabular, status, length, is_unicode)
        if best is None:
            return [Segment(offset, length, TAG_UNK)]
        return [
            Segment(offset + p.row - p.column + 1, p.column, p.tag_prob)
            for p in best.entries()
        ]

    def _make_result(self, whole, tabular, status, length, is_unicode) -> _Path | None:
        head_row = -1
        for row in range(length - 1, -1, -1):
            if status[row] > 0:
                head_row = row
                break
        if head_row == -1:
            return None

        self._queue: list[tuple[float, int, _Path]] = []
        self._result: list[_Path] = []
        self._fast_found = False
        self._tick = 0
        self._len = length

        try:
            if head_row < length - 1:
                tail = _Path(length - 1, length - 1 - head_row, TAG_UNK, None, TAG_UNK.prob)
                self._connect_all(whole, tabular, status, head_row, tail, is_unicode)
            else:
                self._connect_all(whole, tabular, status, head_row, None, is_unicode)
            while self._queue:
                _, _, tail = heapq.heappop(self._queue)
                connect_row = tail.row - tail.column
                if status[connect_row] > 0:
                    self._connect_all(whole, tabular, status, connect_row, tail, is_unicode)
                # else: dead end, drop (matches reference :258-262)
        except _AnalyzeExceed:
            pass

        best = None
        for path in self._result:
            p = self._final_check(path)
            if p is None:
                continue
            if best is None or p.score > best.score:
                best = p
        return best

    def _connect_all(self, whole, tabular, status, head_row, tail, is_unicode):
        found = 0
        for head_col in range(head_row + 1, 0, -1):
            cell = tabular[head_row][head_col]
            if cell is not None:
                if cell[0].tag is not PosTag.ALPHA or any(
                    t.tag is not PosTag.ALPHA for t in cell
                ):
                    self._connect(whole, tabular, cell, head_row, head_col, tail)
                    found += 1
            if found >= status[head_row]:
                break
        if not is_unicode:
            # ASCII-only inputs: a path ending in UNK is not an analysis
            self._result = [
                p for p in self._result if p.last().tag_prob.tag is not PosTag.UNK
            ]

    def _connect(self, whole, tabular, tag_list, head_row, head_col, tail):
        if tail is None:
            for tp in tag_list:
                if tp.tag is PosTag.ALPHA:
                    continue
                head = _Path(head_row, head_col, tp, None, tp.prob)
                if head.row - head.column < 0:
                    self._add_result(head)
                else:
                    self._add_queue(head)
            return
        for tp in tag_list:
            if tp.tag is PosTag.ALPHA:
                continue
            if not self._connectable(whole, tabular, tp, head_row, head_col, tail):
                continue
            new_tail = _Path(head_row, head_col, tp, tail, tp.prob + tail.score)
            if new_tail.row - new_tail.column < 0:
                self._add_result(new_tail)
            else:
                self._add_queue(new_tail)

    def _connectable(self, whole, tabular, head_tp, head_row, head_col, tail) -> bool:
        """Connection grammar (A14, ``:565-602``)."""
        ht, tt = head_tp.tag, tail.tag_prob.tag
        if ht is PosTag.DIGIT and tt is PosTag.DIGIT:
            return False
        if ht is PosTag.ALPHA and tt is PosTag.ALPHA:
            return False
        if ht is PosTag.SYMBOL and tt is PosTag.SYMBOL:
            return False
        if ht not in (PosTag.ALPHA, PosTag.DIGIT, PosTag.SYMBOL):
            if tt is PosTag.J and tail.column == 1:
                ch = whole[tail.row - tail.column + 1]
                prev = whole[head_row]
                if ch in "은이을과" and not has_jongseong(prev):
                    return False
                if ch in "는가를와" and has_jongseong(prev):
                    return False
        if (
            head_col == 1
            and tail.column == 1
            and head_tp.tag is not PosTag.J
            and tail.tag_prob.tag is not PosTag.J
        ):
            if (
                tail.column + head_col <= tail.row + 1
                and tabular[tail.row][tail.column + head_col] is not None
            ):
                return False  # the combined word exists — drop the split
        return True

    def _add_queue(self, path: _Path) -> None:
        if self._fast_found:
            return
        self._tick += 1
        heapq.heappush(self._queue, (-path.score, self._tick, path))
        if len(self._queue) >= QUEUE_MAX:
            raise _AnalyzeExceed()

    def _add_result(self, path: _Path) -> None:
        if self._final_check(path) is None:
            return
        self._result.append(path)
        if self.fast_result_option and self._len > 6:
            self._fast_found = True
            self._queue.clear()
        if len(self._result) >= RESULT_MAX:
            best = None
            for p in self._result:
                q = self._final_check(p)
                if q is not None and (best is None or q.score > best.score):
                    best = q
            self._result = [best] if best is not None else []

    @staticmethod
    def _final_check(path: _Path) -> _Path | None:
        """``finalCheck`` (:612-641): drop leading josa; all-single-char
        chains survive only when ending in josa."""
        if path.tag_prob.tag is PosTag.J:
            return None
        entries = list(path.entries())
        if len(entries) >= 2:
            count = 0
            for e in entries:
                if e.column > 1:
                    break
                count += 1
            if count == len(entries):
                if entries[-1].tag_prob.tag is PosTag.J:
                    return path
                return None
        return path


def _ctype(ch: str) -> str:
    from ..char_class import classify_char

    return classify_char(ch).value
