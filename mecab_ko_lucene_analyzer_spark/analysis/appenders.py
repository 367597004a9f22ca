"""Eojeol-joining rule tables and token-selection policies.

Re-expresses the three PosAppender policies of the reference
(``StandardPosAppender.java:32-355``, ``KeywordSearchPosAppender.java:29-130``,
``SimilarityMeasurePosAppender.java:29-121``) as data-driven Python.
The appendable tables are frozensets of ``(left_end, right_start)``
PosId pairs; token selection (decompounding, EOJEOL insertion, XPN
handling, verb-original-form) is implemented to be output-identical to
the reference's golden tests.
"""

from __future__ import annotations

from dataclasses import dataclass

from .pos import Pos, PosId

__all__ = [
    "TokenizerOption",
    "PosAppender",
    "StandardPosAppender",
    "KeywordSearchPosAppender",
    "SimilarityMeasurePosAppender",
    "INDEPENDENT_XPN",
]

_P = PosId

#: noun-prefix surfaces that stay independent tokens
#: (``util/XpnDiscriminator.java:24-65``)
INDEPENDENT_XPN = frozenset(
    "건 고 급 날 냉 대 맞 맨 맹 명 민 반 범 본 생 성 신 온 왕 원 재 주 참 총 친 탈 통 폐 풋 한 항 헛".split()
)

_NOUNS = (_P.NNG, _P.NNP, _P.NNB, _P.NNBC, _P.NP, _P.NR)


@dataclass
class TokenizerOption:
    """``TokenizerOption.java:21-31`` equivalent (mecab args excluded —
    the lattice provider is configured separately in Spark)."""

    compound_noun_min_length: int = 3
    use_adjective_and_verb_original_form: bool = True


def _pairs(*items: tuple[PosId, PosId]) -> frozenset[tuple[PosId, PosId]]:
    return frozenset(items)


#: ``StandardPosAppender.java:35-115``
STANDARD_APPENDABLE = _pairs(
    (_P.E, _P.E),
    (_P.XR, _P.E),
    (_P.VV, _P.E),
    (_P.VA, _P.E),
    (_P.VX, _P.E),
    (_P.VCP, _P.E),
    (_P.VCN, _P.E),
    (_P.XSV, _P.E),
    (_P.XSA, _P.E),
    # nominal | MAG | XR | UNKNOWN + verb-deriving suffix
    *((n, _P.XSV) for n in _NOUNS),
    (_P.COMPOUND, _P.XSV),
    (_P.MAG, _P.XSV),
    (_P.XR, _P.XSV),
    (_P.UNKNOWN, _P.XSV),
    # + adjective-deriving suffix
    *((n, _P.XSA) for n in _NOUNS),
    (_P.COMPOUND, _P.XSA),
    (_P.MAG, _P.XSA),
    (_P.XR, _P.XSA),
    (_P.UNKNOWN, _P.XSA),
    # nominal | XSN + copula
    *((n, _P.VCP) for n in _NOUNS),
    (_P.COMPOUND, _P.VCP),
    (_P.XSN, _P.VCP),
    (_P.UNKNOWN, _P.VCP),
    # nominal + josa
    *((n, _P.J) for n in _NOUNS),
    (_P.COMPOUND, _P.J),
    (_P.UNKNOWN, _P.J),
    # noun prefix + noun
    (_P.XPN, _P.NNG),
    (_P.XPN, _P.NR),
    (_P.XPN, _P.NP),
    (_P.XSN, _P.J),
    (_P.E, _P.J),
    (_P.MAG, _P.J),
    (_P.J, _P.J),
    (_P.SL, _P.J),
    (_P.SH, _P.J),
)

#: ``KeywordSearchPosAppender.java:32-64``
KEYWORD_APPENDABLE = _pairs(
    (_P.E, _P.E),
    (_P.VV, _P.E),
    (_P.VA, _P.E),
    (_P.VX, _P.E),
    *((n, _P.XSN) for n in _NOUNS),
    (_P.COMPOUND, _P.XSN),
    (_P.UNKNOWN, _P.XSN),
    *((_P.XPN, n) for n in _NOUNS),
    (_P.XPN, _P.COMPOUND),
    (_P.XPN, _P.UNKNOWN),
)

#: ``SimilarityMeasurePosAppender.java:32-65``
SIMILARITY_APPENDABLE = _pairs(
    *((_P.XPN, n) for n in _NOUNS),
    (_P.XPN, _P.COMPOUND),
    (_P.XPN, _P.UNKNOWN),
    *((n, _P.XSN) for n in _NOUNS),
    (_P.COMPOUND, _P.XSN),
    (_P.UNKNOWN, _P.XSN),
    (_P.SL, _P.SN),
    (_P.SL, _P.SY),
    (_P.SN, _P.SL),
    (_P.SN, _P.SY),
    (_P.SY, _P.SL),
    (_P.SY, _P.SN),
)


def split_expression(pos: Pos) -> list[Pos]:
    """Split an index-expression (``A/NNG/*+B/NNG/*``) into Pos parts
    with recomputed offsets (``TokenGenerator.getAnalyzedPoses``,
    ``TokenGenerator.java:77-109``). Single-part expressions return the
    original Pos unchanged."""
    expr = pos.expression
    if expr is None:
        return [pos]
    parts = expr.split("+")
    if len(parts) == 1:
        return [pos]
    out = [Pos.from_expression(p, 0) for p in parts]
    prev: Pos | None = None
    for cur in out:
        if prev is None:
            cur.start_offset = pos.start_offset
            prev = cur
        elif cur.position_incr == 0:
            cur.start_offset = prev.start_offset
        else:
            cur.start_offset = prev.end_offset
            prev = cur
    return out


class Eojeol:
    """Greedy word-phrase accumulator (``Eojeol.java:25-113``)."""

    __slots__ = ("appender", "compound_noun_min_length", "has_compound_noun", "pos_list", "term")

    def __init__(self, appender: "PosAppender", compound_noun_min_length: int):
        self.appender = appender
        self.compound_noun_min_length = compound_noun_min_length
        self.has_compound_noun = False
        self.pos_list: list[Pos] = []
        self.term = ""

    def append(self, pos: Pos) -> bool:
        if self.pos_list and not self.appender.is_appendable(self.pos_list[-1], pos):
            return False
        if (
            pos.is_pos_id(PosId.COMPOUND)
            and pos.surface_length >= self.compound_noun_min_length
        ):
            self.has_compound_noun = True
            self.pos_list.extend(split_expression(pos))
        else:
            self.pos_list.append(pos)
        self.term += pos.surface
        return True

    def generate_tokens(self) -> list[Pos] | None:
        if self.is_skippable():
            return None
        return self.appender.get_tokens(self)

    def is_skippable(self) -> bool:
        return not self.pos_list or (
            len(self.pos_list) == 1 and self.appender.is_skippable(self.pos_list[0])
        )

    @property
    def start_offset(self) -> int:
        return self.pos_list[0].start_offset

    def clear(self) -> None:
        self.pos_list.clear()
        self.term = ""


class PosAppender:
    """Base policy (``PosAppender.java:26-45``)."""

    appendable: frozenset[tuple[PosId, PosId]] = frozenset()

    def __init__(self, option: TokenizerOption | None = None):
        self.option = option or TokenizerOption()

    def is_appendable(self, left: Pos, right: Pos) -> bool:
        if right.is_node and right.has_space():
            return False
        return (left.end_pos_id, right.start_pos_id) in self.appendable

    def is_skippable(self, pos: Pos) -> bool:
        raise NotImplementedError

    def get_tokens(self, eojeol: Eojeol) -> list[Pos]:
        raise NotImplementedError


class StandardPosAppender(PosAppender):
    """Full-text indexing policy: decompound + EOJEOL + original-form
    (``StandardPosAppender.java:32-355``)."""

    appendable = STANDARD_APPENDABLE

    def is_skippable(self, pos: Pos) -> bool:
        # lone symbols produce no token (``StandardPosAppender.java:130-136``)
        return pos.pos_id == PosId.SF or pos.pos_id.in_range(PosId.SP, PosId.SE)

    # -- token selection ------------------------------------------------

    def get_tokens(self, eojeol: Eojeol) -> list[Pos]:
        self._preprocess_xpn(eojeol)
        output = self._additional_poses(eojeol)
        self._insert_eojeol_pos(eojeol, output)
        return output

    def _preprocess_xpn(self, eojeol: Eojeol) -> None:
        """Dependent prefix merges into the noun; independent prefix
        switches the eojeol to compound-noun handling
        (``StandardPosAppender.java:146-178``)."""
        if len(eojeol.pos_list) < 2:
            return
        first, second = eojeol.pos_list[0], eojeol.pos_list[1]
        if not first.is_pos_id(PosId.XPN) or second.pos_id not in (
            PosId.NNG,
            PosId.NR,
            PosId.NP,
        ):
            return
        if first.surface in INDEPENDENT_XPN:
            eojeol.has_compound_noun = True
        else:
            xpn = eojeol.pos_list.pop(0)
            noun = eojeol.pos_list.pop(0)
            merged = xpn.append(noun, PosId.NNG, 1)
            merged.position_length = 1
            eojeol.pos_list.insert(0, merged)

    def _additional_poses(self, eojeol: Eojeol) -> list[Pos]:
        """Decompound emission order / original-form extraction
        (``StandardPosAppender.java:180-226``)."""
        poses = eojeol.pos_list
        output: list[Pos] = []
        if eojeol.has_compound_noun:
            prev: Pos | None = None
            num_absolute = 0
            for pos in poses:
                if not self._is_absolute(pos):
                    break
                output.append(pos)
                num_absolute += 1
                if prev is None:
                    prev = pos
                    continue
                if self._both_single_length_noun(prev, pos):
                    prev = pos
                    continue
                compound = prev.append(pos, PosId.COMPOUND, 0)
                output.insert(len(output) - 1, compound)
                prev = pos
            if num_absolute >= 3:
                output.insert(1, self._whole_compound(poses))
            return output
        for pos in poses:
            if self._is_absolute(pos):
                pos.position_incr = 0
                output.append(pos)
            if pos.is_pos_id(PosId.INFLECT):
                first = self._extract_first_pos(pos)
                if (
                    first is not None
                    and self._is_absolute(first)
                    and first.surface_length <= pos.surface_length
                ):
                    output.append(first)
        return output

    @staticmethod
    def _both_single_length_noun(p1: Pos, p2: Pos) -> bool:
        return (
            p1.pos_id.in_range(PosId.NNG, PosId.NNP)
            and p1.surface_length == 1
            and p2.pos_id.in_range(PosId.NNG, PosId.NNP)
            and p2.surface_length == 1
        )

    def _whole_compound(self, poses: list[Pos]) -> Pos:
        whole = poses[0]
        for pos in poses[1:]:
            if not self._is_absolute(pos):
                break
            whole = whole.append(pos, PosId.COMPOUND, 0)
        return whole

    def _insert_eojeol_pos(self, eojeol: Eojeol, tokens: list[Pos]) -> None:
        """EOJEOL (whole-surface) token insertion
        (``StandardPosAppender.java:246-296``)."""
        pos_list = eojeol.pos_list
        if len(pos_list) == 1:
            if not tokens:
                tokens.append(pos_list[0])
            if tokens[0] is not pos_list[0]:
                tokens.insert(0, pos_list[0])
            tokens[0].position_incr = 1
            return
        if eojeol.has_compound_noun and tokens:
            position_length = sum(p.position_incr for p in tokens)
            eojeol_pos = Pos(
                eojeol.term, PosId.EOJEOL, eojeol.start_offset, 0, position_length
            )
            eojeol_pos.pos = self._concat_morphemes(pos_list)
            if len(tokens) < 2 or not eojeol_pos.equals_offset(tokens[1]):
                tokens.insert(1, eojeol_pos)
        else:
            eojeol_pos = Pos(eojeol.term, PosId.EOJEOL, eojeol.start_offset, 1, 1)
            eojeol_pos.pos = self._concat_morphemes(pos_list)
            tokens.insert(0, eojeol_pos)

    @staticmethod
    def _concat_morphemes(poses: list[Pos]) -> str:
        return "+".join(p.pos or "" for p in poses)

    def _is_absolute(self, pos: Pos) -> bool:
        """Stand-alone morphemes (``StandardPosAppender.java:298-333``)."""
        if pos.pos_id.in_range(PosId.NNG, PosId.NR) or pos.pos_id in (
            PosId.COMPOUND,
            PosId.MAG,
            PosId.MM,
            PosId.XR,
            PosId.SH,
            PosId.SL,
            PosId.SN,
            PosId.UNKNOWN,
            PosId.XPN,
            PosId.XSN,
        ):
            return True
        if self.option.use_adjective_and_verb_original_form:
            return pos.pos_id in (PosId.VA, PosId.VV)
        return False

    @staticmethod
    def _extract_first_pos(inflect_pos: Pos) -> Pos | None:
        """First morpheme of an INFLECT expression, emitted at the same
        position (``StandardPosAppender.java:341-354``)."""
        if not inflect_pos.is_pos_id(PosId.INFLECT) or inflect_pos.expression is None:
            return None
        first = inflect_pos.expression.split("+")[0]
        parts = first.split("/")
        if len(parts) != 3:
            return None
        return Pos(parts[0], PosId.from_tag(parts[1]), inflect_pos.start_offset, 0, 1)


class _WholeEojeolAppender(PosAppender):
    """Shared token selection of keyword/similarity policies: a
    multi-morpheme eojeol collapses to a single EOJEOL token
    (``KeywordSearchPosAppender.java:109-120``,
    ``SimilarityMeasurePosAppender.java:100-111``)."""

    def get_tokens(self, eojeol: Eojeol) -> list[Pos]:
        poses = eojeol.pos_list
        if len(poses) == 1:
            return [poses[0]]
        return [Pos(eojeol.term, PosId.EOJEOL, eojeol.start_offset, 1, 1)]


class KeywordSearchPosAppender(_WholeEojeolAppender):
    """Nominal/verbal keyword policy (``KeywordSearchPosAppender.java``)."""

    appendable = KEYWORD_APPENDABLE

    _KEEP = frozenset(
        {
            PosId.COMPOUND,
            PosId.NNG,
            PosId.NNP,
            PosId.NNB,
            PosId.NNBC,
            PosId.NP,
            PosId.NR,
            PosId.SL,
            PosId.SH,
            PosId.SN,
            PosId.XR,
        }
    )

    def is_appendable(self, left: Pos, right: Pos) -> bool:
        if right.is_node and right.has_space():
            return False
        if left.pos_id == PosId.INFLECT and left.start_pos_id not in (
            PosId.VA,
            PosId.VV,
        ):
            return False
        return (left.end_pos_id, right.start_pos_id) in self.appendable

    def is_skippable(self, pos: Pos) -> bool:
        if pos.pos_id in self._KEEP:
            return False
        if pos.pos_id == PosId.INFLECT:
            return pos.start_pos_id not in (PosId.VA, PosId.VV)
        return True


class SimilarityMeasurePosAppender(_WholeEojeolAppender):
    """Document-similarity policy (``SimilarityMeasurePosAppender.java``)."""

    appendable = SIMILARITY_APPENDABLE

    _KEEP = frozenset(
        {
            PosId.COMPOUND,
            PosId.SL,
            PosId.SH,
            PosId.SN,
            PosId.XR,
            PosId.NNG,
            PosId.NNP,
            PosId.NNBC,
            PosId.NR,
        }
    )

    def is_skippable(self, pos: Pos) -> bool:
        return pos.pos_id not in self._KEEP
