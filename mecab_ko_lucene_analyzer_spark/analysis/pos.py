"""Morpheme/token record (``Pos``) and POS-tag id space.

Re-expresses the reference data model (``Pos.java:26-261``,
``PosIdManager.java:27-113`` of danawalab/mecab-ko-lucene-analyzer) as a
plain-Python value object used *inside* the vectorized analyzer UDF.
Nothing here touches Spark: one analyzed document is a list of ``Pos``
records that the UDF flattens into an ``array<struct>`` column.

mecab-ko-dic feature CSV layout (8 fields, ``Pos.java:47-55``)::

    POS,semanticClass,hasJongseong,reading,type,startPos,endPos,expression
"""

from __future__ import annotations

from enum import IntEnum

__all__ = ["PosId", "Pos", "NO_DECOMPOUND", "DEFAULT_COMPOUND_NOUN_MIN_LENGTH"]

#: sentinel: never decompose compound nouns (``TokenGenerator.java:31``)
NO_DECOMPOUND = 9999
DEFAULT_COMPOUND_NOUN_MIN_LENGTH = 3


class PosId(IntEnum):
    """POS-tag ids, numerically identical to ``PosIdManager.PosId``.

    The numeric values matter: range predicates like "is a noun"
    (``NNG <= x <= NR``) and "is a trailing symbol" (``SP <= x <= SE``)
    use them (``PosIdManager.java:110-112``).
    """

    UNKNOWN = 0
    COMPOUND = 1
    INFLECT = 2
    PREANALYSIS = 3
    E = 100
    IC = 110
    J = 120
    MAG = 130
    MAJ = 131
    MM = 140
    NNG = 150
    NNP = 151
    NNB = 152
    NNBC = 153
    NP = 154
    NR = 155
    SF = 160
    SH = 161
    SL = 162
    SN = 163
    SP = 164
    SSC = 165
    SSO = 166
    SC = 167
    SY = 168
    SE = 169
    VA = 170
    VCN = 171
    VCP = 172
    VV = 173
    VX = 174
    XPN = 181
    XR = 182
    XSA = 183
    XSN = 184
    XSV = 185
    EOJEOL = 900

    def in_range(self, start: "PosId", end: "PosId") -> bool:
        return start.value <= self.value <= end.value

    @classmethod
    def from_num(cls, num: int) -> "PosId":
        try:
            return cls(num)
        except ValueError:
            # mecab-ko-dic inflect ids live in [200, 300)
            if 200 <= num < 300:
                return cls.INFLECT
            return cls.UNKNOWN

    @classmethod
    def from_tag(cls, tag: str) -> "PosId":
        """Tag string -> PosId with the reference's grouping rules:
        every ``J*`` (josa) collapses to ``J``; every ``E*`` except a
        (hypothetical) ``EJ*`` collapses to ``E``; a bare ``"E"`` is
        UNKNOWN because the reference indexes char 1 unconditionally
        (``PosIdManager.java:95-108``).
        """
        tag = tag.upper()
        if not tag:
            return cls.UNKNOWN
        if tag[0] == "J":
            return cls.J
        if tag[0] == "E":
            if len(tag) < 2:
                return cls.UNKNOWN
            if tag[1] != "J":
                return cls.E
        try:
            return cls[tag]
        except KeyError:
            return cls.UNKNOWN


def _semantic_class(field: str) -> str | None:
    return None if field == "*" else field


class Pos:
    """One morpheme with position metadata (``Pos.java``).

    Mutable on purpose: the appender algorithms adjust
    ``position_incr``/``position_length`` in place, and identity
    comparisons (``is``) mirror the reference's reference-equality
    checks (``StandardPosAppender.java:253``).
    """

    __slots__ = (
        "surface",
        "pos_id",
        "start_pos_id",
        "end_pos_id",
        "pos",
        "semantic_class",
        "start_offset",
        "position_incr",
        "position_length",
        "expression",
        "space_len",
        "is_node",
    )

    def __init__(
        self,
        surface: str,
        pos_id: PosId,
        start_offset: int,
        position_incr: int,
        position_length: int,
    ):
        self.surface = surface
        self.pos_id = pos_id
        self.start_pos_id = pos_id
        self.end_pos_id = pos_id
        self.pos: str | None = None
        self.semantic_class: str | None = None
        self.start_offset = start_offset
        self.position_incr = position_incr
        self.position_length = position_length
        self.expression: str | None = None
        self.space_len = 0
        self.is_node = False

    # -- constructors -------------------------------------------------

    @classmethod
    def from_node(
        cls,
        surface: str,
        feature: str,
        space_len: int,
        prev_end_offset: int,
        posid_num: int | None = None,
    ) -> "Pos":
        """Build from a lattice node (``Pos.java:79-87,112-134``).

        ``space_len`` is the whitespace run preceding the surface
        (mecab's ``rlength - length``). ``posid_num`` is the dictionary
        posid when known; otherwise it is derived from the feature CSV
        the same way the reference's mock factory does
        (``TokenGeneratorTestCase.java:73-86``).
        """
        fields = feature.split(",")
        if posid_num is None:
            ftype = fields[4] if len(fields) > 4 else "*"
            if ftype == "Compound":
                pos_id = PosId.COMPOUND
            elif ftype == "Inflect":
                pos_id = PosId.INFLECT
            elif ftype == "Preanalysis":
                pos_id = PosId.PREANALYSIS
            else:
                pos_id = PosId.from_tag(fields[0])
        else:
            pos_id = PosId.from_num(posid_num)

        p = cls(surface, pos_id, prev_end_offset + space_len, 1, 1)
        p.is_node = True
        p.space_len = space_len
        p.pos = fields[0]
        p.semantic_class = _semantic_class(fields[1]) if len(fields) > 1 else None
        if pos_id in (PosId.INFLECT, PosId.PREANALYSIS):
            p.start_pos_id = PosId.from_tag(fields[5])
            p.end_pos_id = PosId.from_tag(fields[6])
            p.expression = fields[7] if len(fields) > 7 else None
        elif pos_id == PosId.COMPOUND:
            p.start_pos_id = PosId.NNG
            p.end_pos_id = PosId.NNG
            expr = fields[7] if len(fields) > 7 else None
            p.expression = expr
            if expr is not None:
                p.position_length = len(expr.split("+"))
        return p

    @classmethod
    def from_expression(cls, expression: str, start_offset: int) -> "Pos":
        """Build from an index-expression part ``surface/TAG/semclass``
        (``Pos.java:95-110``)."""
        parts = expression.split("/")
        if len(parts) < 3:
            raise ValueError("Use mecab-ko-dic 2.0.0 or higher.")
        p = cls(parts[0], PosId.from_tag(parts[1]), start_offset, 1, 1)
        p.pos = parts[1]
        p.semantic_class = _semantic_class(parts[2])
        return p

    # -- derived ------------------------------------------------------

    @property
    def end_offset(self) -> int:
        return self.start_offset + len(self.surface)

    @property
    def surface_length(self) -> int:
        return len(self.surface)

    def has_space(self) -> bool:
        return self.space_len > 0

    def clone_shifted(self, shift: int) -> "Pos":
        """Copy with offsets moved by ``shift`` — cached chunk tokens
        are relocated per occurrence (tokenizer eojeol cache). Runs
        once per token OCCURRENCE on the analysis hot path, so it
        bypasses ``__init__`` (which would double-set half the slots)
        and fills every slot exactly once."""
        p = Pos.__new__(Pos)
        p.surface = self.surface
        p.pos_id = self.pos_id
        p.start_pos_id = self.start_pos_id
        p.end_pos_id = self.end_pos_id
        p.pos = self.pos
        p.semantic_class = self.semantic_class
        p.start_offset = self.start_offset + shift
        p.position_incr = self.position_incr
        p.position_length = self.position_length
        p.expression = self.expression
        p.space_len = self.space_len
        p.is_node = self.is_node
        return p

    def equals_offset(self, other: "Pos") -> bool:
        return (
            self.start_offset == other.start_offset
            and self.end_offset == other.end_offset
        )

    def is_pos_id(self, pos_id: PosId) -> bool:
        return self.pos_id == pos_id

    def token_string(self) -> str:
        """Index term: verbs/adjectives carry their tag (``Pos.java:173-181``)."""
        if self.pos_id in (PosId.VV, PosId.VA):
            return f"{self.surface}/{self.pos_id.name}"
        return self.surface

    def append(self, other: "Pos", pos_id: PosId, position_incr: int) -> "Pos":
        """Concatenate two Pos into a new one (``Pos.java:141-146``)."""
        return Pos(
            self.surface + other.surface,
            pos_id,
            self.start_offset,
            position_incr,
            self.position_length + other.position_length,
        )

    def __repr__(self) -> str:  # matches ``Pos.java:248-256`` golden format
        sem = self.semantic_class if self.semantic_class is not None else "null"
        return (
            f"{self.surface}/{self.pos_id.name}/{sem}/"
            f"{self.position_incr}/{self.position_length}/"
            f"{self.start_offset}/{self.end_offset}"
        )
