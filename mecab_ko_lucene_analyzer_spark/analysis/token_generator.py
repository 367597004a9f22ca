"""Lattice-nodes → eojeol token stream (``TokenGenerator.java:30-132``).

The lattice node is the only upstream IR: ``(surface, feature_csv,
space_len[, posid])``. Real mecab, the bundled mini-segmenter, and the
mocked test fixtures all produce the same node shape, so the generator
is provider-agnostic (mirrors the reference's two-tier test split).
"""

from __future__ import annotations

from dataclasses import dataclass

from .appenders import Eojeol, PosAppender, split_expression
from .pos import NO_DECOMPOUND, Pos, PosId

__all__ = ["LatticeNode", "TokenGenerator", "parse_mock_nodes", "NO_DECOMPOUND"]


@dataclass(frozen=True)
class LatticeNode:
    """One morpheme-lattice node. ``space_len`` is the preceding
    whitespace run (mecab's ``rlength - length``); ``posid`` overrides
    feature-derived POS classification when the dictionary provides a
    numeric posid."""

    surface: str
    feature: str
    space_len: int = 0
    posid: int | None = None


def parse_mock_nodes(pos_strings: list[str]) -> list[LatticeNode]:
    """Parse ``"surface\\tfeatureCSV"`` strings into lattice nodes —
    the reference's dictionary-independent test input format
    (``TokenGeneratorTestCase.mockNodeFactory``,
    ``TokenGeneratorTestCase.java:44-60``): a leading space on the
    surface encodes inter-word whitespace."""
    nodes = []
    for s in pos_strings:
        raw_surface, _, feature = s.partition("\t")
        surface = raw_surface.strip()
        nodes.append(
            LatticeNode(
                surface=surface,
                feature=feature.strip(),
                space_len=len(raw_surface) - len(surface),
            )
        )
    return nodes


def nodes_to_pos_list(nodes: list[LatticeNode]) -> list[Pos]:
    """Offset accumulation + PREANALYSIS splitting
    (``TokenGenerator.java:55-68``)."""
    pos_list: list[Pos] = []
    prev_end = 0
    for node in nodes:
        cur = Pos.from_node(
            node.surface, node.feature, node.space_len, prev_end, node.posid
        )
        if cur.pos_id == PosId.PREANALYSIS:
            pos_list.extend(split_expression(cur))
        else:
            pos_list.append(cur)
        prev_end = cur.end_offset
    return pos_list


class TokenGenerator:
    """Pull-based eojeol token generator (``TokenGenerator.java:115-131``).

    ``next_eojeol_tokens()`` returns the next eojeol's token list, or
    ``None`` when exhausted — same contract as the reference, which the
    golden tests assert against.
    """

    def __init__(
        self,
        appender: PosAppender,
        compound_noun_min_length: int,
        nodes: list[LatticeNode],
    ):
        self.appender = appender
        self.compound_noun_min_length = compound_noun_min_length
        self._pos_list = nodes_to_pos_list(nodes)
        self._idx = 0

    def next_eojeol_tokens(self) -> list[Pos] | None:
        eojeol = Eojeol(self.appender, self.compound_noun_min_length)
        while self._idx < len(self._pos_list):
            cur = self._pos_list[self._idx]
            self._idx += 1
            if not eojeol.append(cur):
                self._idx -= 1
                tokens = eojeol.generate_tokens()
                if tokens is not None:
                    return tokens
                eojeol.clear()
        return eojeol.generate_tokens()

    def all_tokens(self) -> list[Pos]:
        """Flatten every eojeol into one token list."""
        out: list[Pos] = []
        while (tokens := self.next_eojeol_tokens()) is not None:
            out.extend(tokens)
        return out
