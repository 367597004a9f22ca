from .pos import NO_DECOMPOUND, Pos, PosId
from .appenders import (
    KeywordSearchPosAppender,
    SimilarityMeasurePosAppender,
    StandardPosAppender,
    TokenizerOption,
)
from .token_generator import LatticeNode, TokenGenerator, parse_mock_nodes

__all__ = [
    "NO_DECOMPOUND",
    "Pos",
    "PosId",
    "KeywordSearchPosAppender",
    "SimilarityMeasurePosAppender",
    "StandardPosAppender",
    "TokenizerOption",
    "LatticeNode",
    "TokenGenerator",
    "parse_mock_nodes",
]
