from .analyzer import ProductAnalyzerOption, ProductNameAnalyzer
from .extractor import KoreanWordExtractor, PosTag, TagProb, TagProbDictionary
from .parsing_rule import ProductDictionarySet, ProductNameParsingRule, RuleEntry

__all__ = [
    "ProductAnalyzerOption",
    "ProductNameAnalyzer",
    "KoreanWordExtractor",
    "PosTag",
    "TagProb",
    "TagProbDictionary",
    "ProductDictionarySet",
    "ProductNameParsingRule",
    "RuleEntry",
]
