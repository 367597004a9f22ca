"""Document → token stream: the MeCabKoTokenizer equivalent.

``MeCabKoTokenizer.java:95-179``: slurp + lowercase, JNI lattice parse,
TokenGenerator drain, per-token attributes. Here the lattice provider
is pluggable: real mecab (mecab-python3) when importable — the
per-executor model singleton mirrors ``MeCabLoader.java:43-65`` — else
a deterministic dictionary segmenter over the pinned mini-dict.
Everything downstream of the node list is provider-independent.
"""

from __future__ import annotations

from .appenders import (
    KeywordSearchPosAppender,
    PosAppender,
    SimilarityMeasurePosAppender,
    StandardPosAppender,
    TokenizerOption,
)
from .char_class import CharClass, split_runs
from .mini_dict import stem_dict, suffix_dict
from .pos import NO_DECOMPOUND, Pos
from .token_generator import LatticeNode, TokenGenerator

__all__ = [
    "DictionaryLatticeProvider",
    "get_lattice_provider",
    "make_appender",
    "tokenize",
    "token_records",
]

_PROVIDER_GENERATION = __import__("itertools").count()

_SYMBOL_FEATURES = {
    ".": "SF,*,*,*,*,*,*,*",
    "!": "SF,*,*,*,*,*,*,*",
    "?": "SF,*,*,*,*,*,*,*",
    ",": "SC,*,*,*,*,*,*,*",
    "(": "SSO,*,*,*,*,*,*,*",
    ")": "SSC,*,*,*,*,*,*,*",
}


class DictionaryLatticeProvider:
    """Viterbi lattice segmenter over the pinned mini-dictionary.

    Stands in for mecab's native Viterbi (A1) when the engine is absent:
    char-class runs (A11) are mapped to SL/SN/symbol nodes; a hangul run
    goes through the min-cost lattice DP (:mod:`.viterbi` — word costs +
    POS-class connection matrix, the same shape MeCab computes through
    JNI). Round 1's greedy longest-match stranded remainders
    (stem + UNKNOWN) where a full parse existed; the DP recovers them.
    """

    #: this lattice never looks across whitespace, so the full-chain
    #: per-eojeol cache in :func:`tokenize` is sound for it
    supports_chunk_cache = True

    def __init__(
        self,
        stems: dict[str, str | list[str]] | None = None,
        suffixes: dict[str, str | list[str]] | None = None,
    ):
        from functools import lru_cache

        from .viterbi import ViterbiSegmenter

        # distinct dictionaries ⇒ distinct module-cache namespaces: the
        # token goes into every chunk-cache key so two providers in one
        # process (custom dicts, post-recompile hot reload) never read
        # each other's cached token streams
        self.cache_token = next(_PROVIDER_GENERATION)
        self.stems = stems if stems is not None else stem_dict()
        self.suffixes = suffixes if suffixes is not None else suffix_dict()
        self._segmenter = ViterbiSegmenter({**self.stems, **self.suffixes})
        # eojeol runs are Zipfian — memoizing the DP per surface string
        # turns the common case into a dict hit (the same trick mecab
        # gets from its trie-cached lattice); results are read-only
        self._segment_cached = lru_cache(maxsize=65536)(self._segmenter.segment)

    def parse(self, text: str) -> list[LatticeNode]:
        nodes: list[LatticeNode] = []
        for run, cls, space in split_runs(text):
            first_space = space
            if cls is CharClass.HANGUL:
                for k, (surf, feat) in enumerate(self._segment_hangul(run)):
                    nodes.append(LatticeNode(surf, feat, first_space if k == 0 else 0))
            elif cls is CharClass.ALPHA:
                nodes.append(LatticeNode(run, "SL,*,*,*,*,*,*,*", first_space))
            elif cls is CharClass.NUMBER:
                nodes.append(LatticeNode(run, "SN,*,*,*,*,*,*,*", first_space))
            elif cls in (CharClass.JAPANESE, CharClass.CHINESE):
                nodes.append(LatticeNode(run, "SH,*,*,*,*,*,*,*", first_space))
            else:  # SYMBOL / JAMO: char-by-char, punctuation classified
                for k, ch in enumerate(run):
                    feat = _SYMBOL_FEATURES.get(ch, "SY,*,*,*,*,*,*,*")
                    nodes.append(LatticeNode(ch, feat, first_space if k == 0 else 0))
        return nodes

    def _segment_hangul(self, run: str) -> list[tuple[str, str]]:
        return self._segment_cached(run)


_PROVIDER = None


def get_lattice_provider():
    """Per-process provider singleton — the MeCabLoader pattern
    (``MeCabLoader.java:43-65``): one model per executor process,
    lazily created, reused across Arrow batches."""
    global _PROVIDER
    if _PROVIDER is None:
        try:  # pragma: no cover - exercised only where mecab exists
            import MeCab  # type: ignore

            class _MeCabProvider:
                def __init__(self) -> None:
                    self._tagger = MeCab.Tagger()

                def parse(self, text: str) -> list[LatticeNode]:
                    nodes = []
                    node = self._tagger.parseToNode(text)
                    while node is not None:
                        if node.stat not in (2, 3):  # BOS/EOS
                            nodes.append(
                                LatticeNode(
                                    node.surface,
                                    node.feature,
                                    node.rlength - node.length,
                                    node.posid,
                                )
                            )
                        node = node.next
                    return nodes

            _PROVIDER = _MeCabProvider()
        except ImportError:
            _PROVIDER = DictionaryLatticeProvider()
    return _PROVIDER


_APPENDERS = {
    "standard": StandardPosAppender,
    "keyword": KeywordSearchPosAppender,
    "similarity": SimilarityMeasurePosAppender,
}


def make_appender(mode: str, option: TokenizerOption | None = None) -> PosAppender:
    """The three factory presets (``StandardTokenizerFactory.java:42-51``,
    ``KeywordSearchTokenizerFactory.java:40-54``,
    ``SimilarityMeasureTokenizerFactory.java:40-54``)."""
    return _APPENDERS[mode](option or TokenizerOption())


def _lower_offsetsafe(text: str) -> str:
    """Lowercase WITHOUT changing the string length, so every token's
    start/end offset stays valid against the original document.
    ``str.lower()`` is not length-preserving ('İ'.lower() is two code
    points), which would shift every later offset. The fast path is the
    plain C-speed lower(); only texts containing a length-changing
    mapping (vanishingly rare in web text) pay the per-char pass, where
    such chars are kept as-is."""
    lowered = text.lower()
    if len(lowered) == len(text):
        return lowered
    return "".join(
        low if len(low := ch.lower()) == 1 else ch for ch in text
    )


_CHUNK_RE = __import__("re").compile(r"\S+")
_CHUNK_CACHE: dict[tuple, list[Pos]] = {}
_CHUNK_CACHE_MAX = 131072


def _provider_cache_token(provider) -> int | None:
    """Process-unique token namespacing a provider's entries in the
    chunk/stream caches. ``id(provider)`` is NOT usable as a fallback:
    CPython recycles addresses after GC, so a new provider allocated at
    a freed provider's address would read the dead provider's cached
    token streams. Custom cache-capable providers without a
    ``cache_token`` get one assigned on first use; if the attribute is
    unsettable (slots/frozen), returns None — caching is disabled for
    that provider (a fresh per-call token would WRITE unreachable
    entries, repeatedly filling and bulk-clearing the shared cache and
    wiping other providers' warm entries)."""
    tok = getattr(provider, "cache_token", None)
    if tok is None:
        tok = next(_PROVIDER_GENERATION)
        try:
            provider.cache_token = tok
        except Exception:
            return None
    return tok


def tokenize(
    text: str,
    mode: str = "standard",
    compound_noun_min_length: int = 3,
    option: TokenizerOption | None = None,
    provider=None,
) -> list[Pos]:
    """Full tokenizer chain: lowercase (S1, ``MeCabKoTokenizer.java:178``)
    → lattice parse → eojeol token generation. Returns the flat Pos list.

    For providers that declare ``supports_chunk_cache`` (the bundled
    dictionary provider; real mecab does NOT, its lattice may look
    across whitespace), the whole chain is memoized per whitespace
    chunk: eojeols never span whitespace in the standard chain (the
    appenders break on ``has_space()``), so a chunk's token stream is
    context-free and relocatable — cached once, offset-shifted per
    occurrence. Web text is Zipfian in eojeols; this turns the steady
    state into a dict hit + clone per word.
    """
    provider = provider or get_lattice_provider()
    lowered = _lower_offsetsafe(text)
    ptok = (
        _provider_cache_token(provider)
        if getattr(provider, "supports_chunk_cache", False)
        else None
    )
    if ptok is None:
        nodes = provider.parse(lowered)
        gen = TokenGenerator(
            make_appender(mode, option), compound_noun_min_length, nodes
        )
        return gen.all_tokens()
    okey = (
        (option.compound_noun_min_length, option.use_adjective_and_verb_original_form)
        if option is not None
        else None
    )
    out: list[Pos] = []
    for m in _CHUNK_RE.finditer(lowered):
        chunk = m.group(0)
        key = (chunk, mode, compound_noun_min_length, okey, ptok)
        toks = _CHUNK_CACHE.get(key)
        if toks is None:
            nodes = provider.parse(chunk)
            toks = TokenGenerator(
                make_appender(mode, option), compound_noun_min_length, nodes
            ).all_tokens()
            if len(_CHUNK_CACHE) >= _CHUNK_CACHE_MAX:
                _CHUNK_CACHE.clear()  # bulk reset beats LRU bookkeeping here
            _CHUNK_CACHE[key] = toks
        shift = m.start()
        out.extend(p.clone_shifted(shift) for p in toks)
    return out


_INDEX_STREAM_CACHE: dict[tuple, tuple] = {}
_INDEX_STREAM_CACHE_MAX = 131072


def index_token_stream(
    text: str,
    mode: str = "standard",
    compound_noun_min_length: int = 3,
    provider=None,
) -> tuple[list[str], list[int]]:
    """(terms, position_increments) for the INDEXING hot path.

    ``tokenize`` returns full ``Pos`` objects (offsets, POS metadata) —
    posting construction needs only the term string and the position
    increment, so cloning 12-slot objects per token occurrence is pure
    allocator traffic (measured: the build becomes memory-bandwidth-
    bound at high core counts). This variant caches a FLAT
    ``(terms tuple, incrs tuple)`` per whitespace chunk and
    concatenates — no per-occurrence object creation at all.
    """
    provider = provider or get_lattice_provider()
    ptok = (
        _provider_cache_token(provider)
        if getattr(provider, "supports_chunk_cache", False)
        else None
    )
    if ptok is None:
        toks = tokenize(text, mode, compound_noun_min_length, provider=provider)
        return [p.token_string() for p in toks], [p.position_incr for p in toks]
    lowered = _lower_offsetsafe(text)
    terms: list[str] = []
    incrs: list[int] = []
    for m in _CHUNK_RE.finditer(lowered):
        chunk = m.group(0)
        key = (chunk, mode, compound_noun_min_length, ptok)
        entry = _INDEX_STREAM_CACHE.get(key)
        if entry is None:
            toks = tokenize(chunk, mode, compound_noun_min_length, provider=provider)
            entry = (
                tuple(p.token_string() for p in toks),
                tuple(p.position_incr for p in toks),
            )
            if len(_INDEX_STREAM_CACHE) >= _INDEX_STREAM_CACHE_MAX:
                _INDEX_STREAM_CACHE.clear()
            _INDEX_STREAM_CACHE[key] = entry
        terms.extend(entry[0])
        incrs.extend(entry[1])
    return terms, incrs


def token_records(
    text: str,
    mode: str = "standard",
    compound_noun_min_length: int = 3,
    option: TokenizerOption | None = None,
    provider=None,
) -> list[dict]:
    """Tokens as plain dicts with *absolute* positions — the running
    position-increment sum Lucene applies at index time (I2). This is
    the record shape the Arrow UDF emits."""
    out = []
    position = -1
    for p in tokenize(text, mode, compound_noun_min_length, option, provider):
        position += p.position_incr
        out.append(
            {
                "term": p.token_string(),
                "type": p.pos_id.name,
                "pos": p.pos,
                "semantic_class": p.semantic_class,
                "position": position,
                "pos_len": p.position_length,
                "start_offset": p.start_offset,
                "end_offset": p.end_offset,
            }
        )
    return out
