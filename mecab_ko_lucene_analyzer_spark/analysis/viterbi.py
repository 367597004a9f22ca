"""Min-cost Viterbi lattice over the fallback dictionary (A1).

The reference delegates this to MeCab's native Viterbi through JNI
(``MeCabKoTokenizer.java:95-179`` via ``MeCabLoader.java:33``): every
dictionary morpheme spanning a position becomes a lattice node with a
word cost, adjacent nodes pay a connection cost keyed on (left POS,
right POS), and the emitted segmentation is the min-cost path. Round 1
shipped a greedy longest-match stand-in; this module is the real DP —
same shape as MeCab's (word costs + connection matrix + BOS/EOS), with
costs derived from POS class and surface length instead of a trained
corpus (mecab-ko-dic's learned weights are data we don't ship).

Where greedy and Viterbi differ: greedy commits to the longest stem and
strands the remainder (``마을회관`` → ``마을회`` + UNKNOWN ``관`` when
``마을회`` is in-vocabulary but ``관`` is not); the DP recovers the
full parse (``마을`` + ``회관``) because two known nodes cost less than
one known + one unknown.
"""

from __future__ import annotations

__all__ = ["ViterbiSegmenter", "pos_class"]

# ---------------------------------------------------------------------------
# cost model (lower = better; scaled like mecab's short-int costs)
# ---------------------------------------------------------------------------

UNKNOWN_CHAR_COST = 8000  # per stranded char: worse than any dict parse
_BOS_SUFFIX_COST = 10000  # josa/eomi cannot open an eojeol

#: (left class, right class) → connection cost. Classes: N(oun),
#: V(erb/adj stem), J(osa), E(omi/ending), U(nknown), B(OS).
_CONN: dict[tuple[str, str], int] = {
    ("N", "J"): -300,  # noun + particle: the canonical eojeol
    ("V", "E"): -300,  # stem + ending: the canonical predicate
    ("N", "N"): 200,   # compound-ish noun run: allowed, mildly penalized
    ("J", "N"): 100,   # new word after a particle
    ("E", "N"): 100,
    ("J", "J"): 0,     # particle chains (에서 + 도)
    ("E", "J"): 0,
    ("N", "E"): 400,   # copula-ish
    ("N", "V"): 300,
    ("V", "N"): 500,
    ("J", "V"): 300,
    ("E", "V"): 300,
    ("B", "J"): _BOS_SUFFIX_COST,
    ("B", "E"): _BOS_SUFFIX_COST,
}
_CONN_DEFAULT = 500  # any pairing with U, and unlisted pairs


def pos_class(feature: str) -> str:
    """Coarse connection class from the 8-field feature CSV."""
    tag = feature.split(",", 1)[0]
    if tag.startswith("J"):
        return "J"
    if tag.startswith("E") or tag.startswith("XS"):
        return "E"
    if tag.startswith("VCP"):
        return "E"  # copula attaches to a noun like an ending (소스+이다)
    if tag.startswith("V"):
        return "V"
    if tag == "UNKNOWN":
        return "U"
    return "N"


def _word_cost(surface: str, cls: str) -> int:
    if cls in ("J", "E"):
        # closed-class suffixes are high-frequency → cheap
        return max(300 - 50 * len(surface), 100)
    return max(1000 - 200 * len(surface), 100)


class ViterbiSegmenter:
    """Segment one hangul run into ``(surface, feature)`` morphemes by
    min-cost path; ties break toward the candidate tried first (dict
    entries longest-first, then unknown) — deterministic."""

    def __init__(self, entries: dict[str, str | list[str]]):
        #: surface → [(feature, class, word cost), ...] — a surface may
        #: be ambiguous (는 = JX topic particle OR ETM adnominal ending);
        #: the connection matrix picks the reading per context, exactly
        #: how MeCab disambiguates homographs in the native lattice
        self.entries: dict[str, list[tuple[str, str, int]]] = {}
        for s, fs in entries.items():
            feats = [fs] if isinstance(fs, str) else list(fs)
            self.entries[s] = [
                (f, pos_class(f), _word_cost(s, pos_class(f))) for f in feats
            ]
        self._max_len = max(map(len, entries), default=1)

    def segment(self, run: str) -> list[tuple[str, str]]:
        n = len(run)
        # best[i][cls] = (cost, back-pointer) for paths covering run[:i]
        # ending in class cls; back-pointer = (j, surface, feature, prev_cls)
        best: list[dict[str, tuple[int, tuple | None]]] = [
            {} for _ in range(n + 1)
        ]
        best[0]["B"] = (0, None)
        for i in range(n):
            if not best[i]:
                continue
            cands: list[tuple[str, str, str, int]] = []
            for ln in range(min(self._max_len, n - i), 0, -1):
                surf = run[i : i + ln]
                for hit in self.entries.get(surf, ()):
                    cands.append((surf, *hit))
            cands.append((run[i], "UNKNOWN,*,*,*,*,*,*,*", "U", UNKNOWN_CHAR_COST))
            for prev_cls, (pcost, _) in best[i].items():
                for surf, feat, cls, wcost in cands:
                    cost = pcost + wcost + _CONN.get((prev_cls, cls), _CONN_DEFAULT)
                    j = i + len(surf)
                    cur = best[j].get(cls)
                    if cur is None or cost < cur[0]:
                        best[j][cls] = (cost, (i, surf, feat, prev_cls))
        # EOS: min cost over classes at n (U disfavored implicitly by cost)
        end_cls = min(best[n], key=lambda c: (best[n][c][0], c))
        # walk back
        rev: list[tuple[str, str]] = []
        i, cls = n, end_cls
        while i > 0:
            _, bp = best[i][cls]
            assert bp is not None
            j, surf, feat, prev_cls = bp
            rev.append((surf, feat))
            i, cls = j, prev_cls
        out = rev[::-1]
        # merge adjacent unknown chars into maximal UNKNOWN runs (the
        # shape the downstream TokenGenerator expects)
        merged: list[tuple[str, str]] = []
        for surf, feat in out:
            if (
                merged
                and feat.startswith("UNKNOWN")
                and merged[-1][1].startswith("UNKNOWN")
            ):
                merged[-1] = (merged[-1][0] + surf, merged[-1][1])
            else:
                merged.append((surf, feat))
        return merged
