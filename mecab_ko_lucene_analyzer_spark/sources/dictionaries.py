"""Dictionary file loading + registry build + hot reload (S5/S6, Q11).

The reference loads per-type dictionaries from flat files / an ES index
into in-JVM structures with a YAML registry and REST-triggered reload
(``ProductNameDictionary.loadDictionary``, ``ProductNameDictionary.java:151-288``;
reload :294-342; compile-from-index + status upsert :348-497). Spark-
first equivalents:

* flat text files → :class:`ProductDictionarySet` (plain dicts/sets —
  broadcast variables at run time)
* "reload" = rebuild + new broadcast epoch: every job run re-reads the
  current files; executors never hold stale state past a job (the
  reference must POST to every node, Q11 — a broadcast reaches all
  executors for free)
* compile status → an append-only ``dict_status`` parquet (the
  ``.dsearch_dict_apply`` upsert equivalent), one row per dictionary
  with counts + content fingerprint for reproducibility (I6 lineage)

File formats (all UTF-8, ``#`` comments):
  user.txt      word [TAB prob(max|high|mid|p11|p12|low|min)]
  stop.txt      word
  unit.txt      unit
  synonym.txt   a,b,c            (two-way group; ``a=>b,c`` one-way)
  space.txt     word TAB part1 part2 ...
  compound.txt  word TAB comp1 comp2 ...
"""

from __future__ import annotations

import hashlib
import os
from datetime import datetime, timezone

from ..analysis.dictionary import SetDictionary, SynonymDictionary
from ..analysis.product.extractor import PosTag, TagProb, TagProbDictionary
from ..analysis.product.parsing_rule import ProductDictionarySet

__all__ = [
    "load_dictionary_set",
    "write_dict_status",
    "compile_dictionaries",
    "restore_dictionaries",
]

_PROB = {
    "max": TagProb.MAX_PROB,
    "high": TagProb.HIGH_PROB,
    "p11": TagProb.P11_PROB,
    "p12": TagProb.P12_PROB,
    "mid": TagProb.MID_PROB,
    "low": TagProb.LOW_PROB,
    "min": TagProb.MIN_PROB,
}


def _lines(path: str) -> list[str]:
    if not os.path.exists(path):
        return []
    with open(path, encoding="utf-8") as f:
        return [
            ln.strip()
            for ln in f
            if ln.strip() and not ln.lstrip().startswith("#")
        ]


def _load_tag_prob(path: str) -> TagProbDictionary:
    entries: dict[str, list[TagProb]] = {}
    for ln in _lines(path):
        parts = ln.split("\t")
        word = parts[0]
        prob = _PROB.get(parts[1].lower(), TagProb.HIGH_PROB) if len(parts) > 1 else TagProb.HIGH_PROB
        # one-char nouns get demoted at load (``TagProbDictionary.java:135-145``)
        if len(word) == 1:
            prob = min(prob, TagProb.MID_PROB)
        entries.setdefault(word, []).append(TagProb(PosTag.N, prob))
    return TagProbDictionary(entries)


def _load_synonym(path: str) -> SynonymDictionary:
    one_way: list[list[str]] = []
    two_way: list[list[str]] = []
    for ln in _lines(path):
        if "=>" in ln:
            head, tail = ln.split("=>", 1)
            one_way.append([head.strip()] + [w.strip() for w in tail.split(",") if w.strip()])
        else:
            two_way.append([w.strip() for w in ln.split(",") if w.strip()])
    merged = SynonymDictionary.from_groups(two_way, two_way=True)
    for grp in one_way:
        head, *tail = grp
        merged.mapping.setdefault(head, [])
        for t in tail:
            if t not in merged.mapping[head]:
                merged.mapping[head].append(t)
    return merged


def _load_map(path: str) -> dict[str, list[str]]:
    out = {}
    for ln in _lines(path):
        parts = ln.split("\t")
        if len(parts) >= 2:
            out[parts[0]] = parts[1].split()
    return out


def load_dictionary_set(base_dir: str) -> ProductDictionarySet:
    """Load every dictionary file present under ``base_dir``."""
    return ProductDictionarySet(
        tag_prob=_load_tag_prob(os.path.join(base_dir, "user.txt")),
        user=SetDictionary.from_lines(_lines(os.path.join(base_dir, "user_words.txt"))),
        stop=SetDictionary.from_lines(_lines(os.path.join(base_dir, "stop.txt"))),
        unit=SetDictionary.from_lines(_lines(os.path.join(base_dir, "unit.txt"))),
        unit_synonym=_load_synonym(os.path.join(base_dir, "unit_synonym.txt")),
        synonym=_load_synonym(os.path.join(base_dir, "synonym.txt")),
        space=_load_map(os.path.join(base_dir, "space.txt")),
        compound=_load_map(os.path.join(base_dir, "compound.txt")),
    )


#: prob value → text label (inverse of ``_PROB``; restore emits labels)
_PROB_LABEL = {v: k for k, v in _PROB.items()}

#: compiled image name → (kind, source text file)
_COMPILED_LAYOUT = {
    "user.dict": ("tag_prob", "user.txt"),
    "user_words.dict": ("set", "user_words.txt"),
    "stop.dict": ("set", "stop.txt"),
    "unit.dict": ("set", "unit.txt"),
    "synonym.dict": ("synonym", "synonym.txt"),
    "unit_synonym.dict": ("synonym", "unit_synonym.txt"),
    "space.dict": ("map", "space.txt"),
    "compound.dict": ("map", "compound.txt"),
}


def compile_dictionaries(base_dir: str, out_dir: str) -> list[str]:
    """Compile the text dictionaries under ``base_dir`` into the
    reference's binary wire format (one ``.dict`` image per dictionary,
    :mod:`.binary_dicts` layouts). Returns the image names written.
    Deterministic: same text content → byte-identical images (entries
    are sorted), so images double as content fingerprints."""
    from .binary_dicts import write_map_dict, write_set_dict, write_tag_prob_dict

    ds = load_dictionary_set(base_dir)
    os.makedirs(out_dir, exist_ok=True)
    written = []
    for image, (kind, _src) in _COMPILED_LAYOUT.items():
        if kind == "tag_prob":
            data = write_tag_prob_dict(
                {
                    w: [(tp.tag.name, tp.prob) for tp in tps]
                    for w, tps in sorted(ds.tag_prob.entries.items())
                }
            )
        elif kind == "set":
            name = image[: -len(".dict")]
            data = write_set_dict(getattr(ds, "user" if name == "user_words" else name))
        elif kind == "synonym":
            syn = ds.synonym if image == "synonym.dict" else ds.unit_synonym
            data = write_map_dict(dict(sorted(syn.mapping.items())))
        else:  # map
            m = ds.space if image == "space.dict" else ds.compound
            data = write_map_dict(dict(sorted(m.items())))
        with open(os.path.join(out_dir, image), "wb") as f:
            f.write(data)
        written.append(image)
    return written


def restore_dictionaries(compiled_dir: str, out_dir: str) -> list[str]:
    """Inverse of :func:`compile_dictionaries` — regenerate the TEXT
    dictionary files from compiled binary images (the reference's
    ``restore`` REST handler, ``ProductNameAnalysisAction.java`` dict
    actions: users migrating an existing deployment pull their source
    files back out of the compiled store).

    Round-trip contract: ``compile → restore → load`` reloads the
    identical dictionary structures, and re-compiling the restored
    files is byte-identical (a fixpoint) — comments and line order are
    the only information not preserved."""
    from .binary_dicts import read_map_dict, read_set_dict, read_tag_prob_dict

    os.makedirs(out_dir, exist_ok=True)
    written = []
    for image, (kind, src) in _COMPILED_LAYOUT.items():
        path = os.path.join(compiled_dir, image)
        if not os.path.exists(path):
            continue
        with open(path, "rb") as f:
            data = f.read()
        lines: list[str] = []
        if kind == "tag_prob":
            for word, probs in sorted(read_tag_prob_dict(data).items()):
                for _tag, prob in probs:
                    label = _PROB_LABEL.get(prob, "high")
                    lines.append(f"{word}\t{label}")
        elif kind == "set":
            lines = sorted(read_set_dict(data))
        elif kind == "synonym":
            # mapping rows serialize as one-way rules — reloading
            # reproduces the exact mapping (two-way groups were already
            # expanded to their closure at original load)
            for head, syns in sorted(read_map_dict(data).items()):
                lines.append(f"{head}=>{','.join(syns)}")
        else:  # map
            for word, parts in sorted(read_map_dict(data).items()):
                lines.append(f"{word}\t{' '.join(parts)}")
        with open(os.path.join(out_dir, src), "w", encoding="utf-8") as f:
            f.write("\n".join(lines) + ("\n" if lines else ""))
        written.append(src)
    return written


def write_dict_status(spark, base_dir: str, status_path: str) -> None:
    """Append per-dictionary compile status (counts + fingerprint) —
    the ``.dsearch_dict_apply`` upsert equivalent (``SearchUtil.java:66-82``)."""
    rows = []
    applied_at = datetime.now(timezone.utc).isoformat()
    for name in ["user", "stop", "unit", "unit_synonym", "synonym", "space", "compound"]:
        fname = os.path.join(base_dir, f"{name}.txt")
        lines = _lines(fname)
        digest = hashlib.md5("\n".join(lines).encode("utf-8")).hexdigest()
        rows.append((name, len(lines), digest, applied_at))
    df = spark.createDataFrame(
        rows, "dict_name string, entries long, fingerprint string, applied_at string"
    )
    df.write.mode("append").parquet(status_path)
