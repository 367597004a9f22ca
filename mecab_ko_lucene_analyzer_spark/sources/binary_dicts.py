"""Readers/writers for the reference's compiled binary dictionary
images — the migration path for users with existing ``.dict`` files.

Wire format (re-derived from the reference's stream classes —
``com/danawa/io/DataInput.java:109`` (int, 4-byte big-endian),
``:121`` (Lucene-style vint), ``:390`` (``readUString``: vint byte
size, then size/2 UTF-16 code units as 2-byte big-endian shorts) — and
the per-dictionary layouts:

* ``TagProbDictionary.readFrom`` (``TagProbDictionary.java:202-231``):
  ``int n; n × { string key; int m; m × { string posTag; double prob } }``
* ``SetDictionary.readFrom`` (``SetDictionary.java:102-113``):
  ``int n; n × string``
* ``MapDictionary.readFrom``/``writeTo`` (``MapDictionary.java:95-140``):
  ``vint n; n × { ustring key; vint m; m × ustring }``
  (synonym dictionaries share this layout, ``SynonymDictionary.java:12``)

Writers exist so round-trip tests pin the format without shipping any
reference binary. Everything is pure Python over ``bytes`` — these are
driver-side dictionary loads (broadcast after), not row-path code.
"""

from __future__ import annotations

import io
import struct

__all__ = [
    "read_tag_prob_dict",
    "write_tag_prob_dict",
    "read_set_dict",
    "write_set_dict",
    "read_map_dict",
    "write_map_dict",
]


# -- primitives -------------------------------------------------------------


def _read_int(buf: io.BufferedIOBase) -> int:
    return struct.unpack(">i", buf.read(4))[0]


def _write_int(buf: io.BufferedIOBase, v: int) -> None:
    buf.write(struct.pack(">i", v))


def _read_vint(buf: io.BufferedIOBase) -> int:
    i, shift = 0, 0
    while True:
        (b,) = buf.read(1)
        i |= (b & 0x7F) << shift
        if b < 0x80:
            return i
        shift += 7
        if shift > 28:
            raise ValueError("invalid vInt (too many bits)")


def _write_vint(buf: io.BufferedIOBase, v: int) -> None:
    while v >= 0x80:
        buf.write(bytes([(v & 0x7F) | 0x80]))
        v >>= 7
    buf.write(bytes([v]))


def _read_ustring(buf: io.BufferedIOBase) -> str:
    byte_size = _read_vint(buf)
    raw = buf.read(byte_size)
    # UTF-16 code units as 2-byte big-endian shorts (DataInput.java:390)
    return raw.decode("utf-16-be")


def _write_ustring(buf: io.BufferedIOBase, s: str) -> None:
    raw = s.encode("utf-16-be")
    _write_vint(buf, len(raw))
    buf.write(raw)


def _read_double(buf: io.BufferedIOBase) -> float:
    return struct.unpack(">d", buf.read(8))[0]


# -- dictionary images ------------------------------------------------------


def read_tag_prob_dict(data: bytes) -> dict[str, list[tuple[str, float]]]:
    """Compiled TagProb image → {surface: [(posTag, prob), ...]}."""
    buf = io.BytesIO(data)
    out: dict[str, list[tuple[str, float]]] = {}
    for _ in range(_read_int(buf)):
        key = _read_ustring(buf)
        probs = [
            (_read_ustring(buf), _read_double(buf)) for _ in range(_read_int(buf))
        ]
        out[key] = probs
    return out


def write_tag_prob_dict(d: dict[str, list[tuple[str, float]]]) -> bytes:
    buf = io.BytesIO()
    _write_int(buf, len(d))
    for key, probs in d.items():
        _write_ustring(buf, key)
        _write_int(buf, len(probs))
        for tag, prob in probs:
            _write_ustring(buf, tag)
            buf.write(struct.pack(">d", prob))
    return buf.getvalue()


def read_set_dict(data: bytes) -> set[str]:
    """Compiled Set image (stopwords / user words) → set of surfaces."""
    buf = io.BytesIO(data)
    return {_read_ustring(buf) for _ in range(_read_int(buf))}


def write_set_dict(entries: set[str] | list[str]) -> bytes:
    buf = io.BytesIO()
    items = sorted(entries)
    _write_int(buf, len(items))
    for s in items:
        _write_ustring(buf, s)
    return buf.getvalue()


def read_map_dict(data: bytes) -> dict[str, list[str]]:
    """Compiled Map/Synonym image → {key: [values...]}."""
    buf = io.BytesIO(data)
    out: dict[str, list[str]] = {}
    for _ in range(_read_vint(buf)):
        key = _read_ustring(buf)
        out[key] = [_read_ustring(buf) for _ in range(_read_vint(buf))]
    return out


def write_map_dict(d: dict[str, list[str]]) -> bytes:
    buf = io.BytesIO()
    _write_vint(buf, len(d))
    for key, values in d.items():
        _write_ustring(buf, key)
        _write_vint(buf, len(values))
        for v in values:
            _write_ustring(buf, v)
    return buf.getvalue()
