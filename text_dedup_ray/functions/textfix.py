"""Encoding-repair text fixer (reference parity: utils/ftfy_utils.py:5-8).

The reference re-exports ``ftfy``'s fixers; this module provides the same
seam natively (the ftfy wheel does not exist in this environment) plus an
adapter registry — mirroring ``functions/codecs.py`` — so the real ftfy
slots in with one ``pip install ftfy`` and zero pipeline-code changes.

Native fixer (``fix_text_native``), applied in this documented order:

1. **HTML entity unescape** (stdlib ``html.unescape``) when an entity
   pattern (``&name;`` / ``&#d;`` / ``&#xh;``) occurs in the string.
2. **Mojibake repair**: UTF-8 bytes that were mis-decoded as cp1252 /
   latin-1 (``"Ã©" -> "é"``), up to 2 rounds for double-encoding.
   Encoding uses *sloppy* cp1252: the 5 bytes cp1252 leaves unmapped
   (0x81 0x8D 0x8F 0x90 0x9D) fall back to their latin-1 codepoints,
   matching how real-world decoders produced the mojibake in the first
   place.  Repair runs per line and is accepted only when the strict
   UTF-8 re-decode of the whole line succeeds AND shortens it — a
   conservative criterion that never corrupts legitimately non-ASCII
   text (a lone "é" round-trips to an invalid UTF-8 byte and is kept).
3. **Line-break normalization**: ``\\r\\n`` and bare ``\\r`` -> ``\\n``.
4. **Control-char strip**: C0/C1 controls except ``\\t`` ``\\n``.
5. **Unicode NFC normalization** (``unicodedata.normalize``).

``fix_text_array`` is the vectorized Arrow kernel used by the pipeline
stage (`pipelines.textops.with_fixed_text`): rows that are pure printable
ASCII with no ``&`` and no control chars are *provably fixed points* of
the native fixer, so they pass through untouched (zero-copy mask), and
only the suspicious minority pays the per-string Python repair — on a
clean web corpus that is a few percent of rows.
"""

from __future__ import annotations

import html
import re
import unicodedata

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# chars whose presence can make any fixer stage a non-no-op: anything
# outside printable ASCII (incl. control chars and \r), plus '&' (entities).
# \t and \n are untouched by every stage and stay in the clean set.
_CLEAN_RE = r"^[\x20-\x25\x27-\x7e\t\n]*$"

_ENTITY_RE = re.compile(r"&(?:#\d+|#[xX][0-9a-fA-F]+|[A-Za-z][A-Za-z0-9]{1,30});")
_CTRL_RE = re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f-\x9f]")

# cp1252's 5 unmapped bytes -> the latin-1 (= Unicode) codepoints sloppy
# decoders emit for them (ftfy's "sloppy-windows-1252" behavior)
_SLOPPY = {0x81: "\x81", 0x8D: "\x8d", 0x8F: "\x8f", 0x90: "\x90", 0x9D: "\x9d"}
_SLOPPY_INV = {c: b for b, c in _SLOPPY.items()}


def _sloppy_cp1252_encode(s: str) -> bytes | None:
    """Encode as cp1252 with the 5-byte latin-1 fallback; None if impossible."""
    try:
        return s.encode("cp1252")
    except UnicodeEncodeError:
        pass
    out = bytearray()
    for ch in s:
        try:
            out += ch.encode("cp1252")
        except UnicodeEncodeError:
            b = _SLOPPY_INV.get(ch)
            if b is None:
                o = ord(ch)
                if o < 256:
                    out.append(o)
                else:
                    return None
            else:
                out.append(b)
    return bytes(out)


def _repair_line(line: str) -> str:
    """Up to 2 rounds of strict whole-line mojibake repair."""
    for _ in range(2):
        if not any(ord(c) > 0x7F for c in line):
            return line
        raw = _sloppy_cp1252_encode(line)
        if raw is None:
            return line
        try:
            decoded = raw.decode("utf-8")
        except UnicodeDecodeError:
            return line
        if len(decoded) >= len(line):
            return line
        line = decoded
    return line


def fix_mojibake(s: str) -> str:
    """Per-line strict cp1252->utf-8 repair (stage 2 of the fixer)."""
    if all(ord(c) <= 0x7F for c in s):
        return s
    if "\n" in s:
        return "\n".join(_repair_line(ln) for ln in s.split("\n"))
    return _repair_line(s)


def fix_text_native(s: str) -> str:
    """Dependency-free fixer: unescape -> mojibake -> breaks -> ctrl -> NFC.

    Unescape rewrites ONLY full ``&name;`` / ``&#d;`` / ``&#xh;`` tokens
    (each through html.unescape individually) — a wholesale
    ``html.unescape(s)`` would also rewrite semicolon-less legacy entities
    ("AT&ampx" -> "AT&x"), which ftfy never does."""
    if _ENTITY_RE.search(s):
        s = _ENTITY_RE.sub(lambda m: html.unescape(m.group(0)), s)
    s = fix_mojibake(s)
    if "\r" in s:
        s = s.replace("\r\n", "\n").replace("\r", "\n")
    s = _CTRL_RE.sub("", s)
    return unicodedata.normalize("NFC", s)


# --- pluggable fixer adapter registry (codecs.py pattern) -------------------

_TEXT_FIXERS: dict = {"native": fix_text_native}
_AUTOLOADED = False


def register_text_fixer(name: str, fn) -> None:
    """Register a ``str -> str`` fixer (e.g. a wrapped ftfy.fix_text)."""
    _TEXT_FIXERS[name] = fn


def autoload_fixers() -> None:
    """Register ftfy when the wheel exists. Lazy + per-process: first call
    inside each Ray worker, so no registration plumbing is needed."""
    global _AUTOLOADED
    if _AUTOLOADED:
        return
    _AUTOLOADED = True
    try:  # pragma: no cover - wheel absent in this environment
        import ftfy  # type: ignore

        register_text_fixer("ftfy", ftfy.fix_text)
    except ImportError:
        pass


def get_text_fixer(name: str = "auto"):
    """``"native"`` pins the deterministic built-in (gate queries use this
    so an installed ftfy wheel can never shift oracle-checked output);
    ``"auto"`` prefers a registered ftfy, falling back to native."""
    if name == "auto":
        autoload_fixers()
        return _TEXT_FIXERS.get("ftfy", fix_text_native)
    fn = _TEXT_FIXERS.get(name)
    if fn is None:
        raise KeyError(f"no text fixer registered under {name!r}")
    return fn


def masked_transform(
    col: pa.ChunkedArray | pa.Array,
    clean_regex: str,
    scalar_fn,
    vector_fn=None,
) -> pa.Array:
    """Shared masked-scatter kernel: rows matching ``clean_regex`` take the
    vectorized path (``vector_fn(col)``, or zero-copy passthrough when
    None); the non-matching minority goes through ``scalar_fn`` per string.
    The results are stitched by slicing the base array around the dirty
    positions — O(clean) zero-copy + O(dirty) work, never an O(batch)
    Python-object materialization. NULL rows count as clean (stay NULL /
    take the vector path, which must preserve them)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    clean = pc.match_substring_regex(col, clean_regex)
    dirty_idx = np.flatnonzero(
        np.logical_not(clean.fill_null(True).to_numpy(zero_copy_only=False))
    )
    base = col if vector_fn is None else vector_fn(col)
    if isinstance(base, pa.ChunkedArray):
        base = base.combine_chunks()
    if len(dirty_idx) == 0:
        return base
    fixed = pa.array(
        [scalar_fn(s) for s in col.take(pa.array(dirty_idx)).to_pylist()],
        base.type,
    )
    parts: list[pa.Array] = []
    prev = 0
    for k, i in enumerate(dirty_idx.tolist()):
        if i > prev:
            parts.append(base.slice(prev, i - prev))
        parts.append(fixed.slice(k, 1))
        prev = i + 1
    if prev < len(base):
        parts.append(base.slice(prev, len(base) - prev))
    return pa.concat_arrays(parts)


def fix_text_array(arr: pa.ChunkedArray | pa.Array, fixer: str = "native") -> pa.Array:
    """Vectorized kernel: clean printable-ASCII rows are PROVEN fixed
    points of the native fixer and pass through zero-copy; only suspicious
    rows pay the per-string repair. NULLs stay NULL.

    The fast path applies ONLY when the resolved fixer is the native one —
    a registered adapter (ftfy or custom) carries no fixed-point guarantee
    on clean ASCII, so it is applied to every row."""
    fn = get_text_fixer(fixer)
    if fn is fix_text_native:
        return masked_transform(arr, _CLEAN_RE, fn)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    # preserve the input's string type (string vs large_string) so the
    # output schema does not depend on which fixer is configured
    return pa.array(
        [None if s is None else fn(s) for s in arr.to_pylist()], arr.type
    )
