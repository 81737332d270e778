"""Text-analysis kernels for training-data pipelines.

These are additions beyond the reference (SURVEY.md lists them as the
training-data operators a 100 TB pipeline needs): token counting, quality
scoring, language id, and document fingerprinting. Definitions are kept
deliberately simple and, where used with a DuckDB oracle, expressible in ANSI
SQL with identical semantics (ASCII character classes, not unicode, so Python
`re` and DuckDB RE2 agree).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np

WORD_RE = re.compile(r"[A-Za-z0-9_]+")
ALPHA_RE = re.compile(r"[A-Za-z]")
DIGIT_RE = re.compile(r"[0-9]")

# tiny per-language stopword lists for the n-gram/stopword language heuristic
STOPWORDS: dict[str, frozenset[str]] = {
    "en": frozenset(
        "the of and to in a is that for it as was with be by on not he i this are or his from at which but have an".split()
    ),
    "de": frozenset(
        "der die und in den von zu das mit sich des auf für ist im dem nicht ein eine als auch es an werden".split()
    ),
    "fr": frozenset(
        "de la le et les des en un du une que est pour qui dans a par plus pas au sur ne se ce il sont".split()
    ),
    "es": frozenset(
        "de la que el en y a los del se las por un para con no una su al lo como más pero sus le".split()
    ),
}


def count_tokens(text: str) -> int:
    """Number of ``[A-Za-z0-9_]+`` runs — mirrors the DuckDB oracle
    ``length(regexp_extract_all(text, '[A-Za-z0-9_]+'))``."""
    return len(WORD_RE.findall(text))


def quality_stats(text: str) -> tuple[int, int, float, float]:
    """(n_chars, n_tokens, alpha_ratio, digit_ratio) — SQL-mirrorable."""
    n_chars = len(text)
    n_tokens = len(WORD_RE.findall(text))
    if n_chars == 0:
        return 0, 0, 0.0, 0.0
    alpha = len(ALPHA_RE.findall(text))
    digit = len(DIGIT_RE.findall(text))
    return n_chars, n_tokens, alpha / n_chars, digit / n_chars


def detect_language(text: str) -> tuple[str, float]:
    """Stopword-voting language id. Returns (lang, score); 'und' when no
    stopwords hit. A heuristic, not a model — rows-only oracle check."""
    tokens = [t.lower() for t in WORD_RE.findall(text)]
    if not tokens:
        return "und", 0.0
    best_lang, best_score = "und", 0.0
    for lang, stops in STOPWORDS.items():
        score = sum(1 for t in tokens if t in stops) / len(tokens)
        if score > best_score:
            best_lang, best_score = lang, score
    return best_lang, best_score


def content_md5(text: str) -> str:
    """Hex md5 of the UTF-8 text — matches DuckDB ``md5(text)``."""
    return hashlib.md5(text.encode("utf-8")).hexdigest()


def winnowing_fingerprint(text: str, k: int = 8, window: int = 16) -> int:
    """64-bit winnowing-style fingerprint (Schleimer et al., SIGMOD'03 idea):
    rolling k-gram hashes, per-window minima, xor-folded. Deterministic and
    order-stable; used for cheap doc-similarity bucketing."""
    data = text.lower().encode("utf-8")
    n = len(data)
    if n < k:
        return int(np.uint64(int.from_bytes(hashlib.md5(data).digest()[:8], "little")))
    arr = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    base = np.uint64(1000003)
    with np.errstate(over="ignore"):
        pows = base ** np.arange(k, dtype=np.uint64)
        # rolling polynomial hash of every k-gram, fully vectorized
        windows = np.lib.stride_tricks.sliding_window_view(arr, k)
        grams = (windows * pows[::-1]).sum(axis=1, dtype=np.uint64)
    if len(grams) <= window:
        mins = grams
    else:
        w = np.lib.stride_tricks.sliding_window_view(grams, window)
        mins = np.unique(w.min(axis=1))
    with np.errstate(over="ignore"):
        out = np.bitwise_xor.reduce(mins * np.uint64(0x9E3779B97F4A7C15))
    return int(out)
