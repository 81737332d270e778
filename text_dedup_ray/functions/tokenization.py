"""Tokenizer + n-gram shingling (reference parity).

Semantics replicated from the reference:
- tokenizer: ``re.compile(r"\\W", re.UNICODE).split(text.lower())`` dropping
  empties (config/algorithms/minhash.py:181-187; identical copy in simhash).
- ``ngrams(seq, n, min_length)`` (utils/tokenization.py:5-33):
  * ``len(seq) < min_length``  -> no ngrams at all
  * ``len(seq) <  n``          -> one ngram = the whole sequence
  * ``n == 0``                 -> empty (zip of zero iterables)
  * otherwise sliding windows of length n
- shingle set: ``{bytes(" ".join(gram).lower(), "utf-8")}``
  (config/algorithms/minhash.py:189-198).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

NON_ALPHA = re.compile(r"\W", re.UNICODE)


def tokenize(text: str) -> list[str]:
    """Lowercase and split on non-word chars, dropping empty tokens."""
    return [t for t in NON_ALPHA.split(text.lower()) if t]


def ngrams(sequence: list[str], n: int, min_length: int = 5) -> Iterator[tuple[str, ...]]:
    """Sliding n-grams with the reference's two length edge cases."""
    if n < 0:
        raise ValueError("n must be non-negative")
    if len(sequence) < min_length:
        return iter([])
    if len(sequence) < n:
        return iter([tuple(sequence)])
    return zip(*(sequence[i:] for i in range(n)))


def shingle_set(text: str, ngram_size: int, min_length: int = 5) -> set[bytes]:
    """Unique byte shingles of a document, exactly as the reference builds them."""
    return {
        " ".join(gram).lower().encode("utf-8")
        for gram in ngrams(tokenize(text), ngram_size, min_length)
    }


def token_count(text: str) -> int:
    """Number of reference-tokenizer tokens (used by the min-length filter,
    reference minhash.py:23-28)."""
    return len(tokenize(text))
