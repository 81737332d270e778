"""Text normalizers (reference parity: utils/preprocess.py:11-59).

``normalize`` is the cc_net normalizer (lowercase, digits -> 0, strip
punctuation / control / symbol chars); ``news_copy_preprocessing`` is the
NEWS-COPY benchmark cleaner. Both are plain ``str -> str`` kernels applied
via vectorized ``map_batches`` stages.
"""

from __future__ import annotations

import regex as re

DIGIT_RE = re.compile(r"\d")
PUNCT_OR_NON_PRINTING_CHARS_RE = re.compile(r"[\p{P}\p{C}\p{S}]+")
_NEWS_REMOVE = str.maketrans("", "", r'"#$%&\()*+/:;<=>@[\\]^_`{|}~.?,!' + "'")


def normalize(line: str) -> str:
    line = line.strip()
    if not line:
        return line
    line = line.lower()
    line = DIGIT_RE.sub("0", line)
    return PUNCT_OR_NON_PRINTING_CHARS_RE.sub("", line)


def news_copy_preprocessing(text: str) -> str:
    text = text.replace("-\n", "").replace("\n", " ")
    text = text.translate(_NEWS_REMOVE)
    return text.encode("ascii", "ignore").decode()
