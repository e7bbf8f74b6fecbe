"""Unicode → ASCII transliteration ("unidecoder" capability).

The reference vendors a 2k-line replacement table plus a homoglyph map
(``FastPitch_TF/common/text/unidecoder/``). This implementation reaches the
same goal compactly: NFKD decomposition strips combining marks (covers all
Latin diacritics), a small table handles the non-decomposable Latin letters
and common typographic punctuation, and anything still non-ASCII is dropped
with an optional warning — the same observable behavior for English corpora
like LJSpeech.
"""

from __future__ import annotations

import unicodedata
import warnings

__all__ = ["to_ascii"]

_DIRECT = {
    "æ": "ae", "Æ": "AE", "œ": "oe", "Œ": "OE",
    "ß": "ss", "ẞ": "SS",
    "ø": "o", "Ø": "O",
    "đ": "d", "Đ": "D",
    "ð": "d", "Ð": "D",
    "þ": "th", "Þ": "Th",
    "ł": "l", "Ł": "L",
    "ħ": "h", "Ħ": "H",
    "ı": "i", "İ": "I",
    "ĸ": "k",
    "ŋ": "ng", "Ŋ": "NG",
    # typographic punctuation
    "‘": "'", "’": "'", "‚": "'", "‛": "'",
    "“": '"', "”": '"', "„": '"', "‟": '"',
    "–": "-", "—": "-", "―": "-", "‐": "-", "‑": "-",
    "…": "...",
    "«": '"', "»": '"', "‹": "'", "›": "'",
    "·": "-", "•": "-",
    " ": " ",  # nbsp
    "©": "(c)", "®": "(r)", "™": "(tm)",
    "°": " degrees ",
    "½": " half ", "¼": " quarter ", "¾": " three quarters ",
    "×": "x", "÷": "/",
    "¢": " cents ",
}

# Common confusable homoglyphs (Cyrillic/Greek lookalikes) → Latin.
_HOMOGLYPHS = {
    "А": "A", "В": "B", "Е": "E", "К": "K", "М": "M", "Н": "H", "О": "O",
    "Р": "P", "С": "C", "Т": "T", "Х": "X", "а": "a", "е": "e", "о": "o",
    "р": "p", "с": "c", "у": "y", "х": "x",
    "Α": "A", "Β": "B", "Ε": "E", "Ζ": "Z", "Η": "H", "Ι": "I", "Κ": "K",
    "Μ": "M", "Ν": "N", "Ο": "O", "Ρ": "P", "Τ": "T", "Υ": "Y", "Χ": "X",
    "ο": "o",
}


def to_ascii(text: str, warn_dropped: bool = False) -> str:
    """Transliterate to ASCII; non-representable characters are dropped."""
    out = []
    for ch in text:
        if ord(ch) < 128:
            out.append(ch)
            continue
        ch2 = _DIRECT.get(ch) or _HOMOGLYPHS.get(ch)
        if ch2 is None:
            decomp = unicodedata.normalize("NFKD", ch)
            ch2 = "".join(c for c in decomp if ord(c) < 128)
        if not ch2 and warn_dropped:
            warnings.warn(f"to_ascii dropped character {ch!r} (U+{ord(ch):04X})")
        out.append(ch2)
    return "".join(out)
