"""Diacritic folding with the reference's explicit accent map.

Reproduces uFuzzy.latinize byte-for-byte (accent map at
/root/reference/src/uFuzzy.mjs:929-957). We use an explicit literal
map — not NFD/ICU normalization — because the per-row invariant
(BASELINE.json input_hint) requires byte-identical extracted text and
the reference's map is narrower than Unicode's \\p{Diacritic} strip.

Exposed in three equivalent forms:
- ``latinize(str | list[str])`` — pure Python (oracle + fixtures)
- ``ACCENT_SRC`` / ``ACCENT_DST`` — parallel strings for Spark's
  ``F.translate`` (JVM-side, codegen'd — the pipeline hot path)
- ``latinize_series(pd.Series)`` — vectorized pandas (inside UDFs)
"""

from __future__ import annotations

# reference map: base char -> accented chars (uFuzzy.mjs:929-957)
_ACCENTS: dict[str, str] = {
    "A": "ÁÀÃÂÄĄĂÅ",
    "a": "áàãâäąăå",
    "E": "ÉÈÊËĖĚ",
    "e": "éèêëęě",
    "I": "ÍÌÎÏĮİ",
    "i": "íìîïįı",
    "O": "ÓÒÔÕÖ",
    "o": "óòôõö",
    "U": "ÚÙÛÜŪŲŮŰ",
    "u": "úùûüūųůű",
    "C": "ÇČĆ",
    "c": "çčć",
    "D": "Ď",
    "d": "ď",
    "G": "Ğ",
    "g": "ğ",
    "L": "Ł",
    "l": "ł",
    "N": "ÑŃŇ",
    "n": "ñńň",
    "S": "ŠŚȘŞ",
    "s": "šśșş",
    "T": "ŢȚŤ",
    "t": "ţțť",
    "Y": "Ý",
    "y": "ý",
    "Z": "ŻŹŽ",
    "z": "żźž",
}

# parallel from/to strings — the exact arguments for F.translate(col, SRC, DST)
ACCENT_SRC = "".join(accented for accented in _ACCENTS.values())
ACCENT_DST = "".join(base * len(accented) for base, accented in _ACCENTS.items())

_TRANSLATE_TABLE = str.maketrans(ACCENT_SRC, ACCENT_DST)


def latinize(strings):
    """uFuzzy.latinize: accepts a string or a list of strings."""
    if isinstance(strings, str):
        return strings.translate(_TRANSLATE_TABLE)
    return [s.translate(_TRANSLATE_TABLE) for s in strings]


def latinize_series(series):
    """Vectorized fold for pandas Series[str] (inside pandas UDFs)."""
    # pandas .str.translate dispatches to Python str.translate per row but
    # avoids Python-level loops in our code; the table lookup is C-level.
    return series.str.translate(_TRANSLATE_TABLE)
