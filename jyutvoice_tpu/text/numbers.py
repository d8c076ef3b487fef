"""English number expansion without external dependencies.

Re-implements the reference's tacotron-derived normalizer
(text/number_utils.py:64-71) with a built-in number-to-words engine instead
of `inflect`. Output style: plain lowercase words, no hyphens/and (the
downstream g2p splits on non-alpha, so 'thirty four' and inflect's
'thirty-four' produce identical phone streams).

Flow parity matters more than it looks: the reference expands dollars/
pounds/decimals to DIGIT strings and lets the final `_number_re` pass
render words — so '$1,234' reads year-style ('twelve thirty four
dollars'), '3.14' reads 'three point fourteen' (fraction as a cardinal,
'0.05' loses its leading zero), and '1 dollar, 1 cent' keeps the comma
(a real pause token). This module follows the same two-phase flow.
(The reference's own tests/test_number_utils.py expects different
strings — e.g. '1,234' -> 'one thousand...' — but its code produces the
year-style form; we match the code, which is what a user runs. Note the
reference never wires normalize_numbers into a cleaner: it is a tested
standalone utility there, and here.)
"""

from __future__ import annotations

import re

_UNITS = [
    "zero", "one", "two", "three", "four", "five", "six", "seven", "eight",
    "nine", "ten", "eleven", "twelve", "thirteen", "fourteen", "fifteen",
    "sixteen", "seventeen", "eighteen", "nineteen",
]
_TENS = [
    "", "", "twenty", "thirty", "forty", "fifty", "sixty", "seventy",
    "eighty", "ninety",
]
_SCALES = [
    (10**12, "trillion"),
    (10**9, "billion"),
    (10**6, "million"),
    (10**3, "thousand"),
    (10**2, "hundred"),
]
_ORDINAL_SPECIAL = {
    "one": "first", "two": "second", "three": "third", "five": "fifth",
    "eight": "eighth", "nine": "ninth", "twelve": "twelfth",
}

_comma_number_re = re.compile(r"([0-9][0-9\,]+[0-9])")
_decimal_number_re = re.compile(r"([0-9]+\.[0-9]+)")
_pounds_re = re.compile(r"£([0-9\,]*[0-9]+)")
_dollars_re = re.compile(r"\$([0-9\.\,]*[0-9]+)")
_ordinal_re = re.compile(r"[0-9]+(st|nd|rd|th)")
_number_re = re.compile(r"[0-9]+")


def number_to_words(n: int) -> str:
    """Integer -> English words ('1234' -> 'one thousand two hundred thirty four')."""
    if n < 0:
        return "minus " + number_to_words(-n)
    if n < 20:
        return _UNITS[n]
    if n < 100:
        tens, unit = divmod(n, 10)
        return _TENS[tens] + (" " + _UNITS[unit] if unit else "")
    for scale, name in _SCALES:
        if n >= scale:
            head, rest = divmod(n, scale)
            out = number_to_words(head) + " " + name
            if rest:
                out += " " + number_to_words(rest)
            return out
    raise ValueError(n)  # pragma: no cover


def number_to_ordinal_words(n: int) -> str:
    words = number_to_words(n).split(" ")
    last = words[-1]
    if last in _ORDINAL_SPECIAL:
        words[-1] = _ORDINAL_SPECIAL[last]
    elif last.endswith("y"):
        words[-1] = last[:-1] + "ieth"
    else:
        words[-1] = last + "th"
    return " ".join(words)


def _two_digit_groups(n: int) -> str:
    """Year-style reading by 2-digit groups: 1984 -> 'nineteen eighty four'."""
    s = str(n)
    if len(s) % 2:
        s = "0" + s
    groups = [int(s[i : i + 2]) for i in range(0, len(s), 2)]
    words = []
    for g in groups:
        words.append("oh " + _UNITS[g] if 0 < g < 10 else number_to_words(g))
    return " ".join(words)


def _remove_commas(m):
    return m.group(1).replace(",", "")


def _expand_decimal_point(m):
    # digits stay: '3.14' -> '3 point 14'; the final number pass renders
    # 'three point fourteen' (reference flow — NOT digit-by-digit)
    return m.group(1).replace(".", " point ")


def _expand_dollars(m):
    # digits stay (final pass renders words, year-style in (1000, 3000))
    match = m.group(1)
    parts = match.split(".")
    if len(parts) > 2:
        return match + " dollars"
    dollars = int(parts[0]) if parts[0] else 0
    cents = int(parts[1]) if len(parts) > 1 and parts[1] else 0
    if dollars and cents:
        du = "dollar" if dollars == 1 else "dollars"
        cu = "cent" if cents == 1 else "cents"
        return f"{dollars} {du}, {cents} {cu}"
    if dollars:
        du = "dollar" if dollars == 1 else "dollars"
        return f"{dollars} {du}"
    if cents:
        cu = "cent" if cents == 1 else "cents"
        return f"{cents} {cu}"
    return "zero dollars"


def _expand_pounds(m):
    # digits stay (commas were already stripped by the comma pass)
    return m.group(1) + " pounds"


def _expand_ordinal(m):
    return number_to_ordinal_words(int(m.group(0)[:-2]))


def _expand_number(m):
    num = int(m.group(0))
    # year-style handling in (1000, 3000) as in the reference
    if 1000 < num < 3000:
        if num == 2000:
            return "two thousand"
        if 2000 < num < 2010:
            return "two thousand " + number_to_words(num % 100)
        if num % 100 == 0:
            return number_to_words(num // 100) + " hundred"
        return _two_digit_groups(num)
    return number_to_words(num)


def normalize_numbers(text: str) -> str:
    text = re.sub(_comma_number_re, _remove_commas, text)
    text = re.sub(_pounds_re, _expand_pounds, text)
    text = re.sub(_dollars_re, _expand_dollars, text)
    text = re.sub(_decimal_number_re, _expand_decimal_point, text)
    text = re.sub(_ordinal_re, _expand_ordinal, text)
    text = re.sub(_number_re, _expand_number, text)
    return text
