"""Pure-python Porter2 (Snowball English) stemmer.

Implements the published Snowball "english" algorithm (snowballstem.org);
the reference links an external C++ port of the same algorithm
(reference src/token_filter.cpp:16-27). Used as the fallback when neither
PyStemmer nor snowballstemmer is installed. Pure python is fine here:
stemming runs inside the tokenize Arrow pass where the regex lexer
dominates; vectorization happens at the batch level.
"""

from __future__ import annotations

VOWELS = frozenset("aeiouy")
DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
LI_ENDINGS = frozenset("cdeghkmnrt")

_EXCEPTIONS = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    # invariants
    "sky": "sky", "news": "news", "howe": "howe", "atlas": "atlas",
    "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}

_EXCEPTIONS_1A = frozenset((
    "inning", "outing", "canning", "herring", "earring",
    "proceed", "exceed", "succeed",
))

_STEP2 = [  # longest-match-first
    ("ization", "ize"), ("ational", "ate"), ("fulness", "ful"),
    ("ousness", "ous"), ("iveness", "ive"), ("tional", "tion"),
    ("biliti", "ble"), ("lessli", "less"), ("entli", "ent"),
    ("ation", "ate"), ("alism", "al"), ("aliti", "al"), ("ousli", "ous"),
    ("iviti", "ive"), ("fulli", "ful"), ("enci", "ence"), ("anci", "ance"),
    ("abli", "able"), ("izer", "ize"), ("ator", "ate"), ("alli", "al"),
    ("bli", "ble"),
]

_STEP3 = [
    ("ational", "ate"), ("tional", "tion"), ("alize", "al"),
    ("icate", "ic"), ("iciti", "ic"), ("ical", "ic"),
    ("ness", ""), ("ful", ""),
]

_STEP4 = (
    "ement", "ance", "ence", "able", "ible", "ment",
    "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize",
    "ion", "al", "er", "ic",
)


def _is_vowel(word: str, i: int) -> bool:
    return word[i] in VOWELS


def _regions(word: str) -> tuple[int, int]:
    """R1/R2 start offsets. R1 = after the first vowel followed by a
    non-vowel; R2 = the same rule applied within R1. Special R1 prefixes
    per the algorithm: gener-, commun-, arsen-."""
    n = len(word)
    r1 = n
    for pfx in ("gener", "commun", "arsen"):
        if word.startswith(pfx):
            r1 = len(pfx)
            break
    else:
        for i in range(1, n):
            if not _is_vowel(word, i) and _is_vowel(word, i - 1):
                r1 = i + 1
                break
    r2 = n
    for i in range(r1 + 1, n):
        if not _is_vowel(word, i) and _is_vowel(word, i - 1):
            r2 = i + 1
            break
    return r1, r2


def _ends_short_syllable(word: str) -> bool:
    """Short syllable: (c) v (non-vowel other than w, x, Y) at the end, or
    a vowel followed by a non-vowel at the start of the word."""
    n = len(word)
    if n == 2:
        return _is_vowel(word, 0) and not _is_vowel(word, 1)
    if n >= 3:
        c1, v, c2 = word[-3], word[-2], word[-1]
        return (v in VOWELS and c2 not in VOWELS and c2 not in "wxY"
                and c1 not in VOWELS)
    return False


def _is_short(word: str, r1: int) -> bool:
    return r1 >= len(word) and _ends_short_syllable(word)


def porter2(word: str) -> str:
    if len(word) <= 2:
        return word
    word = word.replace("’", "'")
    if word[0] == "'":
        word = word[1:]
    if word in _EXCEPTIONS:
        return _EXCEPTIONS[word]

    # mark consonant-y
    if word and word[0] == "y":
        word = "Y" + word[1:]
    chars = list(word)
    for i in range(1, len(chars)):
        if chars[i] == "y" and chars[i - 1] in VOWELS:
            chars[i] = "Y"
    word = "".join(chars)

    r1, r2 = _regions(word)

    # step 0: 's' / 's / '
    for sfx in ("'s'", "'s", "'"):
        if word.endswith(sfx):
            word = word[: -len(sfx)]
            break

    # step 1a
    if word.endswith("sses"):
        word = word[:-2]
    elif word.endswith(("ied", "ies")):
        word = word[:-3] + ("i" if len(word) > 4 else "ie")
    elif word.endswith(("us", "ss")):
        pass
    elif word.endswith("s"):
        if any(ch in VOWELS for ch in word[:-2]):
            word = word[:-1]

    if word in _EXCEPTIONS_1A:
        return word.replace("Y", "y")

    # step 1b
    if word.endswith(("eed", "eedly")):
        sfx = "eedly" if word.endswith("eedly") else "eed"
        if len(word) - len(sfx) >= r1:
            word = word[: -len(sfx)] + "ee"
    else:
        for sfx in ("ingly", "edly", "ing", "ed"):
            if word.endswith(sfx):
                stem = word[: -len(sfx)]
                if any(ch in VOWELS for ch in stem):
                    word = stem
                    if word.endswith(("at", "bl", "iz")):
                        word += "e"
                    elif word.endswith(DOUBLES):
                        word = word[:-1]
                    elif _is_short(word, r1):
                        word += "e"
                break

    # step 1c: y/Y -> i when preceded by a non-vowel that is not word-initial
    if (len(word) > 2 and word[-1] in "yY"
            and word[-2] not in VOWELS):
        word = word[:-1] + "i"

    # step 2 (suffix must lie in R1)
    for sfx, rep in _STEP2:
        if word.endswith(sfx):
            if len(word) - len(sfx) >= r1:
                word = word[: -len(sfx)] + rep
            break
    else:
        if word.endswith("ogi"):
            if len(word) - 3 >= r1 and len(word) > 3 and word[-4] == "l":
                word = word[:-1]
        elif word.endswith("li"):
            if (len(word) - 2 >= r1 and len(word) > 2
                    and word[-3] in LI_ENDINGS):
                word = word[:-2]

    # step 3 (suffix in R1; 'ative' needs R2)
    for sfx, rep in _STEP3:
        if word.endswith(sfx):
            if len(word) - len(sfx) >= r1:
                word = word[: -len(sfx)] + rep
            break
    else:
        if word.endswith("ative") and len(word) - 5 >= r2:
            word = word[:-5]

    # step 4 (suffix in R2; 'ion' only after s/t)
    for sfx in _STEP4:
        if word.endswith(sfx):
            if len(word) - len(sfx) >= r2:
                if sfx == "ion":
                    if len(word) > 3 and word[-4] in "st":
                        word = word[:-3]
                else:
                    word = word[: -len(sfx)]
            break

    # step 5
    if word.endswith("e"):
        if len(word) - 1 >= r2:
            word = word[:-1]
        elif (len(word) - 1 >= r1
              and not _ends_short_syllable(word[:-1])):
            word = word[:-1]
    elif word.endswith("l"):
        if len(word) - 1 >= r2 and len(word) > 1 and word[-2] == "l":
            word = word[:-1]

    return word.replace("Y", "y")


def stem_words(words: list[str]) -> list[str]:
    return [porter2(w) for w in words]
