"""Krovetz (KStem) inflectional stemmer — rule core.

The reference exposes a "krovetz" token filter backed by the external
KrovetzStemmer C++ library (reference src/token_filter.cpp:29-39,77-79),
which is R. Krovetz's 1993 dictionary-backed inflectional stemmer: a word
is looked up in a headword dictionary first, and only the inflectional
suffixes (plural -s/-es/-ies, past -ed, aspect -ing) are removed, with a
dictionary probe deciding each spelling repair (e-restoration,
consonant undoubling, y-restoration).

This module implements that algorithm's full decision structure.  The
one thing it cannot ship is the KStem headword list itself (a data file,
not in this container — declared in SURVEY §2.2): callers who have one
pass it as ``lexicon=``; without it the dictionary probes fall back to
deterministic orthographic heuristics (Porter-style CVC short-syllable
test for e-restoration, undouble-except-ll/ss/zz) plus a small embedded
exception table for the irregulars those heuristics get wrong.  The
rules, probe order and early-exit behavior match the published
algorithm; only the lexicon breadth differs, and it is pluggable.
"""

from __future__ import annotations

_VOWELS = frozenset("aeiouy")

# Irregular plurals / past forms the rule machinery cannot derive; the
# direct-conflation role of KStem's exception table.
_DIRECT = {
    "children": "child", "feet": "foot", "geese": "goose", "teeth": "tooth",
    "mice": "mouse", "men": "man", "women": "woman", "people": "person",
    "oxen": "ox", "lives": "life", "wives": "wife", "knives": "knife",
    "leaves": "leaf", "halves": "half", "selves": "self", "wolves": "wolf",
    "indices": "index", "matrices": "matrix", "vertices": "vertex",
    "analyses": "analysis", "crises": "crisis", "theses": "thesis",
    "media": "medium", "data": "datum", "criteria": "criterion",
    "phenomena": "phenomenon",
    "went": "go", "gone": "go", "ran": "run", "made": "make",
    "said": "say", "took": "take", "taken": "take", "came": "come",
    "saw": "see", "seen": "see", "knew": "know", "known": "know",
    "found": "find", "gave": "give", "given": "give", "told": "tell",
    "became": "become", "began": "begin", "begun": "begin",
    "brought": "bring", "bought": "buy", "thought": "think",
    "held": "hold", "kept": "keep", "left": "leave", "felt": "feel",
    "met": "meet", "paid": "pay", "sent": "send", "built": "build",
    "spent": "spend", "lost": "lose", "meant": "mean", "wrote": "write",
    "written": "write", "stood": "stand", "understood": "understand",
    "heard": "hear", "led": "lead", "read": "read", "sat": "sit",
    "spoke": "speak", "spoken": "speak", "won": "win", "worn": "wear",
    "wore": "wear", "chose": "choose", "chosen": "choose",
    "grew": "grow", "grown": "grow", "drew": "draw", "drawn": "draw",
    "threw": "throw", "thrown": "throw", "flew": "fly", "flown": "fly",
}

# Words that look inflected but are not (KStem leaves them alone).
_INVARIANT = frozenset((
    "news", "series", "species", "analysis", "basis", "crisis", "thesis",
    "canvas", "bias", "atlas", "alias", "gas", "lens", "chaos", "cosmos",
    "physics", "mathematics", "economics", "politics", "statistics",
    "athletics", "ethics", "genetics", "linguistics", "always", "perhaps",
    "during", "ring", "king", "thing", "spring", "string", "wing",
    "sing", "sting", "bring", "morning", "evening", "sibling", "ceiling",
    "darling", "sterling", "shilling", "dumpling", "duckling",
    "bed", "red", "fed", "wed", "shed", "bleed", "breed",
    "creed", "feed", "greed", "need", "seed", "speed", "steed", "weed",
    "proceed", "exceed", "succeed", "indeed", "hundred", "sacred",
    "infrared", "wicked", "wretched", "naked", "crooked",
    "rugged", "ragged", "jagged", "beloved",
))

# Drop-ing forms where the plain stem keeps a silent e ("hoping"->"hope"):
# the cases the CVC heuristic below would miss or over-fire on.
_E_RESTORE = frozenset((
    "hop", "car", "mak", "tak", "com", "giv", "hav", "liv", "mov", "lov",
    "us", "writ", "driv", "rid", "chang", "charg", "manag", "judg",
    "measur", "pleas", "increas", "decreas", "releas", "purchas", "caus",
    "clos", "creat", "stat", "not", "provid", "decid", "describ",
    "believ", "receiv", "achiev", "serv", "observ", "deserv", "reserv",
    "improv", "prov", "remov", "approv", "involv", "solv", "leas",
    "rais", "advis", "compris", "surpris", "exercis", "promis",
    "produc", "reduc", "introduc", "announc", "experienc", "influenc",
    "referenc", "financ", "balanc", "chas", "phras", "invit", "requir",
    "acquir", "inquir", "retir", "compar", "prepar", "declar", "shar",
    "star", "stor", "scor", "ignor", "explor", "captur", "featur",
    "pictur", "structur", "configur", "secur", "ensur", "insur",
    "assur", "schedul", "rul", "sampl", "fil", "smil", "compil", "styl",
    "cycl", "recycl", "handl", "bundl", "enabl", "disabl", "doubl",
    "troubl", "assembl", "resembl", "settl", "titl", "battl", "puzzl",
    "tackl", "wrestl", "escap", "shap", "scrap", "trad", "upgrad",
    "fad", "shad", "invad", "persuad", "guid", "slid", "divid", "hid",
    "abid", "excit", "unit", "ignit", "recit", "cit", "vot",
    "quot", "promot", "devot", "rotat", "navigat", "updat", "validat",
    "generat", "operat", "integrat", "iterat", "separat", "celebrat",
    "demonstrat", "illustrat", "concentrat", "evaluat", "estimat",
    "calculat", "simulat", "regulat", "translat", "relat", "isolat",
    "populat", "templat", "delegat", "negotiat", "initiat", "locat",
    "allocat", "indicat", "communicat", "dedicat", "duplicat",
    "replicat", "educat", "complicat",
))


def _has_vowel(word: str) -> bool:
    return any(c in _VOWELS for c in word)


def _cvc_short(word: str) -> bool:
    """One vowel group, ending consonant-vowel-consonant with the final
    consonant not w/x/y — Porter's short-word shape, used as the
    e-restoration heuristic when no dictionary is available ("hop"+e but
    not "open": two vowel groups means the final syllable is unstressed
    and the e was never there)."""
    if len(word) < 3:
        return False
    a, b, c = word[-3], word[-2], word[-1]
    if not (a not in _VOWELS and b in _VOWELS
            and c not in _VOWELS and c not in "wxy"):
        return False
    groups = 0
    prev_vowel = False
    for ch in word:
        v = ch in _VOWELS
        if v and not prev_vowel:
            groups += 1
        prev_vowel = v
    return groups == 1


class KrovetzStemmer:
    """kstem_stemmer() equivalent. ``lexicon`` is an optional headword
    set consulted before and during suffix removal, exactly where KStem
    probes its dictionary; entries win over every heuristic."""

    def __init__(self, lexicon: set[str] | None = None):
        self.lexicon = lexicon or set()

    def _in_dict(self, word: str) -> bool:
        return word in self.lexicon

    def stem(self, word: str) -> str:
        if len(word) < 3 or not word.isalpha():
            return word
        if word in _DIRECT:
            return _DIRECT[word]
        if word in _INVARIANT or self._in_dict(word):
            return word
        word = self._plural(word)
        word = self._past(word)
        word = self._aspect(word)
        return word

    # -- step 1: plural ------------------------------------------------
    def _plural(self, w: str) -> str:
        if not w.endswith("s") or w.endswith("ss") or w.endswith("us"):
            return w
        if w.endswith("ies") and len(w) > 4:
            if self._in_dict(w[:-1]):  # "ties" -> "tie"
                return w[:-1]
            return w[:-3] + "y"        # "cities" -> "city"
        if w.endswith("es"):
            stem = w[:-2]
            # -es after sibilants is pure inflection: boxes, churches,
            # classes — but a single trailing s is usually the noun's own
            # e-form ("houses" -> "house"), so require x/z/ch/sh/ss
            if stem.endswith(("ss", "x", "z", "ch", "sh")):
                return stem
            if self._in_dict(w[:-1]) or not self._in_dict(stem):
                return w[:-1]          # "houses" -> "house"
            return stem
        if len(w) > 3:                 # plain -s: "dogs" -> "dog"
            return w[:-1]
        return w

    # -- step 2: past tense --------------------------------------------
    def _past(self, w: str) -> str:
        if len(w) <= 3 or not w.endswith("ed"):
            return w
        if w.endswith("ied"):
            if len(w) == 4 or self._in_dict(w[:-1]):
                return w[:-1]          # "died" -> "die", "tied" -> "tie"
            return w[:-3] + "y"        # "tried" -> "try"
        stem = w[:-2]
        if not _has_vowel(stem):
            return w
        if len(stem) > 1 and stem[-1] == stem[-2] and stem[-1] not in "lsz":
            und = stem[:-1]            # "dropped" -> "drop"
            if not self._in_dict(stem) or self._in_dict(und):
                return und
            return stem
        if self._in_dict(stem + "e"):
            return stem + "e"          # dictionary e-restoration
        if self._in_dict(stem):
            return stem
        if stem in _E_RESTORE or _cvc_short(stem) or stem.endswith(("iz", "yz")):
            return stem + "e"          # "hoped" -> "hope", "sized" -> "size"
        return stem                    # "opened" -> "open"

    # -- step 3: -ing aspect -------------------------------------------
    def _aspect(self, w: str) -> str:
        if len(w) <= 5 or not w.endswith("ing"):
            return w
        stem = w[:-3]
        if not _has_vowel(stem):
            return w
        if len(stem) > 1 and stem[-1] == stem[-2] and stem[-1] not in "lsz":
            und = stem[:-1]            # "running" -> "run"
            if not self._in_dict(stem) or self._in_dict(und):
                return und
            return stem
        if self._in_dict(stem + "e"):
            return stem + "e"
        if self._in_dict(stem):
            return stem
        if stem.endswith("y") and self._in_dict(stem[:-1] + "ie"):
            return stem[:-1] + "ie"    # "dying" handled in _DIRECT-less dicts
        if stem in _E_RESTORE or stem.endswith(("iz", "yz")) or (
                _cvc_short(stem) and not stem.endswith("n")):
            return stem + "e"          # "hoping" -> "hope", "-izing" -> "-ize"
        return stem                    # "opening" -> "open"


def kstem_words(words: list[str], lexicon: set[str] | None = None) -> list[str]:
    st = KrovetzStemmer(lexicon)
    return [st.stem(w) for w in words]
