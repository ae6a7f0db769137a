"""Krovetz (KStem) inflectional stemmer — rule core.

The reference exposes a "krovetz" token filter backed by the external
KrovetzStemmer C++ library (reference src/token_filter.cpp:29-39,77-79),
which is R. Krovetz's 1993 dictionary-backed inflectional stemmer: a word
is looked up in a headword dictionary first, and only the inflectional
suffixes (plural -s/-es/-ies, past -ed, aspect -ing) are removed, with a
dictionary probe deciding each spelling repair (e-restoration,
consonant undoubling, y-restoration).

This module implements that algorithm's full decision structure, backed
by three lexicon layers (KStem's own data file is not redistributable in
this container — declared in SURVEY §2.2 — so the layers substitute for
it and stay pluggable):

1. ``BASE_LEXICON`` — an embedded curated set of common English
   headwords covering the probe-sensitive shapes (silent-e verbs, nouns
   whose -es plural strips to an e-form, undoubling candidates), always
   consulted unless ``use_base=False``.
2. ``lexicon=`` — any caller-supplied headword set (e.g. a real KStem
   dictionary file, or :func:`corpus_lexicon` output) is unioned in;
   entries win over every heuristic, exactly where KStem probes its
   dictionary.
3. Deterministic orthographic fallbacks for words neither layer knows
   (Porter-style CVC short-syllable test for e-restoration,
   undouble-except-ll/ss/zz) plus the embedded irregulars table.

At corpus scale the dictionary is DERIVED FROM THE COLLECTION:
:func:`corpus_lexicon` treats the corpus vocabulary minus its derivable
inflections as the headword set (a surface form whose stem candidates
also occur standing alone is an inflection, everything else is a
headword), and :func:`kstem_lexicon_from_index` materializes that from a
built index's lexicon in one df-ordered scan.  The rules, probe order
and early-exit behavior match the published algorithm.
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


# Embedded headword base: common English words at the probe-sensitive
# shapes. Only UNINFLECTED forms may appear here (an inflected entry
# would short-circuit stem() and return itself). Grouped by the probe
# each group serves.
BASE_LEXICON = frozenset((
    # silent-e verbs: decide e-restoration for -ed/-ing and -es strips
    "ache", "achieve", "acquire", "admire", "advise", "agree", "allocate",
    "announce", "approve", "argue", "arrange", "arrive", "assemble",
    "assume", "assure", "balance", "bake", "base", "bathe", "battle",
    "behave", "believe", "blame", "bounce", "brake", "breathe", "bundle",
    "calculate", "capture", "care", "carve", "cause", "cease", "celebrate",
    "change", "charge", "chase", "choose", "circle", "cite", "close",
    "combine", "come", "communicate", "compare", "compete", "compile",
    "complete", "complicate", "comprise", "concentrate", "configure",
    "confuse", "continue", "contribute", "create", "cycle", "dance",
    "date", "debate", "decide", "declare", "decline", "decorate",
    "decrease", "dedicate", "define", "delegate", "delete", "demonstrate",
    "derive", "describe", "deserve", "devote", "dine", "disable",
    "distribute", "divide", "dominate", "donate", "double", "drive",
    "duplicate", "educate", "eliminate", "emerge", "enable", "encourage",
    "engage", "ensure", "erase", "escape", "estimate", "evaluate",
    "examine", "exchange", "excite", "exclude", "excuse", "exercise",
    "expire", "explore", "expose", "face", "fade", "feature", "figure",
    "file", "finance", "fine", "force", "frame", "freeze", "gaze",
    "generate", "give", "glance", "grade", "guide", "handle", "hate",
    "have", "hide", "hire", "hope", "hype", "ignite", "ignore",
    "illustrate", "imagine", "improve", "include", "increase", "indicate",
    "influence", "initiate", "inquire", "inspire", "insure", "integrate",
    "introduce", "invade", "invite", "involve", "isolate", "issue",
    "iterate", "judge", "lease", "leave", "like", "line", "live",
    "locate", "love", "make", "manage", "measure", "merge", "move",
    "name", "navigate", "negotiate", "note", "notice", "observe",
    "operate", "oppose", "organize", "owe", "pause", "persuade", "phrase",
    "picture", "place", "please", "populate", "pose", "praise", "prepare",
    "preserve", "pressure", "presume", "price", "produce", "promise",
    "promote", "pronounce", "propose", "prove", "provide", "purchase",
    "pursue", "puzzle", "quote", "raise", "rate", "receive", "recite",
    "recognize", "recycle", "reduce", "reference", "refuse", "regulate",
    "relate", "release", "relocate", "remove", "replace", "replicate",
    "require", "resemble", "reserve", "resolve", "retire", "reverse",
    "ride", "rotate", "rule", "sample", "save", "schedule", "score",
    "secure", "seize", "sense", "separate", "serve", "settle", "shape",
    "share", "simulate", "size", "slide", "smile", "smoke", "solve",
    "source", "spare", "square", "stare", "state", "store", "structure",
    "style", "surprise", "tackle", "take", "tape", "taste", "template",
    "tie", "time", "title", "trace", "trade", "translate", "trouble",
    "type", "unite", "update", "upgrade", "use", "validate", "value",
    "vote", "wake", "waste", "wave", "welcome", "wire", "wrestle",
    "write",
    # e-final nouns: keep "houses" -> "house"-style -es strips honest
    "base", "bike", "bone", "bottle", "bridge", "bubble", "cable", "cake",
    "candle", "case", "cave", "code", "college", "course", "craze",
    "crane", "cube", "culture", "curve", "database", "degree", "device",
    "disease", "distance", "dome", "dose", "edge", "employee", "engine",
    "episode", "estate", "example", "experience", "eye", "fate", "fire",
    "flame", "fortune", "gate", "game", "gene", "globe", "grape",
    "grove", "hole", "home", "horse", "house", "image", "instance",
    "interface", "knife", "lake", "language", "lane", "license", "life",
    "machine", "maze", "message", "mile", "mine", "minute", "mistake",
    "mode", "module", "mouse", "movie", "muscle", "node", "noise", "nose",
    "nurse", "office", "outcome", "package", "page", "palace", "particle",
    "phase", "phone", "phrase", "pile", "pipe", "plane", "plate",
    "praise", "principle", "prince", "prize", "probe", "purpose", "purse",
    "race", "range", "recipe", "response", "rose", "route", "sauce",
    "scale", "scene", "science", "sentence", "service",
    "shade", "shore", "side", "site", "slope", "space", "sphere", "stage",
    "stake", "stone", "stove", "suite", "surface", "table", "theme",
    "tide", "tile", "tone", "tribe", "tube", "vehicle", "village", "vine",
    "voice", "wage", "wine", "zone",
    # undoubling candidates: "planned" -> "plan" but "dropped" vs "dross"
    "admit", "bat", "beg", "begin", "chat", "chip", "clip", "commit",
    "control", "cut", "dig", "drag", "drop", "drum", "equip", "fit",
    "flag", "flip", "forget", "grab", "grin", "grip", "hit", "hop", "hug",
    "jog", "knit", "map", "nod", "occur", "omit", "pat", "permit", "pin",
    "plan", "plug", "pop", "prefer", "put", "quit", "refer", "regret",
    "rip", "rob", "rub", "run", "scan", "set", "ship", "shop", "shrug",
    "sit", "skip", "slam", "slip", "snap", "spin", "spot", "star", "stem",
    "step", "stir", "stop", "strip", "submit", "swim", "tag", "tap",
    "top", "transmit", "trap", "travel", "trim", "trip", "tug", "wrap",
    "zip",
    # consonant-final verbs/nouns the plain strips should NOT e-restore
    "act", "add", "answer", "appear", "ask", "attack", "attend", "avoid",
    "await", "award", "bend", "boost", "borrow", "breach", "breakfast",
    "broadcast", "build", "burn", "buy", "call", "catch", "check",
    "claim", "clean", "clear", "click", "climb", "coat", "collect",
    "comment", "connect", "consist", "contain", "cook", "count", "cover",
    "crash", "credit", "cross", "deal", "deliver", "demand", "depend",
    "design", "destroy", "detect", "develop", "differ", "direct",
    "discuss", "display", "download", "draw", "dream", "dress", "drink",
    "earn", "eat", "edit", "employ", "end", "enjoy", "enter", "exist",
    "exit", "expand", "expect", "explain", "export", "express", "extend",
    "fail", "fall", "fear", "feed", "feel", "fill", "filter", "find",
    "finish", "fix", "float", "flood", "flow", "fold", "follow", "form",
    "gain", "gather", "glow", "grant", "group", "grow", "happen",
    "harvest", "head", "hear", "heat", "help", "hold", "host", "hunt",
    "import", "inform", "insist", "install", "instruct", "interact",
    "invent", "invest", "join", "jump", "keep", "kick", "kill", "know",
    "land", "last", "laugh", "launch", "lead", "lean", "learn", "lend",
    "level", "lift", "light", "limit", "link", "list", "listen", "load",
    "lock", "look", "mail", "maintain", "march", "mark", "market",
    "match", "matter", "mean", "meet", "mention", "mix", "model",
    "monitor", "mount", "need", "number", "obtain", "offer", "open",
    "order", "own", "pack", "paint", "park", "pass", "pay", "perform",
    "pick", "plant", "play", "point", "poll", "post", "pour", "power",
    "predict", "present", "press", "prevent", "print", "process",
    "profit", "project", "protect", "protest", "pull", "push", "reach",
    "record", "reflect", "reform", "remain", "remember", "remind",
    "render", "rent", "repair", "repeat", "report", "represent",
    "request", "respond", "rest", "result", "return", "reveal", "review",
    "reward", "risk", "roll", "sail", "search", "season", "seek", "seem",
    "select", "sell", "send", "shift", "shout", "show", "sign", "signal",
    "sleep", "sort", "sound", "speak", "spell", "spend", "split",
    "sprint", "stand", "start", "stay", "stream", "stretch", "submit",
    "succeed", "suffer", "suggest", "support", "surround", "sustain",
    "switch", "talk", "teach", "tell", "tend", "test", "thank", "think",
    "touch", "track", "train", "transform", "treat", "trend", "trust",
    "turn", "visit", "wait", "walk", "want", "warn", "wash", "watch",
    "wear", "weigh", "win", "wish", "wonder", "work", "yield",
    # -ing headwords KStem's dictionary keeps whole
    "building", "feeling", "meaning", "meeting", "painting", "warning",
    "wedding",
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
    probes its dictionary; entries win over every heuristic. The embedded
    :data:`BASE_LEXICON` is unioned in unless ``use_base=False`` (bare
    rule machinery, for tests and heuristic-fallback comparison)."""

    def __init__(self, lexicon: set[str] | frozenset[str] | None = None,
                 use_base: bool = True):
        if use_base:
            self.lexicon = BASE_LEXICON | lexicon if lexicon else BASE_LEXICON
        else:
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
        # KStem re-probes the dictionary after each removal step and
        # stops at the first recognized form ("buildings" -> "building"
        # ends at the -s step because "building" is a headword).
        word = self._plural(word)
        if word in _INVARIANT or self._in_dict(word):
            return word
        word = self._past(word)
        if word in _INVARIANT or self._in_dict(word):
            return word
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


# ------------------------------------------------ corpus-derived lexicon

def _derivable(t: str, vocab: set[str]) -> bool:
    """True if t looks like an inflection of another vocabulary word:
    some candidate the rule machinery would strip it to also occurs in
    the corpus standing alone."""
    if t.endswith("s") and not t.endswith(("ss", "us")) and len(t) > 3:
        cands = [t[:-1]]
        if t.endswith("es"):
            cands.append(t[:-2])
        if t.endswith("ies"):
            cands.append(t[:-3] + "y")
        if any(len(c) > 1 and c in vocab for c in cands):
            return True
    if t.endswith("ed") and len(t) > 4:
        s = t[:-2]
        cands = [s, s + "e"]
        if len(s) > 1 and s[-1] == s[-2]:
            cands.append(s[:-1])
        if t.endswith("ied"):
            cands += [t[:-1], t[:-3] + "y"]
        if _has_vowel(s) and any(c in vocab for c in cands):
            return True
    if t.endswith("ing") and len(t) > 5:
        s = t[:-3]
        cands = [s, s + "e"]
        if len(s) > 1 and s[-1] == s[-2]:
            cands.append(s[:-1])
        if _has_vowel(s) and any(c in vocab for c in cands):
            return True
    return False


def corpus_lexicon(terms, min_len: int = 2) -> frozenset[str]:
    """Derive a KStem headword set from a corpus vocabulary.

    KStem's dictionary file is a list of English headwords; at web scale
    the collection itself is the best available stand-in — a surface form
    is treated as a headword unless it is DERIVABLE: it carries an
    inflectional suffix and one of its rule-machinery stem candidates
    also occurs in the vocabulary ("running" is an inflection because
    "run" occurs; "ring"/"string" are headwords because "r"/"str" do
    not). Approximation vs the real dictionary: corpus-frequent -ing
    nominals whose verb also occurs ("building"/"build") classify as
    inflections — the embedded BASE_LEXICON carries the common ones.
    """
    vocab = {t for t in terms
             if len(t) >= min_len and t.isalpha() and t.islower()}
    return frozenset(t for t in vocab if not _derivable(t, vocab))


def kstem_lexicon_from_index(index, max_terms: int = 1 << 21) -> frozenset[str]:
    """Materialize :func:`corpus_lexicon` from a built index's lexicon:
    one column-pruned scan, df-descending so a ``max_terms`` cap keeps
    the dictionary-grade (frequent) vocabulary and drops the tail noise.
    Driver memory is bounded by ``max_terms`` strings."""
    from pyspark.sql import functions as F

    rows = (index.lexicon
            .select("term", "df")
            .where(F.col("term").rlike("^[a-z]+$"))
            .orderBy(F.col("df").desc(), "term")
            .limit(max_terms)
            .collect())
    return corpus_lexicon(r["term"] for r in rows)
