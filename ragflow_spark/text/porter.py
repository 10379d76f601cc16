"""Porter stemming algorithm (Porter, 1980) — dependency-free.

The reference stems every English token with nltk's PorterStemmer
(rag/nlp/rag_tokenizer.py:296,331).  nltk is unavailable here, so this is
a from-scratch implementation of the published algorithm (steps 1a-5b).
Matches classic Porter on the standard vocabulary for the common cases;
nltk's "NLTK_EXTENSIONS" tweaks are intentionally not applied.
"""

from __future__ import annotations

_VOWELS = set("aeiou")


def _is_cons(word: str, i: int) -> bool:
    ch = word[i]
    if ch in _VOWELS:
        return False
    if ch == "y":
        return i == 0 or not _is_cons(word, i - 1)
    return True


def _measure(stem: str) -> int:
    """Number of VC sequences."""
    m = 0
    prev_c = True
    started = False
    for i in range(len(stem)):
        c = _is_cons(stem, i)
        if started and prev_c and not c:
            pass
        if not c:
            started = True
        if started and c and not prev_c:
            m += 1
        prev_c = c
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(word: str) -> bool:
    return (
        len(word) >= 2
        and word[-1] == word[-2]
        and _is_cons(word, len(word) - 1)
    )


def _cvc(word: str) -> bool:
    if len(word) < 3:
        return False
    if not (
        _is_cons(word, len(word) - 3)
        and not _is_cons(word, len(word) - 2)
        and _is_cons(word, len(word) - 1)
    ):
        return False
    return word[-1] not in "wxy"


def _replace(word: str, suffix: str, repl: str, min_measure: int) -> str | None:
    if not word.endswith(suffix):
        return None
    stem = word[: len(word) - len(suffix)]
    if _measure(stem) > min_measure - 1:
        return stem + repl
    return word


_STEP2 = [
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
    ("izer", "ize"), ("abli", "able"), ("alli", "al"), ("entli", "ent"),
    ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
    ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
    ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
]
_STEP3 = [
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
]
_STEP4 = [
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
]


def porter_stem(word: str) -> str:
    if len(word) <= 2:
        return word
    w = word

    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif not w.endswith("ss") and w.endswith("s"):
        w = w[:-1]

    # step 1b
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    else:
        flag = False
        if w.endswith("ed") and _has_vowel(w[:-2]):
            w = w[:-2]
            flag = True
        elif w.endswith("ing") and _has_vowel(w[:-3]):
            w = w[:-3]
            flag = True
        if flag:
            if w.endswith(("at", "bl", "iz")):
                w += "e"
            elif _ends_double_cons(w) and w[-1] not in "lsz":
                w = w[:-1]
            elif _measure(w) == 1 and _cvc(w):
                w += "e"

    # step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # step 2
    for suffix, repl in _STEP2:
        if w.endswith(suffix):
            res = _replace(w, suffix, repl, 1)
            if res is not None:
                w = res
            break

    # step 3
    for suffix, repl in _STEP3:
        if w.endswith(suffix):
            res = _replace(w, suffix, repl, 1)
            if res is not None:
                w = res
            break

    # step 4
    for suffix in _STEP4:
        if w.endswith(suffix):
            stem = w[: len(w) - len(suffix)]
            if suffix == "ion":
                pass
            if _measure(stem) > 1:
                w = stem
            break
    else:
        if w.endswith("ion") and len(w) > 3 and w[-4] in "st":
            stem = w[:-3]
            if _measure(stem) > 1:
                w = stem

    # step 5a
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _cvc(stem)):
            w = stem

    # step 5b
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]

    return w


# minimal WordNet-morphy-style noun lemmatization (nltk lemmatize default
# pos="n"), used upstream of stemming like the reference does
_LEMMA_RULES = [
    ("ches", "ch"), ("shes", "sh"), ("sses", "ss"), ("xes", "x"),
    ("zes", "z"), ("ves", "f"), ("ies", "y"), ("men", "man"), ("s", ""),
]
_LEMMA_KEEP = {
    "as", "is", "us", "bus", "gas", "this", "its", "was", "has", "his",
    "lens", "series", "species", "news", "plus", "ss", "yes", "does",
    "goes", "chaos", "axis", "basis", "crisis", "analysis", "thesis",
    "princess", "address", "process", "access", "class", "less", "loss",
    "cross", "press", "stress", "grass", "glass", "mass", "miss", "pass",
    "boss", "kiss", "dress", "business",
}


def lemmatize_noun(word: str) -> str:
    if word in _LEMMA_KEEP or len(word) <= 2:
        return word
    if word.endswith("men"):
        return word[:-3] + "man"
    if not word.endswith("s"):
        return word
    for suffix, repl in _LEMMA_RULES:
        if word.endswith(suffix):
            cand = word[: len(word) - len(suffix)] + repl
            if len(cand) >= 2:
                return cand
    return word
