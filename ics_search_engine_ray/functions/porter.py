"""Porter stemmer in NLTK's default NLTK_EXTENSIONS mode.

The reference stems with ``nltk.stem.PorterStemmer()`` (reference:
utils/tokenizer.py:3,21), whose DEFAULT mode is not the 1980 paper but
NLTK_EXTENSIONS — the paper algorithm (M.F. Porter, "An algorithm for suffix
stripping", Program 14(3), 1980) plus NLTK's documented additions. NLTK is
not available in this environment, so this is a from-scratch implementation
of those published semantics:

- irregular-forms pool (sky/dying/lying/tying/news/innings/outings/
  cannings/howe/proceed/exceed/succeed) returned verbatim,
- step 1a: 'ies' on 4-letter words -> 'ie' (dies->die, not di),
- step 1b: 'ied' -> 'ie' (4-letter) / 'i' (longer), before the eed rule,
- step 1c: y -> i only when preceded by a consonant in a stem of length > 1
  (enjoy->enjoy, say->say; the paper's vowel-in-stem test gave enjoi/sai),
- step 2: 'bli' -> 'ble' replaces the paper's 'abli' -> 'able'; 'alli' ->
  'al' applies first with a re-run of step 2; extra rules 'fulli' -> 'ful'
  and 'logi' -> 'log' (measure taken on word[:-3], keeping the l),
- words of length <= 2 returned unchanged (guarantees stems >= 2 chars).

Divergences are pinned by tests/test_functions.py goldens derived from the
published NLTK behaviour.
"""

from __future__ import annotations

_VOWELS = frozenset("aeiou")

# NLTK_EXTENSIONS irregular forms (nltk/stem/porter.py, public source)
_POOL = {
    "sky": "sky", "skies": "sky",
    "dying": "die", "lying": "lie", "tying": "tie",
    "news": "news",
    "innings": "inning", "inning": "inning",
    "outings": "outing", "outing": "outing",
    "cannings": "canning", "canning": "canning",
    "howe": "howe",
    "proceed": "proceed", "exceed": "exceed", "succeed": "succeed",
}


def _is_cons(w: str, i: int) -> bool:
    c = w[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return True if i == 0 else not _is_cons(w, i - 1)
    return True


def _measure(stem: str) -> int:
    """Number of VC sequences in `stem` ([C](VC)^m[V])."""
    m = 0
    i = 0
    n = len(stem)
    # skip initial consonants
    while i < n and _is_cons(stem, i):
        i += 1
    while i < n:
        # in vowel run
        while i < n and not _is_cons(stem, i):
            i += 1
        if i >= n:
            break
        m += 1
        while i < n and _is_cons(stem, i):
            i += 1
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(w: str) -> bool:
    return len(w) >= 2 and w[-1] == w[-2] and _is_cons(w, len(w) - 1)


def _cvc(w: str) -> bool:
    """stem ends cvc where the final c is not w, x or y."""
    if len(w) < 3:
        return False
    n = len(w)
    if not (_is_cons(w, n - 3) and not _is_cons(w, n - 2) and _is_cons(w, n - 1)):
        return False
    return w[-1] not in "wxy"


def _replace_m(word: str, suffix: str, repl: str, min_m: int) -> str | None:
    """If word ends `suffix` and measure(stem) > min_m-1... Returns None on no-op."""
    if not word.endswith(suffix):
        return None
    stem = word[: len(word) - len(suffix)]
    if _measure(stem) >= min_m:
        return stem + repl
    return word  # suffix matched but condition failed: stop rule scanning


_STEP2 = [
    # NLTK_EXTENSIONS list: 'bli'->'ble' replaces the paper's 'abli'->'able';
    # 'fulli'->'ful' appended; 'logi'->'log' handled separately (special
    # condition on word[:-3])
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
    ("izer", "ize"), ("bli", "ble"), ("alli", "al"), ("entli", "ent"),
    ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
    ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
    ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
    ("fulli", "ful"),
]

_STEP3 = [
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
]

_STEP4 = [
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
]


def _step1a(w: str) -> str:
    if w.endswith("ies") and len(w) == 4:
        return w[:-1]                        # NLTK: dies -> die, ties -> tie
    if w.endswith("sses"):
        return w[:-2]
    if w.endswith("ies"):
        return w[:-2]
    if w.endswith("ss"):
        return w
    if w.endswith("s"):
        return w[:-1]
    return w


def _step1b(w: str) -> str:
    if w.endswith("ied"):
        # NLTK: spied -> spi but died -> die
        return w[:-1] if len(w) == 4 else w[:-2]
    if w.endswith("eed"):
        stem = w[:-3]
        if _measure(stem) > 0:
            return w[:-1]
        return w
    flag = False
    if w.endswith("ed"):
        stem = w[:-2]
        if _has_vowel(stem):
            w = stem
            flag = True
    elif w.endswith("ing"):
        stem = w[:-3]
        if _has_vowel(stem):
            w = stem
            flag = True
    if flag:
        if w.endswith(("at", "bl", "iz")):
            return w + "e"
        if _ends_double_cons(w) and w[-1] not in "lsz":
            return w[:-1]
        if _measure(w) == 1 and _cvc(w):
            return w + "e"
    return w


def _step1c(w: str) -> str:
    # NLTK condition: y -> i iff the stem ends in a consonant and has
    # length > 1 (the paper used "stem contains a vowel")
    stem = w[:-1]
    if w.endswith("y") and len(stem) > 1 and _is_cons(stem, len(stem) - 1):
        return stem + "i"
    return w


def _step2(w: str) -> str:
    # NLTK pre-rule: 'alli' -> 'al' applies FIRST (before the ordered list)
    # and, on success, re-runs step 2 on the result
    if w.endswith("alli") and _measure(w[:-4]) > 0:
        return _step2(w[:-4] + "al")
    for suffix, repl in _STEP2:
        if w.endswith(suffix):
            stem = w[: len(w) - len(suffix)]
            if _measure(stem) > 0:
                return stem + repl
            return w
    # NLTK 'logi' -> 'log': measure condition on word[:-3] (the 'l' stays
    # with the stem, so geo-/theo- work like archaeo-)
    if w.endswith("logi") and _measure(w[:-3]) > 0:
        return w[:-4] + "log"
    return w


def _step3(w: str) -> str:
    for suffix, repl in _STEP3:
        if w.endswith(suffix):
            stem = w[: len(w) - len(suffix)]
            if _measure(stem) > 0:
                return stem + repl
            return w
    return w


def _step4(w: str) -> str:
    for suffix in _STEP4:
        if w.endswith(suffix):
            stem = w[: len(w) - len(suffix)]
            if _measure(stem) > 1:
                if suffix == "ion" and (not stem or stem[-1] not in "st"):
                    return w
                return stem
            return w
    return w


def _step5a(w: str) -> str:
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1:
            return stem
        if m == 1 and not _cvc(stem):
            return stem
    return w


def _step5b(w: str) -> str:
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        return w[:-1]
    return w


def porter_stem(word: str) -> str:
    """Stem a single lowercase word (NLTK_EXTENSIONS semantics)."""
    if word in _POOL:
        return _POOL[word]
    if len(word) <= 2:
        return word
    w = _step1a(word)
    w = _step1b(w)
    w = _step1c(w)
    w = _step2(w)
    w = _step3(w)
    w = _step4(w)
    w = _step5a(w)
    w = _step5b(w)
    return w
