"""Unit tests for the pure per-record functions (SURVEY.md §5 item 1)."""

import re

import numpy as np
import pytest

from ics_search_engine_ray.config import STOP_WORDS, TAG_WEIGHTS, DEFAULT_CONFIG
from ics_search_engine_ray.functions.porter import porter_stem
from ics_search_engine_ray.functions.tokenizer import Tokenizer, tokenize_text
from ics_search_engine_ray.functions.textclean import clean_text
from ics_search_engine_ray.functions.simhash import (
    SimHasher, fingerprint_to_bitstring, hamming_bytes, hamming_matrix,
    fps_to_matrix, word_hash_bits,
)
from ics_search_engine_ray.functions.varint import (
    encode_varints, decode_varints, encode_sorted, decode_sorted,
)
from ics_search_engine_ray.functions.htmlx import extract_page


# ---------- Porter (NLTK_EXTENSIONS mode — what the reference's
# nltk.PorterStemmer() actually runs; paper vectors below are unchanged
# by the extensions except 'ties') ----------

PORTER_GOLDEN = {
    "caresses": "caress", "ponies": "poni", "ties": "tie", "caress": "caress",
    "cats": "cat", "feed": "feed", "agreed": "agre", "plastered": "plaster",
    "motoring": "motor", "sing": "sing", "conflated": "conflat",
    "hopping": "hop", "falling": "fall", "hissing": "hiss", "filing": "file",
    "happy": "happi", "sky": "sky", "relational": "relat",
    "conditional": "condit", "rational": "ration", "digitizer": "digit",
    "vietnamization": "vietnam", "operator": "oper", "feudalism": "feudal",
    "decisiveness": "decis", "hopefulness": "hope", "formaliti": "formal",
    "formative": "form", "formalize": "formal", "electriciti": "electr",
    "electrical": "electr", "hopeful": "hope", "goodness": "good",
    "revival": "reviv", "allowance": "allow", "inference": "infer",
    "airliner": "airlin", "adjustable": "adjust", "defensible": "defens",
    "irritant": "irrit", "replacement": "replac", "adjustment": "adjust",
    "dependent": "depend", "adoption": "adopt", "communism": "commun",
    "activate": "activ", "homologous": "homolog", "effective": "effect",
    "bowdlerize": "bowdler", "probate": "probat", "rate": "rate",
    "cease": "ceas", "controlling": "control", "rolling": "roll",
}


def test_porter_paper_vectors():
    for w, want in PORTER_GOLDEN.items():
        assert porter_stem(w) == want, w


# NLTK_EXTENSIONS divergences from the 1980 paper, derived from NLTK's
# published porter.py (irregular pool; ies/ied on short words; the
# consonant-y condition in step 1c; bli/fulli/logi in step 2). The reference
# indexes through nltk.PorterStemmer(), so these ARE its semantics.
PORTER_NLTK_GOLDEN = {
    # irregular-forms pool
    "sky": "sky", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "news": "news", "innings": "inning", "inning": "inning",
    "outings": "outing", "outing": "outing", "cannings": "canning",
    "canning": "canning", "howe": "howe", "proceed": "proceed",
    "exceed": "exceed", "succeed": "succeed",
    # step 1a/1b short-word ies/ied
    "dies": "die", "ties": "tie", "flies": "fli", "cries": "cri",
    "died": "die", "tied": "tie", "spied": "spi", "cried": "cri",
    # step 1c consonant-y condition (paper mode gave enjoi / sai)
    "enjoy": "enjoy", "say": "say", "destroy": "destroy", "happy": "happi",
    # step 2 extensions (paper mode left carefulli / possibli untouched)
    "carefully": "care", "fully": "fulli", "wonderfully": "wonder",
    "possibly": "possibl", "freely": "freeli",
    "geology": "geolog", "biology": "biolog",
}


def test_porter_nltk_extension_vectors():
    for w, want in PORTER_NLTK_GOLDEN.items():
        assert porter_stem(w) == want, w


def test_porter_short_words_unchanged():
    for w in ("a", "is", "as", "be", "by"):
        assert porter_stem(w) == w


def test_porter_never_shorter_than_two():
    import random
    rng = random.Random(7)
    letters = "abcdefghijklmnopqrstuvwxyz"
    for _ in range(2000):
        w = "".join(rng.choice(letters) for _ in range(rng.randint(2, 12)))
        assert len(porter_stem(w)) >= 2


# ---------- tokenizer (reference utils/tokenizer.py:9-34 semantics) ----------

def test_tokenize_basic():
    assert tokenize_text("The Running-Dogs of WAR, a 2nd test!") == \
        ["the", "run", "dog", "of", "war", "2nd", "test"]


def test_tokenize_query_drops_stopwords_prestem():
    # stopwords removed before stemming; 'the'/'of'/'a' dropped
    assert tokenize_text("The Running-Dogs of WAR, a 2nd test!", for_query=True) == \
        ["run", "dog", "war", "2nd", "test"]


def test_tokenize_single_char_dropped_post_stem():
    assert tokenize_text("a b c x7 q") == ["x7"]


def test_tokenize_index_keeps_stopwords():
    toks = tokenize_text("the the the cat")
    assert toks.count("the") == 3


def test_tokenizer_nostem():
    assert tokenize_text("running dogs", stem=False) == ["running", "dogs"]


def test_tokenizer_cache_consistency():
    tk = Tokenizer()
    a = tk.tokens("compression compressed compressing")
    b = tk.tokens("compression compressed compressing")
    assert a == b == ["compress", "compress", "compress"]


# ---------- clean_text (reference document_processor.py:31-36) ----------

def test_clean_text_reference_regexes():
    cases = [
        "helloé world", "multi-part-word", "  a \t b\n c ",
        "emoji \U0001F600 stays", "￿ gone",
    ]
    for s in cases:
        t = re.sub("[-￿]", "", s)
        t = re.sub(r"[\-]", " ", t)
        t = re.sub(r"\s+", " ", t)
        assert clean_text(s) == t.strip(), repr(s)


# ---------- simhash (reference utils/simhash.py) ----------

def _ref_simhash(text: str) -> str:
    """Reference compute_simhash re-derived from simhash.py:8-47."""
    import hashlib
    tokens = tokenize_text(text)
    freq = {}
    for t in tokens:
        freq[t] = freq.get(t, 0) + 1
    V = [0] * 128
    for word, weight in freq.items():
        hv = bin(int(hashlib.md5(word.encode()).hexdigest(), 16))[2:].zfill(128)[-128:]
        for i in range(128):
            V[i] += weight if hv[i] == "1" else -weight
    return "".join("1" if v > 0 else "0" for v in V)


def test_simhash_matches_reference_formula():
    sh = SimHasher()
    for text in [
        "the quick brown fox jumps over the lazy dog",
        "spark table scan merge join order batch",
        "a b",  # all dropped -> empty token list
        "repeated repeated repeated words words",
    ]:
        fp = sh.fingerprint(tokenize_text(text))
        assert fingerprint_to_bitstring(fp) == _ref_simhash(text), text


def test_hamming():
    sh = SimHasher()
    f1 = sh.fingerprint(["alpha", "beta", "gamma"])
    f2 = sh.fingerprint(["alpha", "beta", "delta"])
    d = hamming_bytes(f1, f2)
    s1, s2 = fingerprint_to_bitstring(f1), fingerprint_to_bitstring(f2)
    assert d == sum(c1 != c2 for c1, c2 in zip(s1, s2))
    m = hamming_matrix(fps_to_matrix([f1, f2]))
    assert m[0, 1] == m[1, 0] == d and m[0, 0] == 0


# (banding pigeonhole exactness is covered by the brute-force equivalence
# test in tests/test_training_ops.py, over the real BandEmitter)


# ---------- varint ----------

def test_varint_roundtrip():
    rng = np.random.default_rng(0)
    for vals in [
        np.array([], dtype=np.uint64),
        np.array([0], dtype=np.uint64),
        np.array([0, 1, 127, 128, 129, 2**14 - 1, 2**14, 2**63 - 1, 2**64 - 1], dtype=np.uint64),
        rng.integers(0, 2**63, size=10_000).astype(np.uint64),
    ]:
        assert np.array_equal(decode_varints(encode_varints(vals)), vals)


def test_varint_sorted_roundtrip():
    rng = np.random.default_rng(1)
    vals = np.sort(rng.integers(0, 2**62, size=5000).astype(np.uint64))
    assert np.array_equal(decode_sorted(encode_sorted(vals)), vals)


# ---------- html extraction (reference document_processor.py:38-91) ----------

HTML = b"""<html><head><title> My Title </title></head><body>
<h1>Big Header</h1><h2>Sub</h2>
<p>First para with <b>bold text</b> here.</p>
<p>  Second para.  </p>
<a href="https://other.example.edu/x">x</a>
<a href="http://ext.example.com/y">y</a>
<a href="https://me.example.edu/self">self</a>
<a href="/relative">rel</a>
<b>bold text</b>
</body></html>"""


def test_extract_p_branch():
    pe = extract_page(HTML, "https://me.example.edu/self")
    assert pe.is_utf8 and pe.used_p_branch
    assert pe.text == "First para with bold text here. Second para."
    assert pe.title == "My Title"


def test_extract_weighted_tags_accumulate():
    pe = extract_page(HTML, "https://me.example.edu/self")
    w = dict(pe.weighted_text)
    assert w["My Title"] == 2.0
    assert w["Big Header"] == 1.5
    assert w["Sub"] == 1.0
    # 'bold text' appears in two <b> elements -> weights sum (0.5 + 0.5)
    assert w["bold text"] == 1.0


def test_extract_links_filter_self_and_relative():
    pe = extract_page(HTML, "https://me.example.edu/self")
    assert pe.links == ["http://ext.example.com/y", "https://other.example.edu/x"]


def test_extract_non_utf8_full_text_branch():
    html = "<html><body><p>café latte</p></body></html>".encode("latin-1")
    pe = extract_page(html, "u")
    assert not pe.is_utf8 and not pe.used_p_branch
    assert "caf" in pe.text and "latte" in pe.text


def test_extract_no_p_uses_full_text():
    html = b"<html><body><div>just a div</div><script>var x=1;</script></body></html>"
    pe = extract_page(html, "u")
    # full get_text includes script contents, like bs4
    assert not pe.used_p_branch
    assert "just a div" in pe.text and "var x=1;" in pe.text


def test_extract_broken_html():
    html = b"<html><body><p>open para <b>unclosed bold</body>"
    pe = extract_page(html, "u")
    assert "open para" in pe.text and "unclosed bold" in pe.text
    assert dict(pe.weighted_text).get("unclosed bold") == 0.5


def test_extract_nested_important_tags_count_both():
    html = b"<h1>Head <b>deep</b></h1>"
    pe = extract_page(html, "u")
    w = dict(pe.weighted_text)
    assert w["Head deep"] == 1.5 and w["deep"] == 0.5


def test_wordhash_vectorized_matches_scalar_reference():
    """Pin the vectorized polynomial word/shingle kernels against a
    straightforward per-word Python-int reimplementation of the same hash
    family (catches indexing/boundary bugs in the cumsum/reduceat tricks)."""
    import numpy as np
    from ics_search_engine_ray.functions.wordhash import (
        flat_word_hashes, batch_shingle_hashes)

    M = 1 << 64
    P = 0x100000001B3
    A = 0x9E3779B97F4A7C15
    LS = 0xD6E8FEB86659FD93

    def mix(x):
        z = (x + 0x9E3779B97F4A7C15) % M
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) % M
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) % M
        return z ^ (z >> 31)

    def word_h(w):
        b = w.encode("utf-8")
        h = 0
        for i, byte in enumerate(b):
            h = (h + byte * pow(P, i, M)) % M
        return mix((h + len(b) * LS) % M)

    def shingle_h(words):
        h = 0
        for i, w in enumerate(words):
            h = (h + word_h(w) * pow(A, len(words) - 1 - i, M)) % M
        return mix((h + len(words) * LS) % M)

    words = ["hello", "a", "über", "x" * 50, "b", "hello", "末端", ""]
    words = [w for w in words if w]          # split() never yields empty
    got = flat_word_hashes(words)
    want = np.array([word_h(w) for w in words], dtype=np.uint64)
    assert (got == want).all()

    texts = ["hello a über b hello",           # >= k windows
             "one two",                        # short doc: one whole shingle
             "",                               # empty: none
             "solo",                           # 1 word
             " ".join(f"w{i%7}" for i in range(40))]
    k = 3
    flat, offs = batch_shingle_hashes(texts, k)
    for i, t in enumerate(texts):
        ws = t.split()
        if not ws:
            want_sh = []
        elif len(ws) < k:
            want_sh = [shingle_h(ws)]
        else:
            want_sh = [shingle_h(ws[j:j + k]) for j in range(len(ws) - k + 1)]
        got_sh = flat[offs[i]:offs[i + 1]].tolist()
        assert got_sh == want_sh, f"doc {i}"
