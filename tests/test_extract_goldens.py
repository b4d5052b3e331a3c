"""Hand-authored HTML extraction goldens (VERDICT r1 item 3).

These pin the bs4-``html.parser`` semantics the reference relies on
(components/document_processor.py:38-91) INDEPENDENTLY of the corpus
generator: every expected value below was derived by hand from the
documented behaviour of BeautifulSoup's html.parser tree builder —
no-implied-end-tags nesting, _popToTag end-tag recovery, void elements,
get_text() node selection (comments/doctype out, script/style/CDATA in),
html.parser entity decoding — composed with the reference's branch rule,
tag-weight accumulation, link filter, and _clean_text regexes.

No fixture here is produced by extract_page itself; each `want` is a
hand-computed constant.
"""

import pytest

from ics_search_engine_ray.functions.htmlx import extract_page

U = "https://self.test/"


def ex(html, url=U):
    return extract_page(html.encode("utf-8") if isinstance(html, str) else html, url)


# ---- branch rule + basic extraction ----

def test_p_branch_simple():
    pe = ex("<html><body><p>Hello world.</p><p>Second para.</p></body></html>")
    assert pe.used_p_branch
    assert pe.text == "Hello world. Second para."


def test_no_p_full_text_includes_title():
    pe = ex("<html><head><title>T</title></head><body>Body text here</body></html>")
    assert not pe.used_p_branch
    assert pe.text == "TBody text here"
    assert pe.title == "T"
    assert dict(pe.weighted_text) == {"T": 2.0}


def test_non_utf8_forces_full_text_branch():
    # latin-1 bytes: has <p> but the utf-8 condition fails -> full text;
    # é (U+00E9) is then stripped by the -￿ clean
    pe = ex(b"<p>caf\xe9</p>")
    assert not pe.is_utf8
    assert not pe.used_p_branch
    assert pe.text == "caf"


# ---- html.parser tree semantics (no implied end tags) ----

def test_nested_p_counts_inner_text_twice():
    # html.parser does NOT auto-close <p>: second p nests inside the first,
    # find_all('p') = [outer, inner], outer.get_text() includes inner's text
    pe = ex("<div><p>a<p>b</p>c</p></div>")
    assert pe.text == "abc b"


def test_unclosed_p_at_eof_still_extracted():
    pe = ex("<p>alpha <b>beta</b>")
    assert pe.used_p_branch
    assert pe.text == "alpha beta"
    assert dict(pe.weighted_text) == {"beta": 0.5}


def test_outer_end_tag_implicitly_closes_inner():
    # </div> closes the still-open <b> (bs4 _popToTag): 'after' is outside b
    pe = ex("<div><b>bold text</div>after")
    assert dict(pe.weighted_text) == {"bold text": 0.5}
    assert pe.text == "bold textafter"


def test_end_p_implicitly_closes_bold():
    pe = ex("<p>x <b>y</p> z")
    assert pe.text == "x y"
    assert dict(pe.weighted_text) == {"y": 0.5}


def test_unmatched_end_tag_ignored():
    pe = ex("<p>a</div>b</p>")
    assert pe.text == "ab"


def test_div_inside_p_is_nested_not_closing():
    # html.parser has no HTML5 'p closes before block element' rule
    pe = ex("<p>one<div>two</div></p>")
    assert pe.text == "onetwo"


# ---- node selection in get_text ----

def test_comment_excluded():
    pe = ex("<p>keep<!-- secret comment -->also</p>")
    assert pe.text == "keepalso"


def test_script_content_included_in_full_text():
    # bs4 get_text() DOES include script text (it is a plain text node in
    # the tree); pages with <p> never see it only because of the branch rule
    pe = ex("<script>var x=1;</script>no paras")
    assert pe.text == "var x=1;no paras"


def test_style_content_included_in_full_text():
    pe = ex("<style>.c{color:red}</style>tail")
    assert pe.text == ".c{color:red}tail"


def test_cdata_included():
    pe = ex("<p>a<![CDATA[inside]]>b</p>")
    assert pe.text == "ainsideb"


def test_doctype_excluded():
    pe = ex("<!DOCTYPE html><p>x</p>")
    assert pe.text == "x"


# ---- entities ----

def test_entities_decoded():
    pe = ex("<p>A &amp; B &lt;tag&gt; &#65;&#x42;</p>")
    assert pe.text == "A & B <tag> AB"


def test_nbsp_decoded_then_cleaned():
    # &nbsp; -> U+00A0, which _clean_text removes as a high-byte char
    pe = ex("<p>AB &nbsp;x</p>")
    assert pe.text == "AB x"


def test_unknown_entity_left_verbatim_and_bare_amp():
    # &foo; is not an HTML5 entity (stays); '&amp' without semicolon decodes
    pe = ex("<p>&foo; &amp</p>")
    assert pe.text == "&foo; &"


# ---- voids / self-closing / empty ----

def test_br_is_void_and_contributes_nothing():
    pe = ex("<p>line1<br>line2</p>")
    assert pe.text == "line1line2"


def test_self_closing_br():
    pe = ex("<p>a<br/>b</p>")
    assert pe.text == "ab"


def test_stray_end_br_ignored():
    pe = ex("<p>a</br>b</p>")
    assert pe.text == "ab"


def test_empty_p_elements_join_as_empty_strings():
    pe = ex("<p></p><p>x</p>")
    assert pe.used_p_branch
    assert pe.text == "x"          # ' '.join(['', 'x']) then clean/strip


# ---- weighted important text ----

def test_weight_accumulation_identical_strings_sum():
    pe = ex("<h1>Top</h1><b>Top</b><strong>Top</strong><h2>Other</h2>")
    assert dict(pe.weighted_text) == {"Top": 2.5, "Other": 1.0}
    assert pe.text == "TopTopTopOther"


def test_nested_weighted_tags_each_collect_subtree():
    pe = ex("<b>out <strong>in</strong> side</b>")
    assert dict(pe.weighted_text) == {"out in side": 0.5, "in": 0.5}


def test_h3_weight():
    pe = ex("<h3>  padded  </h3>")
    assert dict(pe.weighted_text) == {"padded": 0.75}


def test_two_titles_first_wins_both_weighted():
    pe = ex("<title>First</title><title>Second</title>")
    assert pe.title == "First"
    assert dict(pe.weighted_text) == {"First": 2.0, "Second": 2.0}


# ---- links ----

def test_links_filtered_deduped_sorted_self_excluded():
    pe = ex('<a href="https://x.test/b">B</a><a href="/rel">r</a>'
            '<a href="https://self.test/">me</a><a href="http://a.test">A</a>'
            '<a href="https://x.test/b">dup</a>')
    assert pe.links == ["http://a.test", "https://x.test/b"]


def test_link_without_href_ignored():
    pe = ex('<a name="anchor">x</a><a href="https://y.test/p">y</a>')
    assert pe.links == ["https://y.test/p"]


# ---- cleaning ----

def test_hyphens_and_whitespace_cleaning():
    pe = ex("<p>state-of-the-art   spacing\n\tmix</p>")
    assert pe.text == "state of the art spacing mix"


def test_astral_chars_kept_bmp_high_chars_removed():
    # the reference regex [-￿] misses astral-plane chars: the
    # emoji survives while é is removed
    pe = ex("<p>emoji \U0001F600 café</p>")
    assert pe.text == "emoji \U0001F600 caf"


def test_whitespace_text_nodes_between_divs():
    pe = ex("<div>a</div>\n<div>b</div>")
    assert pe.text == "a b"


# ---- frozen driver-oracle fixture (tools/freeze_extract_fixture.py) ----

def test_extract_expected_fixture_integrity():
    """The vendored extract_text oracle fixture must stay well-formed: one
    row per (sf, url), a distinct (n_docs, len_sum) key per sf dir, and
    md5-hex payloads. Value agreement with the live extractor is checked by
    tools/oracle_check.py (the CORRECTNESS gate)."""
    import os
    import re
    import pyarrow.parquet as pq

    path = os.path.join(os.path.dirname(__file__), "fixtures",
                        "extract_expected.parquet")
    df = pq.read_table(path).to_pandas()
    assert len(df) > 0
    keys = df[["n_docs", "len_sum"]].drop_duplicates()
    assert len(keys) == 3                      # sf0.001, sf0.01, sf0.1
    assert not df.duplicated(["n_docs", "len_sum", "url"]).any()
    assert df["text_md5"].map(lambda m: bool(re.fullmatch(r"[0-9a-f]{32}", m))).all()
