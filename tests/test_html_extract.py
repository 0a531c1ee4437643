"""Golden + property tests for the HTML->text extractor (P1).

Goldens were produced by compiling the reference extractor
(/root/reference/anno/src/ingest/url_resolver.rs:45-170) into a standalone
harness and capturing its exact output — the byte-identical contract.
"""

from __future__ import annotations

import json
import os

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from anno_ray.core.html import RUST_WHITESPACE, extract_text_from_html, resolve_content

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "html_extract.json")


def _load():
    with open(GOLDEN, encoding="utf-8") as f:
        return json.load(f)


@pytest.mark.parametrize("case", _load(), ids=lambda c: str(abs(hash(c["html"])) % 10**8))
def test_golden_byte_identical(case):
    assert extract_text_from_html(case["html"]) == case["text"]


def test_block_tag_spacing():
    assert extract_text_from_html("a<p>b") == "a b"
    assert extract_text_from_html("a <p>b") == "a b"
    assert extract_text_from_html("<p>b") == "b"
    assert extract_text_from_html("a<span>b") == "ab"
    assert extract_text_from_html("a</p>b") == "ab"  # closing tags never space


def test_script_style_suppression():
    assert extract_text_from_html("<script>x<p>y</p></script>z") == "z"
    assert extract_text_from_html("<style>.c{}</style>ok") == "ok"
    # unterminated <script at EOF does NOT enter script mode
    assert extract_text_from_html("a<script") == "a"


def test_entities():
    assert extract_text_from_html("&amp;&lt;&gt;&quot;&apos;&nbsp;") == "&<>\"'"
    # &#8217; decodes to ASCII apostrophe via the named table
    assert extract_text_from_html("a&#8217;b") == "a'b"
    assert extract_text_from_html("&#65;&#66;") == "AB"
    assert extract_text_from_html("&#x41;") == "&#x41;"  # hex unsupported
    assert extract_text_from_html("&unknown;") == "&unknown;"
    # unmatched & consumes its terminator; '<' swallowed -> tag leaks as text
    assert extract_text_from_html("&foo<b>bold</b>") == "&foo<b>bold"


def test_line_cleanup():
    assert extract_text_from_html("  a  \n\n  b  \n") == "a\nb"
    assert extract_text_from_html("　x　") == "x"


def test_resolve_content_sniff():
    assert resolve_content("  <html>x</html>") == "x"
    assert resolve_content("plain text") == "plain text"
    assert resolve_content("") == ""


@given(st.text(alphabet=st.sampled_from(list("<>&;abp/ sc" + "\n\t式é")), max_size=200))
@settings(max_examples=200, deadline=None)
def test_never_raises_and_no_tags_left(s):
    out = extract_text_from_html(s)
    # output lines are trimmed and non-empty
    for line in out.split("\n"):
        if out:
            assert line == line.strip(RUST_WHITESPACE)
