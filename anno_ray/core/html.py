"""HTML -> text extraction, byte-identical to the reference extractor.

Reimplements the char-level state machine of
``/root/reference/anno/src/ingest/url_resolver.rs:45-170``
(``HttpResolver::extract_text_from_html``) with scan-ahead slicing instead of
a per-char loop, preserving every edge case:

- tag parse consumes up to and including the first ``>``; the tag *name* is
  the prefix of the tag contents before the first whitespace char;
- script/style state flips only when the tag was terminated by ``>`` (an
  unterminated ``<script`` at EOF does NOT enter script mode);
- the block-tag space insertion (p/div/br/li/h1..h6, opening tags only) runs
  after the state update, so ``<script>`` never inserts a space, and it runs
  even for an unterminated trailing tag;
- the entity loop consumes its terminator: an unmatched ``&foo<b>`` emits
  ``&foo<`` verbatim (the ``<`` is eaten, so ``b>`` becomes body text);
- named entities decode before numeric ones, so ``&#8217;`` -> ``'`` (ASCII),
  ``&#8220;``/``&#8221;`` -> ``"`` (ASCII), not the typographic chars;
- generic ``&#NNN;`` uses integer parse semantics that accept a leading ``+``
  and reject anything else non-digit; invalid codepoints keep the raw entity;
- final cleanup splits on ``\\n``, trims each line with the *Rust*
  ``char::is_whitespace`` set (NOT Python's, which adds U+001C..1F), drops
  empty lines, joins with ``\\n``.

Whitespace set = Unicode White_Space (what Rust ``char::is_whitespace`` uses).
"""

from __future__ import annotations

import re

# Unicode White_Space property (== Rust char::is_whitespace). Python's
# str.strip()/\s additionally include U+001C..U+001F, which Rust does not.
RUST_WHITESPACE = "\t\n\x0b\x0c\r \x85\xa0\u1680\u2000\u2001\u2002\u2003\u2004\u2005\u2006\u2007\u2008\u2009\u200a\u2028\u2029\u202f\u205f\u3000"
_WS_SET = frozenset(RUST_WHITESPACE)

_BLOCK_TAGS = frozenset(
    ["p", "div", "br", "li", "h1", "h2", "h3", "h4", "h5", "h6"]
)

# Named entities decoded by the reference; matched BEFORE the numeric path,
# so the three numeric-looking ones decode to ASCII quotes/apostrophes.
_NAMED_ENTITIES = {
    "&amp;": "&",
    "&lt;": "<",
    "&gt;": ">",
    "&quot;": '"',
    "&apos;": "'",
    "&nbsp;": " ",
    "&#39;": "'",
    "&#8217;": "'",
    "&#8220;": '"',
    "&#8221;": '"',
}

# First char that terminates the entity-consumption loop: ';', '<', or any
# Rust-whitespace char. The terminator itself is consumed into the entity.
_ENTITY_TERM = re.compile("[;<" + re.escape(RUST_WHITESPACE) + "]")

# First whitespace char inside tag contents terminates the tag *name*.
_TAG_NAME_WS = re.compile("[" + re.escape(RUST_WHITESPACE) + "]")

# Rust u32::from_str: optional '+', ASCII digits only, no whitespace.
_U32_RE = re.compile(r"\+?[0-9]+\Z")
_U32_MAX = 0xFFFFFFFF


def _decode_numeric(entity: str) -> str | None:
    """Decode ``&#NNN;`` per the reference; None => keep entity verbatim."""
    num_str = entity[2:-1]
    if not _U32_RE.match(num_str):
        return None
    num = int(num_str.lstrip("+"))
    if num > _U32_MAX:
        return None  # u32 parse overflow -> Err -> keep as-is
    if 0xD800 <= num <= 0xDFFF or num > 0x10FFFF:
        return None  # char::from_u32 -> None -> keep as-is
    return chr(num)


def extract_text_from_html(html: str) -> str:
    """Strip tags/scripts/styles, decode entities, normalize lines."""
    out: list[str] = []
    out_len = 0  # running char count (cheap ends-with-space / is-empty checks)
    last_char = ""
    i = 0
    n = len(html)
    in_script = False
    in_style = False

    def emit(s: str) -> None:
        nonlocal out_len, last_char
        if s:
            out.append(s)
            out_len += len(s)
            last_char = s[-1]

    while i < n:
        if in_script or in_style:
            # Only '<' matters; everything else (incl. '&') is skipped.
            j = html.find("<", i)
            if j == -1:
                break
            i = j
        else:
            lt = html.find("<", i)
            amp = html.find("&", i)
            if lt == -1 and amp == -1:
                emit(html[i:])
                i = n
                break
            if lt == -1:
                j = amp
            elif amp == -1:
                j = lt
            else:
                j = min(lt, amp)
            emit(html[i:j])
            i = j

        ch = html[i]
        if ch == "<":
            gt = html.find(">", i + 1)
            if gt == -1:
                contents = html[i + 1 :]
                terminated = False
                i = n
            else:
                contents = html[i + 1 : gt]
                terminated = True
                i = gt + 1
            m = _TAG_NAME_WS.search(contents)
            tag_name = contents[: m.start()] if m else contents
            tag_lower = tag_name.lower()
            if terminated:
                if tag_lower == "script":
                    in_script = True
                elif tag_lower == "/script":
                    in_script = False
                elif tag_lower == "style":
                    in_style = True
                elif tag_lower == "/style":
                    in_style = False
            if not in_script and not in_style:
                if tag_lower in _BLOCK_TAGS and out_len > 0 and last_char != " ":
                    emit(" ")
        else:  # '&' outside script/style
            m = _ENTITY_TERM.search(html, i + 1)
            if m is None:
                entity = html[i:]
                i = n
                found_semicolon = False
            else:
                k = m.start()
                entity = html[i : k + 1]
                i = k + 1
                found_semicolon = html[k] == ";"
            if found_semicolon:
                decoded = _NAMED_ENTITIES.get(entity)
                if decoded is not None:
                    emit(decoded)
                elif entity.startswith("&#") and len(entity) > 2:
                    num = _decode_numeric(entity)
                    emit(num if num is not None else entity)
                else:
                    emit(entity)  # unknown entity kept verbatim
            else:
                emit(entity)  # no ';' -> raw, terminator char included

    text = "".join(out)
    lines = [seg.strip(RUST_WHITESPACE) for seg in text.split("\n")]
    return "\n".join(line for line in lines if line)


def resolve_content(raw: str) -> str:
    """HTML-sniff + extract, per ``HttpResolver::resolve`` (url_resolver.rs:219-227).

    Content whose (whitespace-trimmed) start is '<' is treated as HTML and
    run through the extractor; anything else passes through unchanged.
    """
    if raw.lstrip(RUST_WHITESPACE).startswith("<"):
        return extract_text_from_html(raw)
    return raw
