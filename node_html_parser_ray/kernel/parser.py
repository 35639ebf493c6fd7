"""Single-pass tokenizer + stack-based tree builder with malformed-HTML repair.

From-scratch Python implementation of the parse algorithm specified by the
reference (``/root/reference/src/index.ts:833-1028``): one regex alternation
drives a forward scan (comments OR tags); an element stack handles implicit
closes (kElementsClosedByOpening), raw-text elements (script/noscript/style/
pre), void elements (kSelfClosingElements) and aggressive unwind on close
tags; a post-pass repairs leftover unclosed elements (pair-error vs
single-error) and sets ``root.valid``.

This is a *pure function of the input string* — deterministic and idempotent,
so Ray task retries are safe.  All regexes are compiled at module import,
i.e. once per Ray worker process.
"""
from __future__ import annotations

import re
from typing import Optional

from .dom import CommentNode, HTMLElement, TextNode
from .jsregex import _JS_WS_CHARS, WS, js_trim

__all__ = ["parse", "ParseMetrics", "PATHOLOGICAL", "PATHOLOGICAL_RE2",
           "is_pathological"]

# reference src/index.ts:833 — kMarkupPattern, translated:
#   [^]        -> [\s\S]
#   groups     -> named (close / tag / attrs / selfclose); inner groups made
#                 non-capturing since only 1,2,3,7 are read by parse().
#
# KNOWN INHERITED LIMITATION (kept deliberately): the attrs repetition has
# exponential backtracking on truncated tags whose attr chars are ambiguous
# between the name and junk branches (e.g. "<a " + "a"*20 with no ">") —
# the classic ReDoS shape of a cut-off crawl page.  This is the REFERENCE's
# own behavior (V8's backtracking engine explodes identically on
# src/index.ts:833), and it is NOT fixable bit-exactly: possessive/atomic
# rewrites were fuzz-tested and change captures on 22/40k random inputs,
# because greedy give-back is semantically needed (a shorter tag/junk match
# can expose a `name=value` split whose value consumes '/' that no other
# branch can — e.g. '<BA=/x>' matches tag 'B', attrs 'A=/x' only via
# give-back).  Production guidance: bound worker task time at the Ray
# level (task-level retries/timeouts) rather than altering tokenizer
# semantics.
_S = f"[{WS}]"
# '=' -> quote whitespace class for the prescan: the same JS WS set but as
# LITERAL characters, because RE2 (pyarrow match_substring_regex in the
# partition router) rejects \uXXXX escapes that Python re accepts.
_WSQ = "[" + _JS_WS_CHARS + "]"
KMARKUP = re.compile(
    r"<!--[\s\S]*?(?=-->)-->"
    r"|<(?P<close>/?)"
    r"(?P<tag>[a-z][-.:0-9_a-z]*)"
    r"(?P<attrs>(?:" + _S + r"*(?:[a-z][-.:0-9_a-z]*"
    r"(?:" + _S + r"*=" + _S + r"*(?:\"[^\"]*?\"|'[^']*?'|(?:/(?!>)|[^" + WS + r"\"'<>/])+))?"
    r"|[^</>" + WS + r"]+))*)"
    + _S + r"*(?P<selfclose>/?)>",
    re.IGNORECASE,
)

# ReDoS prescan (round-3 verdict #6): a cheap LINEAR-TIME over-approximation
# of the inputs that can trigger kMarkupPattern's inherited backtracking
# blowup, so pathological documents can be routed to a bounded-time parse
# lane WITHOUT touching tokenizer semantics.  Measured growth: a truncated
# '<a ' + 'a'*n tag takes ~7 s at n=16 and ~3x per +2 chars, so the run
# threshold sits at 12.  The blowup only fires at a tag-open site whose
# whole attrs+'>' match FAILS (a terminated tag matches greedily in linear
# time — the junk branch even eats unclosed quotes as long as a '>'
# follows), so the shapes require a failing tail:
#   1. a tag-open whose [^<>] run reaches >=12 chars and then hits '<' or
#      EOF instead of '>' (the truncated-crawl-page shape; an unclosed
#      quote running to EOF is a sub-case);
#   2. a tag-open whose first quoted value spans a '<'/'>' (legal for the
#      quoted branch) and is never terminated by a '>' after the closing
#      quote — give-back then re-exposes the bracket to the name/junk
#      branches across the whole run;
#   3. (round-4 review fix) the general form of both: a QUOTE-AWARE run —
#      units are a non-bracket/non-quote char OR a whole quoted section
#      (which may legally contain brackets) — reaching >=11 units and then
#      hitting '<'/EOF instead of '>', optionally through one trailing
#      unterminated quote.  Shape 1/2 alone missed e.g.
#      '<a q="" w="1<2" ' + 'e'*n (pre-bracket run under 12 chars, first
#      quoted value bracket-free): measured 1.4 s at n=12, ~3x per +2.
#   4. (round-4 fuzz find, seed 9,039,100) an '='-anchored quoted value
#      containing '<' (closing quote optional) followed by a >=8-char
#      quote-free bracket-free run.  Measured matrix: '<' in the value is
#      load-bearing ('>'-only values are linear); attr spacing is NOT
#      (slow with or without spaces around the name/quote); a run ending
#      directly in '>' is fast but '/V>'/EOF/'<' tails blow up (~3x per
#      +2 run chars, 0.7 s at run 12), so the shape over-approximates by
#      ignoring the tail — the run class EXCLUDES quotes because a
#      following '="..."' pair re-synchronizes the engine (real pages
#      like nice.html carry comment-URL src values whose tails are
#      quote-bounded at <8 chars and parse linearly).  This shape fires
#      even when the tag ultimately MATCHES, falsifying the failing-tail
#      premise above: the greedy engine explores exponentially many
#      junk/quoted re-splits of the bracket-bearing value against the
#      following run before finding the successful path.
# False positives are handled by parsing in a subprocess with the SAME
# kernel (bit-identical output, just fork latency); false negatives keep
# the reference's own behavior.  The source is RE2-compatible so the
# partition router can apply it vectorized (pyarrow match_substring_regex).
# The quote shape anchors on the FIRST quote after the tag-open
# ([^<>"']*) — without that anchor a CLOSING quote can re-anchor the
# scan and flag every '<a href="x">tail' document (measured).  Shape 3's
# quoted units are anchored on a preceding '=' because that is KMARKUP's
# own grammar (a quote NOT after `name=` falls to the junk branch, which
# cannot cross brackets): without the anchor, units can re-pair a CLOSING
# quote with the next attribute's opening quote (`;="" "=""`), leaving a
# stray quote whose unterminated-tail group walks out of a normally
# terminated tag (measured FP on benign attr soup).  Backtracking stays
# effectively deterministic: at a '=' the single-char branch is tried
# first and dies on the unconsumable quote one step later, so give-back
# is O(1) per '=' plus the (linear) repetition count.
_SHAPE4_SRC = (
    r"<[a-zA-Z](?:[^<>\"']|=" + _WSQ + r"*\"[^\"]*\"|=" + _WSQ
    + r"*'[^']*')*=" + _WSQ
    + r"*(?:\"[^\"]*<[^\"]*\"|'[^']*<[^']*')[^<>\"']{8,}"
)
# Shape 5 (round-5 fuzz finds, seeds 9,175,218 / 9,619,904 — the round-4
# campaign recorded these as "V8-only" blowups, but re-measurement showed
# CPython's engine hangs on them too; the campaign had skipped them before
# ever running our side): an '='-anchored quoted value whose SPAN (up to
# its closing quote or EOF) swallows a raw-text open
# (`<script|style|pre|noscript`).  The value legally crosses tags, so the
# stage-2 strip sees a later well-formed raw-text region and removes it —
# but the PRECEDING tag-open attempt (the one holding the quote) scans
# straight across that material and explodes re-splitting it (measured:
# both 1M-campaign docs >60 s full / ~15 s at 20 chars of core, ~3x per
# +2 chars).  Like shape 4, this evidence spans a raw-text boundary, so
# it must be tested on the RAW string, bypassing the strip.  The quote is
# tag-anchored (same attr-unit prefix as shapes 3/4) so a bare JS string
# 'document.write("<script ...")' inside a well-formed script body does
# not fire — only quotes reachable as a tag-open's attribute value.
_SHAPE5_SRC = (
    r"<[a-zA-Z](?:[^<>\"']|=" + _WSQ + r"*\"[^\"]*\"|=" + _WSQ
    + r"*'[^']*')*=" + _WSQ
    + r"*(?:\"[^\"]*<(?:script|style|pre|noscript)\b"
    + r"|'[^']*<(?:script|style|pre|noscript)\b)"
)
_PATHOLOGICAL_SRC = (
    r"<[a-zA-Z](?:[^<>]{11,}(?:<|$)"
    r"|[^<>\"']*[\"'][^\"']*[<>][^\"']*[\"'][^<>]*(?:<|$)"
    r"|(?:[^<>\"']|=" + _WSQ + r"*\"[^\"]*\"|=" + _WSQ + r"*'[^']*'){11,}"
    r"(?:=" + _WSQ + r"*\"[^\"]*|=" + _WSQ + r"*'[^']*)?(?:<|$))"
    r"|" + _SHAPE4_SRC + r"|" + _SHAPE5_SRC
)
PATHOLOGICAL = re.compile(_PATHOLOGICAL_SRC)
# shapes whose evidence can span a raw-text boundary: tested on the RAW
# string, bypassing the stage-2 strip (see is_pathological)
_RAW_SHAPES = re.compile(_SHAPE4_SRC + r"|" + _SHAPE5_SRC)
PATHOLOGICAL_RE2 = _PATHOLOGICAL_SRC  # same source, RE2 syntax-safe

# Stage-2 refinement: kMarkupPattern never scans INSIDE raw-text element
# bodies (parse() jumps lastIndex past the closing tag) or comments (the
# comment alternation consumes them atomically), so '<' runs there are
# harmless.  Real pages are full of 'if (a<b)' script bodies, so only
# stage-1-flagged docs pay this linear strip + re-test.
#
# Round-4 review fixes (both were FALSE NEGATIVES — a masked pathological
# doc parses unbounded in-process and hangs the worker, exactly what the
# lane exists to prevent):
#   * CASE-SENSITIVE, exact close tag: parse() treats a tag as raw-text
#     only via the case-sensitive lookup `t in K_BLOCK_TEXT_ELEMENTS` and
#     terminates it only at the exact lowercase `</script>` (data.find of
#     close_markup, parser loop below).  The old `(?is)`/`</\1[^>]*>` strip
#     removed `<SCRIPT>` bodies the tokenizer actually scans (measured
#     blowup: '<SCRIPT><a ' + 'a'*16 + '</SCRIPT>' ~8.5 s).  Under the
#     lowerCaseTagName option an uppercase body IS skipped, so the
#     case-sensitive strip can only over-flag there (benign: sidecar FP).
#   * '<>' SENTINEL replacement, not '': removing a region outright merges
#     its neighbours, so '<a ' + run + '<!--c-->>' collapsed to a
#     terminated-looking '<a run>' and went unflagged — but the real
#     tokenizer's attempt at '<a' still dies on the comment's own '<' and
#     backtracks across the run (measured ~9.9 s at run 16).  The sentinel
#     keeps that terminator: '<' reproduces the boundary the failing match
#     actually sees, and the trailing '>' cannot start a new tag-open, so
#     the text AFTER a benign stripped region never fuses into a phantom
#     '<letter' run (which a bare '<' sentinel would create).
#   * QUOTE-AWARE open-tag attrs (round-4 fuzz find, seed 9,000,980): the
#     old `[^>]*` crossed an unquoted '<' (e.g. `<pre style..."_u1<>`), so
#     the strip removed a region the tokenizer actually scans — the
#     tag-open attempt FAILS at that '<' (that is the blowup itself), so
#     no raw-text jump ever happens there.  KMARKUP can only cross
#     brackets inside '='-anchored quoted values, so the strip's attr
#     grammar mirrors exactly that (same '='-anchored units as shape 3);
#     an unquoted bracket now stops the strip and the pathology stays
#     visible.  Errors in the other direction (a quote KMARKUP's junk
#     branch would eat, stopping our strip early) only over-flag — the
#     sidecar returns bit-identical results for FPs.
_RAW_TEXT_STRIP = re.compile(
    r"(?s)<(script|style|pre|noscript)\b"
    r"(?:[^<>\"']|=" + _WSQ + r"*\"[^\"]*\"|=" + _WSQ + r"*'[^']*')*"
    r">[\s\S]*?</\1>|<!--[\s\S]*?-->"
)


def is_pathological(html: str) -> bool:
    """True if ``html`` matches the ReDoS over-approximation prescan.

    Two linear-time stages: the cheap pattern over the raw string (almost
    every doc exits here), then — only for stage-1 hits — the same pattern
    over a copy with raw-text bodies and comments replaced by a '<>'
    sentinel (the tokenizer never backtracks inside those regions, but
    their leading '<' still terminates a failing run that started before
    them — see _RAW_TEXT_STRIP's comment).

    Shape 4 on the RAW string BYPASSES the stage-2 refinement (round-4
    fuzz find, seed 9,039,100): its quote+bracket+run evidence can SPAN a
    raw-text region's start — the body of a `<pre>` is scanned by a
    PRECEDING failing tag attempt before the `<pre>` open ever matches,
    so the cost is real even though the strip (correctly, for shapes 1-3)
    removes the body.  Cost of the bypass: documents whose only shape-4
    site sits inside a well-formed script body (e.g. HTML-template JS
    strings '=\"<div ...>\"' + an 8-char run) over-flag — they parse
    bit-identically in the sidecar."""
    if _RAW_SHAPES.search(html) is not None:
        return True
    if PATHOLOGICAL.search(html) is None:
        return False
    return PATHOLOGICAL.search(_RAW_TEXT_STRIP.sub("<>", html)) is not None


# reference src/index.ts:836-847 — kSelfClosingElements (void tags).
K_SELF_CLOSING = frozenset(
    ("area", "base", "br", "col", "hr", "img", "input", "link", "meta", "source")
)

# reference src/index.ts:848-878 — kElementsClosedByOpening: opening tag
# auto-closes the current parent (one level).
_HEADINGS_AND_P = frozenset(("p", "h1", "h2", "h3", "h4", "h5", "h6"))
_TABLE_SECTIONS = frozenset(("tr", "thead", "tbody", "tfoot"))
K_ELEMENTS_CLOSED_BY_OPENING: dict[str, frozenset[str]] = {
    "li": frozenset(("li",)),
    "p": _HEADINGS_AND_P,
    "b": frozenset(("div",)),
    "td": frozenset(("td", "th")),
    "th": frozenset(("td", "th")),
    "h1": _HEADINGS_AND_P,
    "h2": _HEADINGS_AND_P,
    "h3": _HEADINGS_AND_P,
    "h4": _HEADINGS_AND_P,
    "h5": _HEADINGS_AND_P,
    "h6": _HEADINGS_AND_P,
    "colgroup": _TABLE_SECTIONS,
    "tr": _TABLE_SECTIONS,
    "thead": _TABLE_SECTIONS,
    "tbody": _TABLE_SECTIONS,
    "tfoot": _TABLE_SECTIONS,
    "ul": frozenset(("ul", "ol")),
    "ol": frozenset(("ol", "ul")),
    "aside": frozenset(("aside",)),
    "nav": frozenset(("nav",)),
    "form": frozenset(("form",)),
    "header": frozenset(("header",)),
    "footer": frozenset(("footer",)),
    "main": frozenset(("main",)),
}

# reference src/index.ts:879-884 — kBlockTextElements (raw-text elements).
K_BLOCK_TEXT_ELEMENTS = frozenset(("script", "noscript", "style", "pre"))


class ParseMetrics:
    """Per-document counters for lineage/metrics (target-side design)."""

    __slots__ = ("n_nodes", "n_elements", "n_text", "n_comments", "n_fixups",
                 "n_bytes", "valid")

    def __init__(self) -> None:
        self.n_nodes = 0
        self.n_elements = 0
        self.n_text = 0
        self.n_comments = 0
        self.n_fixups = 0
        self.n_bytes = 0
        self.valid = True


def parse(
    data: str,
    options: Optional[dict] = None,
    metrics: Optional[ParseMetrics] = None,
) -> HTMLElement:
    """Parse HTML, returning a fictive root element with ``valid`` set.

    ``options`` mirrors the reference's ParsingOptions
    (``lowerCaseTagName`` / ``script`` / ``style`` / ``pre`` / ``comment``;
    the raw-text option lookup is by tag name, so a ``noscript`` key is also
    honoured, matching the reference's ``options[match[2]]`` lookup at
    src/index.ts:940).
    """
    opts = options or {}
    lower_case = bool(opts.get("lowerCaseTagName"))
    keep_comments = bool(opts.get("comment"))

    root = HTMLElement("")
    current = root
    stack: list[HTMLElement] = [root]
    last_text_pos = 0
    pos = 0
    data_len = len(data)
    n_elements = 0
    n_text = 0
    n_comments = 0

    search = KMARKUP.search
    while pos <= data_len:
        m = search(data, pos)
        if m is None:
            break
        m_start = m.start()
        m_end = m.end()
        # Inter-tag text (reference src/index.ts:902-906).
        if last_text_pos < m_start:
            # NB: appendChild sets parentNode only for elements
            # (reference src/index.ts:485-487) — text nodes stay parentless.
            current.child_nodes.append(TextNode(data[last_text_pos:m_start]))
            n_text += 1
        last_text_pos = m_end
        pos = m_end

        # Comment branch (reference src/index.ts:911-919): match[0][1]=='!'.
        if data[m_start + 1] == "!":
            if keep_comments:
                current.child_nodes.append(CommentNode(data[m_start + 4 : m_end - 3]))
                n_comments += 1
            continue

        close_g, tag, attrs, self_g = m.group(1, 2, 3, 4)
        if lower_case:
            tag = tag.lower() if tag else ""
        is_closing = close_g != ""
        is_self_syntax = self_g != ""

        # Opening-tag branch (reference src/index.ts:924-960).
        if not is_closing:
            if not is_self_syntax:
                closed_by = K_ELEMENTS_CLOSED_BY_OPENING.get(current.tag_name)
                if closed_by is not None and tag in closed_by:
                    stack.pop()
                    current = stack[-1] if stack else root
            child = HTMLElement(tag or "", js_trim(attrs) if attrs else "")
            child.parent_node = current
            current.child_nodes.append(child)
            current = child
            n_elements += 1
            stack.append(current)
            if tag in K_BLOCK_TEXT_ELEMENTS:
                # Raw-text fast-forward (reference src/index.ts:936-959):
                # scan for the literal close markup; content becomes a single
                # TextNode only when the matching option is enabled.
                close_markup = "</" + tag + ">"
                index = data.find(close_markup, pos)
                if opts.get(tag):
                    if index == -1:
                        text = data[pos:]
                    else:
                        text = data[pos:index]
                    if text:
                        current.child_nodes.append(TextNode(text))
                        n_text += 1
                if index == -1:
                    last_text_pos = pos = data_len + 1
                else:
                    last_text_pos = pos = index + len(close_markup)
                    is_closing = True  # match[1] = 'true' (src/index.ts:957)

        # Close / self-close branch (reference src/index.ts:962-991).
        closing_tag = tag
        if is_closing or is_self_syntax or closing_tag in K_SELF_CLOSING:
            is_void = closing_tag in K_SELF_CLOSING
            # Ignore explicit closing tags for void elements like </col>.
            if is_closing and is_void:
                continue
            while True:
                if current.tag_name == closing_tag:
                    stack.pop()
                    current = stack[-1] if stack else root
                    break
                elif len(stack) > 1:
                    # Close unclosed child tag before closing the parent
                    # (<a><b>text</a> closes <b> first).
                    stack.pop()
                    current = stack[-1] if stack else root
                else:
                    break

    # Trailing text (reference src/index.ts:995-998) — appended to *root*.
    if last_text_pos < data_len:
        root.child_nodes.append(TextNode(data[last_text_pos:]))
        n_text += 1

    # Malformed-HTML repair (reference src/index.ts:1000-1026).
    root.valid = len(stack) == 1
    n_fixups = 0
    while len(stack) > 1:
        n_fixups += 1
        last = stack.pop()
        one_before = stack[-1] if stack else root
        parent = last.parent_node
        if parent is not None and parent.parent_node is not None:
            if parent is one_before and last.tag_name == one_before.tag_name:
                # Pair error <h3><h3> -> <h3></h3>: second's children move to
                # the grandparent; both treated closed (extra stack pop).
                one_before.remove_child(last)
                target = one_before.parent_node
                if stack:
                    stack.pop()
            else:
                # Single error <div><h3></div>: <h3> removed, children
                # reattached to its parent.
                one_before.remove_child(last)
                target = one_before
            # batched appendChild (same semantics: extend preserves order,
            # parentNode set only on elements, src/index.ts:483-489)
            moved = last.child_nodes
            if moved:
                target.child_nodes.extend(moved)
                for child in moved:
                    if child.node_type == 1:
                        child.parent_node = target
        # else: top-level leftover — just skip.

    if metrics is not None:
        metrics.n_elements = n_elements
        metrics.n_text = n_text
        metrics.n_comments = n_comments
        metrics.n_nodes = n_elements + n_text + n_comments
        metrics.n_fixups = n_fixups
        metrics.n_bytes = data_len
        metrics.valid = root.valid
    return root
