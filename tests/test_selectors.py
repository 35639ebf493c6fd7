"""Ported selector tests (reference test/html.test.ts:6-45,571-612 and
test/attribute-operators.test.ts:1-270)."""
from __future__ import annotations

from node_html_parser_ray.kernel import HTMLElement, Matcher, parse


class TestMatcher:
    def test_cursor_advance_rewind_matched(self):
        matcher = Matcher("#id .a a.b *.a.b .a.b * a")
        star = HTMLElement("_")
        with_id = HTMLElement("p", "id='id'")
        with_cls = HTMLElement("a", "class='a b'")

        assert not matcher.advance(star)
        assert not matcher.advance(with_cls)
        assert matcher.advance(with_id)  # #id

        assert not matcher.advance(star)
        assert not matcher.advance(with_id)
        assert matcher.advance(with_cls)  # .a

        assert not matcher.advance(star)
        assert not matcher.advance(with_id)
        assert matcher.advance(with_cls)  # a.b

        assert not matcher.advance(with_id)
        assert not matcher.advance(star)
        assert matcher.advance(with_cls)  # *.a.b

        assert not matcher.advance(with_id)
        assert not matcher.advance(star)
        assert matcher.advance(with_cls)  # .a.b

        assert matcher.advance(with_id)  # *
        matcher.rewind()
        assert matcher.advance(star)  # *
        matcher.rewind()
        assert matcher.advance(with_cls)  # *

        assert not matcher.advance(with_id)
        assert not matcher.advance(star)
        assert matcher.advance(with_cls)  # a

        assert matcher.matched


class TestQuerySelector:
    def test_basic(self):
        root = parse(
            '<a id="id" data-id="myid"><div><span class="a b"></span><span></span><span></span></div></a>'
        )
        child_a = root.first_child
        child_span = child_a.first_child.first_child
        assert root.query_selector("#id") is child_a
        assert root.query_selector("span.a") is child_span
        assert root.query_selector("span.b") is child_span
        assert root.query_selector("span.a.b") is child_span
        assert root.query_selector("#id .b") is child_span
        assert root.query_selector("#id span") is child_span
        assert root.query_selector("[data-id=myid]") is child_a
        assert root.query_selector('[data-id="myid"]') is child_a


class TestQuerySelectorAll:
    def test_basic(self):
        root = parse(
            '<a id="id"><div><span id="3" class="a b"></span><span></span><span></span></div></a>'
        )
        child = root.first_child
        grand = child.first_child
        assert root.query_selector_all("#id") == [child]
        assert root.query_selector_all("span.a") == [grand.first_child]
        assert root.query_selector_all("span.b") == [grand.first_child]
        assert root.query_selector_all("span.a.b") == [grand.first_child]
        assert root.query_selector_all("#id .b") == [grand.first_child]
        assert root.query_selector_all("#id span") == grand.child_nodes
        assert root.query_selector_all("#id, #id .b") == [child, grand.first_child]

    def test_comma_union_dedup(self):
        root = parse('<time class="date">')
        assert root.query_selector_all("time,.date") == [root.first_child]

    def test_nested_all(self):
        assert len(parse("<div><div></div></div>").query_selector_all("div")) == 2

    def test_preorder_result_order(self):
        root = parse('<div id="1"><div id="2"></div><div id="3"></div></div>')
        assert ",".join(d.id for d in root.query_selector_all("div")) == "1,2,3"


class TestAttributeOperators:
    def test_existence(self):
        root = parse('<a href="https://example.com">Link</a><span>Text</span>')
        assert root.query_selector("[href]").tag_name == "a"

    def test_exact_match(self):
        root = parse('<input type="text" name="username"><input type="email" name="email">')
        assert root.query_selector('[type="text"]').attributes["type"] == "text"
        assert root.query_selector('[type="email"]').attributes["type"] == "email"

    def test_starts_with(self):
        root = parse('<a href="https://example.com">H</a><a href="http://test.com">P</a>')
        assert root.query_selector('[href^="https://"]').attributes["href"] == "https://example.com"
        assert root.query_selector('[href^="http://"]').attributes["href"] == "http://test.com"

    def test_ends_with(self):
        root = parse('<a href="https://example.com">1</a><a href="https://test.org">2</a>')
        assert root.query_selector('[href$=".com"]').attributes["href"] == "https://example.com"
        assert root.query_selector('[href$=".org"]').attributes["href"] == "https://test.org"

    def test_dot_in_attr_value_not_class(self):
        root = parse('<a href="https://example.com">W</a><span class="com">N</span>')
        result = root.query_selector('[href$=".com"]')
        assert result.tag_name == "a"
        assert result.attributes.get("class") is None

    def test_contains(self):
        root = parse('<div class="btn-primary">1</div><div class="btn-secondary">2</div>')
        assert root.query_selector('[class*="primary"]').attributes["class"] == "btn-primary"
        assert root.query_selector('[class*="secondary"]').attributes["class"] == "btn-secondary"

    def test_not_equal(self):
        root = parse('<input type="text" name="username"><input type="hidden" name="token">')
        assert root.query_selector('[type!="hidden"]').attributes["type"] == "text"
        assert root.query_selector('[type!="text"]').attributes["type"] == "hidden"

    def test_hyphen(self):
        root = parse('<span lang="en">E</span><span lang="en-US">A</span><span lang="fr">F</span>')
        ens = root.query_selector_all('[lang|="en"]')
        assert len(ens) == 2
        assert ens[0].attributes["lang"] == "en"
        assert ens[1].attributes["lang"] == "en-US"

    def test_word(self):
        root = parse('<div class="btn primary large">B</div><div class="secondary small">O</div>')
        assert root.query_selector('[class~="primary"]').attributes["class"] == "btn primary large"
        assert root.query_selector('[class~="large"]').attributes["class"] == "btn primary large"

    def test_multiple_attrs(self):
        root = parse('<input type="email" name="user-email" required>')
        result = root.query_selector('input[type="email"][required]')
        assert result.attributes["type"] == "email"
        assert result.attributes["required"] == ""

    def test_complex_selector(self):
        root = parse('<a href="tel:+1234567890" class="phone-link" id="phone1">P</a>')
        result = root.query_selector('a.phone-link#phone1[href^="tel:"]')
        assert result is not None
        assert result.tag_name == "a"
        assert result.attributes["href"] == "tel:+1234567890"
        assert result.id == "phone1"

    def test_empty_attr_values(self):
        root = parse('<input value="" required class="">')
        assert root.query_selector('[value=""]') is not None
        assert root.query_selector("[required]") is not None
        assert root.query_selector('[class=""]') is not None
        assert root.query_selector('[value^=""]') is not None
        assert root.query_selector('[value$=""]') is not None
        assert root.query_selector('[value*=""]') is not None

    def test_special_chars_and_dots(self):
        root = parse('<div data-test="hello.world-test_123" data-url="https://site.com/path.html">C</div>')
        assert root.query_selector('[data-test^="hello."]') is not None
        assert root.query_selector('[data-test$="_123"]') is not None
        assert root.query_selector('[data-test*="world-test"]') is not None
        assert root.query_selector('[data-url$=".html"]') is not None
        assert root.query_selector('[data-url*=".com"]') is not None

    def test_multi_attrs_complex_values(self):
        root = parse('<input type="email" name="user-email" data-validation="email.required" required>')
        result = root.query_selector('input[type="email"][name^="user"][data-validation*=".required"][required]')
        assert result is not None
        assert result.attributes["data-validation"] == "email.required"

    def test_case_sensitivity(self):
        root = parse('<div class="Test" data-value="CamelCase">C</div>')
        assert root.query_selector('[class="Test"]') is not None
        assert root.query_selector('[CLASS="Test"]') is None
        assert root.query_selector('[class="test"]') is None
        assert root.query_selector('[data-value^="Camel"]') is not None
        assert root.query_selector('[data-value^="camel"]') is None

    def test_whitespace_in_values(self):
        root = parse('<div class=" btn  primary " title="  Hello World  ">C</div>')
        assert root.query_selector('[title^="  Hello"]') is not None

    def test_hyphen_edge_cases(self):
        root = parse(
            '<span lang="en">E</span><span lang="en-US">A</span>'
            '<span lang="en-GB-scotland">S</span><span lang="english">N</span>'
            '<span lang="fr">F</span>'
        )
        ens = root.query_selector_all('[lang|="en"]')
        assert len(ens) == 3
        assert root.query_selector('[lang|="english"]') is not None
        assert all(el.attributes["lang"] != "english" for el in ens)

    def test_word_edge_cases(self):
        root = parse(
            '<div class="btn primary large">Button 1</div>'
            '<div class="btn secondary">Button 2</div>'
            '<div class="primary-btn">Button 3</div>'
            '<div class="btn-primary">Button 4</div>'
        )
        assert len(root.query_selector_all('[class~="btn"]')) == 2
        assert root.query_selector_all('[class~="primary"]')[0].text == "Button 1"
        assert root.query_selector('[class~="primary-btn"]').text == "Button 3"
        assert root.query_selector('[class~="btn-primary"]').text == "Button 4"

    def test_quoted_values_in_selectors(self):
        root = parse('<div data-test=\'value with "quotes"\' title="value with \'apostrophes\'">C</div>')
        assert root.query_selector('[data-test*="quotes"]') is not None
        assert root.query_selector('[title*="apostrophes"]') is not None

    def test_nonexistent_attrs(self):
        root = parse('<div class="test">C</div>')
        assert root.query_selector("[id]") is None
        assert root.query_selector('[id=""]') is None
        assert root.query_selector('[id^="test"]') is None
        assert root.query_selector('[nonexistent*="anything"]') is None
        assert root.query_selector('[data-missing~="word"]') is None

    def test_complex_nested(self):
        root = parse(
            '<article class="post"><header><h1 class="title">Post Title</h1></header>'
            '<div class="content"><p data-paragraph="1">First</p><p data-paragraph="2">Second</p>'
            '<a href="https://example.com" target="_blank" rel="noopener">Ext</a>'
            '<a href="/internal.html" class="internal">Int</a></div></article>'
        )
        assert root.query_selector('article.post [data-paragraph="1"]') is not None
        assert root.query_selector('.content a[href^="https://"][target="_blank"]') is not None
        assert root.query_selector('a[href$=".html"][class="internal"]') is not None
        assert len(root.query_selector_all("article [data-paragraph]")) == 2
        assert len(root.query_selector_all(".content a[href]")) == 2

    def test_non_matching_complex(self):
        root = parse('<a href="https://example.com" class="link">W</a>')
        assert root.query_selector('a[href^="invalid:"]') is None
        assert root.query_selector('a[href$="invalid"]') is None
        assert root.query_selector('a[href*="invalid"]') is None
        assert root.query_selector('a[class~="invalid"]') is None
        assert root.query_selector('a[href^="https://"][class="invalid"]') is None

    def test_spaces_in_attr_values_with_descendants(self):
        root = parse(
            '<div title="Hello World" class="container">'
            '<p data-text="Multi word value">Content</p>'
            '<span alt="Some description here">Text</span></div>'
        )
        assert root.query_selector('div[title="Hello World"] p[data-text="Multi word value"]') is not None
        assert root.query_selector('div[title="Hello World"] span[alt="Some description here"]') is not None
        assert root.query_selector('div[title="Hello"] p') is None
        assert root.query_selector('div p[data-text="Multi"]') is None


class TestBrokenHtml:
    def test_missing_close_tags(self):
        missing = (
            '<table id="liste">\n<span id="nbResultats">Nombre : 3308</span><br>\n'
            "<tr style='border: 1px solid #ddd'>\n<td><a class=\"lien-bouton\" href=\"/detail/0441111U\"><b>E1\n<br>\nABBARETZ (44)\n<br>\n</a>\n</td>\n</tr>\n"
            "<tr style='border: 1px solid #ddd'>\n<td><a class=\"lien-bouton\" href=\"/detail/0441527W\"><b>E2\n<br>\nABBARETZ (44)\n<br>\n</a>\n</td>\n</tr>\n</table>"
        )
        assert len(parse(missing).query_selector_all("tr")) == 2

    def test_missing_space_between_attrs(self):
        root = parse(
            '<body>\n  <div class="a"data-test="/test.jpg"></div>\n'
            '  <div class="b"style="background-image:url(\'test.jpg\')"></div>\n</body>'
        )
        assert len(root.children[0].children) == 2
        assert root.children[0].children[0].attributes["data-test"] == "/test.jpg"
        assert root.children[0].children[1].attributes["style"] == "background-image:url('test.jpg')"


class TestColumnarParity:
    """stages/flat_select columnar masks match the exact per-doc automaton
    for single-part selectors (the documented scale path)."""

    DOCS = {
        "a": '<div class="c top"><p id="x">hi</p><img src="/i.png"></div>',
        "b": '<ul><li class="c">1</li><li>2</li></ul><span data-k>ok</span>',
        "c": '<div><div class="c"><div class="c deep">t</div></div></div>',
        "d": "plain text only, no elements",
        "e": '<article><img alt="no src"><img src="x"></article>',
    }
    PARTS = ["div", "*", ".c", "#x", "img", "[src]", "div.c", "[data-k]"]

    def _kernel_counts(self):
        out = {}
        for doc_id, html in self.DOCS.items():
            root = parse(html)
            for part in self.PARTS:
                out[(doc_id, part)] = len(root.query_selector_all(part))
        return out

    def test_counts_match_kernel(self):
        import pyarrow as pa

        from node_html_parser_ray.stages.flat_select import (
            explode_nodes_batch,
            selector_counts,
        )

        batch = pa.table(
            {
                "doc_id": list(self.DOCS.keys()),
                "html": list(self.DOCS.values()),
            }
        )
        nodes = explode_nodes_batch(batch)
        counts = selector_counts(nodes, self.PARTS)
        got = {
            (r["doc_id"], r["selector"]): r["n_matches"]
            for r in counts.to_pylist()
        }
        expected = self._kernel_counts()
        for key, n in expected.items():
            assert got.get(key, 0) == n, key


def _dp_query_all(root, selector):
    """Independent standard-CSS descendant matcher (DP over ancestor chains).

    Used as a differential oracle for the ported automaton: the reference's
    clone/rewind fork traversal (src/index.ts:418-454) must produce exactly
    the standard descendant-combinator match set in pre-order.
    """
    from node_html_parser_ray.kernel.selector import Matcher

    checkers = Matcher(selector).checkers
    n = len(checkers)
    out = []

    def walk(node, chain):
        for c in node.child_nodes:
            if c.node_type != 1:
                continue
            if not c.tag_name:
                walk(c, chain)
                continue
            newchain = chain + [c]
            dp = [False] * (n + 1)
            dp[0] = True
            ends_at_c = False
            for el in newchain:
                ndp = dp[:]
                for lev in range(n):
                    if dp[lev] and checkers[lev](el):
                        ndp[lev + 1] = True
                        if lev + 1 == n and el is c:
                            ends_at_c = True
                dp = ndp
            if ends_at_c:
                out.append(c)
            walk(c, newchain)

    walk(root, [])
    return out


class TestAutomatonVsDP:
    """Differential check: automaton == independent DP matcher."""

    SELECTORS = ["div", "div div", "div span", ".x", "div .x",
                 "span div span", "li li", "div div div", "#a div"]

    def test_fixed_corpus(self):
        docs = [
            "<div><div><div>t</div></div></div>",
            '<div class="x"><span>a</span><div><span>b</span></div></div>',
            "<ul><li><ul><li>n</li></ul></li></ul>",
            '<div id="a"><div><span><div>d</div></span></div></div>',
            "<span><div><span><div><span>s</span></div></span></div></span>",
        ]
        for html in docs:
            root = parse(html)
            for sel in self.SELECTORS:
                # SET equality: the reference's fork traversal emits deep
                # same-tag chains deepest-first (rewound-clone results are
                # concatenated before the advanced branch, src/index.ts:439),
                # so result ORDER is reference-specific; membership is
                # standard-CSS
                got = {id(e) for e in root.query_selector_all(sel)}
                exp = {id(e) for e in _dp_query_all(root, sel)}
                assert got == exp, (html, sel)

    def test_fuzz(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        alpha = list("<>/=\"' abc divspanli.#x1")
        markup = st.text(alphabet=st.sampled_from(alpha), max_size=250)

        @given(markup, st.sampled_from(self.SELECTORS))
        @settings(max_examples=300, deadline=None)
        def check(html, sel):
            root = parse(html)
            got = {id(e) for e in root.query_selector_all(sel)}
            assert got == {id(e) for e in _dp_query_all(root, sel)}

        check()


class TestColumnarDescendant:
    """columnar_select_mask (vectorized ancestor propagation) matches the
    per-document automaton's match SET for descendant chains."""

    DOCS = {
        "a": "<div><div><div>t</div></div></div>",
        "b": '<div class="x"><span>s</span><div><span>u</span></div></div>',
        "c": "<ul><li><ul><li>n</li></ul></li></ul><span>z</span>",
        "d": '<div id="a"><section><span><div>d</div></span></section></div>',
        "e": "no elements at all",
    }
    SELECTORS = ["div div", "div span", "li li", "div div div",
                 "#a div", ".x span", "ul li", "div .x",
                 "div span, li", "li li, div div, span"]

    def _nodes(self):
        import pyarrow as pa

        from node_html_parser_ray.stages.flat_select import explode_nodes_batch

        return explode_nodes_batch(
            pa.table({"doc_id": list(self.DOCS), "html": list(self.DOCS.values())})
        )

    def test_fixed_corpus(self):
        from node_html_parser_ray.stages.flat_select import columnar_select_mask

        nodes = self._nodes()
        doc_col = nodes.column("doc_id").to_pylist()
        nid_col = nodes.column("node_id").to_pylist()
        for sel in self.SELECTORS:
            mask = columnar_select_mask(nodes, sel)
            got = {
                (d, n) for d, n, m in zip(doc_col, nid_col, mask) if m
            }
            exp = set()
            for doc_id, html in self.DOCS.items():
                root = parse(html)
                matched = set(map(id, root.query_selector_all(sel)))
                # recover node ids by pre-order walk (same order as explode)
                nid = 0
                stack = [root]
                while stack:
                    node = stack.pop()
                    if id(node) in matched:
                        exp.add((doc_id, nid))
                    if node.node_type == 1:
                        stack.extend(reversed(node.child_nodes))
                    nid += 1
            assert got == exp, sel

    def test_fuzz(self):
        import pyarrow as pa
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from node_html_parser_ray.stages.flat_select import (
            columnar_select_mask,
            explode_nodes_batch,
        )

        alpha = list("<>/=\"' abc divspanli.#x1")
        markup = st.text(alphabet=st.sampled_from(alpha), max_size=250)
        sels = st.sampled_from(self.SELECTORS)

        @given(markup, sels)
        @settings(max_examples=200, deadline=None)
        def check(html, sel):
            nodes = explode_nodes_batch(pa.table({"doc_id": ["x"], "html": [html]}))
            n_col = int(columnar_select_mask(nodes, sel).sum())
            assert n_col == len(parse(html).query_selector_all(sel)), (html, sel)

        check()


class TestColumnarAttributeOperators:
    """Round 2: attribute operators run columnar (RE2 masks over the
    encoded attrs column) — match sets must equal the automaton."""

    HTML = (
        '<div data-x="1" href="https://x.com/y" title="b c d">'
        '<span lang="en-US" title="x-y">t</span>'
        '<a title="">empty</a>'
        '<p data-x="12">p</p>'
        "</div>"
    )

    SELECTORS = [
        '[data-x="1"]', '[data-x!="1"]', '[data-x^="1"]', '[data-x$="2"]',
        '[data-x*="2"]', '[lang|="en"]', '[lang|="en-US"]', '[title~="c"]',
        '[title~="b c"]', '[title=""]', '[title!=""]', '[title^="x"]',
        '[missing]', '[missing!="v"]', 'div [title~="y"]',
        'div[title~="d"] span[lang|="en"]', '[data-x="1"][title~="b"]',
        '[title$="d"], [lang$="US"]',
    ]

    def test_fixed_parity_vs_automaton(self):
        import numpy as np
        import pyarrow as pa

        from node_html_parser_ray.kernel.parser import parse
        from node_html_parser_ray.stages import flat_select

        t = pa.table({"doc_id": ["a"], "html": [self.HTML]})
        nodes = flat_select.explode_nodes_batch(t)
        root = parse(self.HTML)
        for sel in self.SELECTORS:
            try:
                m = flat_select.columnar_select_mask(nodes, sel)
            except ValueError:
                continue  # routed to the automaton by design
            n = int(np.asarray(
                m if isinstance(m, np.ndarray)
                else m.to_numpy(zero_copy_only=False)
            ).sum())
            assert n == len(root.query_selector_all(sel)), sel

    def test_ws_edge_routes_to_automaton(self):
        import pyarrow as pa
        import pytest

        from node_html_parser_ray.stages import flat_select

        t = pa.table({"doc_id": ["a"], "html": [self.HTML]})
        nodes = flat_select.explode_nodes_batch(t)
        with pytest.raises(ValueError):
            flat_select.columnar_part_mask(nodes, '[title~=""]')

    def test_sentinel_escaping_injective(self):
        from node_html_parser_ray.stages.flat_select import _encode_attrs, _esc

        vals = ["", "\x00", "\x01", "\x02", "\x00z", "a\x01b", "\x02\x02"]
        assert len({_esc(v) for v in vals}) == len(vals)
        e = _encode_attrs({"k": "\x02v"})
        assert e.count("\x02") == 2  # only the delimiters remain unescaped


class TestIterativeExplore:
    def test_deep_nesting_no_recursion_limit(self):
        """querySelector(+All) must survive documents nested past the
        interpreter recursion limit (wild tag soup), like the parser does."""
        from node_html_parser_ray.kernel.parser import parse
        from node_html_parser_ray.kernel.selector import (
            query_selector,
            query_selector_all,
        )

        root = parse("<div>" * 1500 + "<span>x</span>" + "</div>" * 1500)
        hits = query_selector_all(root, "span")
        assert [e.tag_name for e in hits] == ["span"]
        assert query_selector(root, "span") is hits[0]

    def test_bom_only_selector_part_skipped(self):
        """JS trim() strips U+FEFF: a BOM-only part must be skipped like the
        reference, not compiled into an always-true checker."""
        from node_html_parser_ray.kernel.parser import parse
        from node_html_parser_ray.kernel.selector import query_selector_all

        root = parse("<div><p><span>hi</span></p></div>")
        got = [e.tag_name for e in query_selector_all(root, "div﻿")]
        assert got == ["div"]

    def test_iterative_matches_recursive_reference_fuzz(self):
        """Differential fuzz: the iterative explore reproduces the exact
        result SEQUENCE of the reference's recursive formulation on random
        tag soup (including the deeper-first same-tag chain order)."""
        import random

        from node_html_parser_ray.kernel.parser import parse
        from node_html_parser_ray.kernel.selector import Matcher, _explore_all

        def explore_rec(node, matcher):
            advanced = matcher.advance(node) if node.tag_name else False
            if advanced:
                cloned = matcher.clone()
                cloned.rewind()
                kids = []
                for child in node.children:
                    kids.extend(explore_rec(child, cloned.clone()))
                if matcher.matched:
                    return [node, *kids]
                for child in node.children:
                    kids.extend(explore_rec(child, matcher.clone()))
                return kids
            out = []
            for child in node.children:
                out.extend(explore_rec(child, matcher.clone()))
            return out

        rng = random.Random(11)
        tags = ["div", "p", "span", "a", "b", "ul", "li"]
        sels = ["div", "p span", "div div", "*", "ul li", "div p span",
                ".x", "div.x", "span b"]
        for _ in range(150):
            parts = []
            for _ in range(rng.randint(1, 25)):
                t = rng.choice(tags)
                cls = ' class="x"' if rng.random() < 0.3 else ""
                parts.append(rng.choice([
                    f"<{t}{cls}>", f"</{t}>", "w ",
                ]))
            root = parse("".join(parts))
            for s in sels:
                got = [id(e) for e in _explore_all(root, Matcher(s))]
                want = [id(e) for e in explore_rec(root, Matcher(s))]
                assert got == want, ("order mismatch", s, "".join(parts))
