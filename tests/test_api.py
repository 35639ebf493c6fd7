"""Ported HTMLElement/TextNode API tests (reference test/html.test.ts:438-669)."""
from __future__ import annotations

from node_html_parser_ray.kernel import HTMLElement, TextNode, parse


class TestTextNode:
    def test_is_whitespace(self):
        assert TextNode("").is_whitespace
        assert TextNode(" \t").is_whitespace
        assert TextNode(" \t&nbsp; \t").is_whitespace
        assert not TextNode("x").is_whitespace


class TestChildManagement:
    def test_prepend_child_order(self):
        root = parse("<p></p>")
        p = root.first_child
        p.prepend_child(TextNode("3"))
        p.prepend_child(TextNode("2"))
        p.prepend_child(TextNode("1"))
        assert root.first_child.text == "123"

    def test_remove(self):
        root = parse("<div><p></p></div>")
        child = root.first_child
        child.first_child.remove()
        assert child.outer_html == "<div></div>"

    def test_remove_whitespace(self):
        root = parse("<div> \r \n  \t <h5> 123 </h5></div>")
        p = HTMLElement("div")
        p.append_child(HTMLElement("h5")).append_child(TextNode("123"))
        child = root.first_child
        child.parent_node = None
        assert child.remove_whitespace() == p

    def test_exchange_child(self):
        root = parse("<div><p></p><span></span></div>")
        div = root.first_child
        old = div.child_nodes[0]
        new = HTMLElement("em")
        div.exchange_child(old, new)
        assert div.to_string() == "<div><em></em><span></span></div>"
        assert old.parent_node is None

    def test_trim_right(self):
        root = parse("<div>hello STOP world<span>tail</span></div>")
        root.first_child.trim_right("STOP")
        assert root.first_child.to_string() == "<div>hello </div>"

    def test_structure(self):
        root = parse('<div id="main" class="a b"><p>text</p></div>')
        assert root.first_child.structure == "div#main.a.b\n  p\n    #text"


class TestAttributes:
    def test_raw_attributes(self):
        root = parse("<p a=12 data-id=\"!$$&amp;\" yAz='1'></p>")
        assert root.first_child.raw_attributes == {
            "a": "12",
            "data-id": "!$$&amp;",
            "yAz": "1",
        }

    def test_attributes_decoded(self):
        root = parse("<p a=12 data-id=\"!$$&amp;\" yAz='1' class=\"\" disabled></p>")
        assert root.first_child.attributes == {
            "a": "12",
            "data-id": "!$$&",
            "yAz": "1",
            "disabled": "",
            "class": "",
        }

    def test_set_attribute_edit(self):
        root = parse("<p a=12></p>")
        child = root.first_child
        child.set_attribute("a", 13)
        assert child.attributes == {"a": "13"}
        assert child.to_string() == '<p a="13"></p>'

    def test_set_attribute_add(self):
        root = parse("<p a=12></p>")
        child = root.first_child
        child.set_attribute("b", 13)
        assert child.attributes == {"a": "12", "b": "13"}
        assert child.to_string() == '<p a="12" b="13"></p>'
        child.set_attribute("required", "")
        assert child.to_string() == '<p a="12" b="13" required></p>'

    def test_set_attribute_newline_roundtrip(self):
        root = parse("<p></p>")
        root.first_child.set_attribute("b", "test\ntest")
        reparsed = parse(root.inner_html)
        assert reparsed.first_child.attributes == {"b": "test\ntest"}

    def test_set_attribute_remove(self):
        root = parse('<p a=12 b=13 c=14 data-id="!$$&amp;"></p>')
        child = root.first_child
        child.set_attribute("b", None)
        child.set_attribute("c")
        assert child.attributes == {"a": "12", "data-id": "!$$&"}
        assert child.to_string() == '<p a="12" data-id="!$$&amp;"></p>'

    def test_set_attributes_replace_all(self):
        root = parse("<p a=12 data-id=\"!$$&amp;\" yAz='1' class=\"\" disabled></p>")
        child = root.first_child
        child.set_attributes({"c": 12})
        assert child.attributes == {"c": "12"}
        assert child.to_string() == '<p c="12"></p>'

    def test_get_attribute(self):
        root = parse('<p a="1"></p>')
        assert root.first_child.get_attribute("a") == "1"
        assert root.first_child.get_attribute("zz") is None

    def test_id_class_shortcuts(self):
        root = parse('<p id="x" class="a  b"></p>')
        assert root.first_child.id == "x"
        assert root.first_child.class_names == ["a", "b"]


class TestStructuredText:
    def test_blocks(self):
        assert parse("<span>o<p>a</p><p>b</p>c</span>").structured_text == "o\na\nb\nc"

    def test_comments_excluded(self):
        root = parse("<span>o<p>a</p><!-- my comment --></span>", {"comment": True})
        assert root.structured_text == "o\na"

    def test_whitespace_deferral(self):
        assert parse("<p>a</p> <p>b</p>").structured_text == "a\nb"
        assert parse("x <b>y</b>").structured_text == "x y"

    def test_multi_ws_collapse(self):
        assert parse("<p>a    b</p>").structured_text == "a b"


class TestSetContent:
    def test_set_content_string(self):
        root = parse("<div></div>")
        root.children[0].set_content("<span><div>abc</div>bla</span>")
        assert root.to_string() == "<div><span><div>abc</div>bla</span></div>"

    def test_set_content_nodes(self):
        root = parse("<div></div>")
        root.children[0].set_content(parse("<span><div>abc</div>bla</span>").child_nodes)
        assert root.to_string() == "<div><span><div>abc</div>bla</span></div>"

    def test_set_content_node(self):
        root = parse("<div></div>")
        root.children[0].set_content(parse("<span><div>abc</div>bla</span>").child_nodes[0])
        assert root.to_string() == "<div><span><div>abc</div>bla</span></div>"

    def test_set_content_text(self):
        root = parse("<div></div>")
        root.children[0].set_content("abc")
        assert root.to_string() == "<div>abc</div>"

    def test_set_inner_html(self):
        root = parse("<div></div>")
        root.children[0].inner_html = "<span><div>abc</div>bla</span>"
        assert root.to_string() == "<div><span><div>abc</div>bla</span></div>"


class TestIsBlock:
    def test_is_block(self):
        from node_html_parser_ray.kernel import is_block

        assert is_block(HTMLElement("div"))
        assert is_block(HTMLElement("H1"))
        assert not is_block(HTMLElement("span"))
        assert not is_block(HTMLElement(""))
        assert not is_block(TextNode("x"))
