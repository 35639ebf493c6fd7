"""Span extraction + document assembly + flatten/unflatten kernel tests."""
from __future__ import annotations

from node_html_parser_ray.kernel import (
    assemble_document,
    extract_spans,
    flatten_tree,
    parse,
    parse_and_extract,
    unflatten_tree,
)


def spans_of(html, media_map=None):
    return extract_spans(parse(html), media_map)


class TestExtractSpans:
    def test_text_blocks_match_structured_text(self):
        html = "<span>o<p>a</p><p>b</p>c</span>"
        spans = spans_of(html)
        assert [s[0] for s in spans] == ["text"] * 4
        assert "\n".join(s[1] for s in spans) == parse(html).structured_text

    def test_orders_are_sequential(self):
        spans = spans_of("<p>a</p><img src=x.png><p>b</p>")
        assert [s[3] for s in spans] == list(range(len(spans)))

    def test_media_from_img_element(self):
        spans = spans_of('<p>before</p><img src="pic.jpg" alt="A pic"><p>after</p>')
        assert spans == [
            ("text", "before", "", 0),
            ("image", "A pic", "pic.jpg", 1),
            ("text", "after", "", 2),
        ]

    def test_media_kinds(self):
        spans = spans_of('<img src=i><video src=v></video><embed src=e>')
        assert [(s[0], s[2]) for s in spans] == [
            ("image", "i"),
            ("video", "v"),
            ("embed", "e"),
        ]

    def test_media_mid_block_splits_text(self):
        spans = spans_of('a <img src=x> b')
        assert spans == [
            ("text", "a", "", 0),
            ("image", "", "x", 1),
            ("text", "b", "", 2),
        ]

    def test_entity_decode_in_text_spans(self):
        spans = spans_of("<p>a &amp; b</p>")
        assert spans == [("text", "a & b", "", 0)]

    def test_src_attr_decoded(self):
        spans = spans_of('<img src="a&amp;b.png">')
        assert spans[0][2] == "a&b.png"

    def test_structured_text_parity_on_fixtures(self, fixture_html):
        # For media-free extraction, '\n'.join(text spans) must equal
        # structuredText when no empty-normalised blocks occur.
        for name in ["nice.html", "google.html", "hillcrestpartyrentals.html"]:
            root = parse(fixture_html[name])
            st = root.structured_text
            spans = extract_spans(root)
            text_only = "\n".join(s[1] for s in spans if s[0] == "text")
            # img elements split blocks; compare ignoring block splits:
            assert text_only.replace("\n", " ") != ""  # sanity: non-trivial
            # every text span appears, in order, within structuredText
            pos = 0
            for s in spans:
                if s[0] != "text":
                    continue
                for piece in s[1].split("\n"):
                    idx = st.find(piece, pos)
                    assert idx >= 0, (name, piece[:60])
                    pos = idx


class TestAssembleDocument:
    def test_html_only(self):
        html, media = assemble_document(["html"], ["<p>x</p>"], [""], [0])
        assert html == "<p>x</p>" and media == {}

    def test_offset_order(self):
        html, _ = assemble_document(
            ["html", "html"], ["<p>b</p>", "<p>a</p>"], ["", ""], [1, 0]
        )
        assert html == "<p>a</p><p>b</p>"

    def test_media_placeholder_and_passthrough(self):
        kinds = ["html", "image", "html", "video"]
        texts = ["<p>one</p>", "a caption", "<p>two</p>", ""]
        refs = ["", "media://d/0", "", "media://d/1"]
        offsets = [0, 1, 2, 3]
        spans, valid, metrics = parse_and_extract(kinds, texts, refs, offsets)
        assert valid
        assert spans == [
            ("text", "one", "", 0),
            ("image", "a caption", "media://d/0", 1),
            ("text", "two", "", 2),
            ("video", "", "media://d/1", 3),
        ]
        assert metrics.n_bytes == len("<p>one</p>") + len("<p>two</p>") + 2 * len(
            "<img data-nhpr-media=0>"
        )

    def test_media_between_open_tags(self):
        # media placeholder inside an open block element
        kinds = ["html", "embed", "html"]
        texts = ["<div>start ", "", " end</div>"]
        refs = ["", "media://d/9", ""]
        spans, valid, _ = parse_and_extract(kinds, texts, refs, [0, 1, 2])
        assert valid
        assert spans == [
            ("text", "start", "", 0),
            ("embed", "", "media://d/9", 1),
            ("text", "end", "", 2),
        ]


class TestFlatten:
    def test_roundtrip(self):
        html = '<div id="a" class="x y"><p>hello &amp; bye</p><!--c--><img src=p.png></div>'
        root = parse(html, {"comment": True})
        flat = flatten_tree(root)
        rebuilt = unflatten_tree(flat)
        assert rebuilt.to_string() == root.to_string()
        assert extract_spans(rebuilt) == extract_spans(root)

    def test_preorder_ids(self):
        root = parse("<a><b></b><c></c></a>")
        flat = flatten_tree(root)
        assert flat["node_id"] == [0, 1, 2, 3]
        assert flat["parent_id"] == [-1, 0, 1, 1]
        assert flat["tag"] == ["", "a", "b", "c"]


class TestPlaceholderAttrRobustness:
    def test_wild_placeholder_attr_does_not_crash(self):
        """A document that happens to carry data-nhpr-media with a
        non-numeric (or huge) value is a plain media element, not a crash
        — in both the object and flat kernels."""
        from node_html_parser_ray.kernel.extract import (
            assemble_document,
            extract_spans,
        )
        from node_html_parser_ray.kernel.fast_extract import extract_spans_fast
        from node_html_parser_ray.kernel.parser import parse

        html, media_map = assemble_document(
            ["html", "image"],
            ['<img data-nhpr-media=zzz src="/a.png">'
             '<img data-nhpr-media=99999999999999999999 src="/b.png">'
             # isdigit()-true but int()-rejected: superscript two
             '<img data-nhpr-media=² src="/c.png">'
             # non-ASCII decimals: int() would accept these with different
             # semantics; the guard must not resolve them
             '<img data-nhpr-media=٠ src="/d.png">x', ""],
            ["", "media://d/0"],
            [0, 1],
        )
        slow = extract_spans(parse(html), media_map)
        fast, _ = extract_spans_fast(html, media_map)
        assert fast == slow
        kinds = [s[0] for s in fast]
        assert kinds.count("image") >= 3  # wild imgs + the real placeholder
