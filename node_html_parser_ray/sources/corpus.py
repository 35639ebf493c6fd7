"""Deterministic synthetic corpus of interleaved text+media documents.

Generates the input-table shape fixed by BASELINE.json (input_hint):

    doc_id:  string
    spans:   list<struct<kind, text, media_ref, offset:int32>>

HTML fragments are drawn from a pathology grammar covering every parser
branch (FIXTURES.md §3 — implicit closes, raw-text elements, comments,
malformed attributes, pair/single repair errors, entities, namespaces,
tables, void tags, unquoted values with slashes, doctype fall-through).
Fixed seed, no wall-clock, no network.  Document sizes follow a long-tailed
distribution with a configurable "giant" fraction to exercise skew handling.
"""
from __future__ import annotations

import random

import pyarrow as pa

__all__ = ["SPAN_STRUCT", "INPUT_SCHEMA", "generate_documents",
           "write_corpus", "write_corpus_shard"]

SPAN_STRUCT = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.large_string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)
INPUT_SCHEMA = pa.schema(
    [("doc_id", pa.string()), ("spans", pa.list_(SPAN_STRUCT))]
)

_WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima "
    "mike november oscar papa quebec romeo sierra tango uniform victor whiskey "
    "xray yankee zulu data span block merge stream batch vector table".split()
)

_LANG_ATTRS = ["en", "en-US", "fr", "de", "zh", "es"]


def _words(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(_WORDS) for _ in range(n))


# --- fragment grammar: each production returns an HTML fragment string -----


def _frag_paragraphs(rng: random.Random) -> str:
    return "".join(
        f"<p>{_words(rng, rng.randint(3, 20))}</p>" for _ in range(rng.randint(1, 4))
    )


def _frag_implicit_close(rng: random.Random) -> str:
    items = "".join(f"<li>{_words(rng, 3)}" for _ in range(rng.randint(2, 5)))
    return f"<ul>{items}</ul><p>{_words(rng, 4)}<p>{_words(rng, 4)}"


def _frag_table_broken(rng: random.Random) -> str:
    rows = "".join(
        f"<tr><td><a class=\"lnk\" href=\"/d/{rng.randint(0, 999)}\"><b>{_words(rng, 3)}<br>{_words(rng, 2)}<br></a></td></tr>"
        for _ in range(rng.randint(1, 3))
    )
    return f'<table id="t{rng.randint(0, 99)}">{rows}</table>'


def _frag_uppercase(rng: random.Random) -> str:
    return f"<DIV><A href=\"#x\">{_words(rng, 5)}</A><P>{_words(rng, 6)}</P></DIV>"


def _frag_void_tags(rng: random.Random) -> str:
    return (
        f"{_words(rng, 4)}<br /><img src=\"/img/{rng.randint(0, 99)}.png\" alt=\"{_words(rng, 2)}\">"
        f"<hr><meta charset=\"utf-8\"><input type=\"text\" value=\"{_words(rng, 1)}\">{_words(rng, 3)}</col>"
    )


def _frag_comments(rng: random.Random) -> str:
    return f"<div><!-- {_words(rng, 4)} --><span>{_words(rng, 5)}</span><!--<a></a>--></div>"


def _frag_script_style(rng: random.Random) -> str:
    return (
        f"<script type=\"text/javascript\">var x = {rng.randint(0, 9)}; if (x < 3) x++;</script>"
        f"<style>.c{rng.randint(0, 9)} {{ color: red; }}</style><pre>  {_words(rng, 4)}  </pre>"
        f"<p>{_words(rng, 8)}</p>"
    )


def _frag_doctype(rng: random.Random) -> str:
    return f"<!DOCTYPE html><html><body><p>{_words(rng, 6)}</p></body></html>"


def _frag_unclosed_inline(rng: random.Random) -> str:
    return f"<a href=\"#\"><b>{_words(rng, 3)}</a><div>{_words(rng, 5)}</div>"


def _frag_pair_error(rng: random.Random) -> str:
    return f"<div data-id={rng.randint(0, 9)}><h3>{_words(rng, 3)}<h3><div>"


def _frag_single_error(rng: random.Random) -> str:
    return f"<div><h3>{_words(rng, 4)}</div><p>{_words(rng, 4)}</p>"


def _frag_malformed_attrs(rng: random.Random) -> str:
    return (
        f"<span id='s{rng.randint(0, 99)}' ;=\"\" \"=\"\" class='editable'>{_words(rng, 3)}</span>"
        f"<div class=\"a\"data-test=\"/t{rng.randint(0, 9)}.jpg\">{_words(rng, 2)}</div>"
    )


def _frag_entities(rng: random.Random) -> str:
    return (
        f"<p>{_words(rng, 2)} &amp; {_words(rng, 2)} &lt;tag&gt; &nbsp; &#169; {_words(rng, 2)}</p>"
        f"<p title=\"a &amp; b\">{_words(rng, 3)}</p>"
    )


def _frag_namespace(rng: random.Random) -> str:
    return f"<ns:item>{_words(rng, 3)}</ns:item><my-widget data-k=\"v\">{_words(rng, 2)}</my-widget>"


def _frag_whitespace(rng: random.Random) -> str:
    return f"<div> \t\n <h5> {_words(rng, 3)} </h5>\n</div>  <p>{_words(rng, 4)}    {_words(rng, 2)}</p>"


def _frag_unquoted_slash(rng: random.Random) -> str:
    return f"<img src=/images/i{rng.randint(0, 99)}.png data=text/javascript /><div data=foo/>"


def _frag_nested_sections(rng: random.Random) -> str:
    inner = f"<section>{_words(rng, 6)}</section>"
    for _ in range(rng.randint(1, 4)):
        inner = f"<section>{inner}<p lang=\"{rng.choice(_LANG_ATTRS)}\">{_words(rng, 5)}</p></section>"
    return inner


def _frag_attrs_rich(rng: random.Random) -> str:
    return (
        f"<a href=\"https://example.com/{_words(rng, 1)}.html\" target=\"_blank\" class=\"btn primary\">{_words(rng, 2)}</a>"
        f"<a href=\"tel:+1{rng.randint(1000000, 9999999)}\" class=\"phone-link\" id=\"ph{rng.randint(0, 99)}\">{_words(rng, 1)}</a>"
        f"<div style=\"background-image:url('t{rng.randint(0, 9)}.jpg')\">{_words(rng, 3)}</div>"
    )


_FRAGMENT_GRAMMAR = [
    (_frag_paragraphs, 6),
    (_frag_implicit_close, 2),
    (_frag_table_broken, 1),
    (_frag_uppercase, 1),
    (_frag_void_tags, 2),
    (_frag_comments, 1),
    (_frag_script_style, 2),
    (_frag_doctype, 1),
    (_frag_unclosed_inline, 1),
    (_frag_pair_error, 1),
    (_frag_single_error, 1),
    (_frag_malformed_attrs, 1),
    (_frag_entities, 2),
    (_frag_namespace, 1),
    (_frag_whitespace, 2),
    (_frag_unquoted_slash, 1),
    (_frag_nested_sections, 2),
    (_frag_attrs_rich, 2),
]
_GRAMMAR_FNS = [f for f, w in _FRAGMENT_GRAMMAR for _ in range(w)]


def _make_doc(rng: random.Random, doc_id: str, giant: bool) -> dict:
    """One document: 1-6 html fragments interleaved with 0-4 media spans."""
    n_media = rng.randint(0, 4)
    n_html = rng.randint(1, 6) + (20 if giant else 0)
    spans: list[dict] = []
    offset = 0
    media_k = 0
    target_html = n_html  # rng.randint(1, 6)+... is always >= 1
    emitted_html = 0
    # giant docs repeat fragments until they cross the size threshold
    size_target = rng.randint(200_000, 600_000) if giant else 0
    size = 0
    while emitted_html < target_html or (giant and size < size_target):
        frag = rng.choice(_GRAMMAR_FNS)(rng)
        spans.append({"kind": "html", "text": frag, "media_ref": "", "offset": offset})
        size += len(frag)
        offset += 1
        emitted_html += 1
        if media_k < n_media and rng.random() < 0.4:
            kind = rng.choice(("image", "video", "embed"))
            spans.append(
                {
                    "kind": kind,
                    "text": _words(rng, rng.randint(0, 4)) if rng.random() < 0.5 else "",
                    "media_ref": f"media://{doc_id}/{media_k}",
                    "offset": offset,
                }
            )
            offset += 1
            media_k += 1
    return {"doc_id": doc_id, "spans": spans}


def generate_documents(
    n_docs: int,
    seed: int = 42,
    giant_fraction: float = 0.0,
    id_offset: int = 0,
) -> pa.Table:
    """Generate ``n_docs`` interleaved documents as an Arrow table.

    Deterministic per (seed, id_offset): each doc derives its own RNG from
    the doc index, so any shard of the corpus can be regenerated
    independently (this is what makes the bench corpus shardable across Ray
    tasks without materialising the whole thing on the driver).
    """
    rows = []
    for i in range(id_offset, id_offset + n_docs):
        rng = random.Random((seed << 20) ^ i)
        giant = giant_fraction > 0 and rng.random() < giant_fraction
        rows.append(_make_doc(rng, f"doc-{i:08d}", giant))
    return pa.Table.from_pylist(rows, schema=INPUT_SCHEMA)


def write_corpus_shard(
    out_dir: str,
    start: int,
    n: int,
    seed: int = 42,
    giant_fraction: float = 0.0,
) -> tuple[str, int]:
    """Write ONE corpus shard; returns (path, html_char_total).

    The single implementation of the shard layout — filename pattern and
    parquet options — shared by :func:`write_corpus` (tests) and bench.py's
    parallel generator, so the benched corpus format can't drift from the
    tested one.  Dictionary encoding is disabled: pathological for
    mostly-unique text payloads (40x slower decode measured).
    """
    import os

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    table = generate_documents(
        n, seed=seed, giant_fraction=giant_fraction, id_offset=start
    )
    path = os.path.join(out_dir, f"docs-{start:09d}.parquet")
    pq.write_table(table, path, use_dictionary=False)
    flat = table.column("spans").combine_chunks().flatten()
    html_chars = pc.sum(
        pc.if_else(
            pc.equal(flat.field("kind"), "html"),
            pc.utf8_length(flat.field("text")),
            0,
        )
    ).as_py() or 0
    return path, int(html_chars)


def write_corpus(
    out_dir: str,
    n_docs: int,
    seed: int = 42,
    giant_fraction: float = 0.0,
    rows_per_file: int = 2000,
) -> list[str]:
    """Write the corpus as one parquet file per shard; returns file paths."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for start in range(0, n_docs, rows_per_file):
        n = min(rows_per_file, n_docs - start)
        path, _ = write_corpus_shard(
            out_dir, start, n, seed=seed, giant_fraction=giant_fraction
        )
        paths.append(path)
    return paths
