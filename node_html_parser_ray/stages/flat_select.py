"""Columnar selector evaluation over an exploded node table.

The flattened tree encoding (kernel/extract.flatten_tree) becomes a
corpus-wide Arrow node table — one row per DOM node:

    doc_id, node_id, parent_id, kind, tag, id, classes, attr_keys

Simple selectors (``tag`` / ``#id`` / ``.class`` / ``[attr]`` and their
conjunctions, i.e. one selector part) are then evaluated as pure
``pyarrow.compute`` masks over the whole corpus — no per-document loop at
all — and counted per doc with a vectorized groupby.  This is the scale path
for "count/filter nodes matching X" workloads (SURVEY.md §2.5 mapping note).

Descendant chains and attribute *operators* keep full reference-exact
semantics on the per-document automaton (stages/selector_stage.SelectorStage);
the matched-node *set* of a single part is identical between both paths,
which the parity test asserts.
"""
from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

from ..kernel.extract import assemble_document, flatten_tree
from ..kernel.parser import parse
from ..kernel.selector import _SELECTOR_PART_RE

__all__ = [
    "explode_nodes_batch",
    "columnar_part_mask",
    "columnar_select_mask",
    "selector_counts",
]

NODE_TABLE_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("node_id", pa.int32()),
        ("parent_id", pa.int32()),
        ("kind", pa.int8()),
        ("tag", pa.string()),
        ("id", pa.string()),
        ("classes", pa.string()),
        ("attr_keys", pa.string()),  # parsed attribute KEYS, space-joined
    ]
)


def explode_nodes_batch(batch: pa.Table) -> pa.Table:
    """Parse each document and emit its flattened nodes as table rows."""
    doc_ids = batch.column("doc_id").to_pylist()
    if "spans" in batch.column_names:
        htmls = [
            assemble_document(
                [s["kind"] for s in row],
                [s["text"] for s in row],
                [s["media_ref"] for s in row],
                [s["offset"] for s in row],
            )[0]
            for row in batch.column("spans").to_pylist()
        ]
    else:
        htmls = batch.column("html").to_pylist()

    out_doc: list[str] = []
    out_nid: list[int] = []
    out_pid: list[int] = []
    out_kind: list[int] = []
    out_tag: list[str] = []
    out_id: list[str] = []
    out_cls: list[str] = []
    out_attrs: list[str] = []
    for doc_id, html in zip(doc_ids, htmls):
        root = parse(html or "")
        # walk pre-order collecting element metadata (same ids as
        # flatten_tree but with id/class materialised for columnar checks)
        stack = [(root, -1)]
        nid = 0
        while stack:
            node, pid = stack.pop()
            is_el = node.node_type == 1
            out_doc.append(str(doc_id))
            out_nid.append(nid)
            out_pid.append(pid)
            out_kind.append(node.node_type)
            if is_el:
                out_tag.append(node.tag_name)
                out_id.append(node.id)
                out_cls.append(" ".join(node.class_names))
                # PARSED keys (reference rawAttributes semantics) — matching
                # raw attr text by regex false-positives on values that
                # contain "key=" (caught by the fuzz parity test)
                out_attrs.append(" ".join(node.raw_attributes) if node.raw_attrs else "")
                stack.extend((c, nid) for c in reversed(node.child_nodes))
            else:
                out_tag.append("")
                out_id.append("")
                out_cls.append("")
                out_attrs.append("")
            nid += 1
    return pa.Table.from_arrays(
        [
            pa.array(out_doc, pa.string()),
            pa.array(out_nid, pa.int32()),
            pa.array(out_pid, pa.int32()),
            pa.array(out_kind, pa.int8()),
            pa.array(out_tag, pa.string()),
            pa.array(out_id, pa.string()),
            pa.array(out_cls, pa.string()),
            pa.array(out_attrs, pa.string()),
        ],
        schema=NODE_TABLE_SCHEMA,
    )


def columnar_part_mask(nodes: pa.Table, part: str) -> pa.ChunkedArray:
    """Boolean mask of nodes matching ONE selector part, all-Arrow kernels.

    Supports tag / ``*`` / ``#id`` / ``.cls`` chains / bare ``[attr]``
    existence, AND-composed — the single-part grammar of the reference's
    Matcher (src/index.ts:722-733) minus attribute *operators*.
    """
    stripped = part.strip()
    m = _SELECTOR_PART_RE.match(stripped)
    # reject anything the single-part grammar does not FULLY consume
    # (combinators, pseudo-classes, commas) instead of silently
    # prefix-matching — those belong on the per-document automaton
    if m is None or not m.group(0).strip() or m.end() != len(stripped):
        raise ValueError(f"unsupported selector part: {part!r}")
    tag, id_, classes, attrs = m.group(1), m.group(2), m.group(3), m.group(4)
    # element nodes only; fictive roots (tag == '') never match (the
    # reference only advances the matcher when node.tagName is truthy)
    mask = pc.and_(
        pc.equal(nodes.column("kind"), pa.scalar(1, pa.int8())),
        pc.not_equal(nodes.column("tag"), ""),
    )
    if tag and tag != "*":
        mask = pc.and_(mask, pc.equal(nodes.column("tag"), tag))
    if id_:
        mask = pc.and_(mask, pc.equal(nodes.column("id"), id_))
    if classes:
        for cls in classes.split("."):
            pattern = f"(^| ){re.escape(cls)}( |$)"
            mask = pc.and_(
                mask, pc.match_substring_regex(nodes.column("classes"), pattern)
            )
    if attrs:
        bare = list(re.finditer(r"\[([^\]=~|^$*!]+)\]", attrs))
        if sum(len(am.group(0)) for am in bare) != len(attrs):
            # an [attr op value] operator slipped through — those need the
            # per-document automaton (SelectorStage), not this fast path
            raise ValueError(f"unsupported selector part: {part!r}")
        for am in bare:
            key = am.group(1).strip()
            # exact word match over the PARSED key list (keys contain no
            # whitespace per the reference's kAttributePattern)
            pattern = f"(^| ){re.escape(key)}( |$)"
            mask = pc.and_(
                mask, pc.match_substring_regex(nodes.column("attr_keys"), pattern)
            )
    return mask


def columnar_select_mask(nodes: pa.Table, selector: str):
    """Boolean numpy mask for a whitespace-DESCENDANT-chain selector,
    evaluated columnar over the whole corpus node table.

    Per level k: ``consumed_k = part_mask_k & (some proper ancestor has
    consumed_{k-1})``.  The ancestor flag is computed by a depth-bounded
    vectorized fixpoint over the parent-pointer array (node_id is pre-order,
    so parents always precede children; propagation is one gather + OR per
    tree level, O(depth) numpy passes over the corpus — no per-document
    Python loop).  Match SET equals the per-document automaton
    (query_selector_all), which the parity tests assert; result ORDER is a
    caller concern (the node table is pre-order).
    """
    import numpy as np

    if "," in selector:
        # comma union (reference querySelectorAll comma semantics is a set
        # union, src/index.ts:407-409) — OR of the per-selector masks
        subs = [s for s in selector.split(",") if s.strip()]
        if not subs:
            raise ValueError("empty selector")
        acc = columnar_select_mask(nodes, subs[0])
        for s in subs[1:]:
            acc = acc | columnar_select_mask(nodes, s)
        return acc

    parts = selector.split()
    if not parts:
        raise ValueError("empty selector")

    node_ids = nodes.column("node_id").to_numpy(zero_copy_only=False)
    parent_ids = nodes.column("parent_id").to_numpy(zero_copy_only=False)
    n = len(node_ids)
    # global row index of each node's parent: rows are consecutive per doc
    # (node_id == 0 marks a doc start) and parent_id is doc-local
    doc_start_marks = node_ids == 0
    doc_start = np.maximum.accumulate(
        np.where(doc_start_marks, np.arange(n), 0)
    )
    has_parent = parent_ids >= 0
    gparent = np.where(has_parent, doc_start + parent_ids, 0)

    consumed = np.asarray(columnar_part_mask(nodes, parts[0]).to_numpy(
        zero_copy_only=False), dtype=bool)
    for part in parts[1:]:
        pmask = np.asarray(columnar_part_mask(nodes, part).to_numpy(
            zero_copy_only=False), dtype=bool)
        # anc[i] = True iff some proper ancestor of i is in `consumed`
        anc = np.zeros(n, dtype=bool)
        while True:
            new_anc = has_parent & (anc[gparent] | consumed[gparent])
            if (new_anc == anc).all():
                break
            anc = new_anc
        consumed = pmask & anc
    return consumed


def selector_counts(nodes: pa.Table, parts: list[str]) -> pa.Table:
    """Per-doc match counts for each single-part selector (vectorized)."""
    import pandas as pd

    import numpy as np

    doc_ids = nodes.column("doc_id").to_pandas()
    frames = []
    for part in parts:
        if " " in part.strip():
            mask = pd.Series(columnar_select_mask(nodes, part))
        else:
            mask = columnar_part_mask(nodes, part).to_pandas()
        counts = (
            pd.DataFrame({"doc_id": doc_ids, "hit": mask.astype("int64")})
            .groupby("doc_id", as_index=False)["hit"]
            .sum()
        )
        counts["selector"] = part
        frames.append(counts.rename(columns={"hit": "n_matches"}))
    out = pd.concat(frames, ignore_index=True)[["doc_id", "selector", "n_matches"]]
    return pa.Table.from_pandas(out, preserve_index=False)
