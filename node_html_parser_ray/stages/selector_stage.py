"""Stateful selector stage: compiled CSS matchers on an actor pool.

The reference compiles a Matcher per querySelector call
(src/index.ts:651-685); at 10^12-doc scale the compile cost must be paid once
per *worker*, not per document.  This stage is a callable class for
``ds.map_batches(SelectorStage(selectors), concurrency=N, batch_size=B)``:
the matcher cache is built in ``__init__`` (once per actor) and reused for
every batch (north_star stateful-stage clause).
"""
from __future__ import annotations

from typing import Optional, Sequence

import pyarrow as pa

from .extract_stage import SIDECAR, parse_timeout, htmls_from_batch, prescan_flags
from ..kernel.parser import parse
from ..kernel.selector import Matcher, _explore_all

__all__ = ["SelectorStage", "SELECTOR_OUTPUT_SCHEMA", "select_document"]

# n_matches is -1 for a document the bounded ReDoS lane dropped (sidecar
# wall bound expired): the reference itself would never terminate on such a
# document, so an explicit out-of-band count beats both hanging and a
# silent 0.
SELECTOR_OUTPUT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("selector", pa.string()),
        ("n_matches", pa.int32()),
        ("matches", pa.list_(pa.large_string())),
    ]
)


def select_all(root, parts: list[Matcher]):
    """querySelectorAll over pre-compiled comma-part matchers: pre-order
    result, comma-union dedup by identity (reference src/index.ts:651-685
    semantics)."""
    seen: dict[int, object] = {}
    for matcher in parts:
        matcher.reset()
        for el in _explore_all(root, matcher.clone()):
            if id(el) not in seen:
                seen[id(el)] = el
    return list(seen.values())


def select_document(html, selectors, options, emit_text):
    """ONE document through parse + the whole selector set — the sidecar
    entry point for prescan-flagged docs (kernel/redos_lane.py), so the
    result is pure args in / plain lists out.  Compiles matchers per call:
    only the rare flagged documents pay that.

    Returns ``[(n_matches, texts), ...]`` aligned with ``selectors``."""
    root = parse(html, options)
    out = []
    for sel in selectors:
        parts = [Matcher(p.strip()) for p in sel.split(",") if p.strip()]
        found = select_all(root, parts)
        out.append(
            (len(found), [el.text for el in found] if emit_text else [])
        )
    return out


class SelectorStage:
    """Evaluate a fixed selector set against every document in each batch.

    Emits one row per (doc, selector): match count + matched elements'
    decoded text (pre-order, exactly the reference's querySelectorAll result
    order and comma-union dedup semantics).
    """

    def __init__(
        self,
        selectors: Sequence[str],
        options: Optional[dict] = None,
        emit_text: bool = True,
    ) -> None:
        # once per actor: compile every selector part
        self.selectors = list(selectors)
        self.compiled: list[tuple[str, list[Matcher]]] = [
            (sel, [Matcher(p.strip()) for p in sel.split(",") if p.strip()])
            for sel in self.selectors
        ]
        self.options = options
        self.emit_text = emit_text
        # count-only mode routes selectors the columnar grammar covers
        # (tag/#id/.class/[attr] + descendant/comma) through the vectorized
        # node-table path — ~27x faster matching; text emission needs the
        # automaton's reference result order, so it never routes
        self.columnar: set[str] = set()
        if not emit_text and options is None:
            from .flat_select import NODE_TABLE_SCHEMA, columnar_select_mask

            probe = NODE_TABLE_SCHEMA.empty_table()
            for sel in self.selectors:
                try:
                    columnar_select_mask(probe, sel)
                    self.columnar.add(sel)
                except ValueError:
                    pass

    def _select_all(self, root, parts: list[Matcher]):
        return select_all(root, parts)

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        htmls = htmls_from_batch(batch)

        # bounded ReDoS lane (shared with extract_batch): flagged docs
        # never reach explode_nodes_batch or parse() in-process — they run
        # in the spawn sidecar; a timeout emits n_matches=-1 rows
        timeout = parse_timeout()
        flagged = prescan_flags(htmls, timeout)

        out_doc: list[str] = []
        out_sel: list[str] = []
        out_n: list[int] = []
        flat_matches: list[str] = []
        offsets: list[int] = [0]

        col_counts: dict[tuple[str, str], int] = {}
        if self.columnar:
            import numpy as np

            from .flat_select import columnar_select_mask, explode_nodes_batch

            keep = [
                r for r in range(len(doc_ids))
                if flagged is None or not flagged[r]
            ]
            nodes = explode_nodes_batch(
                pa.Table.from_arrays(
                    [pa.array([str(doc_ids[r]) for r in keep], pa.string()),
                     pa.array([htmls[r] for r in keep], pa.large_string())],
                    names=["doc_id", "html"],
                )
            )
            node_docs = np.asarray(nodes.column("doc_id").to_pylist())
            for sel in self.columnar:
                mask = columnar_select_mask(nodes, sel)
                for r in keep:
                    col_counts[(str(doc_ids[r]), sel)] = 0
                hit_docs, hit_n = np.unique(node_docs[mask], return_counts=True)
                for d, c in zip(hit_docs, hit_n):
                    col_counts[(str(d), sel)] = int(c)

        automaton = [
            (sel, parts) for sel, parts in self.compiled
            if sel not in self.columnar
        ]
        for r, (doc_id, html) in enumerate(zip(doc_ids, htmls)):
            if flagged is not None and flagged[r]:
                res = SIDECAR.call(
                    "node_html_parser_ray.stages.selector_stage",
                    "select_document",
                    (html, self.selectors, self.options, self.emit_text),
                    timeout,
                )
                for i, (sel, _parts) in enumerate(self.compiled):
                    out_doc.append(doc_id)
                    out_sel.append(sel)
                    if res is None:  # wall bound expired: bounded-out doc
                        out_n.append(-1)
                    else:
                        n, txts = res[i]
                        out_n.append(n)
                        flat_matches.extend(txts)
                    offsets.append(len(flat_matches))
                continue
            root = parse(html, self.options) if automaton else None
            for sel, parts in self.compiled:
                out_doc.append(doc_id)
                out_sel.append(sel)
                if sel in self.columnar:
                    out_n.append(col_counts[(str(doc_id), sel)])
                else:
                    found = self._select_all(root, parts)
                    out_n.append(len(found))
                    if self.emit_text:
                        flat_matches.extend(el.text for el in found)
                offsets.append(len(flat_matches))
        matches_col = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()),
            pa.array(flat_matches, pa.large_string()),
        )
        return pa.Table.from_arrays(
            [
                pa.array(out_doc, pa.string()),
                pa.array(out_sel, pa.string()),
                pa.array(out_n, pa.int32()),
                matches_col,
            ],
            schema=SELECTOR_OUTPUT_SCHEMA,
        )
