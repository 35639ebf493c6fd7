"""Persistent spawn-based sidecar for the bounded ReDoS parse lane.

CPython's regex engine cannot be interrupted by signals mid-match, so the
only hard wall bound for a prescan-flagged parse is a kill-able process
(SCALE.md known-limitation; the blowup is the REFERENCE's own tokenizer
behavior, src/index.ts:833).  Round-4 review hardening: the lane previously
``fork()``-ed the (multithreaded) Ray worker per flagged document — a child
forked while another thread holds a malloc/Arrow/gRPC lock can deadlock
before it ever sends a result, making a benign prescan false positive
indistinguishable from a real timeout (a silent nondeterministic doc drop).
This module replaces that with ONE persistent ``spawn`` subprocess per
worker process: spawn starts from a clean single-threaded interpreter (no
inherited locks), the startup cost (~0.1 s; this module's transitive
imports are pure stdlib) is amortized across every flagged document the
worker ever sees, and a timeout kills + respawns the sidecar.

The sidecar runs the SAME kernel (`fast_extract.extract_spans_into`), so
prescan false positives come back bit-identical (tests/test_redos.py).
"""
from __future__ import annotations

import multiprocessing as mp
import threading
from typing import Optional

__all__ = ["RedosSidecar", "kernel_extract"]


def kernel_extract(html: str, media_map: Optional[dict], options: Optional[dict]):
    """One document through the flat-array kernel -> the lane result tuple
    ``(kinds, texts, refs, n_spans, valid, metrics6)``.  Shared by the
    sidecar loop and the in-process fallback so the two lanes cannot
    drift (round-4 review: the fork child duplicated this body)."""
    from .fast_extract import extract_spans_into
    from .parser import ParseMetrics

    metrics = ParseMetrics()
    kinds: list[str] = []
    texts: list[str] = []
    refs: list[str] = []
    n_spans, valid = extract_spans_into(
        html, media_map, options, metrics, kinds, texts, refs
    )
    return (
        kinds, texts, refs, n_spans, valid,
        (metrics.n_nodes, metrics.n_elements, metrics.n_text,
         metrics.n_comments, metrics.n_fixups, metrics.n_bytes),
    )


def _sidecar_loop(conn) -> None:
    """Child body: pure compute over a pipe, one request -> one reply."""
    while True:
        try:
            msg = conn.recv()
        except (EOFError, OSError):
            return
        if msg is None:
            conn.close()
            return
        html, media_map, options = msg
        conn.send(kernel_extract(html, media_map, options))


class RedosSidecar:
    """Lazily-started persistent subprocess running the parse kernel.

    ``extract(...)`` returns the kernel result tuple, or ``None`` when the
    wall bound expires (the sidecar is then killed and will respawn on the
    next call).  Thread-safe; one instance is held per worker process
    (module global in ``stages.extract_stage``)."""

    def __init__(self) -> None:
        self._proc = None
        self._conn = None
        self._lock = threading.Lock()
        # becomes True the first time a spawn succeeds: after that, a
        # setup/send failure is transient (fd/memory pressure) and must NOT
        # fall back to an unbounded in-process parse of a flagged doc
        self._spawn_ok = False

    def _ensure(self) -> None:
        if self._proc is not None and self._proc.is_alive():
            return
        self._close()
        ctx = mp.get_context("spawn")
        parent, child = ctx.Pipe()
        proc = ctx.Process(target=_sidecar_loop, args=(child,), daemon=True)
        proc.start()
        child.close()
        self._proc, self._conn = proc, parent
        self._spawn_ok = True

    def _close(self) -> None:
        if self._conn is not None:
            try:
                self._conn.close()
            except OSError:
                pass
        if self._proc is not None:
            if self._proc.is_alive():
                self._proc.terminate()
                self._proc.join(1.0)
                if self._proc.is_alive():
                    self._proc.kill()
            self._proc.join()
        self._proc = self._conn = None

    def extract(self, html, media_map, options, timeout):
        """Bounded parse; ``None`` on timeout/crash (caller records the doc
        as dropped-invalid).

        Setup/send failure (round-4 review fix): if a spawn has EVER
        succeeded in this process, a later failure is transient resource
        pressure (EAGAIN/EMFILE on process or pipe creation) — return
        ``None`` like a timeout, because an unbounded in-process parse of a
        document the prescan just flagged is the exact hang this lane
        exists to prevent, and a degraded node is when it is most likely to
        fire.  Only when spawn has NEVER worked (platform without spawn
        support) fall back to the unbounded in-process kernel — reference
        behavior, and benign prescan FPs must not become dropped docs
        there."""
        with self._lock:
            try:
                self._ensure()
                self._conn.send((html, media_map, options))
            except Exception:
                self._close()
                if self._spawn_ok:
                    return None
                return kernel_extract(html, media_map, options)
            if self._conn.poll(timeout):
                try:
                    return self._conn.recv()
                except (EOFError, OSError):  # child crashed mid-reply
                    self._close()
                    return None
            self._close()  # timeout: kill; next call respawns
            return None
