"""Text-analysis batch kernels: token counts, quality, language-ID, fingerprints.

Training-data-pipeline operators over a ``text`` column.  All counting ops
are vectorized with ``pyarrow.compute`` regex kernels (no Python loop over
rows in the hot path); the rolling-hash fingerprint is numpy-vectorized
per row over codepoint windows.  Stateless -> Ray tasks.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = [
    "token_stats_batch",
    "quality_batch",
    "langid_batch",
    "fingerprint_batch",
]

# whitespace-run tokenisation (JS \s+ equivalent is fine for stats purposes)
_TOKEN_RE = r"[^\s]+"
# BPE-ish word/number/punct splitter for token counting
_BPE_RE = r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"


def token_stats_batch(batch: pa.Table) -> pa.Table:
    """Per-doc token counts: whitespace tokens + BPE-ish subtokens + chars."""
    text = batch.column("text")
    n_ws_tokens = pc.count_substring_regex(text, _TOKEN_RE)
    n_bpe_tokens = pc.count_substring_regex(text, _BPE_RE)
    n_chars = pc.utf8_length(text)
    return pa.Table.from_arrays(
        [
            batch.column("doc_id"),
            pc.cast(n_ws_tokens, pa.int64()),
            pc.cast(n_bpe_tokens, pa.int64()),
            pc.cast(n_chars, pa.int64()),
        ],
        names=["doc_id", "n_ws_tokens", "n_bpe_tokens", "n_chars_text"],
    )


def quality_batch(batch: pa.Table) -> pa.Table:
    """Per-doc quality counters (ints, so results are oracle-hashable).

    n_punct: sentence/clause punctuation; n_digits; n_upper; n_stop: hits of
    a small english stopword set; quality heuristics downstream combine these
    with token counts.
    """
    text = batch.column("text")
    n_tokens = pc.count_substring_regex(text, _TOKEN_RE)
    n_punct = pc.count_substring_regex(text, r"[.!?,;:]")
    n_digits = pc.count_substring_regex(text, r"[0-9]")
    n_upper = pc.count_substring_regex(text, r"[A-Z]")
    n_stop = pc.count_substring_regex(
        text, r"\b(the|a|of|and|to|in|is|it|that|for)\b"
    )
    return pa.Table.from_arrays(
        [
            batch.column("doc_id"),
            pc.cast(n_tokens, pa.int64()),
            pc.cast(n_punct, pa.int64()),
            pc.cast(n_digits, pa.int64()),
            pc.cast(n_upper, pa.int64()),
            pc.cast(n_stop, pa.int64()),
        ],
        names=["doc_id", "n_tokens", "n_punct", "n_digits", "n_upper", "n_stop"],
    )


# tiny per-language marker profiles (n-gram/stopword heuristic; deterministic)
_LANG_PROFILES: dict[str, str] = {
    "en": r"\b(the|and|of|to|is|that|with|for)\b",
    "fr": r"\b(le|la|les|des|une?|est|avec|pour)\b",
    "de": r"\b(der|die|das|und|ist|mit|für|ein)\b",
    "es": r"\b(el|los|las|una?|es|con|para|que)\b",
    "zh": r"[一-鿿]",
}


def langid_batch(batch: pa.Table) -> pa.Table:
    """Heuristic language-ID: argmax of per-language marker-hit counts.

    Vectorized: one regex count pass per language profile, numpy argmax.
    Documents with zero hits everywhere (including null text) get ``und``.
    """
    text = pc.fill_null(batch.column("text"), "")
    scores = np.stack(
        [
            pc.count_substring_regex(text, pattern).to_numpy(zero_copy_only=False)
            for pattern in _LANG_PROFILES.values()
        ]
    )
    langs = list(_LANG_PROFILES.keys())
    best = scores.argmax(axis=0)
    top = scores.max(axis=0)
    pred = [langs[b] if h else "und" for b, h in zip(best, top > 0)]
    return pa.Table.from_arrays(
        [
            batch.column("doc_id"),
            pa.array(pred, pa.string()),
            pa.array(top, pa.int64()),
        ],
        names=["doc_id", "pred_lang", "lang_score"],
    )


# FNV-prime powers p^1..p^8 mod 2^64 — the 8-gram window-hash weights.
# Plain integer arithmetic so a SQL engine reproduces the fingerprint
# exactly (see ORACLE_SQL["fingerprints"]): hash(window at i) =
# sum_j codepoint[i+j] * p^(j+1) mod 2^64, windows at stride 4.
_FP_WEIGHTS = np.cumprod(
    np.full(8, 1099511628211, dtype=np.uint64), dtype=np.uint64
)
_FP_MASK63 = np.uint64(0x7FFFFFFFFFFFFFFF)


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """Document fingerprint over 8-codepoint rolling window hashes.

    Two int64 fingerprints per doc, both reductions of the same FNV-weighted
    window-hash set (deterministic integer arithmetic — oracle-verifiable):

    * ``window_fingerprint`` = min window hash (a 1-perm MinHash) —
      *usually* stable under small appends (changes only when a new window
      hashes below the current minimum);
    * ``text_fingerprint`` = sum of window hashes mod 2^63 — order-
      sensitive whole-document hash (each window encodes local order).

    Documents shorter than 8 codepoints are zero-padded to one window.
    """
    texts = batch.column("text").to_pylist()
    full = np.empty(len(texts), dtype=np.int64)
    windowed = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        codes = np.frombuffer(
            (t or "").encode("utf-32-le", "surrogatepass"), dtype=np.uint32
        ).astype(np.uint64)
        if len(codes) < 8:
            codes = np.pad(codes, (0, 8 - len(codes)))
        wins = np.lib.stride_tricks.sliding_window_view(codes, 8)[::4]
        hashes = (wins * _FP_WEIGHTS).sum(axis=1, dtype=np.uint64)
        windowed[i] = int(hashes.min() & _FP_MASK63)
        full[i] = int(hashes.sum(dtype=np.uint64) & _FP_MASK63)
    return pa.Table.from_arrays(
        [
            batch.column("doc_id"),
            pa.array(full, pa.int64()),
            pa.array(windowed, pa.int64()),
        ],
        names=["doc_id", "text_fingerprint", "window_fingerprint"],
    )
