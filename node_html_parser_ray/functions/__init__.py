"""Scalar / vectorized function surface (SURVEY.md §2.6 + pipeline helpers).

One stable import point for the engine's scalar functions, mirroring the
reference's exported helpers (decode/encode at src/index.ts:37-39 via
html-entities) plus the vectorized kernels the Ray stages share.  Every
function here is pure and batch-safe: no Ray state, importable on any
worker.
"""
from ..kernel.entities import decode, encode
from ..kernel.jsregex import js_trim, js_ws_split
from ..stages.dedup import bloom_bits_for_ids, bloom_test_ids, popcount64
from ..stages.layout import xy_cut_order
from ..stages.textstats import (
    fingerprint_batch,
    langid_batch,
    quality_batch,
    token_stats_batch,
)

__all__ = [
    "decode",
    "encode",
    "js_trim",
    "js_ws_split",
    "popcount64",
    "bloom_bits_for_ids",
    "bloom_test_ids",
    "xy_cut_order",
    "fingerprint_batch",
    "langid_batch",
    "quality_batch",
    "token_stats_batch",
]
