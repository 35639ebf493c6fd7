"""HTML entity encode/decode matching the reference's `html-entities` usage.

The reference imports ``decode``/``encode`` from the ``html-entities`` npm
package (reference src/index.ts:1) and uses:

* ``decode(text)`` with defaults — full HTML5 named + numeric entity decode
  (used at src/index.ts:38 for ``.text`` and src/index.ts:530 for decoded
  attribute maps).  Python's :func:`html.unescape` implements the same HTML5
  algorithm (named entities with and without trailing semicolons, decimal and
  hex numeric references), so we delegate to it.

* ``encode(value)`` with defaults — "specialChars" mode: only ``& < > " '``
  are replaced, with HTML5 named entities (used at src/index.ts:597, 600,
  628, 631 when re-serialising attributes).  Python's ``html.escape`` uses
  ``&#x27;`` for the apostrophe, so we implement the exact five replacements
  here instead.
"""
from __future__ import annotations

import html as _html

__all__ = ["decode", "encode"]


def decode(text: str) -> str:
    """HTML5 entity decode (named + numeric), matching html-entities decode."""
    if "&" not in text:
        return text
    return _html.unescape(text)


_ENCODE_TABLE = str.maketrans(
    {
        "&": "&amp;",
        "<": "&lt;",
        ">": "&gt;",
        '"': "&quot;",
        "'": "&apos;",
    }
)


def encode(text: str) -> str:
    """Encode the five special chars exactly like html-entities' default mode."""
    return text.translate(_ENCODE_TABLE)
