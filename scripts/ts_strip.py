"""Strip TypeScript annotations from the reference parser source to runnable
CommonJS, for live differential testing (tests/test_differential_reference.py).

This is an ORIGINAL, pragmatic TS-subset stripper — not a general transpiler.
It handles exactly the constructs present in the frozen reference file
(`/root/reference/src/index.ts`, Sharcoux/node-html-parser): type/interface
declarations, `enum`, `abstract`, access modifiers, constructor parameter
properties, function/method overload signatures, parameter/member/variable/
return annotations, generic parameter lists and call-site type arguments, and
`as` casts.  Output is written under /tmp ONLY and is never committed: the
repo contains no reference-derived code; this script derives a test artifact
at test time, the same way the test suite reads the reference's html fixtures.

Correctness of the strip is gated twice at runtime: `node --check` on the
output, and the differential agreement itself (a mangled strip would diverge
on the very first fixture).
"""
from __future__ import annotations

import re

__all__ = ["strip_ts", "exported_names"]

_KEYWORD_BEFORE_REGEX = (
    "return", "typeof", "case", "in", "of", "instanceof", "new", "do", "else",
)
_CTRL_KEYWORDS = ("if", "for", "while", "switch", "catch", "with")


def _mask_literals(src: str) -> str:
    """Return a same-length shadow of ``src`` with every string, template,
    regex literal and comment replaced by spaces (newlines preserved), so
    structural regexes can run without tripping on literal contents."""
    out = list(src)
    i, n = 0, len(src)
    last_code = ""  # last non-space char emitted as code (for regex detection)
    last_word = ""  # last identifier-ish word seen in code

    def blank(a: int, b: int) -> None:
        for k in range(a, b):
            if src[k] != "\n":
                out[k] = " "

    while i < n:
        c = src[i]
        nxt = src[i + 1] if i + 1 < n else ""
        if c == "/" and nxt == "/":
            j = src.find("\n", i)
            j = n if j < 0 else j
            blank(i, j)
            i = j
            continue
        if c == "/" and nxt == "*":
            j = src.find("*/", i + 2)
            j = n - 2 if j < 0 else j
            blank(i, j + 2)
            i = j + 2
            continue
        if c in ("'", '"'):
            j = i + 1
            while j < n and src[j] != c:
                j += 2 if src[j] == "\\" else 1
            blank(i + 1, min(j, n))  # keep the quotes themselves
            i = min(j, n) + 1
            last_code = c
            continue
        if c == "`":
            j, depth = i + 1, 0
            while j < n:
                if src[j] == "\\":
                    j += 2
                    continue
                if src[j] == "$" and j + 1 < n and src[j + 1] == "{":
                    depth += 1
                    j += 2
                    continue
                if src[j] == "}" and depth:
                    depth -= 1
                elif src[j] == "`" and depth == 0:
                    break
                j += 1
            blank(i + 1, min(j, n))
            i = min(j, n) + 1
            last_code = "`"
            continue
        if c == "/":
            # regex literal iff a value cannot precede here
            is_regex = (
                last_code == ""
                or last_code in "(,=:[!&|?{};\n+-*%<>~^"
                or last_word in _KEYWORD_BEFORE_REGEX
            )
            if is_regex:
                j, in_class = i + 1, False
                while j < n:
                    ch = src[j]
                    if ch == "\\":
                        j += 2
                        continue
                    if ch == "[":
                        in_class = True
                    elif ch == "]":
                        in_class = False
                    elif ch == "/" and not in_class:
                        break
                    j += 1
                # flags
                k = j + 1
                while k < n and src[k].isalpha():
                    k += 1
                blank(i + 1, min(j, n))
                i = k
                last_code = "/"
                continue
        if not c.isspace():
            last_code = c
            if c.isalnum() or c in "_$":
                m = re.match(r"[\w$]+", src[i:])
                tok = m.group(0)
                last_word = tok if re.match(r"[A-Za-z_$]", tok) else ""
                i += len(tok)
                continue
            last_word = ""
        i += 1
    return "".join(out)


def _match_bracket(shadow: str, i: int) -> int:
    """Index of the bracket matching shadow[i] (one of ([{<)."""
    pairs = {"(": ")", "[": "]", "{": "}", "<": ">"}
    op, cl = shadow[i], pairs[shadow[i]]
    depth = 0
    for j in range(i, len(shadow)):
        if shadow[j] == op:
            depth += 1
        elif shadow[j] == cl:
            if cl == ">" and j > 0 and shadow[j - 1] == "=":
                continue  # the '>' of '=>' inside a function type
            depth -= 1
            if depth == 0:
                return j
    raise ValueError(f"unbalanced {op!r} at {i}")


_TYPE_WORD = re.compile(r"[A-Za-z_$][\w$.]*")


def _consume_type(shadow: str, i: int) -> int:
    """Consume a type expression starting at shadow[i]; return end index
    (exclusive).  Terminates at a top-level ``,`` ``)`` ``;`` ``=`` (but not
    ``=>``), unbalanced ``]``/``}``/``>``, ``{`` opening a body after a
    return annotation is NOT consumed (callers stop before it via the
    newline/brace rules below): specifically a ``{`` here is consumed only
    as an inline object TYPE, which is distinguishable because a body ``{``
    never follows an identifier/``>``/``]`` inside a type expression."""
    n = len(shadow)
    j = i
    expect_type = True  # next token should start a type (vs operator position)
    while j < n:
        c = shadow[j]
        if c in " \t":
            j += 1
            continue
        if c == "\n":
            # newline ends the type unless we still expect one (union split
            # across lines does not occur in the reference file)
            if expect_type:
                j += 1
                continue
            return j
        if expect_type:
            if c in "([{<":
                j = _match_bracket(shadow, j) + 1
                expect_type = False
                continue
            if c in "'\"":
                k = j + 1
                while k < n and shadow[k] != c:
                    k += 1
                j = k + 1
                expect_type = False
                continue
            m = _TYPE_WORD.match(shadow, j)
            if m:
                word = m.group(0)
                j = m.end()
                if word in ("keyof", "typeof", "new", "readonly"):
                    expect_type = True  # prefix operator
                else:
                    expect_type = False
                continue
            return j  # cannot start a type here: stop
        # operator position
        if c in "|&":
            j += 1
            expect_type = True
            continue
        if c == "=" and j + 1 < n and shadow[j + 1] == ">":
            j += 2
            expect_type = True  # function-type return
            continue
        if c == "[":  # array suffix or index access
            j = _match_bracket(shadow, j) + 1
            continue
        if c == "<":  # generic arguments
            j = _match_bracket(shadow, j) + 1
            continue
        if c == "?":  # optional member inside object types — only valid
            j += 1     # before ':', which the '{...}' bracket match already
            continue   # consumed; bare '?' here would be a ternary: stop is
                       # handled by expect_type bookkeeping upstream
        if c == ".":
            j += 1
            expect_type = True
            continue
        return j
    return j


def _signature_paren_positions(src: str, shadow: str) -> list[int]:
    """Indices of ``(`` that open function/method/constructor parameter
    lists (where ``name: Type`` annotations are legal)."""
    out = []
    for i, c in enumerate(shadow):
        if c != "(":
            continue
        # word immediately before the paren (skipping generic params <...>)
        k = i - 1
        while k >= 0 and shadow[k] in " \t":
            k -= 1
        if k >= 0 and shadow[k] == ">":
            # identifier<...>( — find the matching '<'
            depth = 0
            while k >= 0:
                if shadow[k] == ">":
                    depth += 1
                elif shadow[k] == "<":
                    depth -= 1
                    if depth == 0:
                        break
                k -= 1
            k -= 1
            while k >= 0 and shadow[k] in " \t":
                k -= 1
        m = re.search(r"([A-Za-z_$][\w$]*)\s*$", shadow[: k + 1])
        word = m.group(1) if m else ""
        if word in _CTRL_KEYWORDS:
            continue
        try:
            close = _match_bracket(shadow, i)
        except ValueError:
            continue
        # what follows the matching ')'?
        t = close + 1
        while t < len(shadow) and shadow[t] in " \t":
            t += 1
        follows = shadow[t : t + 2]
        if follows[:1] == "{" or follows == "=>" or follows[:1] == ":":
            # ') {' after a grouped EXPRESSION (not a signature) does not
            # occur at statement level in the reference file; keyword-
            # prefixed control parens were excluded above.
            if word and word not in ("return", "in", "of", "case", "new"):
                out.append(i)
            elif not word and follows == "=>":
                out.append(i)  # arrow with parenthesised params
    return out


def strip_ts(src: str) -> str:
    """TS -> JS for the reference parser source (see module docstring)."""
    # --- pass 1: whole-declaration rewrites (enum / type / interface) ---
    shadow = _mask_literals(src)
    edits: list[tuple[int, int, str]] = []  # (start, end, replacement)

    for m in re.finditer(r"^import .*$\n?", shadow, re.M):
        edits.append((m.start(), m.end(), ""))

    for m in re.finditer(r"\bexport enum (\w+) \{", shadow):
        close = _match_bracket(shadow, m.end() - 1)
        body = src[m.end() : close]
        members = re.findall(r"(\w+)\s*=\s*([\w.'\"-]+)", body)
        js = "const %s = {%s};" % (
            m.group(1),
            ", ".join(f"{k}: {v}" for k, v in members),
        )
        edits.append((m.start(), close + 1, js))

    for m in re.finditer(
        r"^(?:export )?(?:type|interface) \w+[^=\n{]*(=\s*)?", shadow, re.M
    ):
        j = m.end()
        while j < len(shadow) and shadow[j] in " \t\n":
            j += 1
        if j < len(shadow) and shadow[j] == "{":
            j = _match_bracket(shadow, j) + 1
            if j < len(shadow) and shadow[j] == ";":
                j += 1
        else:
            j = shadow.find("\n", j)
            j = len(shadow) if j < 0 else j
        edits.append((m.start(), j, ""))

    # overload signatures: a function/method header line ending without '{'
    for m in re.finditer(
        r"^[ \t]*(?:(?:public|private|protected)\s+)?"
        r"(?:function\s+)?[A-Za-z_$][\w$]*\s*\([^()]*\)\s*:[^;{\n]*;?[ \t]*$\n?",
        shadow,
        re.M,
    ):
        edits.append((m.start(), m.end(), ""))

    # abstract member declarations (no body)
    for m in re.finditer(r"^[ \t]*abstract [^;{\n]*;[ \t]*$\n?", shadow, re.M):
        edits.append((m.start(), m.end(), ""))

    src = _apply(src, edits)

    # --- pass 1b: constructor parameter properties ---
    # `constructor(public a: T, private b = '')` auto-assigns in TS; strip
    # the modifiers (pass 2 does) AND inject `this.a = a; this.b = b;` at
    # the top of the body (after a leading `super(...);` if present).
    shadow = _mask_literals(src)
    edits = []
    for m in re.finditer(r"\bconstructor\s*(\()", shadow):
        close = _match_bracket(shadow, m.start(1))
        inner = shadow[m.start(1) + 1 : close]
        props = re.findall(
            r"\b(?:public|private|protected|readonly)\s+([A-Za-z_$][\w$]*)", inner
        )
        if not props:
            continue
        t = close + 1
        while t < len(shadow) and shadow[t] in " \t\n":
            t += 1
        if t >= len(shadow) or shadow[t] != "{":
            continue
        ins = t + 1
        sm = re.match(r"\s*super\s*\(", shadow[ins:])
        if sm:
            sc = _match_bracket(shadow, ins + sm.end() - 1)
            ins = sc + 1
            if ins < len(shadow) and shadow[ins] == ";":
                ins += 1
        assigns = " " + " ".join(f"this.{p} = {p};" for p in props)
        edits.append((ins, ins, assigns))
    src = _apply(src, edits)

    # --- pass 2: token-level strips, iterated to fixpoint ---
    for _ in range(12):
        new = _strip_once(src)
        if new == src:
            break
        src = new

    # drop leftover 'export ' / 'abstract ' keywords and non-null assertions
    shadow = _mask_literals(src)
    edits = [
        (m.start(), m.end(), "")
        for m in re.finditer(r"\bexport |\babstract (?=class\b)", shadow)
    ]
    edits += [
        (m.start(), m.end(), "")
        for m in re.finditer(r"(?<=[\w$\)\]])!(?=[.\(\)\],;])", shadow)
    ]
    return _apply(src, edits)


def _strip_once(src: str) -> str:
    shadow = _mask_literals(src)
    n = len(src)
    edits: list[tuple[int, int, str]] = []
    claimed: list[tuple[int, int]] = []

    def claim(a: int, b: int) -> bool:
        for x, y in claimed:
            if a < y and b > x:
                return False
        claimed.append((a, b))
        return True

    # 2a. `as` casts (rightmost-first so chained casts resolve inside-out)
    for m in list(re.finditer(r"(?<=[\w$\)\]'\"}]) as (?=[\s\w'\"{(])", shadow))[::-1]:
        end = _consume_type(shadow, m.end())
        if claim(m.start(), end):
            edits.append((m.start(), end, ""))

    # 2b. generic parameter lists / call-site type arguments: name<...>(
    for m in re.finditer(r"[A-Za-z_$][\w$]*(<)", shadow):
        i = m.start(1)
        try:
            close = _match_bracket(shadow, i)
        except ValueError:
            continue
        t = close + 1
        if t < n and shadow[t] == "(" and claim(i, close + 1):
            edits.append((i, close + 1, ""))

    # 2c. parameter annotations inside signature parens
    for p in _signature_paren_positions(src, shadow):
        close = _match_bracket(shadow, p)
        inner = shadow[p + 1 : close]
        # constructor parameter properties -> plain params + assignments
        for m in re.finditer(r"\b(public|private|protected|readonly)\s+", inner):
            a = p + 1 + m.start()
            if claim(a, a + len(m.group(0))):
                edits.append((a, a + len(m.group(0)), ""))
        # name?: Type  /  name: Type
        for m in re.finditer(r"([A-Za-z_$][\w$]*)(\?)?\s*:", inner):
            a = p + 1 + m.end()  # just past ':'
            # only top-level params (not inside nested parens/braces)
            depth = 0
            for ch in inner[: m.start()]:
                if ch in "([{":
                    depth += 1
                elif ch in ")]}":
                    depth -= 1
            if depth != 0:
                continue
            end = _consume_type(shadow, a)
            s = m.start(1) + p + 1
            q_start = p + 1 + (m.start(2) if m.group(2) else m.end(1))
            if claim(q_start, end):
                edits.append((q_start, end, ""))

    # 2d. return annotations: ') : Type {' -> ') {'
    for m in re.finditer(r"\)\s*(:)", shadow):
        a = m.start(1)
        end = _consume_type(shadow, a + 1)
        t = end
        while t < n and shadow[t] in " \t\n":
            t += 1
        if t < n and shadow[t] == "{" and claim(a, end):
            edits.append((a, end, " "))

    # 2e. let/const/var annotations
    for m in re.finditer(r"\b(?:let|const|var)\s+[A-Za-z_$][\w$]*\s*(:)", shadow):
        a = m.start(1)
        end = _consume_type(shadow, a + 1)
        t = end
        while t < n and shadow[t] in " \t":
            t += 1
        if t < n and shadow[t] in "=;\n," and claim(a, end):
            edits.append((a, end, ""))

    # 2f. class-field annotations + access modifiers (class-body level only)
    for cm in re.finditer(r"\bclass\s+[\w$]+[^{]*\{", shadow):
        try:
            body_close = _match_bracket(shadow, cm.end() - 1)
        except ValueError:
            continue
        seg_start = cm.end()
        depth = 0
        k = seg_start
        line_start = seg_start
        while k < body_close:
            ch = shadow[k]
            if ch in "([{":
                depth += 1
            elif ch in ")]}":
                depth -= 1
            elif ch == "\n" and depth == 0:
                line = shadow[line_start:k]
                lm = re.match(
                    r"([ \t]*)((?:(?:public|private|protected|readonly)\s+)+)?"
                    r"([A-Za-z_$][\w$]*)(\?)?\s*(:)",
                    line,
                )
                if lm and lm.group(3) not in ("case", "default", "get", "set"):
                    if lm.group(2):
                        a = line_start + lm.start(2)
                        b = line_start + lm.end(2)
                        if claim(a, b):
                            edits.append((a, b, ""))
                    a = line_start + (lm.start(4) if lm.group(4) else lm.start(5))
                    end = _consume_type(shadow, line_start + lm.end(5))
                    if claim(a, end):
                        edits.append((a, end, ""))
                elif line.lstrip()[:1] and re.match(
                    r"[ \t]*(?:public|private|protected|readonly)\s", line
                ):
                    mm = re.match(r"([ \t]*)((?:(?:public|private|protected|readonly)\s+)+)", line)
                    a = line_start + mm.start(2)
                    b = line_start + mm.end(2)
                    if claim(a, b):
                        edits.append((a, b, ""))
                line_start = k + 1
            k += 1

    return _apply(src, edits)


def _apply(src: str, edits: list[tuple[int, int, str]]) -> str:
    out = src
    for a, b, rep in sorted(edits, key=lambda e: -e[0]):
        out = out[:a] + rep + out[b:]
    return out


def exported_names(src: str) -> list[str]:
    shadow = _mask_literals(src)
    names = re.findall(
        r"\bexport (?:abstract )?(?:class|function|const|let|enum)\s+([\w$]+)",
        shadow,
    )
    return list(dict.fromkeys(names))


if __name__ == "__main__":
    import sys

    with open(sys.argv[1], encoding="utf-8") as f:
        source = f.read()
    names = exported_names(source)
    js = strip_ts(source)
    js += "\nmodule.exports = {%s};\n" % ", ".join(names)
    sys.stdout.write(js)
