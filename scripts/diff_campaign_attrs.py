"""Attribute-soup differential campaign: multi-attribute tags with
randomized quote styles and entity/bracket-bearing values — stresses the
attribute parser + decoded-attribute-map comparison harder than the fixed
single-attribute pool in the in-suite generator.

Usage: python scripts/diff_campaign_attrs.py [n_docs] [seed0]
(defaults 300000 / 9_000_000; the round-4/round-5 1M campaigns used
1000000 9000000).  Prints every V8SKIP with its seed so engine-cost skips
are auditable; tests/test_redos.py::TestCampaignSkipList pins the known
list (currently EMPTY: the two skips the round-4 campaign recorded as
"V8-only" turned out to hang CPython too and are now prescan shape 5 —
they route to the bounded sidecar lane, and this campaign skips them at
the is_pathological gate as shared blowups)."""
import json
import os
import random
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
sys.path.insert(0, "/root/repo/tests")

_KEYS_POOL = ["class", "id", "href", "data-k", "lang", "src", "style",
              "x", "a-b", "CHECKED", "data-9", "_u"]
_VALS_POOL = ["c", "a b", "1<2", ">x", "&amp;", "&copy;", "it's", 'q"q',
              "", "un&#65;e", "€ü", "  pad  ", "&notit;", "a=b",
              "/x?y=1&z=2"]


def _rand_attrs(rng):
    parts = []
    for _ in range(rng.randint(0, 4)):
        k = rng.choice(_KEYS_POOL)
        v = rng.choice(_VALS_POOL)
        style = rng.random()
        if style < 0.15:
            parts.append(f" {k}")            # bare attribute
        elif style < 0.30:
            tok = v.split(" ")[0] or "v"
            tok = tok.replace('"', "").replace("'", "") or "v"
            parts.append(f" {k}={tok}")      # unquoted
        else:
            q = '"' if rng.random() < 0.5 else "'"
            vv = v.replace(q, "")
            parts.append(f" {k}={q}{vv}{q}")
    # NOTE: this generator is FROZEN — tests/test_redos.py pins sha256
    # hashes of docs produced from specific seeds, so even accidental
    # complexity like the fresh-PRNG-from-a-float-draw below (just an
    # rng-derived 10% chance) is load-bearing and must not be simplified
    # without regenerating the pinned fixtures.
    if parts and random.Random(rng.random()).random() < 0.1:
        parts.append(rng.choice([' ="w"', " a='un", ' class=']))
    return "".join(parts)


def _random_html_attrs(rng, n_tokens):
    tags = ["div", "p", "span", "b", "ul", "li", "table", "tr", "td", "a",
            "img", "br", "h1", "script", "style", "pre", "DIV", "P"]
    words = ["hello", "a&amp;b", "x &lt; y", "&copy;", "&#65;", "&#x41;",
             "&notit;", "&unknown;", "tail  spaces ", "\n\t", "1<2",
             "€ü", ""]
    out = []
    depth = 0
    for _ in range(n_tokens):
        r = rng.random()
        if r < 0.40:
            t = rng.choice(tags)
            out.append(f"<{t}{_rand_attrs(rng)}{rng.choice(['', ' /', ''])}>")
            depth += 1
        elif r < 0.55 and depth:
            out.append(f"</{rng.choice(tags)}>")
            depth -= 1
        elif r < 0.60:
            out.append(f"<!--{rng.choice(words)}-->")
        else:
            out.append(rng.choice(words))
    return "".join(out)


def main(n_docs, seed0):
    import html as html_mod
    import html.entities as ent
    import shutil

    from ts_strip import exported_names, strip_ts

    node = shutil.which("node")
    with open("/root/reference/src/index.ts", encoding="utf-8") as f:
        src = f.read()
    js = strip_ts(src)
    js += "\nmodule.exports = {%s};\n" % ", ".join(exported_names(src))
    d = "/tmp/diff_campaign_js2"
    os.makedirs(d, exist_ok=True)
    mod = os.path.join(d, "reference_stripped.js")
    with open(mod, "w", encoding="utf-8") as f:
        f.write(js)
    tables = os.path.join(d, "entities.json")
    with open(tables, "w", encoding="utf-8") as f:
        json.dump(
            {"html5": ent.html5,
             "invalid_charrefs": {str(k): v for k, v in
                                  html_mod._invalid_charrefs.items()},
             "invalid_codepoints": sorted(html_mod._invalid_codepoints)}, f)

    import queue as queue_mod
    import threading

    state = {"proc": None, "q": None}

    def start_node():
        p = subprocess.Popen(
            [node, "/root/repo/scripts/ref_driver.js", mod, tables],
            stdin=subprocess.PIPE, stdout=subprocess.PIPE, text=True,
            bufsize=1)
        q = queue_mod.Queue()

        def reader(pp, qq):
            for line in pp.stdout:
                qq.put(line)

        threading.Thread(target=reader, args=(p, q), daemon=True).start()
        state["proc"], state["q"] = p, q

    start_node()
    counter = iter(range(1, 10**9))

    def ask(html, options=None, selectors=(), timeout=10.0):
        """None on Node-side timeout (V8 regex blowups have different
        constants than CPython's engine — a doc can hang the reference
        while our kernel clears it; the watchdog respawns node and the
        campaign skips the doc)."""
        rid = next(counter)
        state["proc"].stdin.write(json.dumps(
            {"id": rid, "html": html, "options": options,
             "selectors": list(selectors)}) + "\n")
        state["proc"].stdin.flush()
        try:
            resp = json.loads(state["q"].get(timeout=timeout))
        except queue_mod.Empty:
            state["proc"].kill()
            state["proc"].wait()
            start_node()
            return None
        assert resp["id"] == rid and "error" not in resp, resp.get("error")
        return resp

    from test_differential_reference import _KEYS, _ours, _random_selector

    from node_html_parser_ray.kernel.parser import is_pathological

    ATTR_SELECTORS = ["[class]", "[id=main]", "[data-k^=v]", "[lang|=en]",
                      "[href*=x]", "[x~=c]", "[CHECKED]", "a[href]", "[a-b$=b]"]
    t0 = time.time()
    n_div = 0
    n_v8_skip = 0
    try:
        for i in range(n_docs):
            rng = random.Random(seed0 + i)
            html = _random_html_attrs(rng, rng.randint(1, 60))
            if is_pathological(html):
                # the attr soup can form the reference's own ReDoS shape;
                # BOTH engines share that blowup (kernel parity by design),
                # so a hang is not a useful differential — skip
                continue
            if rng.random() < 0.5:
                sels = [_random_selector(rng) for _ in range(3)]
            else:
                sels = rng.sample(ATTR_SELECTORS, 3)
            options = {"comment": True} if rng.random() < 0.15 else None
            theirs = ask(html, options, sels)
            if theirs is None:  # V8-side blowup: skip, count
                n_v8_skip += 1; print(f"V8SKIP seed={seed0 + i} html={html!r}", flush=True)
                continue
            mine = _ours(html, options, sels)
            for key in _KEYS:
                if mine[key] != theirs[key]:
                    n_div += 1
                    print(f"DIVERGENCE doc={i} seed={seed0 + i} key={key}")
                    print(f"  html:   {html!r}")
                    print(f"  ours:   {mine[key]!r}")
                    print(f"  theirs: {theirs[key]!r}")
            if (i + 1) % 2000 == 0:
                rate = (i + 1) / (time.time() - t0) * 60
                print(f"[{i + 1}/{n_docs}] {rate:.0f} docs/min, "
                      f"{n_div} divergences", flush=True)
    finally:
        state["proc"].kill()
        state["proc"].wait()
    print(f"DONE {n_docs} docs, {n_div} divergences, "
          f"{n_v8_skip} v8-only-slow skipped, {time.time() - t0:.0f}s")
    return 1 if n_div else 0


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 300000
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 9_000_000
    sys.exit(main(n, seed))
