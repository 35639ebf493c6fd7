#!/usr/bin/env node
'use strict';
/*
 * Differential-test driver: loads the type-stripped reference module
 * (produced by scripts/ts_strip.py under /tmp) and answers JSONL requests
 * on stdin with the reference's outputs, so the pytest side can compare
 * them against this repo's kernel byte-for-byte.
 *
 *   request : {"id", "html", "options", "selectors": [..]}
 *   response: {"id", "text", "structured", "outer", "structure", "valid",
 *              "sel": {selector: [outerHTML, ...]}, "rw_outer"}
 *
 * decode/encode shims: the reference imports them from the `html-entities`
 * npm package (absent here, no network).  `decode` below is a direct port
 * of the HTML5 character-reference algorithm as implemented by CPython's
 * `html.unescape` (tables generated from `html.entities` at test setup);
 * `encode` is the package's default "specialChars" mode (the five special
 * characters).  This makes entity handling common-mode between the two
 * engines — entity-table parity itself is covered by the ported fixture
 * suite — while every tokenizer/DOM/selector behavior stays differential.
 */

const fs = require('fs');
const readline = require('readline');

const modulePath = process.argv[2];
const tablesPath = process.argv[3];

const tables = JSON.parse(fs.readFileSync(tablesPath, 'utf8'));
const html5 = tables.html5;
const invalidCharrefs = tables.invalid_charrefs; // keys: decimal strings
const invalidCodepoints = new Set(tables.invalid_codepoints);

const charref = /&(#[0-9]+;?|#[xX][0-9a-fA-F]+;?|[^\t\n\f <&#;]{1,32};?)/g;

function decode(s) {
  if (typeof s !== 'string' || s.indexOf('&') < 0) return s;
  return s.replace(charref, (whole, g) => {
    if (g[0] === '#') {
      const hex = g[1] === 'x' || g[1] === 'X';
      const digits = g.replace(/;$/, '').slice(hex ? 2 : 1);
      const num = parseInt(digits, hex ? 16 : 10);
      const key = String(num);
      if (Object.prototype.hasOwnProperty.call(invalidCharrefs, key)) {
        return invalidCharrefs[key];
      }
      if ((num >= 0xd800 && num <= 0xdfff) || num > 0x10ffff) return '�';
      if (invalidCodepoints.has(num)) return '';
      return String.fromCodePoint(num);
    }
    if (Object.prototype.hasOwnProperty.call(html5, g)) return html5[g];
    // longest valid prefix (semicolon-less), like html.unescape
    for (let x = g.length - 1; x >= 2; x--) {
      const head = g.slice(0, x);
      if (Object.prototype.hasOwnProperty.call(html5, head)) {
        return html5[head] + g.slice(x);
      }
    }
    return '&' + g;
  });
}

const ENC = { '&': '&amp;', '<': '&lt;', '>': '&gt;', '"': '&quot;', "'": '&apos;' };
function encode(s) {
  return String(s).replace(/[&<>"']/g, (c) => ENC[c]);
}

// the stripped module references decode/encode as free identifiers
global.decode = decode;
global.encode = encode;

const ref = require(modulePath);

const rl = readline.createInterface({ input: process.stdin, terminal: false });
rl.on('line', (line) => {
  if (!line.trim()) return;
  const req = JSON.parse(line);
  let resp;
  try {
    const root = ref.parse(req.html, req.options || undefined);
    const sel = {};
    for (const s of req.selectors || []) {
      sel[s] = root.querySelectorAll(s).map((el) => el.toString());
    }
    // DFS dump of every element's attribute state (raw + decoded maps)
    const attrs = [];
    (function dfs(node) {
      if (node.nodeType === 1) {
        const dec = {};
        const raw = node.rawAttributes;
        const decoded = node.attributes;
        for (const k of Object.keys(decoded)) dec[k] = decoded[k];
        attrs.push({
          tag: node.tagName,
          id: node.id,
          classes: [...node.classNames],
          raw: { ...raw },  // copy: the getters memoize, and the mutation
          dec,              // step below would otherwise alias into this dump
        });
        node.childNodes.forEach(dfs);
      }
    })(root);
    const out = {
      id: req.id,
      text: root.text,
      structured: root.structuredText,
      outer: root.toString(),
      structure: root.structure,
      valid: root.valid,
      attrs,
      sel,
      // JSON round-trip NOW: toJSON embeds the live memoized attribute
      // maps, which the mutation steps below would otherwise alias into
      tojson: JSON.parse(JSON.stringify(root.toJSON())),
    };
    // mutation round-trip: exercise setAttribute's encode path and the
    // rawAttrs re-serialization on the first element with any attribute
    const target = root.querySelectorAll('*').find(
      (el) => Object.keys(el.rawAttributes).length > 0
    );
    if (target) {
      target.setAttribute('data-new', 'a<b&"c\'');
      target.removeAttribute('class');
      out.mut_outer = root.toString();
      out.mut_get = target.getAttribute('data-new');
    } else {
      out.mut_outer = null;
      out.mut_get = null;
    }
    // scripted tree-mutation sequence (differential for the §2.2 operators)
    const snaps = [];
    const snap = () => snaps.push(root.toString());
    const first = (s) => root.querySelectorAll(s)[0];
    const d = first('div');
    if (d) { d.set_content('<em>new</em> content &amp; more'); snap(); }
    const p = first('p');
    if (p) {
      p.appendChild(new ref.TextNode(' appended'));
      p.appendChild(ref.parse('<i>frag</i>').firstChild);
      snap();
    }
    const sp = first('span');
    if (sp) { sp.remove(); snap(); }
    const li = first('li');
    if (li) { li.innerHTML = '<b>x</b>y'; snap(); }
    const ul = first('ul');
    if (ul) { ul.prependChild(new ref.TextNode('pre ')); snap(); }
    if (root.childNodes.length) {
      root.exchangeChild(root.childNodes[0], new ref.TextNode('X'));
      snap();
    }
    out.mut_script = snaps;
    out.fc = root.firstChild ? root.firstChild.toString() : null;
    out.lc = root.lastChild ? root.lastChild.toString() : null;
    out.n_children = root.children.length;
    root.removeWhitespace();
    out.rw_outer = root.toString();
    // trimRight differential (round-5): truncate after the first text
    // node matching /e/ — fires on most docs, and the no-match path is
    // covered by docs without an 'e'
    root.trimRight(/e/);
    out.tr_outer = root.toString();
    // removeAttribute on a MISSING key: the reference still routes through
    // setAttribute(key, undefined) and re-serializes rawAttrs from the
    // decoded map (normalizing quote styles) — a quirk worth comparing
    const t2 = root.querySelectorAll('*').find(
      (el) => Object.keys(el.rawAttributes).length > 0
    );
    if (t2) {
      t2.removeAttribute('data-definitely-missing');
      out.ra_missing_outer = root.toString();
    } else {
      out.ra_missing_outer = null;
    }
    resp = out;
  } catch (e) {
    resp = { id: req.id, error: String(e && e.stack ? e.stack : e) };
  }
  process.stdout.write(JSON.stringify(resp) + '\n');
});
