"""Browser-side JS validation for the web panadapter (misc/webui.py).

No JS engine or browser exists in this environment (no node/deno/quickjs,
no Chrome, pip installs barred), so the inline script cannot be EXECUTED
here; these tests are the strongest browserless guard:

1. a real JS tokenizer (strings, template literals with ${} nesting,
   comments, regex-literal heuristic) that fails on the ship-breaking
   syntax class — unterminated strings/comments, unbalanced
   parens/brackets/braces;
2. every DOM id the script references must exist in the page markup;
3. every HTTP endpoint the script calls must be served (checked against
   a LIVE WebUIServer, not a route table);
4. every bare page-local function called must be defined (typo guard),
   and every defined one must be used;
5. every bare identifier READ must be declared (var/let/const declarator
   walk incl. multi-declarator + destructuring, params, catch bindings)
   or be a known browser global — the misspelled-variable
   ReferenceError class, with meta-tests proving the guard trips.

Together with tests/test_webui.py (which drives the same endpoints the
JS consumes and checks their payloads), the only thing left unexecuted
is canvas pixel pushing. Reference role: core/src/gui/main_window.cpp,
widgets/waterfall.cpp:896-960.
"""

import json
import re
import threading
import time
import urllib.request

import pytest

from sdrpp_tpu.io.sources import TestSource
from sdrpp_tpu.misc.webui import HTML_PAGE, ReceiverEngine, WebUIServer

JS = HTML_PAGE.split("<script>", 1)[1].rsplit("</script>", 1)[0]

# tokens after which a '/' starts a REGEX literal, not division
_REGEX_PRECEDERS = set("([{,;=:!&|?+-*%~^<>") | {
    "return", "typeof", "instanceof", "in", "of", "new", "delete", "void",
    "case", "do", "else", "yield", "await"}


def _strip_js(src: str):
    """Tokenize enough of JS to remove comments/strings/regex bodies and
    validate their termination; returns (code_with_literals_blanked,
    bracket_events [(char, line)])."""
    out = []
    events = []
    i, n, line = 0, len(src), 1
    last_sig = ""  # last significant token piece for the regex heuristic

    def err(msg):
        raise AssertionError(f"webui JS line {line}: {msg}")

    while i < n:
        c = src[i]
        if c == "\n":
            line += 1
            out.append(c)
            i += 1
            continue
        if c == "/" and i + 1 < n and src[i + 1] == "/":
            j = src.find("\n", i)
            i = n if j < 0 else j
            continue
        if c == "/" and i + 1 < n and src[i + 1] == "*":
            j = src.find("*/", i + 2)
            if j < 0:
                err("unterminated block comment")
            line += src.count("\n", i, j)
            i = j + 2
            continue
        if c in "'\"":
            j = i + 1
            while j < n:
                if src[j] == "\\":
                    j += 2
                    continue
                if src[j] == c:
                    break
                if src[j] == "\n":
                    err("unterminated string")
                j += 1
            else:
                err("unterminated string")
            out.append('"S"')
            last_sig = '"'
            i = j + 1
            continue
        if c == "`":
            # template literal: scan to the closing backtick, entering
            # code again at each ${ ... }
            j = i + 1
            while j < n:
                if src[j] == "\\":
                    j += 2
                    continue
                if src[j] == "`":
                    break
                if src[j] == "$" and j + 1 < n and src[j + 1] == "{":
                    # treat the interpolation as code: push and continue
                    # scanning after the matching close brace
                    k, d = j + 2, 1
                    while k < n and d:
                        if src[k] == "{":
                            d += 1
                        elif src[k] == "}":
                            d -= 1
                        elif src[k] == "`":
                            err("nested template in interpolation "
                                "(tokenizer limit)")
                        k += 1
                    if d:
                        err("unterminated ${...} interpolation")
                    j = k
                    continue
                if src[j] == "\n":
                    line += 1
                j += 1
            else:
                err("unterminated template literal")
            out.append('"T"')
            last_sig = '"'
            i = j + 1
            continue
        if c == "/":
            if last_sig in _REGEX_PRECEDERS or last_sig == "":
                j = i + 1
                in_class = False
                while j < n:
                    if src[j] == "\\":
                        j += 2
                        continue
                    if src[j] == "[":
                        in_class = True
                    elif src[j] == "]":
                        in_class = False
                    elif src[j] == "/" and not in_class:
                        break
                    elif src[j] == "\n":
                        err("unterminated regex literal")
                    j += 1
                else:
                    err("unterminated regex literal")
                out.append('"R"')
                last_sig = '"'
                i = j + 1
                continue
            out.append(c)
            last_sig = c
            i += 1
            continue
        if c in "([{":
            events.append((c, line))
        elif c in ")]}":
            events.append((c, line))
        if not c.isspace():
            m = re.match(r"[A-Za-z_$][\w$]*", src[i:])
            if m:
                last_sig = m.group(0)
                out.append(last_sig)
                i += len(last_sig)
                continue
            last_sig = c
        out.append(c)
        i += 1
    return "".join(out), events


def test_js_tokenizes_and_brackets_balance():
    code, events = _strip_js(JS)
    pairs = {")": "(", "]": "[", "}": "{"}
    stack = []
    for ch, line in events:
        if ch in "([{":
            stack.append((ch, line))
        else:
            assert stack, f"line {line}: unmatched '{ch}'"
            op, oline = stack.pop()
            assert op == pairs[ch], \
                f"line {line}: '{ch}' closes '{op}' from line {oline}"
    assert not stack, f"unclosed '{stack[-1][0]}' from line {stack[-1][1]}"
    # sanity: the tokenizer actually saw the program
    assert code.count("function") >= 5


def test_js_dom_ids_exist_in_markup():
    html = HTML_PAGE.split("<script>", 1)[0]
    ids = set(re.findall(r'id="([^"]+)"', html))
    used = set(re.findall(r"\$\('([^']+)'\)", JS))
    used |= set(re.findall(r"getElementById\('([^']+)'\)", JS))
    missing = used - ids
    assert not missing, f"JS references ids missing from markup: {missing}"


def test_js_page_functions_defined_and_used():
    code, _ = _strip_js(JS)  # strings blanked: no false hits from content
    defined = set(re.findall(r"\bfunction\s+([A-Za-z_$][\w$]*)", code))
    # arrow functions, including comma-scoped declarations (const a=1,f=x=>)
    defined |= set(re.findall(r"(?<![\w$])([A-Za-z_$][\w$]*)\s*=\s*"
                              r"(?:async\s*)?"
                              r"(?:\([^)]*\)|[A-Za-z_$][\w$]*)\s*=>", code))
    builtins = {"fetch", "prompt", "parseFloat", "isFinite", "setInterval",
                "Float32Array", "Uint8ClampedArray", "Int8Array", "ImageData", "Audio",
                "Date", "if", "for", "while", "switch", "catch", "return",
                "await", "new", "function", "typeof"}
    called = set(re.findall(r"(?<![\w$.])([A-Za-z_$][\w$]*)\s*\(", code))
    called -= builtins
    undefined = called - defined
    assert not undefined, f"JS calls undefined page functions: {undefined}"
    # every named page FUNCTION is referenced somewhere (dead code =
    # likely typo at the call site)
    for fn in set(re.findall(r"\bfunction\s+([A-Za-z_$][\w$]*)", code)):
        uses = len(re.findall(rf"(?<![\w$])({re.escape(fn)})(?![\w$])", code))
        assert uses >= 2, f"page function {fn} defined but never used"


_JS_KEYWORDS = set(
    """var let const function return if else for while do switch case default
    break continue new typeof instanceof in of delete void this true false
    null undefined async await try catch finally throw yield get set
    static class extends super debugger with""".split())

_BROWSER_GLOBALS = set(
    """window document fetch console Math JSON Date Audio EventSource Image
    requestAnimationFrame cancelAnimationFrame setInterval setTimeout
    clearInterval clearTimeout parseFloat parseInt isFinite isNaN Number
    String Boolean Array Object Symbol Float32Array Float64Array Uint8Array
    Uint8ClampedArray Uint16Array Uint32Array Int8Array Int16Array Int32Array
    DataView ArrayBuffer ImageData navigator location history alert prompt
    confirm AbortController performance Promise encodeURIComponent
    decodeURIComponent encodeURI decodeURI URLSearchParams URL Error
    TypeError RangeError NaN Infinity arguments globalThis WebSocket
    localStorage sessionStorage atob btoa Blob FileReader event""".split())


def _skip_initializer(code: str, i: int) -> int:
    """Advance past a declarator initializer: stop at a depth-0 ',' or ';'
    (next declarator / end of statement) or a depth-going-negative ')'
    (the enclosing `for(...)` head)."""
    depth = 0
    n = len(code)
    while i < n:
        c = code[i]
        if c in "([{":
            depth += 1
        elif c in ")]}":
            if depth == 0:
                return i
            depth -= 1
        elif depth == 0 and c in ",;":
            return i
        i += 1
    return i


def _declared_names(code: str) -> set:
    """Every name the blanked script declares: function names, parameters,
    catch bindings, and a bracket-aware walk of var/let/const declarator
    lists (handles `const a=f(x,y),b=2` and destructuring patterns).
    Over-collects identifiers inside parameter defaults / destructuring
    targets, which only ever widens the allowed set."""
    decls = set(re.findall(r"\bfunction\s+([A-Za-z_$][\w$]*)", code))
    for m in re.finditer(r"\bfunction\s*[A-Za-z_$\w]*\s*\(([^)]*)\)", code):
        decls |= set(re.findall(r"[A-Za-z_$][\w$]*", m.group(1)))
    for m in re.finditer(r"\(([^()]*)\)\s*=>", code):
        decls |= set(re.findall(r"[A-Za-z_$][\w$]*", m.group(1)))
    for m in re.finditer(r"(?<![\w$])([A-Za-z_$][\w$]*)\s*=>", code):
        decls.add(m.group(1))
    for m in re.finditer(r"\bcatch\s*\(([^)]*)\)", code):
        decls |= set(re.findall(r"[A-Za-z_$][\w$]*", m.group(1)))
    n = len(code)
    for m in re.finditer(r"\b(?:var|let|const)\b", code):
        i = m.end()
        while i < n:
            # one declarator: pattern [= initializer]
            pat = re.compile(r"\s*([A-Za-z_$][\w$]*|[\[{])").match(code, i)
            if not pat:
                break
            if pat.group(1) in "[{":
                # destructuring pattern: take every identifier inside
                close = {"[": "]", "{": "}"}[pat.group(1)]
                depth, j = 1, pat.end()
                while j < n and depth:
                    if code[j] == pat.group(1):
                        depth += 1
                    elif code[j] == close:
                        depth -= 1
                    j += 1
                decls |= set(re.findall(r"[A-Za-z_$][\w$]*",
                                        code[pat.end():j]))
                i = j
            else:
                decls.add(pat.group(1))
                i = pat.end()
            ws = re.compile(r"\s*").match(code, i)
            i = ws.end()
            if i < n and code[i] == "=" and code[i:i + 2] not in ("==", "=>"):
                i = _skip_initializer(code, i + 1)
            if i < n and code[i] == ",":
                i += 1
                continue
            break
    return decls


def _undeclared_names(code: str) -> dict:
    """Bare identifiers used but never declared (property accesses after
    '.', object-literal keys, and keywords/browser globals excluded).
    Limitation: code inside template-literal ${...} interpolations is
    blanked by the tokenizer and not checked."""
    # the tokenizer blanked every literal to "S"/"T"/"R" — drop the letters
    clean = code.replace('"S"', '""').replace('"T"', '""').replace('"R"', '""')
    decls = _declared_names(clean)
    undef = {}
    for m in re.finditer(r"(?<![\w$.])([A-Za-z_$][\w$]*)", clean):
        name = m.group(1)
        if name in _JS_KEYWORDS or name in _BROWSER_GLOBALS or name in decls:
            continue
        before = clean[:m.start()].rstrip()[-1:]
        after = clean[m.end():].lstrip()[:1]
        if after == ":" and before in "{,":  # object-literal key
            continue
        line = clean.count("\n", 0, m.start()) + 1
        undef.setdefault(name, []).append(line)
    return undef


def test_js_no_undeclared_identifiers():
    """Every bare identifier the script reads must be declared somewhere
    in it (or be a browser global) — the misspelled-variable class of
    runtime ReferenceError that no syntax check can catch."""
    code, _ = _strip_js(JS)
    undef = _undeclared_names(code)
    assert not undef, f"JS uses undeclared identifiers: {undef}"


@pytest.mark.parametrize("bad, name", [
    ("const spectrum=1; draw(spetcrum);", "spetcrum"),    # misspelled use
    ("let wfLine=0; wfline+=1;", "wfline"),               # case typo
    ("function f(a){return a+missing;}", "missing"),      # never declared
])
def test_js_undeclared_guard_catches_typos(bad, name):
    code, _ = _strip_js(bad)
    undef = _undeclared_names(code)
    assert name in undef


def test_js_undeclared_guard_accepts_declaration_forms():
    """No false positives on the declaration shapes the real script uses:
    multi-declarator const, for-of heads, destructuring, arrow params,
    catch bindings."""
    ok = """
    const a=f(1,2),b=a+1,y=v=>v*2;
    let st=null, wfLine=0;
    for(const x of [1,2]){g(x);}
    for(let i=0;i<b;i++){g(i);}
    const {p,q}=obj(),[r,s]=pair();
    try{g(r);}catch(e){console.log(e,p,q,s,y(a),st,wfLine);}
    function f(u,v){return u+v;}
    function g(w){return w;}
    function obj(){return {p:1,q:2};}
    function pair(){return [1,2];}
    """
    code, _ = _strip_js(ok)
    assert _undeclared_names(code) == {}


@pytest.fixture(scope="module")
def live():
    src = TestSource(1000000.0, tones=[(100000.0, -20.0)], noise_dbfs=-90.0)
    eng = ReceiverEngine(src, mode="nfm", offset=100000.0, fft_size=4096,
                         base_block=65536, realtime=False)
    srv = WebUIServer(eng, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    eng.start()
    t0 = time.time()
    while eng.blocks < 2 and time.time() - t0 < 60:
        time.sleep(0.05)
    assert eng.blocks >= 2, eng.error
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    eng.stop()
    srv.shutdown()
    srv.server_close()


def test_every_js_endpoint_is_served(live):
    """Every URL path the browser script touches must exist on the live
    server (fails if a JS fetch target and the Python routes drift)."""
    paths = set(re.findall(r"fetch\('(/[^'?]*)", JS))
    paths |= set(re.findall(r"EventSource\('(/[^'?]*)", JS))
    paths |= set(re.findall(r"Audio\('(/[^'?]*)", JS))
    assert {"/api/state", "/api/fft", "/api/waterfall", "/api/control",
            "/api/bookmarks", "/audio.wav"} <= paths
    for p in sorted(paths):
        if p == "/api/control":
            req = urllib.request.Request(
                live + p, data=json.dumps({"action": "auto_range"}).encode(),
                method="POST")
            with urllib.request.urlopen(req, timeout=30) as r:
                assert r.status == 200, p
            continue
        url = live + p + ("?since=0" if p == "/api/waterfall" else "")
        if p == "/audio.wav":
            with urllib.request.urlopen(url, timeout=30) as r:
                assert r.status == 200 and r.read(4) == b"RIFF", p
            continue
        with urllib.request.urlopen(url, timeout=30) as r:
            assert r.status == 200, p


@pytest.mark.parametrize("bad", [
    "const s = 'unterminated\nnext;",
    "function f() { if (x) { g(); }",        # unclosed brace
    "const a = (1 + [2, 3).length;",         # mismatched pair
    "/* never closed",
    "const t = `tpl ${x ;",                  # unterminated interpolation
])
def test_js_guard_fails_on_broken_scripts(bad):
    """Meta-test: the tokenizer/balance check must actually REJECT the
    ship-breaking syntax class it claims to guard."""
    with pytest.raises(AssertionError):
        code, events = _strip_js(bad)
        pairs = {")": "(", "]": "[", "}": "{"}
        stack = []
        for ch, line in events:
            if ch in "([{":
                stack.append((ch, line))
            else:
                assert stack
                assert stack.pop()[0] == pairs[ch]
        assert not stack
