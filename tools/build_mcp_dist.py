"""Build mcp-server/dist/index.js from src/index.ts without a node toolchain.

The npm MCP package (reference: mcp-server/index.ts behavior) is written in
TypeScript, but this environment ships no tsc/node/esbuild. The package is
deliberately dependency-free and uses a bounded set of TS constructs, so a
type-strip transpile (exactly what `tsc --target esnext` does for this file:
erase types, keep runtime code byte-for-byte) is implementable in Python.

Supported constructs (everything src/index.ts uses — extend the whitelist if
you add new type names):
  - `import { a, type B } from ...`         -> drop the type-only specifier
  - `type X = ...;` / `interface X { ... }` -> deleted
  - `private`/`readonly`/`public` members   -> modifier dropped
  - constructor parameter properties        -> `this.x = x;` assignments
  - parameter/variable/field/return types   -> erased (whitelist-driven)
  - `as const` / `new Map<...>()` generics  -> erased
  - optional markers `x?: T`                -> `x`

tests/test_mcp_npm_package.py verifies the output: tool + route sets must
match src exactly and no TS syntax may survive.
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

PKG = Path(__file__).resolve().parents[1] / "mcp-server"

# Type names that may appear on the right of `:` annotations. Object-literal
# keys (the reason we can't strip every `ident:`) never use these as bare
# values, so the whitelist is what makes regex stripping sound here.
_ATOMS = (
    "string|number|boolean|void|any|unknown|never|ChildProcess|ToolSpec"
    "|Handler|BackendLifecycle|HttpClient|TokenTracker|DrainController"
    "|ApiKeyStore"
)
_SIMPLE = rf"(?:{_ATOMS})"
_ARRAY = rf"{_SIMPLE}\[\]"
_GENERIC = r"(?:Promise|Record|Map|Set)<[^<>()]*(?:\[[^\]]*\])?[^<>()]*>"
# `(x: any) => string` and `(() => void)`
_FN = r"\((?:\(\)\s*=>\s*\w+|[^()]*)\)(?:\s*=>\s*\w+(?:\[\])?)?"
_TYPE = rf"(?:{_ARRAY}|{_GENERIC}|{_SIMPLE}|{_FN})(?:\s*\|\s*null)?"


def _delete_type_decls(src: str) -> str:
    src = re.sub(r"^type\s+\w+\s*=.*?;\s*$", "", src, flags=re.M | re.S)
    # interface blocks: match balanced one-level-nested braces
    src = re.sub(
        r"^interface\s+\w+\s*\{(?:[^{}]|\{[^{}]*\})*\}\s*$", "", src, flags=re.M
    )
    return src


def _fix_imports(src: str) -> str:
    def drop_type_specifiers(m: re.Match) -> str:
        names = [n.strip() for n in m.group(1).split(",")]
        kept = [n for n in names if not n.startswith("type ")]
        return "import { " + ", ".join(kept) + " } from"

    return re.sub(r"import\s*\{([^}]*)\}\s*from", drop_type_specifiers, src)


def _constructor_param_properties(src: str) -> str:
    def rewrite(m: re.Match) -> str:
        params, body_open = m.group(1), m.group(2)
        names, cleaned = [], []
        for p in params.split(","):
            p = p.strip()
            if not p:
                continue
            mod = re.match(r"(?:private|readonly|public)\s+(\w+)", p)
            if mod:
                names.append(mod.group(1))
                cleaned.append(re.sub(r"^(?:private|readonly|public)\s+", "", p))
            else:
                cleaned.append(p)
        assigns = " ".join(f"this.{n} = {n};" for n in names)
        joined = ", ".join(cleaned)
        return f"constructor({joined}) {{{(' ' + assigns) if assigns else ''}{body_open}"

    return re.sub(
        r"constructor\(([^)]*)\)\s*\{(\}?)", rewrite, src, flags=re.S
    )


def strip_types(src: str) -> str:
    out = _delete_type_decls(src)
    out = _fix_imports(out)
    out = _constructor_param_properties(out)
    out = out.replace(" as const", "")
    # generic arguments on constructor calls: new Map<...>(
    out = re.sub(r"\bnew\s+(Map|Set|Promise)<[^(]*>\(", r"new \1(", out)
    # return-type annotations:  ): T {   /   ): T =>
    out = re.sub(rf"\)\s*:\s*{_TYPE}(?=\s*(?:\{{|=>))", ")", out)
    # member modifiers on class fields/methods
    out = re.sub(r"^(\s*)(?:private|readonly|public)\s+", r"\1", out, flags=re.M)
    # parameter / variable / field annotations:  name?: T  (before , ) ; = newline)
    out = re.sub(rf"(\w+)\??\s*:\s*{_TYPE}(?=\s*[,;)=\n])", r"\1", out)
    # collapse the blank lines the deletions left behind
    out = re.sub(r"\n{3,}", "\n\n", out)
    return out


def build() -> Path:
    ts = (PKG / "src" / "index.ts").read_text()
    js = strip_types(ts)
    header = (
        "// Generated from src/index.ts by tools/build_mcp_dist.py — do not edit.\n"
    )
    dist = PKG / "dist"
    dist.mkdir(exist_ok=True)
    out = dist / "index.js"
    out.write_text(header + js)
    return out


if __name__ == "__main__":
    path = build()
    sys.stdout.write(f"wrote {path} ({path.stat().st_size} bytes)\n")
