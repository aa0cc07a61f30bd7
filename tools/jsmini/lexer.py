"""Tokenizer for the jsmini ES subset.

Produces a flat token list; template literals come out as structured
tokens carrying their cooked string parts and raw ``${}`` expression
sources (the parser lexes those recursively). Regex literals are
disambiguated from division by the preceding token, the standard
heuristic — sufficient for this codebase's single `/^M/` use and similar.
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Tuple, Union


class Token(NamedTuple):
    kind: str  # num str template regex ident keyword punct eof
    value: object
    pos: int
    line: int


KEYWORDS = {
    "const", "let", "var", "function", "return", "if", "else", "for", "of",
    "in", "while", "do", "break", "continue", "try", "catch", "finally",
    "throw", "new", "typeof", "instanceof", "delete", "void", "null",
    "true", "false", "undefined", "async", "await", "class", "extends",
    "this", "switch", "case", "default", "export", "import", "from",
    "static", "get", "set",
}

PUNCT3 = ["===", "!==", "**=", "...", "<<=", ">>=", "&&=", "||=", "??="]
PUNCT2 = [
    "=>", "==", "!=", "<=", ">=", "&&", "||", "??", "?.", "++", "--",
    "+=", "-=", "*=", "/=", "%=", "&=", "|=", "^=", "**", "<<", ">>",
]
PUNCT1 = list("{}()[];,<>+-*/%&|^!~?:=.")


class LexError(SyntaxError):
    pass


def _line_of(src: str, pos: int) -> int:
    return src.count("\n", 0, pos) + 1


ESCAPES = {"n": "\n", "t": "\t", "r": "\r", "b": "\b", "f": "\f",
           "v": "\v", "0": "\0", "\n": ""}


def _read_string(src: str, i: int) -> Tuple[str, int]:
    quote = src[i]
    i += 1
    out = []
    while i < len(src):
        c = src[i]
        if c == quote:
            return "".join(out), i + 1
        if c == "\\":
            nxt = src[i + 1]
            if nxt == "u":
                if src[i + 2] == "{":
                    j = src.index("}", i + 3)
                    out.append(chr(int(src[i + 3 : j], 16)))
                    i = j + 1
                else:
                    out.append(chr(int(src[i + 2 : i + 6], 16)))
                    i += 6
            elif nxt == "x":
                out.append(chr(int(src[i + 2 : i + 4], 16)))
                i += 4
            else:
                out.append(ESCAPES.get(nxt, nxt))
                i += 2
        else:
            out.append(c)
            i += 1
    raise LexError(f"unterminated string at {i}")


def _read_template(src: str, i: int) -> Tuple[list, int]:
    """Return (["str0", ("expr", src1), "str1", ...], next_index); i points
    at the opening backtick."""
    i += 1
    parts: List[Union[str, Tuple[str, str]]] = []
    buf: List[str] = []
    while i < len(src):
        c = src[i]
        if c == "`":
            parts.append("".join(buf))
            return parts, i + 1
        if c == "\\":
            nxt = src[i + 1]
            if nxt == "u":
                if src[i + 2] == "{":
                    j = src.index("}", i + 3)
                    buf.append(chr(int(src[i + 3 : j], 16)))
                    i = j + 1
                else:
                    buf.append(chr(int(src[i + 2 : i + 6], 16)))
                    i += 6
            else:
                buf.append(ESCAPES.get(nxt, nxt))
                i += 2
            continue
        if c == "$" and i + 1 < len(src) and src[i + 1] == "{":
            parts.append("".join(buf))
            buf = []
            # Find the matching close brace, respecting nested braces,
            # strings and templates.
            depth = 1
            j = i + 2
            start = j
            while j < len(src) and depth:
                cj = src[j]
                if cj in "'\"":
                    _, j = _read_string(src, j)
                    continue
                if cj == "`":
                    _, j = _read_template(src, j)
                    continue
                if cj == "{":
                    depth += 1
                elif cj == "}":
                    depth -= 1
                    if not depth:
                        break
                j += 1
            if depth:
                raise LexError(f"unterminated template expression at {i}")
            parts.append(("expr", src[start:j]))
            i = j + 1
            continue
        buf.append(c)
        i += 1
    raise LexError(f"unterminated template literal at {i}")


def _regex_allowed(tokens: List[Token]) -> bool:
    """A '/' starts a regex literal iff the previous token cannot end an
    expression."""
    if not tokens:
        return True
    t = tokens[-1]
    if t.kind in ("num", "str", "template", "regex"):
        return False
    if t.kind == "ident":
        return False
    if t.kind == "keyword":
        return t.value not in ("this", "null", "true", "false", "undefined")
    return t.value not in (")", "]", "}", "++", "--")


def tokenize(src: str) -> List[Token]:
    tokens: List[Token] = []
    i, n = 0, len(src)
    while i < n:
        c = src[i]
        if c in " \t\r\n":
            i += 1
            continue
        if src.startswith("//", i):
            j = src.find("\n", i)
            i = n if j < 0 else j
            continue
        if src.startswith("/*", i):
            j = src.find("*/", i)
            if j < 0:
                raise LexError(f"unterminated comment at {i}")
            i = j + 2
            continue
        line = _line_of(src, i)
        if c in "'\"":
            val, i2 = _read_string(src, i)
            tokens.append(Token("str", val, i, line))
            i = i2
            continue
        if c == "`":
            parts, i2 = _read_template(src, i)
            tokens.append(Token("template", parts, i, line))
            i = i2
            continue
        if c == "/" and _regex_allowed(tokens):
            j = i + 1
            in_class = False
            while j < n:
                cj = src[j]
                if cj == "\\":
                    j += 2
                    continue
                if cj == "[":
                    in_class = True
                elif cj == "]":
                    in_class = False
                elif cj == "/" and not in_class:
                    break
                elif cj == "\n":
                    raise LexError(f"unterminated regex at {i}")
                j += 1
            body = src[i + 1 : j]
            j += 1
            flags_start = j
            while j < n and (src[j].isalpha()):
                j += 1
            tokens.append(
                Token("regex", (body, src[flags_start:j]), i, line)
            )
            i = j
            continue
        if c.isdigit() or (c == "." and i + 1 < n and src[i + 1].isdigit()):
            j = i
            if src.startswith("0x", i) or src.startswith("0X", i):
                j = i + 2
                while j < n and src[j] in "0123456789abcdefABCDEF_":
                    j += 1
                val = float(int(src[i:j].replace("_", ""), 16))
            else:
                while j < n and (src[j].isdigit() or src[j] in "._"):
                    j += 1
                if j < n and src[j] in "eE":
                    j += 1
                    if j < n and src[j] in "+-":
                        j += 1
                    while j < n and src[j].isdigit():
                        j += 1
                val = float(src[i:j].replace("_", ""))
            tokens.append(Token("num", val, i, line))
            i = j
            continue
        if c.isalpha() or c in "_$":
            j = i
            while j < n and (src[j].isalnum() or src[j] in "_$"):
                j += 1
            word = src[i:j]
            kind = "keyword" if word in KEYWORDS else "ident"
            tokens.append(Token(kind, word, i, line))
            i = j
            continue
        matched = None
        for group in (PUNCT3, PUNCT2):
            for p in group:
                if src.startswith(p, i):
                    matched = p
                    break
            if matched:
                break
        if not matched and c in PUNCT1:
            matched = c
        if not matched:
            raise LexError(f"unexpected character {c!r} at line {line}")
        tokens.append(Token("punct", matched, i, line))
        i += len(matched)
    tokens.append(Token("eof", None, n, _line_of(src, n - 1) if n else 1))
    return tokens
