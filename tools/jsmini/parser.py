"""Recursive-descent / Pratt parser for the jsmini ES subset.

AST nodes are plain tuples (kind, ...); see interp.py for the evaluator's
case list. No automatic-semicolon-insertion subtleties are needed — the
dashboard sources are consistently semicolon-terminated — but stray
newlines never break parsing because the lexer drops all whitespace.
"""

from __future__ import annotations

from typing import List, Optional

from .lexer import Token, tokenize


class ParseError(SyntaxError):
    pass


ASSIGN_OPS = {"=", "+=", "-=", "*=", "/=", "%=", "**=", "&&=", "||=", "??=",
              "&=", "|=", "^="}

# binary precedence (higher binds tighter)
BIN_PREC = {
    "??": 1, "||": 2, "&&": 3,
    "|": 4, "^": 5, "&": 6,
    "===": 7, "!==": 7, "==": 7, "!=": 7,
    "<": 8, ">": 8, "<=": 8, ">=": 8, "instanceof": 8, "in": 8,
    "<<": 9, ">>": 9,
    "+": 10, "-": 10,
    "*": 11, "/": 11, "%": 11,
    "**": 12,
}
LOGIC_OPS = {"&&", "||", "??"}


class Parser:
    def __init__(self, src: str):
        self.toks: List[Token] = tokenize(src)
        self.i = 0

    # ---------------------------------------------------------------- util
    def peek(self, k: int = 0) -> Token:
        return self.toks[min(self.i + k, len(self.toks) - 1)]

    def next(self) -> Token:
        t = self.toks[self.i]
        self.i += 1
        return t

    def at(self, value: str, kind: Optional[str] = None) -> bool:
        t = self.peek()
        return t.value == value and (kind is None or t.kind == kind)

    def eat(self, value: str) -> bool:
        if self.peek().value == value and self.peek().kind in (
            "punct", "keyword"
        ):
            self.i += 1
            return True
        return False

    def expect(self, value: str) -> Token:
        t = self.next()
        if t.value != value:
            raise ParseError(
                f"expected {value!r}, got {t.value!r} at line {t.line}"
            )
        return t

    # ------------------------------------------------------------- program
    def parse_program(self) -> list:
        stmts = []
        while self.peek().kind != "eof":
            stmts.append(self.statement())
        return stmts

    # ----------------------------------------------------------- statements
    def statement(self):
        t = self.peek()
        v = t.value
        if t.kind == "punct" and v == "{":
            return self.block()
        if t.kind == "punct" and v == ";":
            self.next()
            return ("empty",)
        if t.kind == "keyword":
            if v in ("const", "let", "var"):
                return self.var_decl()
            if v == "function":
                return self.function(is_decl=True)
            if v == "async" and self.peek(1).value == "function":
                self.next()
                node = self.function(is_decl=True, is_async=True)
                return node
            if v == "return":
                self.next()
                # ASI: `return` is a restricted production — a line break
                # after it terminates the statement (so `return\nlet x`
                # is a bare return, not `return let...`).
                nxt = self.peek()
                if (
                    self.at(";") or self.at("}") or nxt.kind == "eof"
                    or nxt.line > t.line
                ):
                    self.eat(";")
                    return ("return", ("undef",))
                e = self.expression()
                self.eat(";")
                return ("return", e)
            if v == "if":
                return self.if_stmt()
            if v == "for":
                return self.for_stmt()
            if v == "while":
                self.next()
                self.expect("(")
                c = self.expression()
                self.expect(")")
                return ("while", c, self.statement())
            if v == "do":
                self.next()
                body = self.statement()
                self.expect("while")
                self.expect("(")
                c = self.expression()
                self.expect(")")
                self.eat(";")
                return ("do", body, c)
            if v == "break":
                self.next()
                self.eat(";")
                return ("break",)
            if v == "continue":
                self.next()
                self.eat(";")
                return ("continue",)
            if v == "throw":
                self.next()
                e = self.expression()
                self.eat(";")
                return ("throw", e)
            if v == "try":
                return self.try_stmt()
            if v == "switch":
                return self.switch_stmt()
            if v == "class":
                return self.class_decl()
            if v == "export":
                return self.export_stmt()
            if v == "import":
                return self.import_stmt()
        e = self.expression()
        self.eat(";")
        return ("expr", e)

    def block(self):
        self.expect("{")
        stmts = []
        while not self.at("}"):
            stmts.append(self.statement())
        self.expect("}")
        return ("block", stmts)

    def var_decl(self):
        kind = self.next().value
        decls = []
        while True:
            pattern = self.binding_pattern()
            init = None
            if self.eat("="):
                init = self.assignment()
            decls.append((pattern, init))
            if not self.eat(","):
                break
        self.eat(";")
        return ("decl", kind, decls)

    def binding_pattern(self):
        t = self.peek()
        if t.kind in ("ident",) or (t.kind == "keyword" and t.value in (
            "of", "from", "get", "set", "static", "async", "undefined",
        )):
            self.next()
            return ("id", t.value)
        if t.value == "[":
            self.next()
            elems = []
            rest = None
            while not self.at("]"):
                if self.eat(","):
                    elems.append(None)
                    continue
                if self.eat("..."):
                    rest = self.binding_pattern()
                    break
                p = self.binding_pattern()
                default = self.assignment() if self.eat("=") else None
                elems.append((p, default))
                if not self.at("]"):
                    self.expect(",")
            self.expect("]")
            return ("arr_pat", elems, rest)
        if t.value == "{":
            self.next()
            props = []
            rest = None
            while not self.at("}"):
                if self.eat("..."):
                    rest = self.binding_pattern()
                    break
                key = self.next()
                if key.kind not in ("ident", "keyword", "str"):
                    raise ParseError(
                        f"bad destructuring key at line {key.line}"
                    )
                if self.eat(":"):
                    target = self.binding_pattern()
                else:
                    target = ("id", key.value)
                default = self.assignment() if self.eat("=") else None
                props.append((key.value, target, default))
                if not self.at("}"):
                    self.expect(",")
            self.expect("}")
            return ("obj_pat", props, rest)
        raise ParseError(f"bad binding pattern {t.value!r} at line {t.line}")

    def if_stmt(self):
        self.expect("if")
        self.expect("(")
        c = self.expression()
        self.expect(")")
        then = self.statement()
        other = None
        if self.eat("else"):
            other = self.statement()
        return ("if", c, then, other)

    def for_stmt(self):
        self.expect("for")
        self.expect("(")
        init = None
        if not self.at(";"):
            if self.peek().value in ("const", "let", "var"):
                kind = self.next().value
                pattern = self.binding_pattern()
                if self.peek().value in ("of", "in"):
                    mode = self.next().value
                    it = self.expression()
                    self.expect(")")
                    body = self.statement()
                    return (
                        "forof" if mode == "of" else "forin",
                        kind, pattern, it, body,
                    )
                decls = []
                init_e = self.assignment() if self.eat("=") else None
                decls.append((pattern, init_e))
                while self.eat(","):
                    p2 = self.binding_pattern()
                    e2 = self.assignment() if self.eat("=") else None
                    decls.append((p2, e2))
                init = ("decl", kind, decls)
            else:
                init = ("expr", self.expression())
        self.expect(";")
        test = None if self.at(";") else self.expression()
        self.expect(";")
        update = None if self.at(")") else self.expression()
        self.expect(")")
        return ("for", init, test, update, self.statement())

    def try_stmt(self):
        self.expect("try")
        block = self.block()
        param = None
        catch = None
        final = None
        if self.eat("catch"):
            if self.eat("("):
                param = self.binding_pattern()
                self.expect(")")
            catch = self.block()
        if self.eat("finally"):
            final = self.block()
        return ("try", block, param, catch, final)

    def switch_stmt(self):
        self.expect("switch")
        self.expect("(")
        disc = self.expression()
        self.expect(")")
        self.expect("{")
        cases = []
        while not self.at("}"):
            if self.eat("case"):
                test = self.expression()
            else:
                self.expect("default")
                test = None
            self.expect(":")
            body = []
            while not (self.at("case") or self.at("default") or self.at("}")):
                body.append(self.statement())
            cases.append((test, body))
        self.expect("}")
        return ("switch", disc, cases)

    def class_decl(self):
        self.expect("class")
        name = None
        if self.peek().kind == "ident":
            name = self.next().value
        if self.eat("extends"):
            raise ParseError("class inheritance unsupported in jsmini")
        self.expect("{")
        methods = []  # (name, is_static, fn_node)
        while not self.at("}"):
            if self.eat(";"):
                continue
            is_static = False
            if self.peek().value == "static" and self.peek(1).value != "(":
                self.next()
                is_static = True
            name_t = self.next()
            if name_t.kind not in ("ident", "keyword", "str"):
                raise ParseError(
                    f"bad class member at line {name_t.line}"
                )
            self.expect("(")
            params = self.param_list()
            body = self.block()
            methods.append((
                name_t.value, is_static,
                ("fn", name_t.value, params, body, False, False, False),
            ))
        self.expect("}")
        return ("class_decl", name, methods)

    def export_stmt(self):
        self.expect("export")
        if self.eat("default"):
            e = self.expression()
            self.eat(";")
            return ("export_default", e)
        stmt = self.statement()
        return ("export", stmt)

    def import_stmt(self):
        self.expect("import")
        names = []
        default_name = None
        t = self.peek()
        if t.kind == "ident":
            default_name = self.next().value
            self.eat(",")
        if self.eat("{"):
            while not self.at("}"):
                name = self.next().value
                alias = name
                if self.eat("as"):
                    alias = self.next().value
                names.append((name, alias))
                if not self.at("}"):
                    self.expect(",")
            self.expect("}")
        self.expect("from")
        module = self.next()
        self.eat(";")
        return ("import", default_name, names, module.value)

    # ---------------------------------------------------------- expressions
    def expression(self):
        e = self.assignment()
        if self.at(","):
            exprs = [e]
            while self.eat(","):
                exprs.append(self.assignment())
            return ("seq", exprs)
        return e

    def assignment(self):
        if self._arrow_ahead():
            return self.arrow_function()
        left = self.conditional()
        t = self.peek()
        if t.kind == "punct" and t.value in ASSIGN_OPS:
            self.next()
            right = self.assignment()
            return ("assign", t.value, left, right)
        return left

    def _arrow_ahead(self) -> bool:
        """Detect `ident =>`, `async ident =>`, `( ... ) =>` and
        `async ( ... ) =>` without consuming."""
        j = self.i
        toks = self.toks
        if toks[j].kind == "keyword" and toks[j].value == "async":
            j += 1
        t = toks[j]
        if t.kind == "ident":
            return toks[j + 1].value == "=>"
        if t.value == "(":
            depth = 0
            while j < len(toks):
                v = toks[j].value
                if v == "(":
                    depth += 1
                elif v == ")":
                    depth -= 1
                    if depth == 0:
                        return toks[j + 1].value == "=>"
                elif toks[j].kind == "eof":
                    return False
                j += 1
        return False

    def arrow_function(self):
        is_async = self.eat("async")
        params = []
        if self.peek().kind == "ident":
            params.append((("id", self.next().value), None, False))
        else:
            self.expect("(")
            params = self.param_list()
        self.expect("=>")
        if self.at("{"):
            body = self.block()
            return ("fn", None, params, body, True, is_async, False)
        body = self.assignment()
        return ("fn", None, params, body, True, is_async, True)

    def param_list(self):
        """Parse params up to and including ')'. Returns
        [(pattern, default, is_rest), ...]."""
        params = []
        while not self.at(")"):
            if self.eat("..."):
                params.append((self.binding_pattern(), None, True))
            else:
                p = self.binding_pattern()
                default = self.assignment() if self.eat("=") else None
                params.append((p, default, False))
            if not self.at(")"):
                self.expect(",")
        self.expect(")")
        return params

    def function(self, is_decl: bool, is_async: bool = False):
        self.expect("function")
        name = None
        if self.peek().kind == "ident":
            name = self.next().value
        self.expect("(")
        params = self.param_list()
        body = self.block()
        node = ("fn", name, params, body, False, is_async, False)
        if is_decl:
            return ("fn_decl", name, node)
        return node

    def conditional(self):
        c = self.binary(0)
        if self.eat("?"):
            t = self.assignment()
            self.expect(":")
            f = self.assignment()
            return ("cond", c, t, f)
        return c

    def binary(self, min_prec: int):
        left = self.unary()
        while True:
            t = self.peek()
            op = t.value
            if (t.kind == "punct" and op in BIN_PREC) or (
                t.kind == "keyword" and op in ("instanceof", "in")
            ):
                prec = BIN_PREC[op]
                if prec < min_prec:
                    return left
                self.next()
                right = (
                    self.binary(prec)  # right-assoc for **
                    if op == "**"
                    else self.binary(prec + 1)
                )
                kind = "logic" if op in LOGIC_OPS else "bin"
                left = (kind, op, left, right)
                continue
            return left

    def unary(self):
        t = self.peek()
        if t.kind == "punct" and t.value in ("!", "-", "+", "~"):
            self.next()
            return ("un", t.value, self.unary())
        if t.kind == "punct" and t.value in ("++", "--"):
            self.next()
            return ("update", t.value, self.unary(), True)
        if t.kind == "keyword" and t.value in ("typeof", "void", "delete"):
            self.next()
            return ("un", t.value, self.unary())
        if t.kind == "keyword" and t.value == "await":
            self.next()
            return ("await", self.unary())
        if t.kind == "keyword" and t.value == "new":
            self.next()
            callee = self.member_chain(self.primary(), no_call=True)
            args = []
            if self.eat("("):
                args = self.arguments()
            return self.postfix(self.member_chain(("new", callee, args)))
        return self.postfix(self.member_chain(self.primary()))

    def arguments(self):
        args = []
        while not self.at(")"):
            if self.eat("..."):
                args.append(("spread", self.assignment()))
            else:
                args.append(self.assignment())
            if not self.at(")"):
                self.expect(",")
        self.expect(")")
        return args

    def member_chain(self, e, no_call: bool = False):
        while True:
            t = self.peek()
            if t.value == "." and t.kind == "punct":
                self.next()
                name = self.next().value
                e = ("member", e, name, False)
            elif t.value == "?.":
                self.next()
                if self.at("("):
                    self.next()
                    e = ("call", e, self.arguments(), True)
                elif self.at("["):
                    self.next()
                    idx = self.expression()
                    self.expect("]")
                    e = ("index", e, idx, True)
                else:
                    e = ("member", e, self.next().value, True)
            elif t.value == "[":
                self.next()
                idx = self.expression()
                self.expect("]")
                e = ("index", e, idx, False)
            elif t.value == "(" and not no_call:
                self.next()
                e = ("call", e, self.arguments(), False)
            elif t.kind == "template":
                raise ParseError(
                    f"tagged templates unsupported at line {t.line}"
                )
            else:
                return e

    def postfix(self, e):
        t = self.peek()
        if t.kind == "punct" and t.value in ("++", "--"):
            self.next()
            return ("update", t.value, e, False)
        return e

    def template_node(self, parts):
        out = []
        for part in parts:
            if isinstance(part, str):
                out.append(part)
            else:
                sub = Parser(part[1])
                out.append(("expr", sub.expression()))
                if sub.peek().kind != "eof":
                    raise ParseError("junk after template expression")
        return ("template", out)

    def primary(self):
        t = self.next()
        if t.kind == "num":
            return ("num", t.value)
        if t.kind == "str":
            return ("str", t.value)
        if t.kind == "template":
            return self.template_node(t.value)
        if t.kind == "regex":
            return ("regex", t.value[0], t.value[1])
        if t.kind == "ident":
            return ("ident", t.value)
        if t.kind == "keyword":
            v = t.value
            if v == "true":
                return ("bool", True)
            if v == "false":
                return ("bool", False)
            if v == "null":
                return ("null",)
            if v == "undefined":
                return ("undef",)
            if v == "this":
                return ("this",)
            if v == "function":
                self.i -= 1
                return self.function(is_decl=False)
            if v == "async" and self.peek().value == "function":
                self.next()
                self.i -= 1
                return self.function(is_decl=False, is_async=True)
            if v in ("of", "from", "get", "set", "static", "async"):
                return ("ident", v)  # contextual keywords as plain names
            raise ParseError(f"unexpected keyword {v!r} at line {t.line}")
        if t.value == "(":
            e = self.expression()
            self.expect(")")
            return e
        if t.value == "[":
            elems = []
            while not self.at("]"):
                if self.at(","):
                    self.next()
                    elems.append(("undef",))
                    continue
                if self.eat("..."):
                    elems.append(("spread", self.assignment()))
                else:
                    elems.append(self.assignment())
                if not self.at("]"):
                    self.expect(",")
            self.expect("]")
            return ("array", elems)
        if t.value == "{":
            props = []
            while not self.at("}"):
                if self.eat("..."):
                    props.append(("spread", self.assignment()))
                    if not self.at("}"):
                        self.expect(",")
                    continue
                key_t = self.next()
                computed = False
                if key_t.value == "[" and key_t.kind == "punct":
                    key = self.assignment()
                    self.expect("]")
                    computed = True
                elif key_t.kind in ("ident", "keyword", "str"):
                    key = ("str", str(key_t.value))
                elif key_t.kind == "num":
                    key = ("str", _num_key(key_t.value))
                else:
                    raise ParseError(
                        f"bad object key at line {key_t.line}"
                    )
                if self.at("("):  # method shorthand
                    self.next()
                    params = self.param_list()
                    body = self.block()
                    val = ("fn", None, params, body, False, False, False)
                elif self.eat(":"):
                    val = self.assignment()
                else:  # shorthand {name}
                    if key_t.kind not in ("ident", "keyword"):
                        raise ParseError(
                            f"bad shorthand at line {key_t.line}"
                        )
                    val = ("ident", key_t.value)
                props.append(("prop", key, val, computed))
                if not self.at("}"):
                    self.expect(",")
            self.expect("}")
            return ("object", props)
        raise ParseError(f"unexpected token {t.value!r} at line {t.line}")


def _num_key(v: float) -> str:
    return str(int(v)) if float(v).is_integer() else repr(v)


def parse(src: str) -> list:
    return Parser(src).parse_program()
