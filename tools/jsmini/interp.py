"""Tree-walking evaluator for the jsmini ES subset.

Value mapping: JS number -> Python float (always; string formatting goes
through js_str so `1` prints as "1"), string -> str, boolean -> bool,
null -> None, undefined -> the UNDEFINED sentinel, object -> dict,
array -> list, function -> JSFunction / any Python callable. Host objects
(the DOM stub, fetch stubs) are ordinary Python objects; property access
falls back to getattr, so stubs are written as plain classes.
"""

from __future__ import annotations

import math
import re
from typing import Any, Dict, List, Optional

from .parser import parse


class _Undefined:
    _instance = None

    def __new__(cls):
        if cls._instance is None:
            cls._instance = super().__new__(cls)
        return cls._instance

    def __repr__(self):
        return "undefined"

    def __bool__(self):
        return False


UNDEFINED = _Undefined()


class JSThrow(Exception):
    """A JS `throw` in flight; .value is the thrown JS value."""

    def __init__(self, value):
        self.value = value
        super().__init__(js_str(value))


class _Return(Exception):
    def __init__(self, value):
        self.value = value


class _Break(Exception):
    pass


class _Continue(Exception):
    pass


class Env:
    __slots__ = ("vars", "parent")

    def __init__(self, parent: Optional["Env"] = None):
        self.vars: Dict[str, Any] = {}
        self.parent = parent

    def lookup(self, name: str):
        env = self
        while env is not None:
            if name in env.vars:
                return env.vars[name]
            env = env.parent
        raise JSThrow(make_error("ReferenceError", f"{name} is not defined"))

    def assign(self, name: str, value):
        env = self
        while env is not None:
            if name in env.vars:
                env.vars[name] = value
                return
            env = env.parent
        raise JSThrow(make_error("ReferenceError", f"{name} is not defined"))

    def declare(self, name: str, value):
        self.vars[name] = value


class JSFunction:
    def __init__(self, name, params, body, env, is_arrow, is_async,
                 expr_body, this_val=UNDEFINED):
        self.name = name or ""
        self.params = params
        self.body = body
        self.env = env
        self.is_arrow = is_arrow
        self.is_async = is_async
        self.expr_body = expr_body
        self.this_val = this_val  # arrows capture; others get call-site this
        self.props: Dict[str, Any] = {}

    def __repr__(self):
        return f"[function {self.name or 'anonymous'}]"


class JSClass:
    """A class value: constructor + prototype methods + statics.

    Instances are ordinary dicts carrying a hidden __jsclass__ slot so
    member lookup can fall through to bound prototype methods."""

    def __init__(self, name, methods, statics, interp):
        self.name = name or ""
        self.methods = methods  # {name: JSFunction}
        self.statics = statics  # {name: JSFunction}
        self._interp = interp

    def __js_construct__(self, *args):
        inst = {"__jsclass__": self}
        ctor = self.methods.get("constructor")
        if ctor is not None:
            self._interp.call_function(ctor, list(args), inst)
        return inst

    def __js_get__(self, attr):
        if attr in self.statics:
            return self.statics[attr]
        if attr == "name":
            return self.name
        return UNDEFINED

    def __js_instancecheck__(self, v):
        return isinstance(v, dict) and v.get("__jsclass__") is self

    def bind_method(self, name, inst):
        m = self.methods.get(name)
        if m is None:
            return UNDEFINED
        return lambda *a: self._interp.call_function(m, list(a), inst)


class JSRegExp:
    def __init__(self, body: str, flags: str):
        py_flags = 0
        if "i" in flags:
            py_flags |= re.IGNORECASE
        if "m" in flags:
            py_flags |= re.MULTILINE
        if "s" in flags:
            py_flags |= re.DOTALL
        self.source = body
        self.flags = flags
        self.global_ = "g" in flags
        self.rx = re.compile(body, py_flags)

    def __repr__(self):
        return f"/{self.source}/{self.flags}"


class Thenable:
    """Synchronous stand-in for a resolved/rejected promise."""

    def __init__(self, value=UNDEFINED, error=None):
        self.value = value
        self.error = error


def make_error(name: str, message: str) -> dict:
    return {"name": name, "message": message, "stack": ""}


# --------------------------------------------------------------- coercions

def js_truthy(v) -> bool:
    if v is None or v is UNDEFINED:
        return False
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        return not (v == 0.0 or math.isnan(v))
    if isinstance(v, str):
        return len(v) > 0
    return True


def js_num(v) -> float:
    if isinstance(v, bool):
        return 1.0 if v else 0.0
    if isinstance(v, float):
        return v
    if isinstance(v, int):
        return float(v)
    if v is None:
        return 0.0
    if v is UNDEFINED:
        return math.nan
    if isinstance(v, str):
        s = v.strip()
        if not s:
            return 0.0
        try:
            return float(int(s, 16)) if s.lower().startswith("0x") else float(s)
        except ValueError:
            return math.nan
    if isinstance(v, list):
        if not v:
            return 0.0
        if len(v) == 1:
            return js_num(v[0])
    return math.nan


def format_number(x: float) -> str:
    """JS Number -> string (shortest round-trip, ints without '.0')."""
    if isinstance(x, bool):
        return "true" if x else "false"
    if math.isnan(x):
        return "NaN"
    if math.isinf(x):
        return "Infinity" if x > 0 else "-Infinity"
    if x == 0:
        return "0"
    if float(x).is_integer() and abs(x) < 1e21:
        return str(int(x))
    r = repr(float(x))
    if "e" in r:
        mant, exp = r.split("e")
        exp_i = int(exp)
        # JS uses fixed notation for 1e-6..1e21
        if -7 < exp_i < 21:
            return f"{float(x):.{max(0, -exp_i + 16)}f}".rstrip("0").rstrip(".")
        sign = "+" if exp_i >= 0 else "-"
        return f"{mant}e{sign}{abs(exp_i)}"
    return r


def js_str(v) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float) or isinstance(v, int):
        return format_number(float(v))
    if isinstance(v, str):
        return v
    if v is None:
        return "null"
    if v is UNDEFINED:
        return "undefined"
    if isinstance(v, list):
        return ",".join("" if x is None or x is UNDEFINED else js_str(x)
                        for x in v)
    if isinstance(v, dict):
        if "name" in v and "message" in v and "stack" in v:
            return f"{v['name']}: {v['message']}"
        return "[object Object]"
    if isinstance(v, (JSFunction,)) or callable(v):
        return f"function {getattr(v, 'name', '')}() {{ [code] }}"
    return str(v)


def strict_eq(a, b) -> bool:
    if a is UNDEFINED or b is UNDEFINED:
        return a is b
    if a is None or b is None:
        return a is b
    if isinstance(a, bool) or isinstance(b, bool):
        return isinstance(a, bool) and isinstance(b, bool) and a == b
    if isinstance(a, float) and isinstance(b, float):
        return a == b  # NaN != NaN falls out naturally
    if isinstance(a, str) and isinstance(b, str):
        return a == b
    return a is b


def loose_eq(a, b) -> bool:
    if (a is None or a is UNDEFINED) and (b is None or b is UNDEFINED):
        return True
    if isinstance(a, (float, str, bool)) and isinstance(b, (float, str, bool)):
        return js_num(a) == js_num(b)
    return strict_eq(a, b)


def _to_index(v) -> int:
    return int(js_num(v))


class Interpreter:
    def __init__(self, global_env: Optional[Env] = None):
        self.globals = global_env or Env()

    # ---------------------------------------------------------------- run
    def run(self, src: str, env: Optional[Env] = None):
        env = env or self.globals
        stmts = parse(src)
        self.hoist(stmts, env)
        result = UNDEFINED
        for stmt in stmts:
            result = self.exec_stmt(stmt, env)
        return result

    def hoist(self, stmts, env):
        for stmt in stmts:
            if stmt[0] == "fn_decl":
                env.declare(stmt[1], self.make_function(stmt[2], env))
            elif stmt[0] == "export" and stmt[1][0] == "fn_decl":
                env.declare(stmt[1][1], self.make_function(stmt[1][2], env))

    def make_function(self, node, env, this_val=UNDEFINED):
        _, name, params, body, is_arrow, is_async, expr_body = node
        return JSFunction(name, params, body, env, is_arrow, is_async,
                          expr_body, this_val)

    def make_class(self, node, env) -> "JSClass":
        _, name, members = node
        methods = {}
        statics = {}
        for mname, is_static, fn_node in members:
            fn = self.make_function(fn_node, env)
            (statics if is_static else methods)[mname] = fn
        return JSClass(name, methods, statics, self)

    # ---------------------------------------------------------- statements
    def exec_stmt(self, stmt, env):
        kind = stmt[0]
        if kind == "expr":
            return self.eval(stmt[1], env)
        if kind == "decl":
            for pattern, init in stmt[2]:
                value = UNDEFINED if init is None else self.eval(init, env)
                self.bind_pattern(pattern, value, env, declare=True)
            return UNDEFINED
        if kind == "fn_decl":
            if stmt[1] not in env.vars:
                env.declare(stmt[1], self.make_function(stmt[2], env))
            return UNDEFINED
        if kind == "block":
            inner = Env(env)
            self.hoist(stmt[1], inner)
            for s in stmt[1]:
                self.exec_stmt(s, inner)
            return UNDEFINED
        if kind == "return":
            raise _Return(self.eval(stmt[1], env))
        if kind == "if":
            if js_truthy(self.eval(stmt[1], env)):
                self.exec_stmt(stmt[2], env)
            elif stmt[3] is not None:
                self.exec_stmt(stmt[3], env)
            return UNDEFINED
        if kind == "while":
            while js_truthy(self.eval(stmt[1], env)):
                try:
                    self.exec_stmt(stmt[2], env)
                except _Break:
                    break
                except _Continue:
                    continue
            return UNDEFINED
        if kind == "do":
            while True:
                try:
                    self.exec_stmt(stmt[1], env)
                except _Break:
                    break
                except _Continue:
                    pass
                if not js_truthy(self.eval(stmt[2], env)):
                    break
            return UNDEFINED
        if kind == "for":
            loop_env = Env(env)
            if stmt[1] is not None:
                self.exec_stmt(stmt[1], loop_env)
            while stmt[2] is None or js_truthy(self.eval(stmt[2], loop_env)):
                try:
                    self.exec_stmt(stmt[4], loop_env)
                except _Break:
                    break
                except _Continue:
                    pass
                if stmt[3] is not None:
                    self.eval(stmt[3], loop_env)
            return UNDEFINED
        if kind == "forof":
            _, _, pattern, it_expr, body = stmt
            iterable = self.eval(it_expr, env)
            for item in self.js_iter(iterable):
                inner = Env(env)
                self.bind_pattern(pattern, item, inner, declare=True)
                try:
                    self.exec_stmt(body, inner)
                except _Break:
                    break
                except _Continue:
                    continue
            return UNDEFINED
        if kind == "forin":
            _, _, pattern, it_expr, body = stmt
            obj = self.eval(it_expr, env)
            keys = (list(obj.keys()) if isinstance(obj, dict)
                    else [format_number(float(i)) for i in range(len(obj))]
                    if isinstance(obj, list) else [])
            for key in keys:
                inner = Env(env)
                self.bind_pattern(pattern, key, inner, declare=True)
                try:
                    self.exec_stmt(body, inner)
                except _Break:
                    break
                except _Continue:
                    continue
            return UNDEFINED
        if kind == "break":
            raise _Break()
        if kind == "continue":
            raise _Continue()
        if kind == "throw":
            raise JSThrow(self.eval(stmt[1], env))
        if kind == "try":
            _, block, param, catch, final = stmt
            try:
                try:
                    self.exec_stmt(block, env)
                except JSThrow as exc:
                    if catch is None:
                        raise
                    inner = Env(env)
                    if param is not None:
                        self.bind_pattern(param, exc.value, inner,
                                          declare=True)
                    self.exec_stmt(catch, inner)
            finally:
                if final is not None:
                    self.exec_stmt(final, env)
            return UNDEFINED
        if kind == "switch":
            _, disc_e, cases = stmt
            disc = self.eval(disc_e, env)
            matched = False
            try:
                for test, body in cases:
                    if not matched:
                        if test is None:
                            matched = True
                        elif strict_eq(self.eval(test, env), disc):
                            matched = True
                    if matched:
                        for s in body:
                            self.exec_stmt(s, env)
                if not matched:  # run default if it wasn't in order
                    seen_default = False
                    for test, body in cases:
                        if test is None:
                            seen_default = True
                        if seen_default:
                            for s in body:
                                self.exec_stmt(s, env)
            except _Break:
                pass
            return UNDEFINED
        if kind == "class_decl":
            env.declare(stmt[1], self.make_class(stmt, env))
            return UNDEFINED
        if kind == "export":
            return self.exec_stmt(stmt[1], env)
        if kind == "export_default":
            env.declare("__default__", self.eval(stmt[1], env))
            return UNDEFINED
        if kind == "import":
            # Imports are resolved by runtime.load_frontend (module envs
            # share bindings); standalone runs treat them as no-ops.
            return UNDEFINED
        if kind == "empty":
            return UNDEFINED
        raise RuntimeError(f"unknown statement {kind}")

    # ----------------------------------------------------------- patterns
    def bind_pattern(self, pattern, value, env, declare: bool):
        kind = pattern[0]
        if kind == "id":
            if declare:
                env.declare(pattern[1], value)
            else:
                env.assign(pattern[1], value)
            return
        if kind == "arr_pat":
            items = list(self.js_iter(value)) if value not in (
                None, UNDEFINED
            ) else []
            for i, elem in enumerate(pattern[1]):
                if elem is None:
                    continue
                sub, default = elem
                v = items[i] if i < len(items) else UNDEFINED
                if v is UNDEFINED and default is not None:
                    v = self.eval(default, env)
                self.bind_pattern(sub, v, env, declare)
            if pattern[2] is not None:
                rest = items[len(pattern[1]):]
                self.bind_pattern(pattern[2], rest, env, declare)
            return
        if kind == "obj_pat":
            taken = set()
            for key, target, default in pattern[1]:
                taken.add(key)
                v = self.get_member(value, key) if value not in (
                    None, UNDEFINED
                ) else UNDEFINED
                if v is UNDEFINED and default is not None:
                    v = self.eval(default, env)
                self.bind_pattern(target, v, env, declare)
            if pattern[2] is not None:
                rest = {k: v for k, v in value.items() if k not in taken} \
                    if isinstance(value, dict) else {}
                self.bind_pattern(pattern[2], rest, env, declare)
            return
        raise RuntimeError(f"unknown pattern {kind}")

    def js_iter(self, value):
        if isinstance(value, (list, tuple)):
            return list(value)
        if isinstance(value, str):
            return list(value)
        if isinstance(value, dict):
            raise JSThrow(make_error("TypeError", "object is not iterable"))
        if hasattr(value, "__iter__"):
            return list(value)
        raise JSThrow(make_error(
            "TypeError", f"{js_str(value)} is not iterable"
        ))

    # -------------------------------------------------------- expressions
    def eval(self, node, env):
        kind = node[0]
        if kind == "num":
            return float(node[1])
        if kind == "str":
            return node[1]
        if kind == "bool":
            return node[1]
        if kind == "null":
            return None
        if kind == "undef":
            return UNDEFINED
        if kind == "ident":
            return env.lookup(node[1])
        if kind == "this":
            return env.lookup("this") if self._has(env, "this") else UNDEFINED
        if kind == "template":
            out = []
            for part in node[1]:
                if isinstance(part, str):
                    out.append(part)
                else:
                    out.append(js_str(self.eval(part[1], env)))
            return "".join(out)
        if kind == "regex":
            return JSRegExp(node[1], node[2])
        if kind == "array":
            out = []
            for e in node[1]:
                if e[0] == "spread":
                    out.extend(self.js_iter(self.eval(e[1], env)))
                else:
                    out.append(self.eval(e, env))
            return out
        if kind == "object":
            obj: Dict[str, Any] = {}
            for prop in node[1]:
                if prop[0] == "spread":
                    src = self.eval(prop[1], env)
                    if isinstance(src, dict):
                        obj.update(src)
                    continue
                _, key_node, val_node, computed = prop
                key = js_str(self.eval(key_node, env)) if computed else \
                    key_node[1]
                obj[key] = self.eval(val_node, env)
            return obj
        if kind == "fn":
            this_val = env.lookup("this") if (
                node[4] and self._has(env, "this")
            ) else UNDEFINED
            return self.make_function(node, env, this_val)
        if kind == "seq":
            result = UNDEFINED
            for e in node[1]:
                result = self.eval(e, env)
            return result
        if kind == "cond":
            return (self.eval(node[2], env)
                    if js_truthy(self.eval(node[1], env))
                    else self.eval(node[3], env))
        if kind == "logic":
            left = self.eval(node[2], env)
            op = node[1]
            if op == "&&":
                return self.eval(node[3], env) if js_truthy(left) else left
            if op == "||":
                return left if js_truthy(left) else self.eval(node[3], env)
            # ??
            return (self.eval(node[3], env)
                    if left is None or left is UNDEFINED else left)
        if kind == "bin":
            return self.binop(node[1], self.eval(node[2], env),
                              self.eval(node[3], env))
        if kind == "un":
            op = node[1]
            if op == "typeof":
                try:
                    v = self.eval(node[2], env)
                except JSThrow:
                    return "undefined"
                return self.type_of(v)
            v = self.eval(node[2], env)
            if op == "!":
                return not js_truthy(v)
            if op == "-":
                return -js_num(v)
            if op == "+":
                return js_num(v)
            if op == "~":
                return float(~_to_int32(js_num(v)))
            if op == "void":
                return UNDEFINED
            if op == "delete":
                return True
            raise RuntimeError(f"unknown unary {op}")
        if kind == "update":
            _, op, target, prefix = node
            old = js_num(self.eval(target, env))
            new = old + (1.0 if op == "++" else -1.0)
            self.assign_to(target, new, env)
            return new if prefix else old
        if kind == "assign":
            _, op, target, value_node = node
            if op == "=":
                value = self.eval(value_node, env)
            elif op in ("&&=", "||=", "??="):
                cur = self.eval(target, env)
                if op == "&&=" and not js_truthy(cur):
                    return cur
                if op == "||=" and js_truthy(cur):
                    return cur
                if op == "??=" and cur is not None and cur is not UNDEFINED:
                    return cur
                value = self.eval(value_node, env)
            else:
                cur = self.eval(target, env)
                value = self.binop(op[:-1], cur, self.eval(value_node, env))
            self.assign_to(target, value, env)
            return value
        if kind == "member":
            obj = self.eval(node[1], env)
            if node[3] and (obj is None or obj is UNDEFINED):
                return UNDEFINED
            return self.get_member(obj, node[2])
        if kind == "index":
            obj = self.eval(node[1], env)
            if node[3] and (obj is None or obj is UNDEFINED):
                return UNDEFINED
            key = self.eval(node[2], env)
            return self.get_index(obj, key)
        if kind == "call":
            return self.eval_call(node, env)
        if kind == "new":
            callee = self.eval(node[1], env)
            args = self.eval_args(node[2], env)
            ctor = getattr(callee, "__js_construct__", None)
            if ctor is not None:
                return ctor(*args)
            if callable(callee):
                return callee(*args)
            raise JSThrow(make_error(
                "TypeError", f"{js_str(callee)} is not a constructor"
            ))
        if kind == "await":
            v = self.eval(node[1], env)
            if isinstance(v, Thenable):
                if v.error is not None:
                    raise JSThrow(v.error)
                return v.value
            return v
        if kind == "spread":
            raise RuntimeError("spread outside call/array")
        raise RuntimeError(f"unknown expression {kind}")

    @staticmethod
    def _has(env, name):
        e = env
        while e is not None:
            if name in e.vars:
                return True
            e = e.parent
        return False

    def eval_args(self, arg_nodes, env) -> List[Any]:
        args = []
        for a in arg_nodes:
            if a[0] == "spread":
                args.extend(self.js_iter(self.eval(a[1], env)))
            else:
                args.append(self.eval(a, env))
        return args

    def eval_call(self, node, env):
        _, callee_node, arg_nodes, optional = node
        this_val = UNDEFINED
        if callee_node[0] == "member":
            obj = self.eval(callee_node[1], env)
            if callee_node[3] and (obj is None or obj is UNDEFINED):
                return UNDEFINED
            fn = self.get_member(obj, callee_node[2])
            this_val = obj
        elif callee_node[0] == "index":
            obj = self.eval(callee_node[1], env)
            fn = self.get_index(obj, self.eval(callee_node[2], env))
            this_val = obj
        else:
            fn = self.eval(callee_node, env)
        if optional and (fn is None or fn is UNDEFINED):
            return UNDEFINED
        args = self.eval_args(arg_nodes, env)
        return self.call_function(fn, args, this_val)

    def call_function(self, fn, args: List[Any], this_val=UNDEFINED):
        if isinstance(fn, JSFunction):
            env = Env(fn.env)
            if fn.is_arrow:
                if fn.this_val is not UNDEFINED:
                    env.declare("this", fn.this_val)
            else:
                env.declare("this", this_val)
                env.declare("arguments", list(args))
            i = 0
            for pattern, default, is_rest in fn.params:
                if is_rest:
                    self.bind_pattern(pattern, list(args[i:]), env,
                                      declare=True)
                    break
                v = args[i] if i < len(args) else UNDEFINED
                if v is UNDEFINED and default is not None:
                    v = self.eval(default, env)
                self.bind_pattern(pattern, v, env, declare=True)
                i += 1
            if fn.expr_body:
                result = self.eval(fn.body, env)
            else:
                result = UNDEFINED
                try:
                    self.exec_stmt(fn.body, env)
                except _Return as r:
                    result = r.value
            if fn.is_async and not isinstance(result, Thenable):
                return Thenable(result)
            return result
        if callable(fn):
            return fn(*args)
        raise JSThrow(make_error(
            "TypeError", f"{js_str(fn)} is not a function"
        ))

    def binop(self, op, a, b):
        if op == "+":
            if isinstance(a, str) or isinstance(b, str) or \
                    isinstance(a, (dict, list)) or isinstance(b, (dict, list)):
                return js_str(a) + js_str(b)
            return js_num(a) + js_num(b)
        if op == "-":
            return js_num(a) - js_num(b)
        if op == "*":
            return js_num(a) * js_num(b)
        if op == "/":
            an, bn = js_num(a), js_num(b)
            if bn == 0:
                if an == 0 or math.isnan(an):
                    return math.nan
                return math.inf * math.copysign(1, an) * math.copysign(1, bn)
            return an / bn
        if op == "%":
            an, bn = js_num(a), js_num(b)
            if bn == 0 or math.isnan(an) or math.isinf(an):
                return math.nan
            return math.fmod(an, bn)
        if op == "**":
            return js_num(a) ** js_num(b)
        if op == "===":
            return strict_eq(a, b)
        if op == "!==":
            return not strict_eq(a, b)
        if op == "==":
            return loose_eq(a, b)
        if op == "!=":
            return not loose_eq(a, b)
        if op in ("<", ">", "<=", ">="):
            if isinstance(a, str) and isinstance(b, str):
                pass
            else:
                a, b = js_num(a), js_num(b)
                if math.isnan(a) or math.isnan(b):
                    return False
            if op == "<":
                return a < b
            if op == ">":
                return a > b
            if op == "<=":
                return a <= b
            return a >= b
        if op == "&":
            return float(_to_int32(js_num(a)) & _to_int32(js_num(b)))
        if op == "|":
            return float(_to_int32(js_num(a)) | _to_int32(js_num(b)))
        if op == "^":
            return float(_to_int32(js_num(a)) ^ _to_int32(js_num(b)))
        if op == "<<":
            return float(_to_int32(_to_int32(js_num(a))
                                   << (_to_index(js_num(b)) & 31)))
        if op == ">>":
            return float(_to_int32(js_num(a)) >> (_to_index(js_num(b)) & 31))
        if op == "instanceof":
            check = getattr(b, "__js_instancecheck__", None)
            if check is not None:
                return bool(check(a))
            return False
        if op == "in":
            if isinstance(b, dict):
                return js_str(a) in b
            if isinstance(b, list):
                return 0 <= _to_index(js_num(a)) < len(b)
            return False
        raise RuntimeError(f"unknown binary op {op}")

    def type_of(self, v) -> str:
        if v is UNDEFINED:
            return "undefined"
        if isinstance(v, bool):
            return "boolean"
        if isinstance(v, float):
            return "number"
        if isinstance(v, str):
            return "string"
        if isinstance(v, JSFunction) or callable(v):
            return "function"
        return "object"

    # --------------------------------------------------------- assignment
    def assign_to(self, target, value, env):
        kind = target[0]
        if kind == "ident":
            env.assign(target[1], value)
            return
        if kind == "member":
            obj = self.eval(target[1], env)
            self.set_member(obj, target[2], value)
            return
        if kind == "index":
            obj = self.eval(target[1], env)
            key = self.eval(target[2], env)
            self.set_index(obj, key, value)
            return
        if kind == "array":
            items = list(self.js_iter(value))
            for i, el in enumerate(target[1]):
                if el[0] == "undef":
                    continue
                self.assign_to(el, items[i] if i < len(items) else UNDEFINED,
                               env)
            return
        raise JSThrow(make_error("SyntaxError", "invalid assignment target"))

    # ------------------------------------------------------ member access
    def get_index(self, obj, key):
        if isinstance(obj, list):
            if isinstance(key, float) or isinstance(key, int):
                i = _to_index(key)
                if 0 <= i < len(obj):
                    return obj[i]
                return UNDEFINED
            return self.get_member(obj, js_str(key))
        if isinstance(obj, str):
            if isinstance(key, (float, int)):
                i = _to_index(key)
                return obj[i] if 0 <= i < len(obj) else UNDEFINED
            return self.get_member(obj, js_str(key))
        if isinstance(obj, dict):
            return obj.get(js_str(key), UNDEFINED)
        return self.get_member(obj, js_str(key))

    def set_index(self, obj, key, value):
        if isinstance(obj, list):
            i = _to_index(key)
            while len(obj) <= i:
                obj.append(UNDEFINED)
            obj[i] = value
            return
        if isinstance(obj, dict):
            obj[js_str(key)] = value
            return
        self.set_member(obj, js_str(key), value)

    def set_member(self, obj, name, value):
        if isinstance(obj, dict):
            obj[name] = value
            return
        if isinstance(obj, JSFunction):
            obj.props[name] = value
            return
        if obj is None or obj is UNDEFINED:
            raise JSThrow(make_error(
                "TypeError",
                f"Cannot set properties of {js_str(obj)} ({name})",
            ))
        setter = getattr(obj, "__js_set__", None)
        if setter is not None:
            setter(name, value)
            return
        setattr(obj, name, value)

    def get_member(self, obj, name):
        from .builtins import member_lookup

        return member_lookup(self, obj, name)


def _to_int32(x: float) -> int:
    if math.isnan(x) or math.isinf(x):
        return 0
    n = int(x) & 0xFFFFFFFF
    return n - 0x100000000 if n >= 0x80000000 else n
