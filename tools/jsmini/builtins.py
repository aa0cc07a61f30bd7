"""Built-in members and globals for the jsmini ES subset.

Member dispatch maps JS method calls on strings/arrays/numbers/functions/
regexps/host objects onto Python implementations; make_globals builds the
Math/JSON/Object/Array/Number/console surface the dashboard uses.
"""

from __future__ import annotations

import functools
import json as _json
import math
import re
from typing import Any

from .interp import (
    UNDEFINED, Env, JSFunction, JSRegExp, JSThrow, Thenable, format_number,
    js_num, js_str, js_truthy, make_error, strict_eq,
)


def _idx(v) -> int:
    return int(js_num(v))


# ------------------------------------------------------------------ strings

def _string_member(interp, s: str, name: str):
    if name == "length":
        return float(len(s))
    table = {
        "slice": lambda *a: _slice(s, *a),
        "substring": lambda *a: _substring(s, *a),
        "split": lambda sep=UNDEFINED, *a: (
            [s] if sep is UNDEFINED
            else list(s) if sep == ""
            else (sep.rx.split(s) if isinstance(sep, JSRegExp)
                  else s.split(sep))
        ),
        "trim": lambda: s.strip(),
        "trimStart": lambda: s.lstrip(),
        "trimEnd": lambda: s.rstrip(),
        "startsWith": lambda p, at=0.0: s[_idx(at):].startswith(p),
        "endsWith": lambda p, *a: s.endswith(p),
        "includes": lambda p, *a: p in s,
        "indexOf": lambda p, *a: float(s.find(p, *(_idx(x) for x in a))),
        "lastIndexOf": lambda p: float(s.rfind(p)),
        "charAt": lambda i=0.0: s[_idx(i)] if 0 <= _idx(i) < len(s) else "",
        "charCodeAt": lambda i=0.0: float(ord(s[_idx(i)]))
        if 0 <= _idx(i) < len(s) else math.nan,
        "codePointAt": lambda i=0.0: float(ord(s[_idx(i)]))
        if 0 <= _idx(i) < len(s) else UNDEFINED,
        "toUpperCase": lambda: s.upper(),
        "toLowerCase": lambda: s.lower(),
        "repeat": lambda n: s * _idx(n),
        "padStart": lambda n, fill=" ": _pad(s, _idx(n), fill, start=True),
        "padEnd": lambda n, fill=" ": _pad(s, _idx(n), fill, start=False),
        "concat": lambda *a: s + "".join(js_str(x) for x in a),
        "replace": lambda pat, repl: _replace(interp, s, pat, repl,
                                              first_only=True),
        "replaceAll": lambda pat, repl: _replace(interp, s, pat, repl,
                                                 first_only=False),
        "match": lambda pat: _match(s, pat),
        "toString": lambda: s,
        "localeCompare": lambda o: float((s > o) - (s < o)),
        "at": lambda i: (s[_idx(i)] if -len(s) <= _idx(i) < len(s)
                         else UNDEFINED),
    }
    if name in table:
        return table[name]
    return UNDEFINED


def _pad(s, n, fill, start):
    if len(s) >= n or not fill:
        return s
    pad = (fill * n)[: n - len(s)]
    return pad + s if start else s + pad


def _slice(s, begin=UNDEFINED, end=UNDEFINED):
    n = len(s)
    b = 0 if begin is UNDEFINED else _idx(begin)
    e = n if end is UNDEFINED else _idx(end)
    if b < 0:
        b = max(0, n + b)
    if e < 0:
        e = max(0, n + e)
    return s[b:e]


def _substring(s, begin=0.0, end=UNDEFINED):
    n = len(s)
    b = max(0, min(n, _idx(begin)))
    e = n if end is UNDEFINED else max(0, min(n, _idx(end)))
    if b > e:
        b, e = e, b
    return s[b:e]


def _js_repl_template(template: str, m: "re.Match") -> str:
    out = template.replace("$&", m.group(0))
    for gi in range(1, (m.re.groups or 0) + 1):
        out = out.replace(f"${gi}", m.group(gi) or "")
    return out


def _replace(interp, s, pat, repl, first_only: bool):
    def do(m):
        if isinstance(repl, str):
            return _js_repl_template(repl, m)
        return js_str(interp.call_function(
            repl, [m.group(0)] + [g or "" for g in m.groups()]
        ))

    if isinstance(pat, JSRegExp):
        count = 0 if (pat.global_ or not first_only) else 1
        return pat.rx.sub(do, s, count=count)
    if isinstance(repl, str):
        return s.replace(pat, repl, 1 if first_only else -1)
    i = s.find(pat)
    if i < 0:
        return s
    rep = js_str(interp.call_function(repl, [pat]))
    if first_only:
        return s[:i] + rep + s[i + len(pat):]
    return s.replace(pat, rep)


def _match(s, pat):
    rx = pat.rx if isinstance(pat, JSRegExp) else re.compile(pat)
    if isinstance(pat, JSRegExp) and pat.global_:
        out = rx.findall(s)
        return out or None
    m = rx.search(s)
    if not m:
        return None
    return [m.group(0)] + [g if g is not None else UNDEFINED
                           for g in m.groups()]


# ------------------------------------------------------------------ arrays

def _array_member(interp, arr: list, name: str):
    call = interp.call_function
    if name == "length":
        return float(len(arr))
    table = {
        "push": lambda *a: (arr.extend(a), float(len(arr)))[1],
        "pop": lambda: arr.pop() if arr else UNDEFINED,
        "shift": lambda: arr.pop(0) if arr else UNDEFINED,
        "unshift": lambda *a: (arr.__setitem__(slice(0, 0), list(a)),
                               float(len(arr)))[1],
        "map": lambda fn: [call(fn, [v, float(i), arr])
                           for i, v in enumerate(arr)],
        "filter": lambda fn: [v for i, v in enumerate(arr)
                              if js_truthy(call(fn, [v, float(i), arr]))],
        "forEach": lambda fn: [call(fn, [v, float(i), arr])
                               for i, v in enumerate(arr)] and UNDEFINED,
        "join": lambda sep=",": (
            sep if sep is not UNDEFINED else ","
        ).join("" if v is None or v is UNDEFINED else js_str(v)
               for v in arr),
        "slice": lambda *a: _arr_slice(arr, *a),
        "splice": lambda start, count=UNDEFINED, *items:
            _splice(arr, start, count, items),
        "indexOf": lambda v: float(next(
            (i for i, x in enumerate(arr) if strict_eq(x, v)), -1
        )),
        "includes": lambda v: any(strict_eq(x, v) for x in arr),
        "some": lambda fn: any(
            js_truthy(call(fn, [v, float(i), arr]))
            for i, v in enumerate(arr)
        ),
        "every": lambda fn: all(
            js_truthy(call(fn, [v, float(i), arr]))
            for i, v in enumerate(arr)
        ),
        "find": lambda fn: next(
            (v for i, v in enumerate(arr)
             if js_truthy(call(fn, [v, float(i), arr]))), UNDEFINED
        ),
        "findIndex": lambda fn: float(next(
            (i for i, v in enumerate(arr)
             if js_truthy(call(fn, [v, float(i), arr]))), -1
        )),
        "reduce": lambda fn, *init: _reduce(interp, arr, fn, init),
        "concat": lambda *a: _concat(arr, a),
        "reverse": lambda: (arr.reverse(), arr)[1],
        "sort": lambda fn=UNDEFINED: _sort(interp, arr, fn),
        "flat": lambda depth=1.0: _flat(arr, _idx(depth)),
        "flatMap": lambda fn: _flat(
            [call(fn, [v, float(i), arr]) for i, v in enumerate(arr)], 1
        ),
        "keys": lambda: [float(i) for i in range(len(arr))],
        "entries": lambda: [[float(i), v] for i, v in enumerate(arr)],
        "fill": lambda v, *a: (_fill(arr, v, a), arr)[1],
        "at": lambda i: (arr[_idx(i)] if -len(arr) <= _idx(i) < len(arr)
                         else UNDEFINED),
        "toString": lambda: js_str(arr),
    }
    if name in table:
        return table[name]
    return UNDEFINED


def _fill(arr, v, a):
    start = _idx(a[0]) if len(a) > 0 else 0
    end = _idx(a[1]) if len(a) > 1 else len(arr)
    for i in range(start, min(end, len(arr))):
        arr[i] = v


def _concat(arr, parts):
    out = list(arr)
    for p in parts:
        if isinstance(p, list):
            out.extend(p)
        else:
            out.append(p)
    return out


def _arr_slice(arr, begin=UNDEFINED, end=UNDEFINED):
    n = len(arr)
    b = 0 if begin is UNDEFINED else _idx(begin)
    e = n if end is UNDEFINED else _idx(end)
    if b < 0:
        b = max(0, n + b)
    if e < 0:
        e = max(0, n + e)
    return arr[b:e]


def _splice(arr, start, count, items):
    n = len(arr)
    b = _idx(start)
    if b < 0:
        b = max(0, n + b)
    c = n - b if count is UNDEFINED else max(0, _idx(count))
    removed = arr[b : b + c]
    arr[b : b + c] = list(items)
    return removed


def _reduce(interp, arr, fn, init):
    items = list(enumerate(arr))
    if init:
        acc = init[0]
    else:
        if not items:
            raise JSThrow(make_error(
                "TypeError", "Reduce of empty array with no initial value"
            ))
        (_, acc), items = items[0], items[1:]
    for i, v in items:
        acc = interp.call_function(fn, [acc, v, float(i), arr])
    return acc


def _sort(interp, arr, fn):
    if fn is UNDEFINED:
        arr.sort(key=js_str)
    else:
        def cmp(a, b):
            r = js_num(interp.call_function(fn, [a, b]))
            return -1 if r < 0 else (1 if r > 0 else 0)

        arr.sort(key=functools.cmp_to_key(cmp))
    return arr


def _flat(arr, depth):
    out = []
    for v in arr:
        if isinstance(v, list) and depth > 0:
            out.extend(_flat(v, depth - 1))
        else:
            out.append(v)
    return out


# ------------------------------------------------------------------ numbers

def _number_member(num: float, name: str):
    table = {
        "toFixed": lambda d=0.0: _to_fixed(num, _idx(d)),
        "toString": lambda *a: format_number(num),
        "toLocaleString": lambda *a: _locale_number(num),
        "toPrecision": lambda p: f"{num:.{_idx(p)}g}",
        "toExponential": lambda d=UNDEFINED: _to_exponential(num, d),
        "valueOf": lambda: num,
    }
    return table.get(name, UNDEFINED)


def _to_fixed(num: float, digits: int) -> str:
    return f"{num:.{digits}f}"


def _to_exponential(num: float, digits) -> str:
    """JS Number.prototype.toExponential: no zero-padded exponent
    ("1.23e+5", not "e+05"); digits omitted -> as many as needed; non-finite
    values format like toString ("Infinity", "NaN")."""
    if math.isnan(num) or math.isinf(num):
        return format_number(num)
    if digits is UNDEFINED:
        # Omitted digits -> fewest that round-trip (JS "as many as needed").
        for d in range(0, 18):
            s = f"{num:.{d}e}"
            if float(s) == num:
                break
        mantissa, exp = s.split("e")
        if "." in mantissa:
            mantissa = mantissa.rstrip("0").rstrip(".")
    else:
        mantissa, exp = f"{num:.{_idx(digits)}e}".split("e")
    return f"{mantissa}e{exp[0]}{int(exp[1:])}"


def _locale_number(num: float) -> str:
    if float(num).is_integer():
        return f"{int(num):,}"
    return f"{num:,.3f}".rstrip("0").rstrip(".")


# ------------------------------------------------------------------ objects

def _dict_member(interp, obj: dict, name: str):
    if name in obj:
        return obj[name]
    cls = obj.get("__jsclass__")
    if cls is not None:
        bound = cls.bind_method(name, obj)
        if bound is not UNDEFINED:
            return bound
    if name == "hasOwnProperty":
        return lambda k: js_str(k) in obj
    if name == "toString":
        return lambda: js_str(obj)
    return UNDEFINED


# ---------------------------------------------------------------- dispatch

def member_lookup(interp, obj, name: str):
    if obj is None or obj is UNDEFINED:
        raise JSThrow(make_error(
            "TypeError",
            f"Cannot read properties of {js_str(obj)} (reading '{name}')",
        ))
    if isinstance(obj, str):
        return _string_member(interp, obj, name)
    if isinstance(obj, list):
        return _array_member(interp, obj, name)
    if isinstance(obj, bool):
        return UNDEFINED
    if isinstance(obj, float) or isinstance(obj, int):
        return _number_member(float(obj), name)
    if isinstance(obj, dict):
        return _dict_member(interp, obj, name)
    if isinstance(obj, JSFunction):
        if name in obj.props:
            return obj.props[name]
        if name == "call":
            return lambda this=UNDEFINED, *a: interp.call_function(
                obj, list(a), this
            )
        if name == "apply":
            return lambda this=UNDEFINED, a=None: interp.call_function(
                obj, list(a or []), this
            )
        if name == "bind":
            def bound(this=UNDEFINED, *pre):
                def inner(*a):
                    return interp.call_function(obj, list(pre) + list(a),
                                                this)
                return inner
            return bound
        if name == "name":
            return obj.name
        return UNDEFINED
    if isinstance(obj, JSRegExp):
        if name == "test":
            return lambda s: obj.rx.search(s) is not None
        if name == "source":
            return obj.source
        return UNDEFINED
    if isinstance(obj, Thenable):
        if name == "then":
            def then(on_ok=UNDEFINED, on_err=UNDEFINED):
                if obj.error is not None:
                    if callable(on_err) or isinstance(on_err, JSFunction):
                        return Thenable(
                            interp.call_function(on_err, [obj.error])
                        )
                    return obj
                if callable(on_ok) or isinstance(on_ok, JSFunction):
                    return Thenable(interp.call_function(on_ok, [obj.value]))
                return obj
            return then
        if name == "catch":
            def catch(on_err):
                if obj.error is not None:
                    return Thenable(interp.call_function(on_err, [obj.error]))
                return obj
            return catch
        if name == "finally":
            def fin(cb):
                interp.call_function(cb, [])
                return obj
            return fin
        return UNDEFINED
    # Host object: explicit protocol first, then plain attributes.
    getter = getattr(obj, "__js_get__", None)
    if getter is not None:
        return getter(name)
    value = getattr(obj, name, UNDEFINED)
    return value


# ----------------------------------------------------------------- globals

class _HostCtor:
    """Wrap a Python factory as a JS constructor (usable with `new`)."""

    def __init__(self, factory, name):
        self.__js_construct__ = factory
        self.name = name

    def __call__(self, *args):
        return self.__js_construct__(*args)

    def __js_instancecheck__(self, v):
        return False


def _json_parse(interp, text, *_):
    def norm(v):
        if isinstance(v, bool):
            return v
        if isinstance(v, (int, float)):
            return float(v)
        if isinstance(v, list):
            return [norm(x) for x in v]
        if isinstance(v, dict):
            return {k: norm(x) for k, x in v.items()}
        return v

    try:
        return norm(_json.loads(text))
    except Exception as exc:
        raise JSThrow(make_error("SyntaxError", str(exc)))


def _json_stringify(interp, value, _replacer=UNDEFINED, indent=UNDEFINED):
    def conv(v):
        if v is UNDEFINED:
            return None
        if isinstance(v, bool) or v is None or isinstance(v, str):
            return v
        if isinstance(v, float):
            return int(v) if v.is_integer() and abs(v) < 1e15 else v
        if isinstance(v, list):
            return [conv(x) for x in v]
        if isinstance(v, dict):
            return {k: conv(x) for k, x in v.items() if x is not UNDEFINED
                    and not isinstance(x, JSFunction)}
        return None

    kwargs = {"separators": (",", ":")}
    if indent is not UNDEFINED and indent:
        kwargs = {"indent": _idx(indent)}
    return _json.dumps(conv(value), **kwargs)


def make_globals(interp) -> Env:
    env = interp.globals

    math_obj = {
        "abs": lambda x: abs(js_num(x)),
        "floor": lambda x: float(math.floor(js_num(x))),
        "ceil": lambda x: float(math.ceil(js_num(x))),
        "round": lambda x: float(math.floor(js_num(x) + 0.5)),
        "trunc": lambda x: float(math.trunc(js_num(x))),
        "sqrt": lambda x: math.sqrt(js_num(x)) if js_num(x) >= 0 else math.nan,
        "pow": lambda a, b: js_num(a) ** js_num(b),
        "log": lambda x: math.log(js_num(x)) if js_num(x) > 0 else (
            -math.inf if js_num(x) == 0 else math.nan),
        "log2": lambda x: math.log2(js_num(x)) if js_num(x) > 0 else math.nan,
        "log10": lambda x: math.log10(js_num(x)) if js_num(x) > 0 else (
            -math.inf if js_num(x) == 0 else math.nan),
        "exp": lambda x: math.exp(js_num(x)),
        "min": lambda *a: min((js_num(x) for x in a), default=math.inf),
        "max": lambda *a: max((js_num(x) for x in a), default=-math.inf),
        "random": lambda: 0.5,  # deterministic under test
        "sign": lambda x: math.copysign(1.0, js_num(x))
        if js_num(x) != 0 else 0.0,
        "hypot": lambda *a: math.hypot(*(js_num(x) for x in a)),
        "PI": math.pi,
        "E": math.e,
    }
    env.declare("Math", math_obj)

    env.declare("JSON", {
        "parse": lambda text, *a: _json_parse(interp, text, *a),
        "stringify": lambda v, *a: _json_stringify(interp, v, *a),
    })

    env.declare("Object", {
        "keys": lambda o: list(o.keys()) if isinstance(o, dict) else [],
        "values": lambda o: list(o.values()) if isinstance(o, dict) else [],
        "entries": lambda o: [[k, v] for k, v in o.items()]
        if isinstance(o, dict) else [],
        "assign": lambda target, *srcs: (
            [target.update(s) for s in srcs if isinstance(s, dict)],
            target,
        )[1],
        "fromEntries": lambda pairs: {js_str(k): v for k, v in pairs},
        "freeze": lambda o: o,
    })

    env.declare("Array", {
        "isArray": lambda v=UNDEFINED: isinstance(v, list),
        "from": lambda it, fn=UNDEFINED: (
            [interp.call_function(fn, [v, float(i)])
             for i, v in enumerate(_arraylike(interp, it))]
            if fn is not UNDEFINED else _arraylike(interp, it)
        ),
        "of": lambda *a: list(a),
    })

    class _NumberFn:
        """Number is both a conversion function and a namespace."""

        @staticmethod
        def __call__(v=UNDEFINED):
            return 0.0 if v is UNDEFINED else js_num(v)

        isInteger = staticmethod(
            lambda v=UNDEFINED: isinstance(v, float) and not math.isnan(v)
            and not math.isinf(v) and v.is_integer()
        )
        isFinite = staticmethod(
            lambda v=UNDEFINED: isinstance(v, float) and math.isfinite(v)
        )
        isNaN = staticmethod(
            lambda v=UNDEFINED: isinstance(v, float) and math.isnan(v)
        )
        parseFloat = staticmethod(lambda s: js_num(s))
        parseInt = staticmethod(lambda s, base=10.0: _parse_int(s, base))
        MAX_SAFE_INTEGER = float(2**53 - 1)
        POSITIVE_INFINITY = math.inf
        NEGATIVE_INFINITY = -math.inf
        NaN = math.nan
        EPSILON = 2.0 ** -52

    env.declare("Number", _NumberFn())

    env.declare("String", _HostCtor(lambda v=UNDEFINED: js_str(
        "" if v is UNDEFINED else v
    ), "String"))
    env.declare("Boolean", _HostCtor(
        lambda v=UNDEFINED: js_truthy(v), "Boolean"
    ))
    env.declare("parseFloat", lambda s: js_num(s))
    env.declare("parseInt", lambda s, base=10.0: _parse_int(s, base))
    env.declare("isNaN", lambda v: math.isnan(js_num(v)))
    env.declare("isFinite", lambda v: math.isfinite(js_num(v)))
    env.declare("NaN", math.nan)
    env.declare("Infinity", math.inf)
    env.declare("undefined", UNDEFINED)
    env.declare("globalThis", {})

    logs = []
    env.declare("console", {
        "log": lambda *a: logs.append(" ".join(js_str(x) for x in a)),
        "warn": lambda *a: logs.append("WARN " + " ".join(js_str(x)
                                                          for x in a)),
        "error": lambda *a: logs.append("ERROR " + " ".join(js_str(x)
                                                            for x in a)),
    })
    env.declare("__console_logs__", logs)

    def make_js_error(name):
        def ctor(message=UNDEFINED):
            return make_error(
                name, "" if message is UNDEFINED else js_str(message)
            )
        return _HostCtor(ctor, name)

    for err in ("Error", "TypeError", "RangeError", "SyntaxError"):
        env.declare(err, make_js_error(err))

    env.declare("RegExp", _HostCtor(
        lambda body, flags="": JSRegExp(js_str(body), js_str(flags)),
        "RegExp",
    ))
    env.declare("Promise", {
        "resolve": lambda v=UNDEFINED: Thenable(v),
        "reject": lambda e=UNDEFINED: Thenable(error=e),
        "all": lambda arr: Thenable([
            v.value if isinstance(v, Thenable) else v for v in arr
        ]),
    })
    class JSSet:
        def __init__(self, items=UNDEFINED):
            self._items = []
            if items is not UNDEFINED and items is not None:
                for v in interp.js_iter(items):
                    self.add(v)

        @property
        def size(self):
            return float(len(self._items))

        def has(self, v):
            return any(strict_eq(x, v) for x in self._items)

        def add(self, v):
            if not self.has(v):
                self._items.append(v)
            return self

        def delete(self, v):
            for i, x in enumerate(self._items):
                if strict_eq(x, v):
                    self._items.pop(i)
                    return True
            return False

        def clear(self):
            self._items = []

        def forEach(self, fn):
            for v in list(self._items):
                interp.call_function(fn, [v, v, self])

        def values(self):
            return list(self._items)

        def __iter__(self):
            return iter(self._items)

    class JSMap:
        def __init__(self, pairs=UNDEFINED):
            self._keys = []
            self._vals = []
            if pairs is not UNDEFINED and pairs is not None:
                for k, v in interp.js_iter(pairs):
                    self.set(k, v)

        @property
        def size(self):
            return float(len(self._keys))

        def _find(self, k):
            for i, x in enumerate(self._keys):
                if strict_eq(x, k):
                    return i
            return -1

        def has(self, k):
            return self._find(k) >= 0

        def get(self, k):
            i = self._find(k)
            return self._vals[i] if i >= 0 else UNDEFINED

        def set(self, k, v):
            i = self._find(k)
            if i >= 0:
                self._vals[i] = v
            else:
                self._keys.append(k)
                self._vals.append(v)
            return self

        def delete(self, k):
            i = self._find(k)
            if i >= 0:
                self._keys.pop(i)
                self._vals.pop(i)
                return True
            return False

        def keys(self):
            return list(self._keys)

        def values(self):
            return list(self._vals)

        def entries(self):
            return [[k, v] for k, v in zip(self._keys, self._vals)]

        def forEach(self, fn):
            for k, v in zip(list(self._keys), list(self._vals)):
                interp.call_function(fn, [v, k, self])

        def __iter__(self):
            return iter([[k, v] for k, v in zip(self._keys, self._vals)])

    env.declare("Set", _HostCtor(lambda items=UNDEFINED: JSSet(items), "Set"))
    env.declare("Map", _HostCtor(lambda pairs=UNDEFINED: JSMap(pairs), "Map"))
    env.declare("Date", _HostCtor(lambda *a: {"_date": True}, "Date"))
    env.vars["Date"].now = lambda: 0.0

    class _TextDecoder:
        def decode(self, value=UNDEFINED, *_):
            if value is UNDEFINED:
                return ""
            if isinstance(value, bytes):
                return value.decode("utf-8")
            return js_str(value)

    env.declare("TextDecoder", _HostCtor(lambda *a: _TextDecoder(),
                                         "TextDecoder"))
    env.declare("setTimeout", lambda fn, _ms=0.0, *a:
                interp.call_function(fn, list(a)))
    env.declare("clearTimeout", lambda *_: UNDEFINED)
    env.declare("setInterval", lambda fn, _ms=0.0: 1.0)
    env.declare("clearInterval", lambda *_: UNDEFINED)
    return env


def _arraylike(interp, it):
    if isinstance(it, list):
        return list(it)
    if isinstance(it, str):
        return list(it)
    if isinstance(it, dict) and "length" in it:
        return [it.get(str(i), UNDEFINED) for i in range(_idx(it["length"]))]
    return list(interp.js_iter(it))


def _parse_int(s, base=10.0):
    try:
        m = re.match(r"\s*[-+]?[0-9a-fA-F]+" if _idx(base) == 16
                     else r"\s*[-+]?[0-9]+", js_str(s))
        if not m:
            return math.nan
        return float(int(m.group(0), _idx(base)))
    except Exception:
        return math.nan
