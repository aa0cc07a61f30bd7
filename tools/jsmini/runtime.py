"""Browser-ish runtime: module loading + window environment.

`load_frontend` parses and executes the shipped ES modules in dependency
order inside one Interpreter, resolving import/export bindings across the
per-module scopes, with a Document stub and CSS variables read from the
real styles.css — so tests drive the exact sources users load.
"""

from __future__ import annotations

import os
import re
from typing import Dict, List, Optional

from .dom import Document
from .interp import UNDEFINED, Env, Interpreter
from .parser import parse


def parse_css_vars(css_path: str) -> Dict[str, str]:
    """Pull custom properties from the FIRST :root block (the light theme)
    so cssVar() resolves to the shipped palette."""
    out: Dict[str, str] = {}
    try:
        css = open(css_path, encoding="utf-8").read()
    except OSError:
        return out
    m = re.search(r":root\s*{([^}]*)}", css)
    if not m:
        return out
    for name, value in re.findall(r"(--[\w-]+)\s*:\s*([^;]+);", m.group(1)):
        out[name] = value.strip()
    return out


class ComputedStyle:
    def __init__(self, css_vars: Dict[str, str]):
        self._vars = css_vars

    def getPropertyValue(self, name):
        return self._vars.get(str(name), "")


class LocalStorage:
    def __init__(self):
        self._store: Dict[str, str] = {}

    def getItem(self, key):
        return self._store.get(str(key), None)

    def setItem(self, key, value):
        self._store[str(key)] = str(value)

    def removeItem(self, key):
        self._store.pop(str(key), None)


class MediaQueryList:
    def __init__(self, matches: bool):
        self.matches = matches

    def addEventListener(self, *_):
        pass


class Window:
    def __init__(self, document: Document):
        self.document = document
        self.localStorage = LocalStorage()
        self.innerWidth = 1280.0
        self.innerHeight = 800.0
        self.scrollX = 0.0
        self.scrollY = 0.0

    def matchMedia(self, _query):
        return MediaQueryList(False)

    def addEventListener(self, *_):
        pass


def _exported_names(stmts) -> List[str]:
    names: List[str] = []
    for stmt in stmts:
        if stmt[0] != "export":
            continue
        inner = stmt[1]
        if inner[0] == "fn_decl":
            names.append(inner[1])
        elif inner[0] == "class_decl":
            names.append(inner[1])
        elif inner[0] == "decl":
            for pattern, _init in inner[2]:
                if pattern[0] == "id":
                    names.append(pattern[1])
    return names


class Frontend:
    """Loaded frontend session: interpreter + module scopes + DOM."""

    def __init__(self, interp: Interpreter, document: Document,
                 window: Window, modules: Dict[str, Env]):
        self.interp = interp
        self.document = document
        self.window = window
        self.modules = modules

    def get(self, module: str, name: str):
        return self.modules[module].lookup(name)

    def call(self, module: str, name: str, *args):
        return self.interp.call_function(self.get(module, name), list(args))

    def set_global(self, name: str, value):
        self.interp.globals.declare(name, value)


def load_frontend(
    files: Optional[List[str]] = None,
    frontend_dir: Optional[str] = None,
    fetch=None,
    load_page: bool = False,
) -> Frontend:
    """Execute the dashboard modules and return handles to their exports.

    Args:
      files: module load order (dependencies first). Defaults to the chart
        toolkit + views + API client — the render pipeline.
      frontend_dir: frontend/js directory (default: this repo's).
      fetch: optional host callable installed as the global ``fetch``.
    """
    from .builtins import make_globals

    if frontend_dir is None:
        root = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)
        )))
        frontend_dir = os.path.join(root, "frontend")
    js_dir = os.path.join(frontend_dir, "js")
    files = files or ["charts.js", "views.js", "api.js"]

    interp = Interpreter()
    make_globals(interp)
    document = Document()
    if load_page:
        document.load(open(os.path.join(frontend_dir, "index.html"),
                           encoding="utf-8").read())
    window = Window(document)
    css_vars = parse_css_vars(os.path.join(frontend_dir, "styles.css"))

    g = interp.globals
    g.declare("document", document)
    g.declare("window", window)
    g.declare("localStorage", window.localStorage)
    g.declare("getComputedStyle", lambda _el: ComputedStyle(css_vars))
    if fetch is not None:
        g.declare("fetch", fetch)

    modules: Dict[str, Env] = {}
    exports: Dict[str, Dict[str, object]] = {}
    for fname in files:
        src = open(os.path.join(js_dir, fname), encoding="utf-8").read()
        stmts = parse(src)
        env = Env(g)
        # Resolve imports from already-loaded modules.
        for stmt in stmts:
            if stmt[0] != "import":
                continue
            _, default_name, names, module_path = stmt
            dep = os.path.basename(str(module_path))
            if dep not in exports:
                raise RuntimeError(
                    f"{fname} imports {dep} which is not loaded yet — "
                    f"pass files in dependency order"
                )
            for name, alias in names:
                env.declare(alias, exports[dep][name])
            if default_name:
                env.declare(default_name, exports[dep].get("__default__"))
        interp.hoist(stmts, env)
        for stmt in stmts:
            interp.exec_stmt(stmt, env)
        modules[fname] = env
        exports[fname] = {
            name: env.vars[name] for name in _exported_names(stmts)
            if name in env.vars
        }
        if "__default__" in env.vars:
            exports[fname]["__default__"] = env.vars["__default__"]

    return Frontend(interp, document, window, modules)
