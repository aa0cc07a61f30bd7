"""DOM stub for executing the dashboard under pytest.

Implements the element surface frontend/js/*.js touches: create/append,
class and style manipulation, (inner)HTML in both directions via Python's
html.parser, textContent, attributes, events, and document lookups. Layout
APIs return fixed geometry (getBoundingClientRect) so hover math runs.
"""

from __future__ import annotations

import html as _html
from html.parser import HTMLParser
from typing import Dict, List, Optional

from .interp import UNDEFINED, js_str

VOID_TAGS = {"br", "hr", "img", "input", "meta", "link", "col", "area",
             "base", "embed", "source", "track", "wbr"}


class ClassList:
    def __init__(self, element: "Element"):
        self._el = element

    def _classes(self) -> List[str]:
        return [c for c in self._el.className.split() if c]

    def add(self, *names):
        classes = self._classes()
        for n in names:
            n = js_str(n)
            if n not in classes:
                classes.append(n)
        self._el.className = " ".join(classes)

    def remove(self, *names):
        drop = {js_str(n) for n in names}
        self._el.className = " ".join(
            c for c in self._classes() if c not in drop
        )

    def toggle(self, name, force=UNDEFINED):
        name = js_str(name)
        has = name in self._classes()
        want = (not has) if force is UNDEFINED else bool(force)
        if want:
            self.add(name)
        else:
            self.remove(name)
        return want

    def contains(self, name):
        return js_str(name) in self._classes()


class Style:
    """style object: arbitrary property assignment + cssText-ish reads."""

    def __init__(self):
        object.__setattr__(self, "_props", {})

    def __js_get__(self, name):
        if name == "setProperty":
            return lambda k, v: self._props.__setitem__(js_str(k), js_str(v))
        if name == "getPropertyValue":
            return lambda k: self._props.get(js_str(k), "")
        return self._props.get(name, "")

    def __js_set__(self, name, value):
        self._props[name] = js_str(value)


class TextNode:
    def __init__(self, text: str):
        self.text = text
        self.parentNode: Optional["Element"] = None

    @property
    def textContent(self):
        return self.text

    def serialize(self) -> str:
        return _html.escape(self.text, quote=False)


class Element:
    def __init__(self, tag: str, document: "Document", ns: str = ""):
        self.tagName = tag.upper()
        self._tag = tag
        self._ns = ns
        self._doc = document
        self.attributes: Dict[str, str] = {}
        self.childNodes: List[object] = []
        self.parentNode: Optional["Element"] = None
        self.style = Style()
        self.classList = ClassList(self)
        self._listeners: Dict[str, list] = {}
        # common writable handler slots
        self.onclick = None
        self.onchange = None
        self.oninput = None
        self.value = ""
        self.disabled = False
        self.checked = False
        self.open = False

    # ------------------------------------------------------------ core API
    @property
    def id(self):
        return self.attributes.get("id", "")

    @id.setter
    def id(self, value):
        self.attributes["id"] = js_str(value)

    @property
    def className(self):
        return self.attributes.get("class", "")

    @className.setter
    def className(self, value):
        self.attributes["class"] = js_str(value)

    @property
    def children(self):
        return [c for c in self.childNodes if isinstance(c, Element)]

    @property
    def firstChild(self):
        return self.childNodes[0] if self.childNodes else None

    def setAttribute(self, name, value):
        self.attributes[js_str(name)] = js_str(value)

    def getAttribute(self, name):
        return self.attributes.get(js_str(name), None)

    def removeAttribute(self, name):
        self.attributes.pop(js_str(name), None)

    def hasAttribute(self, name):
        return js_str(name) in self.attributes

    def appendChild(self, child):
        if getattr(child, "parentNode", None) is not None:
            child.parentNode.removeChild(child)
        self.childNodes.append(child)
        child.parentNode = self
        return child

    def append(self, *children):
        for c in children:
            if isinstance(c, str):
                c = TextNode(c)
            self.appendChild(c)

    def insertBefore(self, node, ref):
        if getattr(node, "parentNode", None) is not None:
            node.parentNode.removeChild(node)
        if ref is None or ref is UNDEFINED:
            self.childNodes.append(node)
        else:
            idx = self.childNodes.index(ref)
            self.childNodes.insert(idx, node)
        node.parentNode = self
        return node

    def removeChild(self, child):
        self.childNodes.remove(child)
        child.parentNode = None
        return child

    def remove(self):
        if self.parentNode is not None:
            self.parentNode.removeChild(self)

    # ------------------------------------------------------- text and HTML
    @property
    def textContent(self) -> str:
        out = []
        for c in self.childNodes:
            out.append(c.textContent if isinstance(c, (Element, TextNode))
                       else "")
        return "".join(out)

    @textContent.setter
    def textContent(self, value):
        self.childNodes = []
        text = js_str(value)
        if text:
            self.appendChild(TextNode(text))

    @property
    def innerHTML(self) -> str:
        return "".join(
            c.serialize() if isinstance(c, (Element, TextNode)) else ""
            for c in self.childNodes
        )

    @innerHTML.setter
    def innerHTML(self, value):
        self.childNodes = []
        for node in parse_fragment(js_str(value), self._doc):
            self.appendChild(node)

    @property
    def outerHTML(self) -> str:
        return self.serialize()

    def serialize(self) -> str:
        attrs = "".join(
            f' {k}="{_html.escape(str(v), quote=True)}"'
            for k, v in self.attributes.items()
        )
        if self._tag in VOID_TAGS:
            return f"<{self._tag}{attrs} />"
        return f"<{self._tag}{attrs}>{self.innerHTML}</{self._tag}>"

    # --------------------------------------------------------------- events
    def addEventListener(self, name, handler, *_):
        self._listeners.setdefault(js_str(name), []).append(handler)

    def removeEventListener(self, name, handler, *_):
        try:
            self._listeners.get(js_str(name), []).remove(handler)
        except ValueError:
            pass

    def dispatch(self, interp, name: str, event: Optional[dict] = None):
        """Test helper: fire an event through listeners + the on<name> slot."""
        event = event or {}
        event.setdefault("type", name)
        event.setdefault("target", self)
        event.setdefault("preventDefault", lambda *_: UNDEFINED)
        event.setdefault("stopPropagation", lambda *_: UNDEFINED)
        for fn in self._listeners.get(name, []):
            interp.call_function(fn, [event])
        slot = getattr(self, "on" + name, None)
        if slot not in (None, UNDEFINED):
            interp.call_function(slot, [event])

    def contains(self, node):
        while node is not None and node is not UNDEFINED:
            if node is self:
                return True
            node = getattr(node, "parentNode", None)
        return False

    # --------------------------------------------------------------- lookup
    def getElementsByTagName(self, tag):
        tag = js_str(tag).lower()
        out = []

        def walk(el):
            for c in el.children:
                if c._tag.lower() == tag:
                    out.append(c)
                walk(c)

        walk(self)
        return out

    def querySelector(self, selector):
        found = self.querySelectorAll(selector)
        return found[0] if found else None

    def querySelectorAll(self, selector):
        """Supports the simple selectors the dashboard uses: 'tag',
        '.class', '#id', 'tag.class' and descendant combinations 'a b'."""
        parts = js_str(selector).strip().split()

        def match(el: Element, part: str) -> bool:
            tag = None
            classes = []
            ident = None
            buf = ""
            mode = "tag"
            for ch in part + "\0":
                if ch in ".#\0":
                    if buf:
                        if mode == "tag":
                            tag = buf
                        elif mode == "class":
                            classes.append(buf)
                        else:
                            ident = buf
                    buf = ""
                    mode = "class" if ch == "." else ("id" if ch == "#"
                                                      else mode)
                else:
                    buf += ch
            if tag and el._tag.lower() != tag.lower():
                return False
            if ident and el.id != ident:
                return False
            return all(c in el.className.split() for c in classes)

        def collect(el: Element, idx: int) -> List[Element]:
            out = []
            for c in el.children:
                if match(c, parts[idx]):
                    if idx == len(parts) - 1:
                        out.append(c)
                    else:
                        out.extend(collect(c, idx + 1))
                out.extend(collect(c, idx))
            return out

        seen = []
        for e in collect(self, 0):
            if e not in seen:
                seen.append(e)
        return seen

    # --------------------------------------------------------------- layout
    def getBoundingClientRect(self):
        return {"left": 0.0, "top": 0.0, "right": 720.0, "bottom": 300.0,
                "width": 720.0, "height": 300.0, "x": 0.0, "y": 0.0}

    def focus(self):
        pass

    def blur(self):
        pass

    def click(self):
        pass

    def scrollIntoView(self, *_):
        pass

    def __repr__(self):
        return f"<{self._tag} id={self.id!r} class={self.className!r}>"


class _FragmentParser(HTMLParser):
    def __init__(self, document: "Document"):
        super().__init__(convert_charrefs=True)
        self.doc = document
        self.root: List[object] = []
        self.stack: List[Element] = []

    def _add(self, node):
        if self.stack:
            self.stack[-1].appendChild(node)
        else:
            self.root.append(node)

    @staticmethod
    def _apply_attrs(el, attrs):
        for k, v in attrs:
            v = v if v is not None else ""
            el.attributes[k] = v
            if k == "style":
                for decl in v.split(";"):
                    if ":" in decl:
                        prop, val = decl.split(":", 1)
                        el.style._props[prop.strip()] = val.strip()
            elif k == "value":
                # Real DOM: the value CONTENT attribute initializes the
                # value PROPERTY of form controls.
                el.value = v
            elif k in ("disabled", "checked", "open"):
                setattr(el, k, True)

    def _maybe_select_default(self, el):
        # Real DOM select semantics: the value is the `selected` option's,
        # else the FIRST option's — even when that value is "" — and an
        # option without a value attribute falls back to its text content.
        # Runs when the option CLOSES so the text fallback sees its text.
        if el._tag != "option":
            return
        value = el.attributes.get("value")
        el.value = value if value is not None else el.textContent
        for anc in reversed(self.stack):
            if anc._tag == "select":
                n_before = getattr(anc, "_option_count", 0)
                anc._option_count = n_before + 1
                if "selected" in el.attributes or n_before == 0:
                    anc.value = el.value
                break

    def handle_starttag(self, tag, attrs):
        el = Element(tag, self.doc)
        self._apply_attrs(el, attrs)
        self._add(el)
        if tag not in VOID_TAGS:
            self.stack.append(el)

    def handle_startendtag(self, tag, attrs):
        el = Element(tag, self.doc)
        self._apply_attrs(el, attrs)
        self._add(el)
        self._maybe_select_default(el)

    def handle_endtag(self, tag):
        while self.stack:
            top = self.stack.pop()
            if top._tag == "option":
                self._maybe_select_default(top)
            if top._tag == tag:
                break

    def handle_data(self, data):
        if data:
            self._add(TextNode(data))


def parse_fragment(markup: str, document: "Document") -> List[object]:
    p = _FragmentParser(document)
    p.feed(markup)
    p.close()
    return p.root


class Document:
    def __init__(self):
        self.documentElement = Element("html", self)
        self.head = Element("head", self)
        self.body = Element("body", self)
        self.documentElement.appendChild(self.head)
        self.documentElement.appendChild(self.body)
        self._listeners: Dict[str, list] = {}

    def load(self, markup: str):
        """Replace the tree with a parsed page (e.g. the real index.html)."""
        for node in parse_fragment(markup, self):
            if isinstance(node, Element) and node._tag.lower() == "html":
                self.documentElement = node
                heads = node.getElementsByTagName("head")
                bodies = node.getElementsByTagName("body")
                self.head = heads[0] if heads else Element("head", self)
                self.body = bodies[0] if bodies else Element("body", self)
                return
        raise ValueError("document markup has no <html> element")

    def createElement(self, tag):
        return Element(js_str(tag), self)

    def createElementNS(self, _ns, tag):
        return Element(js_str(tag), self, ns=js_str(_ns))

    def createTextNode(self, text):
        return TextNode(js_str(text))

    def getElementById(self, ident):
        ident = js_str(ident)

        def walk(el):
            for c in el.children:
                if c.id == ident:
                    return c
                found = walk(c)
                if found is not None:
                    return found
            return None

        return walk(self.documentElement)

    def querySelector(self, selector):
        return self.documentElement.querySelector(selector)

    def querySelectorAll(self, selector):
        return self.documentElement.querySelectorAll(selector)

    def addEventListener(self, name, handler, *_):
        self._listeners.setdefault(js_str(name), []).append(handler)

    def dispatch(self, interp, name: str, event: Optional[dict] = None):
        event = event or {}
        event.setdefault("type", name)
        event.setdefault("target", self.body)
        event.setdefault("preventDefault", lambda *_: UNDEFINED)
        for fn in self._listeners.get(name, []):
            interp.call_function(fn, [event])
