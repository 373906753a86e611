"""Lightweight DOM built on stdlib ``html.parser.HTMLParser``.

The reference's HTML path (``deepdoc/parser/html_parser.py:41-50``) relies on
lxml via readability-lxml + html-text.  Neither lxml nor those libraries exist
in this environment, so the extraction engine carries its own from-scratch DOM:
tolerant of malformed markup (unclosed tags, stray end tags — FIXTURES.md §1.1
injects 10% malformed pages), with the implicit-close rules browsers apply to
``p``/``li``/``tr``/``td``/``th``/``option``.

This code runs *inside* Arrow-batched pandas UDFs only — never per-row at the
DataFrame level.  It is pure Python with no per-node regex; parse cost is
O(bytes) and dominates the extraction UDF profile, which is expected (same as
lxml parse dominating the reference's profile).
"""

from __future__ import annotations

from html.parser import HTMLParser

VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

# tag → set of open ancestor tags it implicitly closes (nearest first)
_IMPLICIT_CLOSE = {
    "p": {"p"},
    "li": {"li"},
    "tr": {"tr", "td", "th"},
    "td": {"td", "th"},
    "th": {"td", "th"},
    "option": {"option"},
    "dd": {"dd", "dt"},
    "dt": {"dd", "dt"},
    "thead": {"tr", "td", "th"},
    "tbody": {"tr", "td", "th", "thead"},
}

# block-level elements whose start implicitly closes an open <p>
_P_CLOSERS = frozenset(
    "address article aside blockquote div dl fieldset figure footer form "
    "h1 h2 h3 h4 h5 h6 header hr main nav ol p pre section table ul".split()
)


class Node:
    __slots__ = ("tag", "attrs", "children", "parent")

    def __init__(self, tag: str, attrs=None, parent=None):
        self.tag = tag
        self.attrs = dict(attrs or {})
        self.children: list = []  # Node or str (text)
        self.parent = parent

    # -- tree ops ---------------------------------------------------------
    def append(self, child):
        if isinstance(child, Node):
            child.parent = self
        self.children.append(child)

    def remove_child(self, child):
        self.children = [c for c in self.children if c is not child]
        if isinstance(child, Node):
            child.parent = None

    def drop(self):
        if self.parent is not None:
            self.parent.remove_child(self)

    def iter(self):
        """Depth-first over element nodes (self included).  Iterative —
        the generator-per-level form dominated the extraction profile.
        (``type(c) is Node`` instead of isinstance: Node is final, and this
        loop is the hottest line of the whole extraction UDF.)"""
        stack = [self]
        while stack:
            n = stack.pop()
            yield n
            for c in reversed(n.children):
                if type(c) is Node:
                    stack.append(c)

    def find_all(self, *tags):
        """Non-generator DFS: one flat loop, no per-node genexpr frames."""
        out = []
        stack = [self]
        while stack:
            n = stack.pop()
            if n.tag in tags:
                out.append(n)
            for c in reversed(n.children):
                if type(c) is Node:
                    stack.append(c)
        return out

    def count_tags(self, counts: dict) -> dict:
        """Increment ``counts[tag]`` for every descendant (self included)
        whose tag is a key — the 5-tag sanitize census in ONE traversal."""
        stack = [self]
        while stack:
            n = stack.pop()
            if n.tag in counts:
                counts[n.tag] += 1
            for c in n.children:
                if type(c) is Node:
                    stack.append(c)
        return counts

    def find(self, tag):
        for n in self.iter():
            if n.tag == tag:
                return n
        return None

    # -- text -------------------------------------------------------------
    def text_content(self) -> str:
        out = []
        stack = [self]
        while stack:
            n = stack.pop()
            if isinstance(n, str):
                out.append(n)
            else:
                stack.extend(reversed(n.children))
        return "".join(out)

    def get(self, attr, default=""):
        return self.attrs.get(attr, default)

    def __repr__(self):
        return f"<Node {self.tag} {self.attrs.get('class', '')!r}>"


# Browsers cap tree depth (~512); we cap at 256 so the recursive
# serialize/clone/extract passes stay far from Python's recursion limit even
# on adversarial pages. Elements beyond the cap attach flat to the current
# node instead of nesting.
MAX_DEPTH = 256


class _DomBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node("#document")
        self.stack = [self.root]

    # current open element
    @property
    def top(self) -> Node:
        return self.stack[-1]

    def _close_implicit(self, tag: str):
        closers = _IMPLICIT_CLOSE.get(tag)
        if tag in _P_CLOSERS and self.top.tag == "p":
            self.stack.pop()
            return
        if closers and self.top.tag in closers:
            self.stack.pop()
            # td/th after closing may expose a tr that a new tr must close too
            if tag == "tr" and self.top.tag == "tr":
                self.stack.pop()

    def handle_starttag(self, tag, attrs):
        tag = tag.lower()
        if tag in ("script", "style"):
            # HTMLParser delivers raw script/style content via handle_data;
            # we keep the node so cleaners can drop it subtree-wise.
            pass
        self._close_implicit(tag)
        top = self.stack[-1]
        node = Node(tag, attrs, top)
        top.children.append(node)   # parent already set by the constructor
        if tag not in VOID_TAGS and len(self.stack) < MAX_DEPTH:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        tag = tag.lower()
        top = self.stack[-1]
        top.children.append(Node(tag, attrs, top))

    def handle_endtag(self, tag):
        tag = tag.lower()
        if tag in VOID_TAGS:
            return
        # pop to the nearest matching open tag; ignore stray end tags
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(data)

    def error(self, message):  # pragma: no cover - py<3.10 compat hook
        pass


def parse_html(text: str) -> Node:
    """Parse (possibly malformed) HTML into a DOM; never raises on bad
    markup — worst case the content lands as text under a wrong parent,
    mirroring lenient browser behavior."""
    b = _DomBuilder()
    try:
        b.feed(text)
        b.close()
    except Exception:
        # extremely malformed input: salvage whatever tree was built
        pass
    return b.root


def inner_html(node: Node) -> str:
    """Serialize children of node back to HTML (used by summary())."""
    out = []
    _serialize_children(node, out)
    return "".join(out)


def _serialize_children(node: Node, out: list):
    from html import escape
    for c in node.children:
        if isinstance(c, str):
            out.append(escape(c, quote=False))
        else:
            attrs = "".join(f' {k}="{escape(str(v or ""))}"' for k, v in c.attrs.items())
            if c.tag in VOID_TAGS:
                out.append(f"<{c.tag}{attrs}/>")
            else:
                out.append(f"<{c.tag}{attrs}>")
                _serialize_children(c, out)
                out.append(f"</{c.tag}>")
