"""Arc90 readability main-content extraction, implemented from scratch.

The reference delegates boilerplate stripping to readability-lxml 0.8.1
(``deepdoc/parser/html_parser.py:45-47``: ``Document(txt).summary(
html_partial=True)``).  That library is a public implementation of the Arc90
"Readability" text-density + link-density scoring algorithm; this module is a
native re-implementation of that published algorithm over our stdlib DOM
(no lxml available here):

  1. remove script/style; drop "unlikely candidate" nodes by class/id regex;
  2. score every <p>/<td>/<pre> by text length + comma count, propagating to
     parent (x1) and grandparent (x0.5), with tag + class/id weight priors;
  3. penalize candidates by link density;
  4. pick the best candidate, re-attach qualifying siblings;
  5. conditional cleanup of low-signal lists/tables/divs in the article.

Pure Python, runs only inside Arrow-batched UDFs.  Deterministic: regexes and
thresholds are the published Arc90 constants.
"""

from __future__ import annotations

import re

from .dom import Node, parse_html, inner_html

UNLIKELY_RE = re.compile(
    r"combx|comment|community|disqus|extra|foot|header|menu|remark|rss|"
    r"shoutbox|sidebar|sponsor|ad-break|agegate|pagination|pager|popup|"
    r"tweet|twitter|nav|banner|advert|\bad\b|\bads\b",
    re.I,
)
MAYBE_RE = re.compile(r"and|article|body|column|main|shadow", re.I)
POSITIVE_RE = re.compile(
    r"article|body|content|entry|hentry|main|page|pagination|post|text|blog|story", re.I
)
NEGATIVE_RE = re.compile(
    r"combx|comment|com-|contact|foot|footer|footnote|masthead|media|meta|"
    r"outbrain|promo|related|scroll|shoutbox|sidebar|sponsor|shopping|tags|"
    r"tool|widget|nav|ad-|advert",
    re.I,
)
_DIV_TO_P_BLOCKS = ("a", "blockquote", "dl", "div", "img", "ol", "p", "pre", "table", "ul")

MIN_TEXT_LEN = 25


def _norm_text(n: Node) -> str:
    return re.sub(r"\s+", " ", n.text_content()).strip()


def _class_weight(n: Node) -> float:
    w = 0.0
    for attr in ("class", "id"):
        v = n.get(attr)
        if v:
            if NEGATIVE_RE.search(v):
                w -= 25
            if POSITIVE_RE.search(v):
                w += 25
    return w


def _score_node(n: Node) -> float:
    score = _class_weight(n)
    t = n.tag
    if t == "div":
        score += 5
    elif t in ("pre", "td", "blockquote"):
        score += 3
    elif t in ("address", "ol", "ul", "dl", "dd", "dt", "li", "form"):
        score -= 3
    elif t in ("h1", "h2", "h3", "h4", "h5", "h6", "th"):
        score -= 5
    return score


def _link_density(n: Node) -> float:
    total = len(_norm_text(n))
    if total == 0:
        return 0.0
    link_len = sum(len(_norm_text(a)) for a in n.find_all("a"))
    return min(link_len / total, 1.0)


class Document:
    """API-compatible subset of readability.Document: title() + summary()."""

    def __init__(self, html: str):
        self._raw = html
        self._root = None
        self._title: str | None = None

    def _dom(self) -> Node:
        if self._root is None:
            self._root = parse_html(self._raw)
        return self._root

    def title(self) -> str:
        if self._title is None:
            t = self._dom().find("title")
            self._title = _norm_text(t) if t is not None else ""
        return self._title if self._title else "[no-title]"

    # ------------------------------------------------------------------
    def summary(self, html_partial: bool = True) -> str:
        """Return the main-article fragment as an HTML string.

        html_partial=True (the reference's mode) omits any wrapping
        body/html — we return the best candidate subtree + joined siblings
        inside a single <div>."""
        return inner_html(self.summary_node())

    def summary_node(self) -> Node:
        """Main-article fragment as a DOM node (fast path: callers that only
        need text extract it directly from this node, skipping the
        serialize→re-parse round trip)."""
        root = parse_html(self._raw)  # fresh tree; we mutate it
        # reuse this parse for title() too (single-parse fast path)
        if self._title is None:
            t = root.find("title")
            self._title = _norm_text(t) if t is not None else ""
        for bad in root.find_all("script", "style", "noscript", "iframe", "form",
                                 "button", "input", "textarea", "select"):
            bad.drop()
        self._remove_unlikely(root)
        self._divs_to_paragraphs(root)
        candidates = self._score_paragraphs(root)
        if not candidates:
            return root.find("body") or root
        best = max(candidates.items(), key=lambda kv: kv[1])
        best_node, best_score = best
        article = self._join_siblings(best_node, best_score, candidates)
        self._sanitize(article, candidates)
        return article

    # ------------------------------------------------------------------
    def _remove_unlikely(self, root: Node):
        for n in list(root.iter()):
            if n.tag in ("#document", "html", "body"):
                continue
            attrs = f"{n.get('class', '')} {n.get('id', '')}"
            if attrs.strip() and UNLIKELY_RE.search(attrs) and not MAYBE_RE.search(attrs):
                n.drop()

    def _divs_to_paragraphs(self, root: Node):
        for n in root.find_all("div"):
            if not any(isinstance(c, Node) and c.tag in _DIV_TO_P_BLOCKS for c in n.children):
                n.tag = "p"

    def _score_paragraphs(self, root: Node) -> dict:
        candidates: dict[Node, float] = {}
        ordered: list[Node] = []
        for p in root.find_all("p", "pre", "td"):
            parent = p.parent
            if parent is None:
                continue
            grand = parent.parent
            text = _norm_text(p)
            if len(text) < MIN_TEXT_LEN:
                continue
            score = 1.0 + text.count(",") + text.count("，") + min(len(text) / 100.0, 3.0)
            for node, share in ((parent, 1.0), (grand, 0.5)):
                if node is None or node.tag in ("#document", "html"):
                    continue
                if node not in candidates:
                    candidates[node] = _score_node(node)
                    ordered.append(node)
                candidates[node] += score * share
        for node in ordered:
            candidates[node] *= (1.0 - _link_density(node))
        return candidates

    def _join_siblings(self, best: Node, best_score: float, candidates: dict) -> Node:
        article = Node("div", {"class": "article"})
        threshold = max(10.0, best_score * 0.2)
        parent = best.parent
        siblings = parent.children if parent is not None else [best]
        for sib in siblings:
            if not isinstance(sib, Node):
                continue
            keep = False
            if sib is best:
                keep = True
            elif candidates.get(sib, -1e9) >= threshold:
                keep = True
            elif sib.tag == "p":
                text = _norm_text(sib)
                ld = _link_density(sib)
                if len(text) > 80 and ld < 0.25:
                    keep = True
                elif len(text) <= 80 and ld == 0 and re.search(r"[.。]( |$)", text):
                    keep = True
            if keep:
                article.append(_clone(sib))
        if not article.children:
            article.append(_clone(best))
        return article

    def _sanitize(self, article: Node, candidates: dict):
        # conditional cleaning of low-signal containers inside the article
        for n in list(article.iter()):
            if n is article or n.tag not in ("table", "ul", "div", "section"):
                continue
            weight = _class_weight(n)
            if weight < 0:
                n.drop()
                continue
            text = _norm_text(n)
            if text.count(",") + text.count("，") < 10:
                ld = _link_density(n)
                if weight < 25 and ld > 0.2:
                    n.drop()
                elif weight >= 25 and ld > 0.5:
                    n.drop()


def _clone(n):
    if isinstance(n, str):
        return n
    c = Node(n.tag, dict(n.attrs))
    for ch in n.children:
        c.append(_clone(ch))
    return c
