"""Q&A chunk template — csv/tsv two-column pairs and markdown header-stack.

Re-implementation of ``rag/app/qa.py`` semantics:
  * ``beAdoc`` chunk text: ``"Question: q\\tAnswer: a"`` (EN) /
    ``"问题：q\\t回答：a"`` (CN), with Q/A prefixes stripped from inputs
    first (qa.py:279-301);
  * txt/csv: 2-column rows start a new pair; other rows append to the open
    answer; rows before any question are failures (qa.py:317-399);
  * markdown: ``#``-level heading stack forms the question path; body lines
    accumulate into the answer; a new heading flushes the previous Q&A
    (qa.py:415-447).  Answers are rendered to HTML like the reference's
    ``markdown(..., extensions=['tables'])`` via the native subset renderer
    (``parsers/markdown.py::md_render``; inline emphasis stays verbatim —
    documented subset).
"""

from __future__ import annotations

import csv as _csv
import io
import re


def rm_prefix(txt: str) -> str:
    return re.sub(
        r"^(问题|答案|回答|user|assistant|Q|A|Question|Answer|问|答)[\t:： ]+",
        "", txt.strip(), flags=re.IGNORECASE)


def qa_text(q: str, a: str, eng: bool) -> str:
    qprefix = "Question: " if eng else "问题："
    aprefix = "Answer: " if eng else "回答："
    return "\t".join([qprefix + rm_prefix(q), aprefix + rm_prefix(a)])


def md_question_level(s: str):
    m = re.match(r"#*", s)
    return (len(m.group(0)), s.lstrip("#").lstrip()) if m else (0, s)


def qa_from_txt(txt: str, eng: bool = True,
                delimiter: str = "\t") -> tuple[list[str], list[int]]:
    """→ (chunks, failed_line_numbers). Tab-separated two-column pairs."""
    lines = txt.split("\n")
    question, answer = "", ""
    res, fails = [], []
    i = 0
    while i < len(lines):
        arr = lines[i].split(delimiter)
        if len(arr) != 2:
            if question:
                answer += "\n" + lines[i]
            else:
                fails.append(i + 1)
        else:
            if question and answer:
                res.append(qa_text(question, answer, eng))
            question, answer = arr
        i += 1
    if question:
        res.append(qa_text(question, answer, eng))
    return res, fails


def qa_from_csv(txt: str, eng: bool = True) -> tuple[list[str], list[int]]:
    lines = txt.split("\n")
    delimiter = "\t" if any("\t" in ln for ln in lines) else ","
    question, answer = "", ""
    res, fails = [], []
    reader = _csv.reader(io.StringIO(txt), delimiter=delimiter)
    for i, row in enumerate(reader):
        if len(row) != 2:
            if question:
                answer += "\n" + (lines[i] if i < len(lines) else "")
            else:
                fails.append(i + 1)
        else:
            if question and answer:
                res.append(qa_text(question, answer, eng))
            question, answer = row
    if question:
        res.append(qa_text(question, answer, eng))
    return res, fails


def qa_from_markdown(txt: str, eng: bool = True) -> list[str]:
    """Markdown heading-stack Q&A; answers are RENDERED to HTML like the
    reference's ``markdown(last_answer, extensions=['tables'])``
    (rag/app/qa.py:434,446) via the native subset renderer."""
    from ..parsers.markdown import md_render
    lines = txt.split("\n")
    last_answer = ""
    question_stack: list[str] = []
    level_stack: list[int] = []
    res = []
    code_block = False
    for line in lines:
        if line.strip().startswith("```"):
            code_block = not code_block
        question_level, question = 0, ""
        if not code_block:
            question_level, question = md_question_level(line)
        if not question_level or question_level > 6:  # body line
            last_answer = f"{last_answer}\n{line}"
        else:
            if last_answer.strip():
                sum_question = "\n".join(question_stack)
                if sum_question:
                    res.append(qa_text(sum_question, md_render(last_answer),
                                       eng))
                last_answer = ""
            while question_stack and question_level <= level_stack[-1]:
                question_stack.pop()
                level_stack.pop()
            question_stack.append(question)
            level_stack.append(question_level)
    if last_answer.strip():
        sum_question = "\n".join(question_stack)
        if sum_question:
            res.append(qa_text(sum_question, md_render(last_answer), eng))
    return res


def qa_from_docx(paragraphs: list[tuple[str, str]],
                 eng: bool = True) -> list[str]:
    """Docx Q&A route (rag/app/qa.py:200-239): "Heading N"-styled
    paragraphs are questions; body paragraphs accumulate into the open
    answer; each new question flushes (question-stack, answer) as a
    ``qa_text`` chunk.  Same stack mechanics as the manual template
    (images omitted — no codecs in this engine)."""
    from .manual import docx_question_level
    last_answer = ""
    question_stack: list[str] = []
    level_stack: list[int] = []
    out: list[str] = []

    def flush():
        nonlocal last_answer
        if last_answer:
            sum_question = "\n".join(question_stack)
            if sum_question:
                out.append(qa_text(sum_question, last_answer, eng))
            last_answer = ""

    for text, style in paragraphs:
        question_level, p_text = 0, ""
        if text.strip():
            question_level, p_text = docx_question_level(text, style)
        if not question_level or question_level > 6:  # not a question
            last_answer = f"{last_answer}\n{p_text}"
        else:
            flush()
            i = question_level
            while question_stack and i <= level_stack[-1]:
                question_stack.pop()
                level_stack.pop()
            question_stack.append(p_text)
            level_stack.append(question_level)
    flush()
    return out


# ---------------------------------------------------------- pdf Q&A route
# question-bullet taxonomy (rag/nlp/__init__.py:74-86)
QUESTION_PATTERN = [
    r"第([零一二三四五六七八九十百0-9]+)问",
    r"第([零一二三四五六七八九十百0-9]+)条",
    r"[\(（]([零一二三四五六七八九十百]+)[\)）]",
    r"第([0-9]+)问",
    r"第([0-9]+)条",
    r"([0-9]{1,2})[\. 、]",
    r"([零一二三四五六七八九十百]+)[ 、]",
    r"[\(（]([0-9]{1,2})[\)）]",
    r"QUESTION (ONE|TWO|THREE|FOUR|FIVE|SIX|SEVEN|EIGHT|NINE|TEN)",
    r"QUESTION (I+V?|VI*|XI|IX|X)",
    r"QUESTION ([0-9]+)",
]

_EN_WORDS = {"one": 1, "two": 2, "three": 3, "four": 4, "five": 5,
             "six": 6, "seven": 7, "eight": 8, "nine": 9, "ten": 10}
_CN_DIGITS = {"零": 0, "一": 1, "二": 2, "三": 3, "四": 4, "五": 5,
              "六": 6, "七": 7, "八": 8, "九": 9}
_ROMAN = {"I": 1, "V": 5, "X": 10, "L": 50, "C": 100, "D": 500, "M": 1000}


def _cn2an(s: str) -> int:
    """Chinese numeral → int for the 零-百 range of QUESTION_PATTERN."""
    if not s or any(c not in _CN_DIGITS and c not in "十百" for c in s):
        raise ValueError(s)
    total, num = 0, 0
    for c in s:
        if c in _CN_DIGITS:
            num = num * 10 + _CN_DIGITS[c]
        elif c == "十":
            total += (num or 1) * 10
            num = 0
        elif c == "百":
            total += (num or 1) * 100
            num = 0
    return total + num


def _roman2an(s: str) -> int:
    if not s or any(c not in _ROMAN for c in s.upper()):
        raise ValueError(s)
    vals = [_ROMAN[c] for c in s.upper()]
    return sum(-v if i + 1 < len(vals) and v < vals[i + 1] else v
               for i, v in enumerate(vals))


def index_int(index_str: str) -> int:
    """Bullet index parse: int / English word / Chinese numeral / roman
    (rag/nlp/__init__.py:133-148; the reference delegates to the
    word2number / cn2an / roman libraries — native equivalents here)."""
    try:
        return int(index_str)
    except (ValueError, TypeError):
        pass
    if index_str and index_str.lower() in _EN_WORDS:
        return _EN_WORDS[index_str.lower()]
    try:
        return _cn2an(index_str)
    except (ValueError, TypeError):
        pass
    try:
        return _roman2an(index_str)
    except (ValueError, TypeError):
        return -1


def _not_bullet(line: str) -> bool:
    patt = [r"0", r"[0-9]+ +[0-9~个只-]", r"[0-9]+\.{2,}"]
    return any(re.match(r, line) for r in patt)


def qbullets_category(sections: list[str]) -> tuple[int, str]:
    """Elect the question-bullet pattern by per-pattern hit presence
    (rag/nlp/__init__.py:151-165)."""
    hits = [0] * len(QUESTION_PATTERN)
    for i, pro in enumerate(QUESTION_PATTERN):
        for sec in sections:
            if re.match(pro, sec) and not _not_bullet(sec):
                hits[i] += 1
                break
    maxium, res = 0, -1
    for i, h in enumerate(hits):
        if h <= maxium:
            continue
        res, maxium = i, h
    return res, QUESTION_PATTERN[res] if res >= 0 else ""


def has_qbullet(reg: str, box: dict, last_box: dict, last_index: int,
                last_bull, bull_x0_list: list):
    """x0/top-aware question-bullet match (rag/nlp/__init__.py:89-130):
    indent drift vs the running bullet-x0 average, monotone index check,
    interrogative fallback for out-of-order indices."""
    section, last_section = box["text"], last_box["text"]
    q_reg = r"(\w|\W)*?(?:？|\?|\n|$)+"
    full_reg = reg + q_reg
    has_bull = re.match(full_reg, section)
    if has_bull:
        if "x0" not in last_box:
            last_box["x0"] = box["x0"]
        if "top" not in last_box:
            last_box["top"] = box["top"]
        if last_bull and box["x0"] - last_box["x0"] > 10:
            return None, last_index
        if not last_bull and box["x0"] >= last_box["x0"] \
                and box["top"] - last_box["top"] < 20:
            return None, last_index
        avg_bull_x0 = (sum(bull_x0_list) / len(bull_x0_list)
                       if bull_x0_list else box["x0"])
        if box["x0"] - avg_bull_x0 > 10:
            return None, last_index
        index = index_int(has_bull.group(1))
        if last_section and last_section[-1] in ":：":
            return None, last_index
        if not last_index or index >= last_index:
            bull_x0_list.append(box["x0"])
            return has_bull, index
        if section and section[-1] in "?？":
            bull_x0_list.append(box["x0"])
            return has_bull, index
        if box.get("layout_type") == "title":
            bull_x0_list.append(box["x0"])
            return has_bull, index
        pure_section = section.lstrip(re.match(reg, section).group()).lower()
        ask_reg = r"(what|when|where|how|why|which|who|whose|为什么|为啥|哪)"
        if re.match(ask_reg, pure_section):
            bull_x0_list.append(box["x0"])
            return has_bull, index
    return None, last_index


def qa_from_pdf_boxes(boxes: list[dict], eng: bool = True) -> list[str]:
    """Box-driven Q&A pairing (rag/app/qa.py:109-170, table interleaving
    omitted — tables come from the model-gated TSR stage): a bullet match
    starts a new question; following boxes append to the open answer."""
    sections = [b["text"] for b in boxes]
    q_bull, reg = qbullets_category(sections)
    if q_bull == -1:
        raise ValueError("Unable to recognize Q&A structure.")
    qai_list = []
    bull_x0_list: list = []
    last_q, last_a = "", ""
    last_index = -1
    last_box: dict = {"text": ""}
    last_bull = None
    for box in boxes:
        section = box["text"]
        bull, index = has_qbullet(reg, box, last_box, last_index,
                                  last_bull, bull_x0_list)
        last_box, last_index, last_bull = box, index, bull
        if not bull:
            if last_q:
                last_a = f"{last_a}{section}"
            continue
        if last_q:
            qai_list.append((last_q, last_a))
            last_q, last_a = "", ""
        last_q = bull.group()
        _, end = bull.span()
        last_a = section[end:]
    if last_q:
        qai_list.append((last_q, last_a))
    return [qa_text(q, a, eng) for q, a in qai_list]


def qa_from_xlsx(binary: bytes, eng: bool = True) -> list[str]:
    """Excel 2-col Q&A route (reference rag/app/qa.py:36-75): per row, the
    first non-empty cell is the question, the second the answer; rows
    without both are skipped.  Language election is a deterministic
    parameter here (the reference samples 30 random pairs —
    nondeterministic; documented divergence, pair text unaffected)."""
    from ..parsers.ooxml import xlsx_sheets
    res = []
    for _name, rows in xlsx_sheets(binary):
        for r in rows:
            q, a = "", ""
            for cell in r:
                # reference uses `if not cell.value: continue` — ALL falsy
                # values skip (numeric 0, False, empty), not just None/""
                if not cell or not str(cell):
                    continue
                if not q:
                    q = str(cell)
                elif not a:
                    a = str(cell)
                else:
                    break
            if q and a:
                res.append(qa_text(q, a, eng))
    return res
