"""Q&A chunk template — csv/tsv two-column pairs and markdown header-stack.

Re-implementation of ``rag/app/qa.py`` semantics:
  * ``beAdoc`` chunk text: ``"Question: q\\tAnswer: a"`` (EN) /
    ``"问题：q\\t回答：a"`` (CN), with Q/A prefixes stripped from inputs
    first (qa.py:279-301);
  * txt/csv: 2-column rows start a new pair; other rows append to the open
    answer; rows before any question are failures (qa.py:317-399);
  * markdown: ``#``-level heading stack forms the question path; body lines
    accumulate into the answer; a new heading flushes the previous Q&A
    (qa.py:415-447).  The reference renders answers through the ``markdown``
    lib; absent here, answers stay raw markdown text (divergence documented —
    affects only the answer rendering, not pairing logic).
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
                    res.append(qa_text(sum_question, last_answer, eng))
                last_answer = ""
            while question_stack and question_level <= level_stack[-1]:
                question_stack.pop()
                level_stack.pop()
            question_stack.append(question)
            level_stack.append(question_level)
    if last_answer.strip():
        sum_question = "\n".join(question_stack)
        if sum_question:
            res.append(qa_text(sum_question, last_answer, eng))
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
