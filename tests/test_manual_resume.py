"""Unit tests: manual question-stack chunking (rag/app/manual.py) and
resume chunk assembly (rag/app/resume.py)."""

from ragflow_core16_spark.chunkers.manual import (docx_question_level,
                                                  docx_table_html,
                                                  manual_docx_chunks)
from ragflow_core16_spark.chunkers.resume_t import (parse_resume,
                                                    resume_to_doc, rm_space)

import pytest


# ---------------------------------------------------------------- manual
def test_question_level_heading_styles():
    assert docx_question_level("Intro", "Heading 1") == (1, "Intro")
    assert docx_question_level("Deep", "Heading 3") == (3, "Deep")
    assert docx_question_level("Body", "Normal") == (0, "Body")


def test_manual_stack_nesting():
    paras = [("Chapter A", "Heading 1"),
             ("Section A1", "Heading 2"),
             ("answer one", "Normal"),
             ("Section A2", "Heading 2"),
             ("answer two", "Normal"),
             ("Chapter B", "Heading 1"),
             ("answer three", "Normal")]
    cks = manual_docx_chunks(paras)
    # chunk 1: A + A1 + answer; chunk 2: A2 pops A1 but keeps A;
    # chunk 3: B pops everything
    assert cks[0] == "Chapter A\nSection A1\n\nanswer one"
    assert cks[1] == "Chapter A\nSection A2\n\nanswer two"
    assert cks[2] == "Chapter B\n\nanswer three"


def test_manual_no_heading_no_chunks():
    # answers with no question stack are dropped (manual.py:131-133)
    assert manual_docx_chunks([("just text", "Normal")]) == []


def test_table_html_colspan_merge():
    html = docx_table_html([["a", "a", "b"]])
    assert "<td colspan='2'>a</td>" in html and "<td>b</td>" in html
    assert docx_table_html([["x", "y"]]) == \
        "<table><tr><td>x</td><td>y</td></tr></table>"


# ---------------------------------------------------------------- resume
def test_parse_resume_fixture_and_stub():
    assert parse_resume(b'{"name_kwd": "n"}') == {"name_kwd": "n"}
    with pytest.raises(NotImplementedError):
        parse_resume(b"%PDF-1.4 real resume bytes")


def test_resume_doc_assembly():
    doc = resume_to_doc({
        "name_kwd": "Zhang San",
        "gender_kwd": "男",
        "age_int": 30,
        "position_name_tks": "data engineer",
        "degree_kwd": ["本科", "硕士"],
        "school_name_tks": ["some uni"],
    }, "r.json")
    # rmSpace keeps latin word spacing, strips CJK-adjacent spaces
    assert doc["title_txt"] == "Zhang San-男-data engineer-30-简历"
    # parenthesized annotations stripped from aliases (resume.py:153)
    assert "性别: 男" in doc["content_with_weight"]
    assert "（男，女）" not in doc["content_with_weight"]
    # forbidden multi-select field stays a list; 1-elem lists unwrap
    assert doc["degree_kwd"] == ["本科", "硕士"]
    assert doc["school_name_tks"] == "some uni"


def test_rm_space():
    assert rm_space("数据 工程师") == "数据工程师"
    assert rm_space("data engineer") == "data engineer"


# ------------------------------------------------------------ laws (docx)
def test_laws_docx_level_tree():
    from ragflow_core16_spark.chunkers.manual import laws_docx_sections
    paras = [("Law Title", "Heading 1"),
             ("Chapter One", "Heading 2"),
             ("Article 1. first rule", "Normal"),
             ("Article 2. second rule", "Normal"),
             ("Chapter Two", "Heading 2"),
             ("Article 3. third rule", "Normal")]
    secs = laws_docx_sections(paras)
    # the title section groups its chapter children; each chapter groups
    # its articles (laws.py:78-99)
    assert secs[0] == "Law Title\nChapter One\nChapter Two"
    assert "Chapter One\nArticle 1. first rule\nArticle 2. second rule" in secs
    assert "Chapter Two\nArticle 3. third rule" in secs


def test_laws_docx_plain_paragraphs_no_headings():
    from ragflow_core16_spark.chunkers.manual import laws_docx_sections
    secs = laws_docx_sections([("plain a", "Normal"), ("plain b", "Normal")])
    # all lines level 0 → every line is its own parent with no children
    assert secs == ["plain a", "plain b"]


# -------------------------------------------------------------- qa (docx)
def test_qa_docx_pairs():
    from ragflow_core16_spark.chunkers.qa import qa_from_docx
    paras = [("What is X?", "Heading 1"),
             ("X is a thing.", "Normal"),
             ("more detail", "Normal"),
             ("What is Y?", "Heading 1"),
             ("Y is other.", "Normal")]
    cks = qa_from_docx(paras, eng=True)
    assert len(cks) == 2
    assert cks[0].startswith("Question: What is X?\tAnswer:")
    assert "X is a thing." in cks[0] and "more detail" in cks[0]
    assert cks[1].startswith("Question: What is Y?\tAnswer:")


def test_qa_docx_nested_question_path():
    from ragflow_core16_spark.chunkers.qa import qa_from_docx
    paras = [("Topic", "Heading 1"),
             ("Sub question?", "Heading 2"),
             ("the body", "Normal")]
    cks = qa_from_docx(paras, eng=True)
    # question path = stack join: "Topic\nSub question?"
    assert cks == ["Question: Topic\nSub question?\tAnswer: the body"]


def test_qa_docx_rm_prefix_quirk():
    from ragflow_core16_spark.chunkers.qa import qa_from_docx
    # reference rmPrefix strips a leading "Answer"/"answer" word from the
    # accumulated answer (qa.py:279-284) — reproduced as-is
    cks = qa_from_docx([("Q?", "Heading 1"), ("answer body", "Normal")])
    assert cks == ["Question: Q?\tAnswer: body"]


# --------------------------------------------------------------- qa (pdf)
def test_index_int_variants():
    from ragflow_core16_spark.chunkers.qa import index_int
    assert index_int("7") == 7
    assert index_int("SEVEN") == 7
    assert index_int("二十三") == 23
    assert index_int("十") == 10
    assert index_int("IX") == 9
    assert index_int("garbage") == -1


def test_qbullets_category_elects_numeric():
    from ragflow_core16_spark.chunkers.qa import qbullets_category
    secs = ["1. What is A?", "body", "2. What is B?", "body"]
    q_bull, reg = qbullets_category(secs)
    assert q_bull >= 0 and reg.startswith("([0-9]{1,2})")


def test_qa_from_pdf_boxes_pairs():
    from ragflow_core16_spark.chunkers.qa import qa_from_pdf_boxes
    from ragflow_core16_spark.pdf.plain import build_pdf, extract_pdf_boxes
    pdf = build_pdf([["FAQ Doc", "1. What is A?", "first body.",
                      "2. What is B?", "second body."]], leading=24)
    cks = qa_from_pdf_boxes(extract_pdf_boxes(pdf))
    assert len(cks) == 2
    assert cks[0].startswith("Question: 1. What is A?\tAnswer:")
    assert "second body." in cks[1]
