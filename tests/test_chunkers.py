"""Chunker-rule unit tests (FIXTURES.md §3 inline fixtures)."""

from ragflow_core16_spark.chunkers.naive import naive_merge
from ragflow_core16_spark.chunkers.hierarchy import (
    bullets_category, hierarchical_merge, title_frequency, not_title,
    remove_contents_table, make_colon_as_title, is_english, is_chinese,
    BULLET_PATTERN,
)
from ragflow_core16_spark.textnorm.tokens import num_tokens_from_string


def _mk_section(n_tokens: int) -> str:
    """Build a section whose token count is close to n_tokens (words ≈ tokens
    for short ascii words under our counter)."""
    words = []
    i = 0
    while num_tokens_from_string(" ".join(words)) < n_tokens:
        words.append(f"w{i}")
        i += 1
    return " ".join(words)


class TestNaiveMerge:
    def test_empty(self):
        assert naive_merge([]) == []

    def test_single_small_section_one_chunk(self):
        assert naive_merge(["hello world"], 128) == ["hello world"]

    def test_close_late_boundary_rule(self):
        """FIXTURES.md §3.1: a chunk closes only after its count already
        EXCEEDS the budget — so [100, 30, 5, 200, 1] @128 groups as
        [100+30] (closes at 130>128), [5] stays until over, [5+200] no —
        verify against a direct simulation of the reference rule."""
        secs = [_mk_section(n) for n in (100, 30, 5, 200, 1)]
        counts = [num_tokens_from_string(s) for s in secs]
        chunks = naive_merge(secs, 128)
        # simulate the close-late rule on the true counts
        sim, cur = [], 0
        exp_n = 1
        for c in counts:
            if cur > 128:
                exp_n += 1
                cur = c
            else:
                cur += c
        assert len(chunks) == exp_n
        # no text lost, order preserved
        assert "".join(chunks) == "".join(secs)

    def test_boundary_exactly_at_budget_does_not_close(self):
        # budget=10, first section exactly 10 tokens → still open (rule is >)
        s10 = _mk_section(10)
        s1 = "tail"
        chunks = naive_merge([s10, s1], 10)
        assert len(chunks) == 1

    def test_boundary_over_budget_closes(self):
        s11 = _mk_section(11)
        chunks = naive_merge([s11, "tail"], 10)
        assert len(chunks) == 2 and chunks[1] == "tail"

    def test_tuple_sections_with_pos(self):
        big = _mk_section(20)
        chunks = naive_merge([(big, "@@POS##"), ("x", "@@P2##")], 10)
        # pos appended for ≥8-token sections when not already present
        assert "@@POS##" in chunks[0]
        # second section <8 tokens → pos dropped
        assert "@@P2##" not in "".join(chunks)


class TestBullets:
    def test_cn_legal_wins(self):
        secs = ["第一章 总则", "第一条 为了规范", "第二条 本法适用", "第二章 细则"]
        assert bullets_category(secs) == 0

    def test_en_chapter_wins(self):
        secs = ["Chapter I Introduction", "Section 1 Scope", "Article 1 Terms",
                "Chapter II Details"]
        assert bullets_category(secs) == 3

    def test_no_bullets(self):
        assert bullets_category(["plain text", "more text"]) == -1

    def test_title_frequency(self):
        bull = 3
        secs = [("Chapter I Intro", ""), ("Some body text here", ""),
                ("Chapter II More", ""), ("Other body", "")]
        most, levels = title_frequency(bull, secs)
        assert levels[0] == 1 and levels[2] == 1  # "Chapter" is pattern idx 1
        assert most == 1

    def test_not_title(self):
        assert not_title("this sentence, has a comma")
        assert not_title("word " * 13)
        assert not not_title("第三条")
        assert not not_title("Short Title")


class TestHierarchicalMerge:
    def test_cn_hierarchy(self):
        secs = ["第一章 总则", "第一条 为了规范借贷行为特制定本办法",
                "第二条 本办法适用于全部相关机构",
                "第二章 罚则", "第三条 违反本办法的处罚如下"]
        cks = hierarchical_merge(0, secs, 5)
        flat = ["\n".join(c) for c in cks if c]
        joined = "\n".join(flat)
        assert "第一条" in joined and "第三条" in joined
        # each 条 chunk carries its ancestor 章
        tiao1 = next(c for c in cks if any("第一条" in s for s in c))
        assert any("第一章" in s for s in tiao1)

    def test_empty_and_no_bullet(self):
        assert hierarchical_merge(-1, ["x"], 5) == []
        assert hierarchical_merge(0, [], 5) == []


class TestTocRemoval:
    def test_removes_contents_block(self):
        # NOTE: the reference's match is effectively case-sensitive — its
        # re.IGNORECASE lands in re.sub's `count` parameter
        # (rag/nlp/__init__.py:344-345) — so only lowercase "contents"
        # triggers removal; we mirror that behavior exactly.
        secs = ["contents", "Chapter I Introduction", "Chapter II Methods",
                "Chapter I Introduction", "The real body text starts here."]
        remove_contents_table(secs, eng=True)
        # TOC header + entries removed; body remains
        assert "The real body text starts here." in secs
        assert secs.count("Chapter I Introduction") == 1

    def test_no_toc_no_change(self):
        secs = ["A normal section", "Another one"]
        before = list(secs)
        remove_contents_table(secs, eng=True)
        assert secs == before


class TestMakeColonAsTitle:
    def test_splits_colon_heading(self):
        long_tail = "这是很长的一段解释文字" * 5
        secs = [(f"定义如下：{long_tail}。", "")]
        # reversed-split logic requires the part after 。 to be ≥32 chars
        secs2 = [(f"标题前缀：{long_tail}，继续补充足够长度的内容使得条件满足。", "")]
        make_colon_as_title(secs2)
        assert isinstance(secs2, list)

    def test_str_passthrough(self):
        assert make_colon_as_title(["plain"]) == ["plain"]


class TestLangHeuristics:
    def test_is_english(self):
        assert is_english(["This is a line", "Another line", "More text",
                           "Fourth line", "Fifth line"])
        assert not is_english(["中文", "中文", "中文"])

    def test_is_chinese(self):
        assert is_chinese("这是中文文本")
        assert not is_chinese("english text only")
