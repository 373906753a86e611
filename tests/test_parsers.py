"""Unit tests: txt/markdown/json parsers, qa/table/book/laws/one templates."""

import json

from ragflow_core16_spark.parsers.txt import TxtParser
from ragflow_core16_spark.parsers.markdown import MarkdownParser, md_table_to_html
from ragflow_core16_spark.parsers.jsonp import JsonParser
from ragflow_core16_spark.chunkers.qa import (qa_from_txt, qa_from_csv,
                                              qa_from_markdown, rm_prefix)
from ragflow_core16_spark.chunkers.table import (column_data_type, parse_csv,
                                                 table_chunks, trans_bool,
                                                 trans_datetime)
from ragflow_core16_spark.chunkers.templates import (chunk_book, chunk_laws,
                                                     chunk_one, chunk_naive)


class TestTxtParser:
    def test_simple_split(self):
        secs = TxtParser.parser_txt("a.b.c", 128, ".")
        assert [s for s, _ in secs] == ["abc"]  # packs into one (under budget)

    def test_multichar_backtick_delimiter(self):
        # FIXTURES.md §2: `##` is a two-char delimiter
        out = TxtParser.parser_txt("one##two##three", 0, "`##`")
        texts = [s for s, _ in out]
        assert texts == ["one", "two", "three"]

    def test_mixed_delimiters(self):
        out = TxtParser.parser_txt("a!b?c;d。e", 0, "!?;。")
        assert [s for s, _ in out] == ["a", "b", "c", "d", "e"]

    def test_unicode_unescape(self):
        # literal backslash-n in the delimiter string means newline
        out = TxtParser.parser_txt("x\ny", 0, "\\n")
        assert [s for s, _ in out] == ["x", "y"]

    def test_close_late_packing(self):
        # budget 0 → every section becomes its own chunk after the first
        out = TxtParser.parser_txt("aaa.bbb.ccc", 0, ".")
        assert len(out) == 3

    def test_type_error(self):
        import pytest
        with pytest.raises(TypeError):
            TxtParser.parser_txt(b"bytes", 128, ".")


MD = """# Title

Intro paragraph here.

| name | qty |
| ---- | --- |
| a | 1 |
| b | 2 |

tail text
<table><tr><td>x</td></tr></table>
"""


class TestMarkdownParser:
    def test_table_extraction(self):
        p = MarkdownParser(128)
        remainder, tables = p.extract_tables_and_remainder(MD)
        assert len(tables) == 2  # pipe table + html table
        assert "| name | qty |" in tables[0]
        assert "<table>" in tables[1]
        assert "| name" not in remainder

    def test_header_attach(self):
        p = MarkdownParser(128)
        sections, tbls = p(text="# Head\nbody line\nother")
        texts = [s for s, _ in sections]
        assert any(t.startswith("# Head\nbody line") for t in texts)

    def test_long_line_halved(self):
        p = MarkdownParser(1)  # 3×1 token budget → everything halves
        sections, _ = p(text="word " * 50)
        assert len(sections) >= 2

    def test_md_table_to_html(self):
        html = md_table_to_html("| a | b |\n| - | - |\n| 1 | 2 |")
        assert html.count("<th>") == 2 and html.count("<td>") == 2


class TestJsonParser:
    def test_small_json_one_chunk(self):
        out = JsonParser(2000)(text='{"a": 1, "b": "x"}')
        assert len(out) == 1
        assert json.loads(out[0]) == {"a": 1, "b": "x"}

    def test_lists_become_index_dicts(self):
        out = JsonParser(2000)(text='[1, 2]')
        assert json.loads(out[0]) == {"0": 1, "1": 2}

    def test_large_json_splits(self):
        data = {f"key{i}": "v" * 300 for i in range(40)}
        out = JsonParser(500)(text=json.dumps(data))
        assert len(out) > 1
        merged = {}
        for c in out:
            merged.update(json.loads(c))
        assert merged == data  # nothing lost

    def test_nested_preserved(self):
        data = {"a": {"b": {"c": [1, 2, 3]}}}
        out = JsonParser(2000)(text=json.dumps(data))
        assert json.loads(out[0])["a"]["b"]["c"] == {"0": 1, "1": 2, "2": 3}


class TestQA:
    def test_rm_prefix(self):
        assert rm_prefix("Question: what?") == "what?"
        assert rm_prefix("问题：为什么") == "为什么"
        assert rm_prefix("plain") == "plain"

    def test_txt_pairs(self):
        txt = "Q1\tA1\nQ2\tA2"
        res, fails = qa_from_txt(txt, eng=True)
        assert res == ["Question: Q1\tAnswer: A1", "Question: Q2\tAnswer: A2"]
        assert fails == []

    def test_txt_continuation_lines(self):
        txt = "Q1\tA1\nmore answer\nQ2\tA2"
        res, _ = qa_from_txt(txt, eng=True)
        assert "A1\nmore answer" in res[0]

    def test_txt_leading_garbage_fails(self):
        res, fails = qa_from_txt("garbage line\nQ\tA", eng=True)
        assert fails == [1] and len(res) == 1

    def test_csv_comma(self):
        res, _ = qa_from_csv("first thing,one answer\nsecond thing,two answers",
                             eng=True)
        assert len(res) == 2 and res[0].startswith("Question: first thing")

    def test_qa_prefix_stripped_like_reference(self):
        # "q "/"a " leading tokens are prefixes per rmPrefix (qa.py:279-283)
        res, _ = qa_from_csv("q one,a one", eng=True)
        assert res == ["Question: one\tAnswer: one"]

    def test_cn_prefixes(self):
        res, _ = qa_from_txt("问\t答", eng=False)
        assert res == ["问题：问\t回答：答"]

    def test_markdown_heading_stack(self):
        md = "# Top\n## Sub\nmain body\n## Sub2\nbody2"
        res = qa_from_markdown(md, eng=True)
        assert len(res) == 2
        assert "Top\nSub" in res[0] and "main body" in res[0]
        assert "Sub2" in res[1] and "Sub\n" not in res[1].split("\t")[0].replace("Top\n", "")

    def test_markdown_code_block_ignored(self):
        md = "# Q\nbody\n```\n# not a heading\n```\nmore"
        res = qa_from_markdown(md, eng=True)
        assert len(res) == 1 and "# not a heading" in res[0]


class TestTable:
    def test_column_type_votes(self):
        assert column_data_type(["1", "2", "3"])[1] == "int"
        assert column_data_type(["1.5", "2.25"])[1] == "float"
        assert column_data_type(["yes", "no", "yes"])[1] == "bool"
        assert column_data_type(["2024-01-01", "2023-05-06"])[1] == "datetime"
        assert column_data_type(["foo", "bar"])[1] == "text"

    def test_coercion_failures_none(self):
        vals, ty = column_data_type(["1", "2", "x"])
        assert ty == "int" and vals == [1, 2, None]

    def test_trans_bool(self):
        assert trans_bool("TRUE") == "yes" and trans_bool("×") == "no"

    def test_trans_datetime(self):
        assert trans_datetime("2024-01-02") == "2024-01-02 00:00:00"

    def test_parse_csv_arity(self):
        headers, rows, fails = parse_csv("a\tb\n1\t2\n3\n4\t5")
        assert headers == ["a", "b"] and len(rows) == 2 and fails == [1]

    def test_table_chunks(self):
        texts, fields, types = table_chunks(
            ["name", "count", "flag"],
            [["alpha", "3", "yes"], ["beta", "5", "no"]])
        assert texts[0] == "name:alpha; count:3; flag:yes"
        assert types == {"name": "text", "count": "int", "flag": "bool"}
        assert fields[0]["count_long"] == 3
        assert fields[0]["flag_kwd"] == "yes"

    def test_drop_id_columns(self):
        texts, fields, types = table_chunks(["id", "name"], [["1", "x"]])
        assert "id" not in types and texts == ["name:x"]


class TestSectionTemplates:
    CN = ["第一章 总则", "第一条 为了规范借贷行为特制定本办法",
          "第二条 本办法适用于相关机构", "第二章 罚则",
          "第三条 违反规定的处罚措施如下"]

    def test_book_hierarchical(self):
        cks = chunk_book(self.CN)
        assert cks and any("第一条" in c for c in cks)

    def test_book_fallback_naive(self):
        cks = chunk_book(["plain text one.", "plain text two."])
        assert cks == ["plain text one.plain text two."]

    def test_laws(self):
        cks = chunk_laws(self.CN)
        assert cks and all(isinstance(c, str) for c in cks)

    def test_one(self):
        assert chunk_one(["a", "", "b"]) == ["a\nb"]
        assert chunk_one([]) == []

    def test_naive(self):
        assert chunk_naive(["hello", "world"]) == ["helloworld"]


class TestLegacyDoc:
    """Native CFB + Word 97 piece-table extraction (parsers/doc.py)."""

    def test_round_trip_ascii(self):
        from ragflow_core16_spark.parsers.doc import (build_doc, doc_lines,
                                                      extract_doc_text)
        t = "hello legacy word\nsecond line here\nthird"
        assert extract_doc_text(build_doc(t)) == t + "\n"
        assert doc_lines(build_doc(t)) == t.split("\n")

    def test_round_trip_cjk(self):
        from ragflow_core16_spark.parsers.doc import build_doc, extract_doc_text
        t = "中文内容测试\nmixed 行 line"
        assert extract_doc_text(build_doc(t)) == t + "\n"

    def test_multi_sector_text(self):
        from ragflow_core16_spark.parsers.doc import build_doc, extract_doc_text
        t = "\n".join(f"line number {i} with several words" for i in range(400))
        assert extract_doc_text(build_doc(t)) == t + "\n"

    def test_cfb_streams_listed(self):
        from ragflow_core16_spark.parsers.doc import build_doc, read_cfb
        streams = read_cfb(build_doc("x"))
        assert set(streams) == {"WordDocument", "1Table"}

    def test_compressed_piece_decodes_cp1252(self):
        # rewrite the single piece as fCompressed with cp1252 bytes
        import struct
        from ragflow_core16_spark.parsers.doc import build_doc, extract_doc_text
        blob = bytearray(build_doc("abc"))
        # locate the PCD inside the file: plc = CP(0), CP(n), PCD(8)
        clx_sig = b"\x02" + struct.pack("<I", 8 + 8)
        i = blob.find(clx_sig)
        assert i > 0
        plc_off = i + 5
        n_chars = struct.unpack_from("<I", blob, plc_off + 4)[0]
        # point the compressed fc at byte offset 1024 (fc = 2*1024 | bit30)
        struct.pack_into("<HIH", blob, plc_off + 8, 0,
                         (1024 << 1) | 0x40000000, 0)
        # overwrite the text region with cp1252 bytes
        wd_region = blob.find(struct.pack("<H", 0xA5EC))
        body = ("caf\xe9" + "x" * (n_chars - 4)).encode("cp1252")
        blob[wd_region + 1024:wd_region + 1024 + n_chars] = body
        out = extract_doc_text(bytes(blob))
        assert out.startswith("caf\xe9")

    def test_prc_blocks_skipped(self):
        # prepend a Prc (0x01 + cb + grpprl) before the Pcdt in the table
        import struct
        from ragflow_core16_spark.parsers.doc import (build_doc, read_cfb,
                                                      extract_doc_text)
        blob = bytearray(build_doc("prc skip test line"))
        streams = read_cfb(bytes(blob))
        clx = streams["1Table"]
        end = 5 + struct.unpack_from("<I", clx, 1)[0]
        prc = b"\x01" + struct.pack("<H", 4) + b"\x00\x00\x00\x00"
        new_clx = prc + clx[:end]
        # table stream bytes appear verbatim in the file (flat chain)
        i = blob.find(clx[:end])
        # the table copy is the LAST occurrence (wd text precedes it)
        i = blob.rfind(clx[:end])
        blob[i:i + len(new_clx)] = new_clx
        # grow lcbClx in the FIB
        wd_off = blob.find(struct.pack("<H", 0xA5EC))
        struct.pack_into("<I", blob, wd_off + 0x01A6, len(new_clx))
        assert extract_doc_text(bytes(blob)).startswith("prc skip test line")
