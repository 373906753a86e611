"""Driver-scale spot checks: the driver compares at sf0.01, and some
oracle arithmetic is scale-sensitive (packer boundaries, garbage-line
edges, digit counts), so a subset of the scale-sensitive queries re-runs
here at sf0.01.  The full 64-query sweep stays in the round verification
(it costs ~90 s); these eight cover every distinct derivation mechanism:
recursive packer, two-level pack, char-size splitter, fused sections,
PDF routes, and the garbage-line rule that only fires on 1-char words."""

import pytest

import __spark_entry__ as E
from oracle_compare import compare

SF = "/root/testdata/sf0.01"
SCALE_SENSITIVE = [
    "txt_template",           # recursive greedy packer
    "email_template",         # two-level pack + header fusion constant
    "json_template",          # char-size splitter boundaries
    "markdown_template",      # fused heading sections
    "docx_template",          # packer + table chunk indexing
    "presentation_template",  # len<3 garbage rule (1-char words)
    "paper_pdf_template",     # abstract >64-char election edge
    "sequence_pack",          # window cumsum spans
]
_REG = E._registry()


@pytest.mark.parametrize("name", SCALE_SENSITIVE)
def test_driver_scale_parity(spark, name):
    fn, sql = _REG[name]
    r = compare(spark, SF, name, fn, sql)
    assert r["cols_match"], f"cols {r['spark_cols']} != {r['duck_cols']}"
    assert r["rows_match"], f"rows {r['n_spark']} != {r['n_duck']}"
    assert r["values_match"], f"first diff: {r['first_diff']}"


# doc_id digit-run sensitivity: sf0.1 is the first scale with 4-digit ids,
# where 'Document <id>' / 'sender-<id>@' headers cost ceil(digits/3) token
# pieces instead of the sf0.01-fitted single piece — these two oracles
# carry that correction and are pinned at sf0.1 here (regression for the
# r2 fix; the rest of the registry was sweep-verified digit-insensitive)
DIGIT_SENSITIVE = ["docx_template", "email_template"]


@pytest.mark.parametrize("name", DIGIT_SENSITIVE)
def test_four_digit_id_parity(spark, name):
    fn, sql = _REG[name]
    r = compare(spark, "/root/testdata/sf0.1", name, fn, sql)
    assert r["cols_match"] and r["rows_match"] and r["values_match"], r
