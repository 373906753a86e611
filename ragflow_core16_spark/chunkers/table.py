"""Table chunk template: per-column type inference + typed-field rows.

Re-implementation of ``rag/app/table.py:82-241`` semantics:
  * ``column_data_type``: per-cell pattern vote over
    {int, float, bool, datetime, text}; majority wins; cells are coerced to
    the winning type (failures → None);
  * each data row becomes one chunk: ``"header:value; header:value"``;
  * field names get a type suffix (``_long/_flt/_kwd/_dt/_tks``) — the
    reference's suffix-typed dynamic schema (conf/mapping.json:26-211);
    the pinyin romanization of CJK headers is out of scope (no pinyin lib) —
    headers are slugified ASCII-safe instead, text bytes unaffected.

The Spark-side operator is ``table_rows_df``: the same inference vectorized
over a DataFrame of (url, body) CSV blobs via mapInPandas.
"""

from __future__ import annotations

import re
from datetime import datetime

_BOOL_TRUE = r"(true|yes|是|\*|✓|✔|☑|✅|√)$"
_BOOL_FALSE = r"(false|no|否|⍻|×)$"
_BOOL_ANY = r"(true|yes|是|\*|✓|✔|☑|✅|√|false|no|否|⍻|×)$"

_DT_FORMATS = [
    "%Y-%m-%d", "%Y/%m/%d", "%Y-%m-%d %H:%M:%S", "%Y/%m/%d %H:%M:%S",
    "%d-%m-%Y", "%d/%m/%Y", "%Y%m%d", "%b %d %Y", "%B %d, %Y",
]


def trans_datetime(s: str):
    s = s.strip()
    # dateutil (bundled with pandas) first — mirrors the reference's
    # datetime_parse; strict formats as fallback
    try:
        from dateutil.parser import parse as _p
        return _p(s).strftime("%Y-%m-%d %H:%M:%S")
    except Exception:
        pass
    for f in _DT_FORMATS:
        try:
            return datetime.strptime(s, f).strftime("%Y-%m-%d %H:%M:%S")
        except Exception:
            continue
    return None


def trans_bool(s: str):
    if re.match(_BOOL_TRUE, str(s).strip(), flags=re.IGNORECASE):
        return "yes"
    if re.match(_BOOL_FALSE, str(s).strip(), flags=re.IGNORECASE):
        return "no"
    return None


def column_data_type(arr: list):
    """→ (coerced_values, type_name) — same vote + coercion rules as
    rag/app/table.py:97-127."""
    arr = list(arr)
    counts = {"int": 0, "float": 0, "text": 0, "datetime": 0, "bool": 0}
    trans = {"int": int, "float": float, "datetime": trans_datetime,
             "bool": trans_bool, "text": str}
    for a in arr:
        if a is None:
            continue
        sa = str(a).replace("%%", "")
        if re.match(r"[+-]?[0-9]{,19}(\.0+)?$", sa):
            counts["int"] += 1
        elif re.match(r"[+-]?[0-9.]{,19}$", sa):
            counts["float"] += 1
        elif re.match(_BOOL_ANY, str(a), flags=re.IGNORECASE):
            counts["bool"] += 1
        elif trans_datetime(str(a)):
            counts["datetime"] += 1
        else:
            counts["text"] += 1
    ty = sorted(counts.items(), key=lambda x: -x[1])[0][0]
    for i in range(len(arr)):
        if arr[i] is None:
            continue
        try:
            v = trans[ty](str(arr[i]))
            if ty == "int":
                v = int(float(str(arr[i])))  # "3.0" → 3 like reference int()
            arr[i] = v
        except Exception:
            arr[i] = None
    return arr, ty


FIELD_SUFFIX = {"text": "_tks", "int": "_long", "keyword": "_kwd",
                "float": "_flt", "datetime": "_dt", "bool": "_kwd"}

_DROP_COLS = ("id", "_id", "index", "idx")


def _slug(name: str) -> str:
    # strip "/alias" and parenthesized enums like the reference
    # (table.py:213-218), then ASCII slug
    base = re.sub(r"(/.*|（[^（）]+?）|\([^()]+?\))", "", str(name))
    s = re.sub(r"[^0-9a-zA-Z]+", "_", base).strip("_").lower()
    return s or "col"


def table_chunks(headers: list[str], rows: list[list[str]],
                 delimiter: str = "\t"):
    """→ (chunk_texts, typed_fields_per_row, column_types).

    chunk text = "header:value; header:value" per row (table.py:238-242);
    typed field dict mirrors the suffix-typed schema."""
    headers = [h for h in headers]
    keep = [i for i, h in enumerate(headers) if h not in _DROP_COLS]
    headers = [headers[i] for i in keep]
    cols = [[r[i] if i < len(r) else None for r in rows] for i in keep]

    typed_cols, types = [], []
    for col in cols:
        vals, ty = column_data_type(col)
        typed_cols.append(vals)
        types.append(ty)

    field_names = [_slug(h) + FIELD_SUFFIX[t] for h, t in zip(headers, types)]
    texts, fields = [], []
    for ri in range(len(rows)):
        row_txt, d = [], {}
        for ci, h in enumerate(headers):
            v = typed_cols[ci][ri]
            if v is None or str(v) == "":
                continue
            d[field_names[ci]] = v
            row_txt.append(f"{h}:{v}")
        if not row_txt:
            continue
        texts.append("; ".join(row_txt))
        fields.append(d)
    return texts, fields, dict(zip(headers, types))


def parse_csv(txt: str, delimiter: str = "\t"):
    """csv/txt route of table.py:152-176: first line = headers; rows with
    wrong arity are failures."""
    lines = txt.split("\n")
    if not lines:
        return [], [], []
    headers = lines[0].split(delimiter)
    rows, fails = [], []
    for i, line in enumerate(lines[1:]):
        if not line:
            continue
        row = line.split(delimiter)
        if len(row) != len(headers):
            fails.append(i)
            continue
        rows.append(row)
    return headers, rows, fails
