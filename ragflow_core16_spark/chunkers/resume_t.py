"""Resume chunk template — structured-resume → suffix-typed doc assembly.

Reference: ``rag/app/resume.py``.  The resume *parse* is a remote service
there (``remote_call`` POSTs to a resume_parse_module endpoint,
resume.py:44-80) — unavailable by design, so that stage is the documented
stub here (``parse_resume`` handles the deterministic JSON fixture format
and raises for real pdf/docx resume bytes).  What this module implements
faithfully is the chunk-assembly stage (resume.py:94-170):

  * ``FIELD_MAP``: suffix-typed field → human query aliases;
  * title = "-".join(name, gender, position, age) + "-简历";
  * ``content_with_weight`` = "alias: value" lines with the
    parenthesized alias annotations stripped (``re.sub("（[^（）]+）","",k)``);
  * list values joined by space; ``*_tks`` values de-space-normalized;
  * single-element lists unwrapped except for the forbidden select
    fields (resume.py:33-35,160-165).
"""

from __future__ import annotations

import json
import re

FORBIDDEN_SELECT_FIELDS = [
    "name_pinyin_kwd", "edu_first_fea_kwd", "degree_kwd", "sch_rank_kwd",
    "edu_fea_kwd",
]

FIELD_MAP = {
    "name_kwd": "姓名/名字",
    "name_pinyin_kwd": "姓名拼音/名字拼音",
    "gender_kwd": "性别（男，女）",
    "age_int": "年龄/岁/年纪",
    "phone_kwd": "电话/手机/微信",
    "email_tks": "email/e-mail/邮箱",
    "position_name_tks": "职位/职能/岗位/职责",
    "expect_city_names_tks": "期望城市",
    "work_exp_flt": "工作年限/工作年份/N年经验/毕业了多少年",
    "corporation_name_tks": "最近就职(上班)的公司/上一家公司",
    "first_school_name_tks": "第一学历毕业学校",
    "first_degree_kwd": "第一学历（高中，职高，硕士，本科，博士，初中，中技，中专，专科，专升本，MPA，MBA，EMBA）",
    "highest_degree_kwd": "最高学历（高中，职高，硕士，本科，博士，初中，中技，中专，专科，专升本，MPA，MBA，EMBA）",
    "first_major_tks": "第一学历专业",
    "edu_first_fea_kwd": "第一学历标签（211，留学，双一流，985，海外知名，重点大学，中专，专升本，专科，本科，大专）",
    "degree_kwd": "过往学历（高中，职高，硕士，本科，博士，初中，中技，中专，专科，专升本，MPA，MBA，EMBA）",
    "major_tks": "学过的专业/过往专业",
    "school_name_tks": "学校/毕业院校",
    "sch_rank_kwd": "学校标签（顶尖学校，精英学校，优质学校，一般学校）",
    "edu_fea_kwd": "教育标签（211，留学，双一流，985，海外知名，重点大学，中专，专升本，专科，本科，大专）",
    "corp_nm_tks": "就职过的公司/之前的公司/上过班的公司",
    "edu_end_int": "毕业年份",
    "industry_name_tks": "所在行业",
    "birth_dt": "生日/出生年份",
    "expect_position_name_tks": "期望职位/期望职能/期望岗位",
}


def rm_space(txt: str) -> str:
    """rag/utils rmSpace: drop spaces between CJK/word boundaries."""
    txt = re.sub(r"([^a-z0-9.,\)>]) +([^ ])", r"\1\2", txt,
                 flags=re.IGNORECASE)
    return re.sub(r"([^ ]) +([^a-z0-9.,\(<])", r"\1\2", txt,
                  flags=re.IGNORECASE)


def parse_resume(binary: bytes) -> dict:
    """STUB of the remote resume_parse_module call (resume.py:44-80).
    Accepts the deterministic JSON fixture format; real pdf/docx resume
    bytes require the external service and raise."""
    try:
        obj = json.loads(binary.decode("utf-8"))
        if isinstance(obj, dict):
            return obj
    except (UnicodeDecodeError, json.JSONDecodeError):
        pass
    raise NotImplementedError(
        "resume parsing beyond the JSON fixture format requires the "
        "reference's external resume_parse_module service (resume.py:44-80)")


def resume_to_doc(resume: dict, filename: str = "") -> dict:
    """Chunk-assembly stage (resume.py:129-167): returns the suffix-typed
    doc dict with title, content_with_weight and passthrough fields."""
    titles = []
    for n in ["name_kwd", "gender_kwd", "position_name_tks", "age_int"]:
        v = resume.get(n, "")
        if isinstance(v, list):
            v = v[0] if v else ""
        if n.find("tks") > 0:
            v = rm_space(str(v))
        titles.append(str(v))
    doc: dict = {"docnm_kwd": filename,
                 "title_txt": "-".join(titles) + "-简历"}

    pairs = []
    for n, m in FIELD_MAP.items():
        if not resume.get(n):
            continue
        v = resume[n]
        if isinstance(v, list):
            v = " ".join(str(x) for x in v)
        if n.find("tks") > 0:
            v = rm_space(str(v))
        pairs.append((m, str(v)))

    doc["content_with_weight"] = "\n".join(
        "{}: {}".format(re.sub(r"（[^（）]+）", "", k), v) for k, v in pairs)

    for n in FIELD_MAP:
        if n not in resume:
            continue
        v = resume[n]
        if isinstance(v, list) and (
                len(v) == 1 or n not in FORBIDDEN_SELECT_FIELDS):
            v = v[0]
        doc[n] = v
    return doc
