"""Systematic expansion of the built-in CJK lexicon — REAL words only.

The reference's ``huqie.txt`` (hundreds of thousands of entries) is a
stripped binary asset (SURVEY.md §0) and no public wordlist ships in this
sandbox, so a full-scale dictionary remains a DEPLOYMENT asset loaded via
``RAG_TOKENIZER_DICT`` (see ``tools/build_cjk_dict.py`` for the one-command
conversion recipe).  This module grows the BUILT-IN fallback with
closed-class, systematically enumerable vocabulary that is real by
construction — numerals, ordinals, calendar terms, numeral×measure
compounds, verb-resultative compounds from curated productive pairs, and
negation/degree prefix derivations over curated stems.  A combinatorial
blow-up to 100k entries was deliberately NOT done: a maximal-match
dictionary whose tail is fabricated non-words actively corrupts
segmentation (the longest match wins, so one fake 4-char entry can glue
two real words together forever).

Entries: (word, freq, pos) — same shape as ``cjk_lexicon.LEXICON``.
"""

from __future__ import annotations

_DIGITS = "一二三四五六七八九"


def _numerals() -> list[tuple[str, int, str]]:
    """Composed Chinese numerals 1-99, whole hundreds/thousands, the
    colloquial 两-forms, and ordinals 第一..第九十九."""
    out: list[tuple[str, int, str]] = []
    units = list(_DIGITS)
    nums: list[str] = []
    nums += units                                   # 一..九
    nums.append("十")                               # 10
    nums += ["十" + u for u in units]               # 11..19
    for t in units:                                 # 20..99
        nums.append(t + "十")
        nums += [t + "十" + u for u in units]
    nums += [u + "百" for u in units] + ["两百"]     # whole hundreds
    nums += [u + "千" for u in units] + ["两千"]
    nums += [u + "万" for u in units] + ["两万", "十万", "百万", "千万"]
    nums += [u + "亿" for u in units] + ["两亿", "十亿", "百亿"]
    out += [(n, 8000, "m") for n in nums]
    out += [("第" + n, 4000, "m") for n in nums[:99]]
    out += [("两", 60000, "m"), ("几", 50000, "m"), ("半", 30000, "m")]
    return out


def _calendar() -> list[tuple[str, int, str]]:
    units = list(_DIGITS)
    months = [u + "月" for u in units] + ["十月", "十一月", "十二月"]
    weekdays = (["星期" + u for u in "一二三四五六日天"]
                + ["周" + u for u in "一二三四五六日末"]
                + ["礼拜" + u for u in "一二三四五六日天"])
    hours = [u + "点" for u in units] + ["十点", "十一点", "十二点"]
    misc = ["上午", "下午", "中午", "凌晨", "傍晚", "半夜", "清晨",
            "今晚", "昨晚", "明晚", "本周", "上周", "下周", "本月",
            "上月", "下月", "月底", "月初", "年底", "年初", "年中",
            "春天", "夏天", "秋天", "冬天", "春季", "夏季", "秋季",
            "冬季", "季度", "工作日", "节假日", "周末"]
    return ([(m, 15000, "t") for m in months]
            + [(w, 12000, "t") for w in weekdays]
            + [(h, 8000, "t") for h in hours]
            + [(x, 10000, "t") for x in misc])


# productive numeral × measure-word compounds (all real words: 一个, 两件,
# 三种, …) — numerals 一..十 plus 两/几/半/每, measures from the standard
# closed class
_MEASURES = ("个 件 种 名 位 台 条 项 次 批 组 层 段 篇 份 场 轮 家 套 "
             "部 只 张 块 片 句 行 页 步 倍 天 年 间 所 座 栋 辆 艘 架 "
             "杯 瓶 碗 盘 袋 盒 箱 双 对 群 堆 排 列 束 滴 颗 粒 棵 朵 "
             "封 首 幅 幕 集 册 卷 期 届 任 代 笔 门 课 节 章 回 招 "
             "记 声 顿 趟 遍 番 阵 丝 毫 分 秒 米 克 吨 亩 元 角").split()


def _measures() -> list[tuple[str, int, str]]:
    nums = list(_DIGITS) + ["十", "两", "几", "半", "每", "整", "数"]
    return [(n + m, 6000, "m") for n in nums for m in _MEASURES]


# verb-resultative compounds: curated (verb, complements) pairs — every
# emitted combination is a standard compound, not a blind product
_VERB_RES = [
    ("做", "好 完 到 出 成 错"), ("写", "好 完 出 下 错 满"),
    ("看", "到 见 完 懂 出 清 好 过"), ("听", "到 见 懂 完 清"),
    ("说", "好 完 出 清 错 到"), ("想", "到 好 出 起 通 开"),
    ("找", "到 出 回 着"), ("拿", "到 出 走 来 起 下 住"),
    ("买", "到 下 回 来 好"), ("卖", "出 完 掉 光"),
    ("吃", "完 饱 光 掉 好"), ("喝", "完 光 掉 醉"),
    ("学", "好 会 完 到 成"), ("用", "完 好 掉 光 上"),
    ("打", "开 完 好 到 破 败 赢"), ("关", "上 好 掉 紧"),
    ("走", "开 出 进 回 掉 过"), ("跑", "开 出 回 掉 过"),
    ("送", "到 出 回 来 走 给"), ("带", "来 走 上 回 到 给"),
    ("收", "到 好 回 起 下 完"), ("放", "下 好 开 进 回 上"),
    ("记", "住 下 得 错 起"), ("忘", "记 掉 光"),
    ("读", "完 懂 好 到 过"), ("讲", "完 清 好 到 过"),
    ("建", "好 成 起 完"), ("改", "好 完 成 掉 过"),
    ("修", "好 完 成 过"), ("洗", "好 完 干净 掉"),
    ("准备", "好 完"), ("安排", "好 完"), ("整理", "好 完"),
    ("完成", "好"), ("处理", "好 完 掉"), ("解决", "好 掉"),
    ("举", "起 出 办"), ("提", "出 到 起 高 升"),
    ("传", "来 开 出 到 给"), ("递", "给 来 出 上"),
    ("睡", "着 好 醒 过"), ("醒", "来 过"),
    ("站", "住 起 好 稳"), ("坐", "下 好 稳 满"),
    ("停", "下 住 好"), ("留", "下 住 给"),
    ("救", "出 回 活"), ("变", "成 好 坏 回"),
    ("翻", "开 过 出 成"), ("搬", "走 来 出 进 回"),
    ("挂", "上 好 起 断"), ("接", "到 住 起 通 上"),
    ("装", "好 上 满 进"), ("摆", "好 上 开 满"),
    ("算", "出 好 完 错 上"), ("数", "完 清 错"),
    ("查", "到 出 清 完"), ("问", "到 清 好 过"),
    ("回答", "好 完"), ("报", "出 上 完"),
    ("跳", "起 出 过 下"), ("爬", "上 起 出 过"),
    ("推", "开 出 进 倒 下"), ("拉", "开 出 住 回 上"),
]


def _verb_resultatives() -> list[tuple[str, int, str]]:
    out = []
    for verb, comps in _VERB_RES:
        for c in comps.split():
            out.append((verb + c, 5000, "v"))
    return out


# negation / degree / scope prefixes over curated stems — each emitted
# form is standard usage
_PREFIX_PATTERNS = [
    ("不", 8000, "d", """同 能 会 要 行 好 对 满 安 足 利 便 变 断 久
     定 论 但 必 再 太 少 大 小 算 止 准 许 依 符 当 妥 适 宜 限 明
     法 公 正 平 等 良 佳 透明 规范 正常 合理 合法 稳定 完整 确定
     均匀 对称 充分 彻底 成熟 健全 清晰 可靠 兼容"""),
    ("无", 6000, "b", """法 力 效 关 数 限 比 私 偿 偿还 条件 意义 意识
     原则 边 界 障碍 人机 线 源 缝 害 毒 菌 糖 烟 声 形 名 知 奈
     误 辜 疑 端 需 须 非"""),
    ("非", 5000, "b", """常 法 凡 议 洲 人 主流 正式 正常 official 营利
     公开 理性 线性 对称 标准 典型 传统 物质 机动"""),
    ("反", 5000, "v", """对 应 映 思 省 驳 抗 击 问 复 转 弹 感 面 向
     垄断 倾销 腐败 恐怖 诈骗 病毒 措施 思维"""),
    ("超", 5000, "b", """过 级 越 出 市 前 高 低 大 小 强 远 员 额 速
     载 标 期 重 长 短 市场 预期 现实 自然 导体 声波 高清"""),
    ("高", 6000, "b", """度 级 档 端 层 速 效 产 价 温 压 低 手 峰 潮
     原 地 空 楼 山 中 考 管 官 铁 龄 薪 危 频 质量 标准 水平 科技
     性能 密度 精度 收益 风险 血压 血糖"""),
    ("低", 5000, "b", """级 档 端 层 速 效 价 温 压 头 谷 地 空 龄 薪
     碳 频 调 迷 落 成本 收入 风险 密度 标准 水平"""),
    ("多", 5000, "b", """少 样 元 数 次 年 种 层 方 边 媒体 功能 角度
     领域 渠道 语言 民族 维度 层次 元化 样化"""),
    ("半", 4000, "b", """年 月 天 夜 岛 径 价 成品 决赛 导体 自动 透明
     公开 封建 殖民地"""),
    ("全", 5000, "b", """部 面 体 球 国 省 市 县 区 年 天 程 景 力 新
     能 额 员 民 社会 世界 过程 方位 天候 自动 覆盖"""),
    ("可", 5000, "v", """以 能 见 行 靠 信 爱 怕 惜 笑 观 取 用 读 写
     变 控 调 塑 溶 燃 再生 持续 扩展 维护 追溯 验证 复制 编程
     视化 用性 靠性"""),
]


def _prefixed() -> list[tuple[str, int, str]]:
    out = []
    for pre, freq, pos, stems in _PREFIX_PATTERNS:
        for stem in stems.split():
            if stem.isascii():          # guard against list typos
                continue
            out.append((pre + stem, freq, pos))
    return out


# high-frequency words surfaced as gaps by the mixed-script segmentation
# fixtures (tests/test_tokenizer.py::TestMixedScriptFixtures)
_GAPS = [
    ("应当", 40000, "v"), ("持续", 40000, "v"), ("吃饭", 30000, "v"),
    ("睡觉", 25000, "v"), ("说话", 30000, "v"), ("走路", 15000, "v"),
    ("开车", 15000, "v"), ("做饭", 12000, "v"), ("洗澡", 12000, "v"),
    ("唱歌", 12000, "v"), ("跳舞", 12000, "v"), ("看书", 12000, "v"),
    ("上班", 25000, "v"), ("下班", 20000, "v"), ("上学", 15000, "v"),
    ("放学", 10000, "v"), ("开会", 20000, "v"), ("出差", 10000, "v"),
    ("加班", 12000, "v"), ("请假", 10000, "v"), ("报名", 10000, "v"),
    ("排队", 10000, "v"), ("付款", 10000, "v"), ("收款", 6000, "v"),
    ("退款", 8000, "v"), ("下单", 8000, "v"), ("签字", 8000, "v"),
    ("盖章", 6000, "v"), ("有关", 30000, "v"), ("无关", 12000, "v"),
    ("相应", 20000, "v"), ("对应", 15000, "v"), ("适应", 20000, "v"),
    ("反应", 25000, "vn"), ("响应", 12000, "v"), ("供需", 6000, "n"),
    ("上涨", 15000, "v"), ("下跌", 12000, "v"), ("上升", 20000, "v"),
    ("下降", 25000, "v"), ("波动", 12000, "v"), ("趋势", 25000, "n"),
    ("策略", 30000, "n"), ("战略", 30000, "n"), ("措施", 30000, "n"),
    ("风险", 40000, "n"), ("危机", 20000, "n"), ("挑战", 20000, "n"),
    ("机会", 30000, "n"), ("机遇", 12000, "n"), ("优势", 20000, "n"),
    ("劣势", 6000, "n"), ("瓶颈", 8000, "n"), ("痛点", 5000, "n"),
    ("亮点", 8000, "n"), ("难点", 6000, "n"), ("重点", 25000, "n"),
    ("要点", 8000, "n"), ("观点", 20000, "n"), ("看法", 15000, "n"),
    ("想法", 15000, "n"), ("做法", 15000, "n"), ("说法", 12000, "n"),
    ("经验", 30000, "n"), ("教训", 10000, "n"), ("案例", 15000, "n"),
    ("实例", 8000, "n"), ("示例", 6000, "n"), ("例子", 12000, "n"),
]

EXT_LEXICON: list[tuple[str, int, str]] = (
    _numerals() + _calendar() + _measures() + _verb_resultatives()
    + _prefixed() + _GAPS
)
