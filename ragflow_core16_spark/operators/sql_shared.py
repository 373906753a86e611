"""SQL fragments shared by the oracle derivations.

One definition each for the qa prefix-strip regex (rag/app/qa.py rmPrefix)
and the token piece-cost arithmetic (textnorm/tokens.py: cost 1 when the
piece length — leading space included for non-first words — is ≤ 5, else
ceil(len/4.4)); every template oracle interpolates these so a rule change
lands everywhere at once.
"""

from __future__ import annotations

RM_PREFIX_SQL = (r"^(问题|答案|回答|user|assistant|Q|A|Question|Answer|问|答)"
                 r"[\t:： ]+")


def cost_sql(expr: str) -> str:
    """Token cost of a piece whose char length is ``expr``."""
    return (f"CASE WHEN {expr} <= 5 THEN 1 "
            f"ELSE CAST(ceil(({expr})/4.4) AS BIGINT) END")
