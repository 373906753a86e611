#!/usr/bin/env python
"""Regenerate expected_extract.json from the committed fixture bytes.

Run ONLY when pinning an intentional extraction-behavior change; the
committed JSON is the cross-round regression anchor for real-world
markup."""

import hashlib
import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.abspath(os.path.join(HERE, "..", "..", ".."))
sys.path.insert(0, REPO)


def main() -> int:
    from ragflow_core16_spark.html.density import density_sections
    from ragflow_core16_spark.html.parser import HtmlParser
    from ragflow_core16_spark.textnorm.codec import find_codec

    out = {}
    for name in sorted(os.listdir(HERE)):
        if not name.endswith(".html"):
            continue
        raw = open(os.path.join(HERE, name), "rb").read()
        codec = find_codec(raw)
        txt = raw.decode(codec, errors="ignore")
        row = {"codec": codec}
        for strat, fn in (("readability", HtmlParser.parser_txt),
                          ("density", density_sections)):
            secs = [s for s in fn(txt) if s]
            joined = "\n".join(secs)
            row[strat] = {
                "title": secs[0] if secs else "",
                "n_sections": len(secs),
                "n_chars": len(joined),
                "md5": hashlib.md5(joined.encode()).hexdigest(),
            }
        out[name] = row
    with open(os.path.join(HERE, "expected_extract.json"), "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"froze {len(out)} fixtures")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
