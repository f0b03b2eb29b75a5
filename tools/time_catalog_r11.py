"""r11 opt round: one-pass wall-time ranking of EVERY catalog entry at
a given SF (default sf0.1) — call (construction incl. eager index
builds) and count(), single warm session, job-labeled. Streaming
entries that cannot run offline record their error and move on.

Usage: python tools/time_catalog_r11.py [SF_DIR] [OUT.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lrmr_spark.catalog import queries
from lrmr_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "CATALOG_TIMES_r11.json"
    spark = get_spark("lrmr-time-catalog")
    spark.range(1000).selectExpr("sum(id)").collect()
    qs = queries()
    rows = {}
    for name, fn in qs.items():
        spark.sparkContext.setJobDescription(f"time:{name}")
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            t1 = time.time()
            df.count()
            t2 = time.time()
            rows[name] = {
                "call": round(t1 - t0, 3),
                "count": round(t2 - t1, 3),
                "total": round(t2 - t0, 3),
            }
        except Exception as e:
            rows[name] = {"error": str(e).splitlines()[0][:120]}
        spark.sparkContext.setJobDescription(None)
        print(json.dumps({name: rows[name]}), flush=True)
    ranked = sorted(
        (r for r in rows.items() if "total" in r[1]),
        key=lambda kv: -kv[1]["total"],
    )
    with open(out_path, "w") as f:
        json.dump(
            {
                "sf_dir": sf_dir,
                "loadavg": [round(x, 2) for x in os.getloadavg()],
                "times": rows,
                "top20": [
                    {"name": k, **v} for k, v in ranked[:20]
                ],
            },
            f,
            indent=2,
        )


if __name__ == "__main__":
    main()
