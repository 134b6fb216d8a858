"""Dump the formatted physical plan of any gated query key.

The per-operator SURVEY rows make concrete plan claims (exchange
counts, TakeOrdered vs Sort, broadcast sides, pushed filters); the
plan-audit tests pin the load-bearing ones. This tool is the manual
companion: inspect what Catalyst actually planned for any key at any
SF without writing a script.

Usage:
  python scripts/explain_key.py <key> [sf_dir] [--mode formatted|extended]

Examples:
  python scripts/explain_key.py bm25_search
  python scripts/explain_key.py pit_features_core /root/testdata/sf0.1
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    mode = "formatted"
    for a in sys.argv[1:]:
        if a.startswith("--mode"):
            mode = a.split("=", 1)[1] if "=" in a else "formatted"
    if not args:
        print(__doc__)
        raise SystemExit(2)
    key = args[0]
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.01"

    from pyspark.sql import SparkSession

    import __spark_entry__ as ent

    qs = ent.queries()
    if key not in qs:
        print(f"unknown key {key!r}; {len(qs)} available:", file=sys.stderr)
        print(" ".join(sorted(qs)), file=sys.stderr)
        raise SystemExit(2)

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .appName(f"explain-{key}")
        .getOrCreate()
    )
    df = qs[key](spark, sf_dir)
    df.explain(mode)


if __name__ == "__main__":
    main()
