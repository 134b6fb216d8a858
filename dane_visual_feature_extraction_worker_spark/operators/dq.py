"""Data-quality expectation checks — the contract gate a production
pipeline runs BEFORE features are computed.

Great-Expectations-shaped: each rule is a boolean Column over one
table ("totalprice positive", "status in the enum", "date present"),
plus referential-integrity checks across tables. The output is the
audit artifact (rule, n_checked, n_failed) a scheduler gates on —
the same observability family as null_profile and skew_report.

The reference worker validates inputs imperatively (one file at a
time, exceptions on bad shapes); here validation is declarative and
distributed: every per-table rule rides ONE map-side-combined
aggregate pass (the corpus never shuffles — the exchange carries one
row of counters per rule), and FK checks are key-join-shaped with the
dimension side broadcastable.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def expectations_report(
    df: DataFrame, rules: dict[str, F.Column], table: str
) -> DataFrame:
    """Evaluate boolean ``rules`` over ``df`` in ONE pass →
    ``(table, rule, n_checked, n_failed)``, one row per rule.

    A row PASSES a rule only if the expression evaluates TRUE —
    NULL counts as a failure (the Great Expectations convention:
    "value must be > 0" is violated by an absent value). All counters
    are exact BIGINTs from a single aggregate; the per-rule rows are
    unpivoted from that one result row (rule-count-sized, never a
    second scan).
    """
    if not rules:
        raise ValueError("expectations_report needs at least one rule")
    aggs = [F.count(F.lit(1)).cast("bigint").alias("__n")]
    for i, (_, col) in enumerate(rules.items()):
        aggs.append(
            F.sum(F.when(F.coalesce(col, F.lit(False)), 0).otherwise(1))
            .cast("bigint")
            .alias(f"__f{i}")
        )
    one = df.agg(*aggs)
    stack = ", ".join(
        f"'{name}', __f{i}" for i, name in enumerate(rules)
    )
    return one.selectExpr(
        f"stack({len(rules)}, {stack}) AS (rule, n_failed)", "__n"
    ).select(
        F.lit(table).alias("table_name"),
        "rule",
        F.col("__n").alias("n_checked"),
        "n_failed",
    )


def fk_violations(
    child: DataFrame,
    parent: DataFrame,
    child_key: str,
    parent_key: str,
    table: str,
    rule: str,
) -> DataFrame:
    """Referential-integrity check → ONE row
    ``(table, rule, n_checked, n_failed)``: child rows whose key has
    no match in the parent (NULL child keys are orphans too — an FK
    that must resolve).

    Plan: distinct parent keys (dimension-sized — Spark broadcasts
    under the join threshold, exactly what you want for a 10^12-row
    fact against a 10^6-row dimension) left-joined to the child, then
    one counter aggregate. No sort, no corpus-keyed exchange on the
    fact side beyond the join itself.
    """
    keys = parent.select(F.col(parent_key).alias("__pk")).distinct()
    j = child.select(F.col(child_key).alias("__ck")).join(
        F.broadcast(keys), F.col("__ck") == F.col("__pk"), "left"
    )
    return j.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_checked"),
        F.sum(F.when(F.col("__pk").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_failed"),
    ).select(
        F.lit(table).alias("table_name"),
        F.lit(rule).alias("rule"),
        "n_checked",
        "n_failed",
    )
