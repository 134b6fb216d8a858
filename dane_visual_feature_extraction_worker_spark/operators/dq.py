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
from pyspark.sql import DataFrame, Window


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


# Benford first-digit expected shares, micro-floored. Computed once in
# Python (log10(1 + 1/d)) and inlined as integer literals in BOTH the
# Spark plan and the DuckDB oracle, so no runtime ln() ulp differences
# can reach the gate comparator.
BENFORD_EXPECTED_MICRO: dict[int, int] = {
    1: 301029, 2: 176091, 3: 124938, 4: 96910, 5: 79181,
    6: 66946, 7: 57991, 8: 51152, 9: 45757,
}


def benford_report(df: DataFrame, amount: str) -> DataFrame:
    """Benford first-significant-digit audit over a positive money
    column — the classic fraud/synthetic-data smell test, run as a
    data-quality gate next to ``expectations_report``.

    First digit is extracted EXACTLY: cents = floor(amount*100) as
    int64 (same double op on every engine), then the first character
    of the int64's decimal string — integer-to-string is
    engine-identical, unlike float formatting or log10-based digit
    math (log10(1000.0) can land below 3.0 and shift the digit).

    Output (9 rows): ``(digit, n_obs, share, expected_share,
    dev_micro, chi2_term)`` where chi2_term = (n_d - n·p_d)²/(n·p_d),
    micro-floored per digit.

    Plan: ONE map-side-combined 9-group aggregate over the corpus;
    the total ``n`` comes from a window over the 9-row result, never
    a second scan.
    """
    cents = F.floor(F.col(amount) * F.lit(100)).cast("bigint")
    digit = F.substring(cents.cast("string"), 1, 1).cast("int")
    g = (
        df.where(F.col(amount) > 0)
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_obs"))
    )
    n = F.sum("n_obs").over(Window.partitionBy())
    expected = F.create_map(
        *[
            x
            for d, micro in BENFORD_EXPECTED_MICRO.items()
            for x in (F.lit(d), F.lit(micro))
        ]
    )[F.col("digit")].cast("bigint")
    withm = g.select(
        "digit", "n_obs", n.alias("__n"), expected.alias("__exp_micro")
    )
    share = F.col("n_obs").cast("double") / F.col("__n").cast("double")
    exp_share = F.col("__exp_micro").cast("double") / F.lit(1e6)
    exp_n = F.col("__n").cast("double") * exp_share
    diff = F.col("n_obs").cast("double") - exp_n
    return withm.select(
        "digit",
        "n_obs",
        (F.floor(share * F.lit(1e6)) / F.lit(1e6)).alias("share"),
        (F.col("__exp_micro").cast("double") / F.lit(1e6)).alias(
            "expected_share"
        ),
        F.floor((share - exp_share) * F.lit(1e6))
        .cast("bigint")
        .alias("dev_micro"),
        (F.floor(diff * diff / exp_n * F.lit(1e6)) / F.lit(1e6)).alias(
            "chi2_term"
        ),
    )


def k_anonymity_report(
    df: DataFrame,
    qi: dict[str, F.Column],
    k: int = 5,
) -> DataFrame:
    """k-anonymity audit over quasi-identifier columns: the
    group-size histogram of the QI partition, flagging equivalence
    classes smaller than ``k`` (re-identifiable rows) — the privacy
    gate run before releasing a feature table.

    ``qi`` maps output names to quasi-identifier expressions. Output,
    one row per distinct class size: ``(group_size, n_groups, n_rows,
    at_risk)`` with n_rows = group_size · n_groups.

    Plan: ONE map-side-combined groupBy over the QI tuple (the only
    corpus exchange), then a class-size rollup over the
    |distinct QI| result — never a self-join, all exact int64.
    """
    if not qi:
        raise ValueError("k_anonymity_report needs at least one QI column")
    g = df.groupBy(
        *[col.alias(name) for name, col in qi.items()]
    ).agg(F.count(F.lit(1)).cast("bigint").alias("__size"))
    return (
        g.groupBy(F.col("__size").alias("group_size"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_groups"))
        .select(
            "group_size",
            "n_groups",
            (F.col("group_size") * F.col("n_groups"))
            .cast("bigint")
            .alias("n_rows"),
            (F.col("group_size") < F.lit(int(k))).alias("at_risk"),
        )
    )


#: PII scan patterns — deliberately restricted to character classes and
#: bounded quantifiers, the regex subset Java (Spark) and RE2 (DuckDB
#: and most scanners) match identically. Extend with the same
#: discipline: no backreferences, no lookaround.
PII_PATTERNS = {
    "email": r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}",
    "longnum": r"[0-9]{6,}",
}


def pii_audit(
    docs: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    patterns: dict[str, str] | None = None,
) -> DataFrame:
    """Per-source PII exposure scan — the release gate that pairs with
    ``k_anonymity_report``: k-anonymity bounds re-identification via
    the metadata QI; this bounds DIRECT leakage in the text body
    (emails, long digit runs — account/phone shapes). A source whose
    email rate spikes needs scrubbing (``text_scrub``) before the
    corpus ships.

    Output: one row per (group, pattern): ``(grp, pattern, n_docs,
    docs_hit, total_hits, hit_doc_micro)`` with the doc-rate as an
    exact integer-micro DIV.

    Plan: ``regexp_extract_all`` counts per row (JVM codegen, no
    Python), one tagged union per pattern, ONE map-side-combined
    group aggregate — |groups|·|patterns| output rows, the corpus
    never shuffles (the exchange carries combined partials).
    """
    pats = PII_PATTERNS if patterns is None else patterns
    if not pats:
        raise ValueError("patterns must be non-empty")
    lowered = F.lower(F.coalesce(F.col(text_col), F.lit("")))
    parts = []
    for name, rx in sorted(pats.items()):
        hits = F.size(F.regexp_extract_all(lowered, F.lit(rx), 0))
        parts.append(
            docs.select(
                F.col(group_col).alias("grp"),
                F.lit(name).alias("pattern"),
                hits.cast("bigint").alias("__h"),
            )
        )
    tagged = parts[0]
    for p in parts[1:]:
        tagged = tagged.unionByName(p)
    return (
        tagged.groupBy("grp", "pattern")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum((F.col("__h") > 0).cast("bigint"))
            .cast("bigint")
            .alias("docs_hit"),
            F.sum("__h").cast("bigint").alias("total_hits"),
        )
        .select(
            "grp",
            "pattern",
            "n_docs",
            "docs_hit",
            "total_hits",
            F.expr("docs_hit * 1000000 DIV n_docs")
            .cast("bigint")
            .alias("hit_doc_micro"),
        )
    )


#: Refusal-phrase lexicon — plain lowercase substrings (NO regex: both
#: engines match with simple `contains`, so there is no engine-dialect
#: surface at all). Extend freely; matching is case-insensitive.
REFUSAL_PHRASES = (
    "i cannot",
    "i can't",
    "i'm sorry",
    "i am sorry",
    "as an ai",
    "i'm unable",
    "i am unable",
)


def refusal_rate(
    docs: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    phrases: tuple[str, ...] | None = None,
) -> DataFrame:
    """Per-source refusal-phrase rate — the RLHF-curation gate next to
    ``pii_audit``: assistant outputs that open with boilerplate
    refusals ("I'm sorry, I can't…") poison SFT mixes and inflate
    over-refusal; dashboards track this share per source before a mix
    ships. A doc counts as hit if ANY lexicon phrase occurs
    (case-insensitive substring — deliberately not regex, see
    REFUSAL_PHRASES).

    Plan: one lower() + |phrases| `contains` ORs per row (all JVM
    codegen, zero per-row Python), ONE map-side-combined group
    aggregate — |groups| output rows, the corpus never shuffles.
    """
    pats = REFUSAL_PHRASES if phrases is None else phrases
    if not pats:
        raise ValueError("phrases must be non-empty")
    lowered = F.lower(F.coalesce(F.col(text_col), F.lit("")))
    hit = F.lit(False)
    for p in sorted(pats):
        hit = hit | lowered.contains(p.lower())
    return (
        docs.select(F.col(group_col).alias("grp"), hit.alias("__hit"))
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.col("__hit").cast("bigint"))
            .cast("bigint")
            .alias("docs_hit"),
        )
        .select(
            "grp",
            "n_docs",
            "docs_hit",
            F.expr("docs_hit * 1000000 DIV n_docs")
            .cast("bigint")
            .alias("hit_doc_micro"),
        )
    )


def dp_histogram(
    df: DataFrame,
    category_col: str = "event_type",
    eps_inv_micro: int = 1_000_000,
    salt: str = "dp",
) -> DataFrame:
    """Differentially-private histogram release (Laplace mechanism,
    sensitivity 1) — the privacy-preserving counterpart of a plain
    groupBy count for publishing corpus composition stats; pairs with
    ``k_anonymity`` (which audits the raw table) by protecting the
    RELEASED aggregate. Noise scale b = 1/ε; ``eps_inv_micro`` is
    b·10⁶ (default ε = 1).

    Exactness: Laplace(b) = b·(E₁ − E₂) for iid exponentials, and an
    exponential from a uniform integer u ∈ [1, 2³²] is
    ``ln(2³²) − ln(u)`` — every ln of a BARE INTEGER, micro-nat
    floor-scaled (the js/entropy discipline), so the noise is an
    exact int64 and any engine replays the release bit-for-bit.
    Randomness is the portable md5 key (``sample_key`` convention):
    deterministic under a seed HERE so the mechanism is testable —
    a production release must draw the two uniforms from a real
    entropy source instead (swap the salt for os.urandom material);
    the privacy guarantee is about the noise DISTRIBUTION, which is
    exactly Laplace either way.

    Output keeps ``n_raw`` beside ``released_micro`` for the gate and
    tests; a production release drops the raw column. Plan: ONE
    map-side-combined count, noise is a |categories|-row projection.
    """
    if eps_inv_micro <= 0:
        raise ValueError("eps_inv_micro must be positive")
    from dane_visual_feature_extraction_worker_spark.operators.sampling import sample_key

    counts = df.groupBy(F.col(category_col).alias("category")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_raw")
    )
    lnm = lambda c: F.floor(  # noqa: E731 — repo-wide micro-nat ln
        F.log(c.cast("double")) * 1e6
    ).cast("bigint")
    u1 = sample_key(F.col("category"), salt=f"{salt}1") + 1
    u2 = sample_key(F.col("category"), salt=f"{salt}2") + 1
    # Laplace(b) in micro-units: b_micro · (ln u2 − ln u1) / 1e6. The
    # micro-nat difference is exact int64 but SIGNED — and integer
    # division of negatives truncates in Spark yet floors in DuckDB,
    # so the DIV runs on the ABSOLUTE value and the sign re-applies
    # after (both engines then agree bit-for-bit).
    noise = F.expr(
        f"CAST(CASE WHEN __dln >= 0 THEN 1 ELSE -1 END"
        f" * (({eps_inv_micro} * abs(__dln)) DIV 1000000) AS BIGINT)"
    )
    out = counts.withColumn("__dln", lnm(u2) - lnm(u1)).select(
        "category",
        "n_raw",
        noise.alias("noise_micro"),
        (F.col("n_raw") * F.lit(1_000_000) + noise)
        .cast("bigint")
        .alias("released_micro"),
    )
    return out


def canary_scan(
    docs: DataFrame,
    canaries: tuple[str, ...],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Canary / secret-string extraction audit (Carlini et al. 2019
    "secret sharer" protocol, public paper): count EXACT occurrences
    of each planted canary across the corpus — the memorization gate
    a release runs before and after dedup, and the leak scan for
    known secrets (API-key literals, internal hostnames). ``pii_audit``
    scans SHAPES (regex classes); this scans LITERALS.

    Exactness: occurrences per row =
    (len(text) − len(replace(text, canary, ''))) / len(canary) — the
    charclass_profile length-difference trick with a LITERAL replace
    (no regex dialect surface at all); matching is case-insensitive
    (lower both sides). Counts are non-overlapping occurrences,
    replace semantics — identical in both engines.

    Plan: |canaries| literal replace passes per row fused into the
    scan, one tagged union, ONE map-side-combined aggregate —
    |canaries| output rows, zero corpus shuffle.
    """
    if not canaries:
        raise ValueError("canaries must be non-empty")
    if any(not c for c in canaries):
        raise ValueError("canaries must be non-empty strings")
    lowered = F.lower(F.coalesce(F.col(text_col), F.lit("")))
    parts = []
    for c in sorted(canaries):
        cl = c.lower()
        occ = (
            (
                F.length(lowered)
                - F.length(F.replace(lowered, F.lit(cl), F.lit("")))
            )
            / F.lit(len(cl))
        ).cast("bigint")
        parts.append(
            docs.select(
                F.lit(c).alias("canary"),
                occ.alias("__occ"),
            )
        )
    tagged = parts[0]
    for p in parts[1:]:
        tagged = tagged.unionByName(p)
    return (
        tagged.groupBy("canary")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum((F.col("__occ") > 0).cast("bigint"))
            .cast("bigint")
            .alias("docs_hit"),
            F.sum("__occ").cast("bigint").alias("occurrences"),
        )
        .select(
            "canary",
            "n_docs",
            "docs_hit",
            "occurrences",
            F.expr("docs_hit * 1000000 DIV n_docs")
            .cast("bigint")
            .alias("hit_doc_micro"),
        )
    )


def comissing_matrix(
    df: DataFrame,
    columns: list[str],
) -> DataFrame:
    """Pairwise co-missingness matrix — the STRUCTURE view
    ``null_profile`` (per-column rates) cannot give: features that go
    null TOGETHER share an upstream join/outage (fix the pipe once),
    features that never co-null fail independently (impute
    separately). Reports, per ordered pair (a < b), both-null counts
    and the lift over independence.

    Exactness: all counts one pass; ``lift_micro`` =
    n·n_both·10⁶ DIV (null_a·null_b) (NULL when either marginal is
    zero — no 0/0 smoothing).

    Plan: ONE aggregate computing |cols| null flags + |cols|²/2
    both-null CASE sums map-side — zero shuffles at any corpus size
    (the dq_expectations shape); the pair rows unpivot from the one
    result row.
    """
    if len(columns) < 2:
        raise ValueError("need at least two columns")
    aggs = [F.count(F.lit(1)).cast("bigint").alias("__n")]
    for c in columns:
        aggs.append(
            F.sum(F.col(c).isNull().cast("bigint"))
            .cast("bigint")
            .alias(f"__m_{c}")
        )
    pairs = [
        (a, b)
        for i, a in enumerate(sorted(columns))
        for b in sorted(columns)[i + 1 :]
    ]
    for a, b in pairs:
        aggs.append(
            F.sum(
                (F.col(a).isNull() & F.col(b).isNull()).cast("bigint")
            )
            .cast("bigint")
            .alias(f"__b_{a}_{b}")
        )
    one = df.agg(*aggs)
    stack = ", ".join(
        f"'{a}', '{b}', __m_{a}, __m_{b}, __b_{a}_{b}" for a, b in pairs
    )
    long = one.selectExpr(
        f"stack({len(pairs)}, {stack})"
        " AS (col_a, col_b, null_a, null_b, both_null)",
        "__n",
    )
    return long.select(
        "col_a",
        "col_b",
        F.col("__n").alias("n_rows"),
        "null_a",
        "null_b",
        "both_null",
        F.when(
            (F.col("null_a") > 0) & (F.col("null_b") > 0),
            # products ride decimal(38,0): n·both·10⁶ hits 10³⁰ at
            # 10¹² rows, 10× past int64
            F.expr(
                "CAST(__n AS decimal(38,0))"
                " * CAST(both_null AS decimal(38,0)) * 1000000"
                " DIV (CAST(null_a AS decimal(38,0))"
                "      * CAST(null_b AS decimal(38,0)))"
            ),
        )
        .cast("bigint")
        .alias("lift_micro"),
    )


def scrub_verification(
    docs: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    patterns: dict[str, str] | None = None,
    replacement: str = "<scrubbed>",
) -> DataFrame:
    """Scrubber effectiveness gate: run the ``pii_audit`` patterns
    over the text BEFORE and AFTER ``scrub_text``-style replacement
    IN ONE PLAN and report the residual rate — the release check that
    proves the scrubber actually removed what the auditor flags
    (a scrubber regex that drifts from the audit regex leaves
    residual hits; this catches exactly that class). Residual > 0
    with the SAME pattern set means replacement overlapped matches —
    surfaced, never assumed away.

    Plan: per pattern, two ``regexp_extract_all`` counts per row (raw
    and post-replacement text — both codegen, the replacement chain
    is a narrow projection), one tagged union, ONE map-side-combined
    aggregate. |groups|·|patterns| rows, zero corpus shuffle.
    """
    pats = dict(PII_PATTERNS) if patterns is None else patterns
    if not pats:
        raise ValueError("patterns must be non-empty")
    lowered = F.lower(F.coalesce(F.col(text_col), F.lit("")))
    cleaned = lowered
    for _, rx in sorted(pats.items()):
        cleaned = F.regexp_replace(cleaned, rx, replacement.lower())
    parts = []
    for name, rx in sorted(pats.items()):
        before = F.size(F.regexp_extract_all(lowered, F.lit(rx), 0))
        after = F.size(F.regexp_extract_all(cleaned, F.lit(rx), 0))
        parts.append(
            docs.select(
                F.col(group_col).alias("grp"),
                F.lit(name).alias("pattern"),
                before.cast("bigint").alias("__b"),
                after.cast("bigint").alias("__a"),
            )
        )
    tagged = parts[0]
    for p in parts[1:]:
        tagged = tagged.unionByName(p)
    agg = tagged.groupBy("grp", "pattern").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("__b").cast("bigint").alias("hits_before"),
        F.sum("__a").cast("bigint").alias("hits_after"),
    )
    return agg.select(
        "grp",
        "pattern",
        "n_docs",
        "hits_before",
        "hits_after",
        F.when(
            F.col("hits_before") > 0,
            F.expr(
                "(hits_before - hits_after) * 1000000"
                " DIV hits_before"
            ),
        )
        .cast("bigint")
        .alias("removed_micro"),
    )


def forget_audit(
    df: DataFrame,
    tombstones: DataFrame,
    entity_col: str = "user_id",
) -> DataFrame:
    """Right-to-be-forgotten purge audit: given a (small) tombstone
    table of entity keys that must be erased, report what a purge of
    ``df`` would remove — requested / found / not-found entity counts,
    rows purged vs kept, and the purged row share — BEFORE the
    destructive delete runs.  ``entities_not_found`` > 0 is the
    compliance signal that a deletion request names an entity the
    table has never seen (typo'd id, already-purged user): surfaced,
    never silently satisfied.

    Plan: tombstone keys are |requests| rows by construction — they
    broadcast; the fact table gets a narrow flag projection and one
    conditional global aggregate.  The only hash exchanges are
    tombstone-sized (the key distinct, twice) and the
    ``entities_purged`` count-distinct, whose partial aggregate
    dedups entity keys MAP-SIDE first — that exchange carries at most
    |hit entities| keys per task, never fact rows.  At 10^12 rows
    this is one fact scan, which is the floor for any audit that
    counts rows.
    """
    keys = tombstones.select(F.col(entity_col).alias("__forget")).distinct()
    flagged = df.join(
        F.broadcast(keys),
        df[entity_col] == F.col("__forget"),
        "left",
    ).select(
        F.col("__forget").isNotNull().alias("__hit"),
        df[entity_col].alias("__e"),
    )
    fact = flagged.agg(
        F.sum(F.when(F.col("__hit"), 1).otherwise(0))
        .cast("bigint")
        .alias("rows_purged"),
        F.sum(F.when(F.col("__hit"), 0).otherwise(1))
        .cast("bigint")
        .alias("rows_kept"),
        F.countDistinct(F.when(F.col("__hit"), F.col("__e")))
        .cast("bigint")
        .alias("entities_purged"),
        F.count(F.lit(1)).cast("bigint").alias("__total"),
    )
    req = keys.agg(F.count(F.lit(1)).cast("bigint").alias("entities_requested"))
    return fact.crossJoin(F.broadcast(req)).select(
        "entities_requested",
        "entities_purged",
        (F.col("entities_requested") - F.col("entities_purged"))
        .cast("bigint")
        .alias("entities_not_found"),
        "rows_purged",
        "rows_kept",
        F.expr("rows_purged * 1000000 DIV __total")
        .cast("bigint")
        .alias("purged_share_micro"),
    )


def l_diversity_report(
    df: DataFrame,
    qi: dict[str, F.Column],
    sensitive: F.Column,
    l_threshold: int = 3,
) -> DataFrame:
    """l-diversity audit — the companion gate to ``k_anonymity_report``:
    k-anonymity bounds re-identification but a class of 50 rows that
    all share ONE sensitive value still leaks the attribute
    (homogeneity attack); l-diversity requires every quasi-identifier
    equivalence class to contain >= l DISTINCT sensitive values.

    Output, one row per distinct diversity level: ``(sensitive_distinct,
    n_groups, n_rows, below_l)`` — the diversity histogram of the QI
    partition, flagging classes below ``l_threshold``.

    Plan: one groupBy over (QI, sensitive) collapses duplicates
    map-side, a second over QI counts distinct values and rows exactly
    (two narrow re-aggregations of an already-exchanged frame — Spark
    plans the countDistinct as a two-phase expand over ONE corpus
    exchange), then a |distinct QI|-sized rollup.  Never a self-join,
    all exact int64.  NULL sensitive values count as one distinct
    level (documented: NULL is itself a leak-relevant value).
    """
    if not qi:
        raise ValueError("l_diversity_report needs at least one QI column")
    pairs = df.groupBy(
        *[col.alias(name) for name, col in qi.items()],
        F.coalesce(sensitive.cast("string"), F.lit("\x00NULL")).alias("__s"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("__rows"))
    classes = pairs.groupBy(*qi.keys()).agg(
        F.count(F.lit(1)).cast("bigint").alias("__l"),
        F.sum("__rows").cast("bigint").alias("__n"),
    )
    return (
        classes.groupBy(F.col("__l").alias("sensitive_distinct"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_groups"),
            F.sum("__n").cast("bigint").alias("n_rows"),
        )
        .select(
            "sensitive_distinct",
            "n_groups",
            "n_rows",
            (F.col("sensitive_distinct") < l_threshold).alias("below_l"),
        )
    )


def cold_start_report(
    df: DataFrame,
    split_ts,
    entity_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Cold-start coverage audit for a temporal train/serve split: of
    the entities active AFTER ``split_ts``, how many have NO history
    before it?  A feature store backfilled to the split serves those
    entities all-NULL/default features — a silent quality cliff the
    usual row-count checks never see.  Reports entity and event-level
    exposure: ``(n_entities_post, n_cold_entities,
    cold_entity_share_micro, n_events_post, n_events_cold,
    cold_event_share_micro)``.

    Plan: ONE conditional per-entity aggregate (min ts + post-split
    event count — the single entity-key exchange), then a one-row
    rollup.  Zero joins, exact integer shares; the corpus is scanned
    once, which is the floor for any coverage audit.
    """
    ts = F.col(ts_col).cast("timestamp")
    split = F.lit(split_ts).cast("timestamp")
    per = df.groupBy(F.col(entity_col).alias("__e")).agg(
        F.min(ts).alias("__first"),
        F.sum(F.when(ts >= split, 1).otherwise(0))
        .cast("bigint")
        .alias("__post"),
    )
    return per.where(F.col("__post") > 0).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_entities_post"),
        F.sum(F.when(F.col("__first") >= split, 1).otherwise(0))
        .cast("bigint")
        .alias("n_cold_entities"),
        F.sum("__post").cast("bigint").alias("n_events_post"),
        F.sum(F.when(F.col("__first") >= split, F.col("__post")).otherwise(0))
        .cast("bigint")
        .alias("n_events_cold"),
    ).select(
        "n_entities_post",
        "n_cold_entities",
        F.when(
            F.col("n_entities_post") > 0,
            F.expr("n_cold_entities * 1000000 DIV n_entities_post"),
        )
        .cast("bigint")
        .alias("cold_entity_share_micro"),
        "n_events_post",
        "n_events_cold",
        F.when(
            F.col("n_events_post") > 0,
            F.expr("n_events_cold * 1000000 DIV n_events_post"),
        )
        .cast("bigint")
        .alias("cold_event_share_micro"),
    )
