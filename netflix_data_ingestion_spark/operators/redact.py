"""PII detection and redaction — beyond-reference (BASELINE.json north
star; the reference stores raw customer rows with no scrubbing,
schema.sql:42-56).

Training-corpus hygiene: find and mask email addresses, phone numbers,
and SSN-shaped identifiers before text reaches a training shard, and
report per-document counts so the pipeline can quarantine high-PII
sources instead of silently laundering them.

Plan shape: a PURE NARROW MAP — regexp counting + a replace chain as
JVM-side projections, no shuffle, no UDF.  At 100 TB this is one pass
over the corpus fused into whatever scan feeds it (whole-stage
codegen); the regex cost is per-byte and embarrassingly parallel.

Regex portability: the patterns use only syntax with IDENTICAL
semantics in Java regex (Spark) and RE2 (the DuckDB oracle) — ASCII
character classes, bounded repetition, ``\\b`` word boundaries, ``\\d``
ASCII digits.  No lookaround (RE2 has none), no possessive
quantifiers, no unicode classes.  That keeps every count and every
replacement bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Portable patterns (Java regex == RE2 semantics for this subset)
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"
SSN_RE = r"\b\d{3}-\d{2}-\d{4}\b"

_CATEGORIES = [
    # (name, pattern, replacement) — SSN before PHONE so the 3-2-4 shape
    # is classified before the generic phone pass sees the text (the two
    # patterns cannot match the same span, but explicit order makes the
    # precedence auditable)
    ("ssn", SSN_RE, "[SSN]"),
    ("phone", PHONE_RE, "[PHONE]"),
    ("email", EMAIL_RE, "[EMAIL]"),
]


def _count(text: Column, pattern: str) -> Column:
    return F.coalesce(
        F.size(F.regexp_extract_all(text, F.lit(pattern), F.lit(0))),
        F.lit(0),
    ).cast("long")


def redact_pii(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, redacted_text, n_ssns, n_phones, n_emails, has_pii) — masked
    text plus per-category match counts.

    Counts are taken against the ORIGINAL text (before any replacement)
    so categories cannot shadow each other; replacements run as a chain
    whose placeholders (``[SSN]`` etc.) contain no digits or ``@`` and
    therefore cannot be re-matched by a later pattern.
    """
    text = F.col(text_col)
    redacted = text
    for _, pattern, repl in _CATEGORIES:
        redacted = F.regexp_replace(redacted, F.lit(pattern), F.lit(repl))
    counts = {name: _count(text, pat) for name, pat, _ in _CATEGORIES}
    return df.select(
        F.col(id_col),
        redacted.alias("redacted_text"),
        counts["ssn"].alias("n_ssns"),
        counts["phone"].alias("n_phones"),
        counts["email"].alias("n_emails"),
        (
            (counts["ssn"] + counts["phone"] + counts["email"]) > 0
        ).alias("has_pii"),
    )


def pseudonymize(
    df: DataFrame,
    cols: list[str],
    salt: str = "v1",
    keep_prefix: int = 16,
) -> DataFrame:
    """Replace identifier columns with salted md5 surrogates —
    deterministic PSEUDONYMIZATION (GDPR art. 4(5) sense): the same
    input value always maps to the same surrogate, so joins,
    group-bys, and train/test splits on the pseudonymized frame behave
    exactly like the original, while the raw identifier leaves the
    dataset.  The salt is the re-identification secret: without it the
    mapping cannot be rebuilt by hashing guesses, and rotating it
    unlinks releases from each other.  (This complements `redact_pii`,
    which handles identifiers embedded in free TEXT; this handles the
    structured key columns.)

    Pure narrow map, one md5 per cell; NULLs stay NULL (md5(NULL) is
    NULL, preserving join semantics on missing keys).  ``keep_prefix``
    truncates the surrogate (collision odds 2^-keep_prefix*2 — 16 hex
    chars = 64 bits is plenty below trillions of distinct keys).
    """
    out = df
    for c in cols:
        out = out.withColumn(
            c,
            F.substring(
                F.md5(
                    F.concat(F.lit(f"{salt}|"), F.col(c).cast("string"))
                ),
                1,
                keep_prefix,
            ),
        )
    return out


def k_anonymity_suppress(
    df: DataFrame,
    quasi_cols: list[str],
    k: int = 5,
) -> DataFrame:
    """Input + ``group_size`` + ``suppressed`` — k-anonymity enforcement
    over the quasi-identifier columns (Sweeney 2002): any row whose
    (quasi_cols) combination is shared by FEWER than ``k`` rows is
    re-identifiable by linkage and gets its quasi-identifiers nulled
    (suppressed = 1); rows in groups of >= k pass through.  The release
    gate after `pseudonymize` has replaced the direct identifiers —
    pseudonyms stop linkage on the key, k-anonymity stops linkage on
    the quasi-identifiers.

    Plan: one combinable group-size aggregate joined back on the quasi
    columns (broadcast when the combination space is small), then a
    narrow conditional null-out.  Suppression (not generalization) is
    the deterministic, hierarchy-free variant — generalization needs a
    domain taxonomy the engine cannot invent.
    """
    sizes = df.groupBy(*quasi_cols).agg(
        F.count("*").cast("long").alias("group_size")
    )
    out = df.join(sizes, list(quasi_cols), "left")
    suppressed = (F.col("group_size") < k).cast("int")
    for c in quasi_cols:
        out = out.withColumn(
            c, F.when(F.col("group_size") >= k, F.col(c))
        )
    return out.withColumn("suppressed", suppressed)
