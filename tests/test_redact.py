"""PII redaction (operators/redact.py)."""

from netflix_data_ingestion_spark.operators.redact import redact_pii


def test_redact_all_categories(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at jo.doe+x@sub.example.co or 555-123-4567 ok"),
            (2, "ssn is 123-45-6789 and backup 987-65-4321"),
            (3, "clean text with number 12345 and date 2024-01-01"),
            (4, "dotted phone 555.123.4567 works too"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in redact_pii(df, "doc_id", "text").collect()}

    r1 = rows[1]
    assert r1["redacted_text"] == "mail me at [EMAIL] or [PHONE] ok"
    assert (r1["n_emails"], r1["n_phones"], r1["n_ssns"]) == (1, 1, 0)
    assert r1["has_pii"]

    r2 = rows[2]
    assert r2["redacted_text"] == "ssn is [SSN] and backup [SSN]"
    assert r2["n_ssns"] == 2

    # 5-digit number and ISO date must NOT be flagged
    r3 = rows[3]
    assert r3["redacted_text"] == r3["redacted_text"]
    assert not r3["has_pii"]
    assert r3["n_phones"] == 0 and r3["n_ssns"] == 0

    assert rows[4]["n_phones"] == 1
    assert "[PHONE]" in rows[4]["redacted_text"]


def test_redact_counts_against_original_text(spark):
    # an SSN-shaped span must count as SSN, not phone (and not both)
    df = spark.createDataFrame(
        [(1, "id 123-45-6789 here")], "doc_id long, text string"
    )
    r = redact_pii(df, "doc_id", "text").collect()[0]
    assert r["n_ssns"] == 1 and r["n_phones"] == 0
    assert r["redacted_text"] == "id [SSN] here"


def test_k_anonymity_suppression_boundary(spark):
    from netflix_data_ingestion_spark.operators.redact import (
        k_anonymity_suppress,
    )

    rows = (
        [(i, "US", "A") for i in range(5)]       # group of 5: passes at k=5
        + [(10 + i, "US", "B") for i in range(4)]  # group of 4: suppressed
        + [(20, "FR", "A")]                       # singleton: suppressed
    )
    df = spark.createDataFrame(rows, "id long, nation string, seg string")
    got = {r["id"]: r for r in k_anonymity_suppress(
        df, ["nation", "seg"], k=5).collect()}
    for i in range(5):
        r = got[i]
        assert (r["nation"], r["seg"], r["suppressed"]) == ("US", "A", 0)
        assert r["group_size"] == 5
    for i in [10, 11, 12, 13, 20]:
        r = got[i]
        assert r["nation"] is None and r["seg"] is None
        assert r["suppressed"] == 1


def test_pseudonymize_nulls_and_join_preservation(spark):
    from netflix_data_ingestion_spark.operators.redact import pseudonymize

    a = spark.createDataFrame(
        [(1, "alice"), (2, "bob"), (3, None)], "id long, name string"
    )
    b = spark.createDataFrame(
        [(10, "alice"), (11, "carol"), (12, None)], "id long, name string"
    )
    pa = pseudonymize(a, ["name"])
    pb = pseudonymize(b, ["name"])
    # NULLs stay NULL (no phantom surrogate)
    assert {r["id"]: r["name"] for r in pa.collect()}[3] is None
    # joins on the pseudonymized column behave like the original:
    # only 'alice' matches (NULL never joins, same as raw)
    raw = a.join(b.withColumnRenamed("id", "bid"), "name").count()
    pse = pa.join(pb.withColumnRenamed("id", "bid"), "name").count()
    assert raw == pse == 1
    # surrogates are salted: a different salt unlinks them
    other = pseudonymize(a, ["name"], salt="v2")
    assert (
        {r["id"]: r["name"] for r in other.collect()}[1]
        != {r["id"]: r["name"] for r in pa.collect()}[1]
    )
