from __future__ import annotations

import random

from netflix_data_ingestion_spark.operators.fuzzy import fuzzy_name_pairs


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_blocking_is_lossless_vs_brute_force(spark):
    rng = random.Random(11)
    words = list(
        {
            "".join(rng.choice("abc") for _ in range(rng.randint(1, 9)))
            for _ in range(120)
        }
    )
    df = spark.createDataFrame([(w,) for w in words], ["name"])
    got = {
        (r["name_a"], r["name_b"]): r["dist"]
        for r in fuzzy_name_pairs(df, "name", max_dist=2).collect()
    }
    want = {}
    for i, a in enumerate(sorted(words)):
        for b in sorted(words)[i + 1 :]:
            d = _lev(a, b)
            if 1 <= d <= 2:
                want[(a, b)] = d
    assert got == want  # equality: lossless AND duplicate-free


def test_duplicate_corpus_rows_collapse(spark):
    df = spark.createDataFrame(
        [("cat",), ("cat",), ("cap",), ("dog",)], ["name"]
    )
    rows = fuzzy_name_pairs(df, "name", max_dist=1).collect()
    assert len(rows) == 1
    assert (rows[0]["name_a"], rows[0]["name_b"], rows[0]["dist"]) == (
        "cap",
        "cat",
        1,
    )


def test_length_band_excludes_far_lengths_but_keeps_boundary(spark):
    # "ab" vs "abxy" is distance 2 with length gap 2 -> must be found
    df = spark.createDataFrame([("ab",), ("abxy",)], ["name"])
    rows = fuzzy_name_pairs(df, "name", max_dist=2).collect()
    assert [(r["name_a"], r["name_b"]) for r in rows] == [("ab", "abxy")]


def test_resolve_entities_transitive_chain(spark):
    """a~b and b~c link (dist 1 each) but a~c is dist 2 via different
    edits — the chain still forms ONE entity (transitive closure), with
    the min name canonical; unrelated names stay singletons."""
    from netflix_data_ingestion_spark.operators.fuzzy import (
        resolve_entities,
    )

    df = spark.createDataFrame(
        [("acme corp",), ("acme corpx",), ("acme corpxy",),
         ("zebra ltd",), (None,)],
        "name string",
    )
    out = {
        r["name"]: (r["entity_id"], r["entity_size"], r["is_canonical"])
        for r in resolve_entities(df, "name", max_dist=2).collect()
    }
    assert out["acme corp"] == ("acme corp", 3, True)
    assert out["acme corpx"] == ("acme corp", 3, False)
    assert out["acme corpxy"] == ("acme corp", 3, False)
    assert out["zebra ltd"] == ("zebra ltd", 1, True)
    assert None not in out and len(out) == 4
