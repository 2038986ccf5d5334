"""W8 fuzzy-search kernel: the OSA edit-distance budget check must agree
with the oracle's damerau_levenshtein exactly (the engine and SQL sides of
fuzzy_search share these semantics)."""

import random

import duckdb

from ocr_ray.ops.extraction_queries import _auto_fuzziness, _osa_within


def test_auto_fuzziness_tiers():
    # ES "AUTO": 0 edits below 3 chars, 1 for 3-5, 2 for 6+
    assert [_auto_fuzziness(t) for t in ("a", "do", "cas", "casas", "casass")] \
        == [0, 0, 1, 1, 2]


def test_osa_transpositions_count_as_one():
    assert _osa_within("abdc", "abcd", 1)
    assert _osa_within("acsa", "casa", 1)
    assert not _osa_within("dcba", "abcd", 2)  # two swaps + more


def test_osa_matches_duckdb_damerau_levenshtein():
    rng = random.Random(7)
    syl = "ca sa do ra mi to ve la por tu es den fi lo mu".split()
    words = ["".join(rng.choices(syl, k=rng.randint(1, 3))) for _ in range(200)]
    terms = [("casa", 1), ("porto", 1), ("cassa", 1), ("do", 0), ("portos", 2)]
    con = duckdb.connect()
    for w in set(words):
        for t, cap in terms:
            d = con.sql(
                f"SELECT damerau_levenshtein('{w}', '{t}')"
            ).fetchone()[0]
            assert _osa_within(w, t, cap) == (d <= cap), (w, t, cap, d)
