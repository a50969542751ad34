"""readability + keyness (operators/text.py): hand-computed scores
and planted-vocabulary recovery."""

import math

import pytest

from recdb_postgresql_spark.operators import text


def test_readability_hand_computed(spark):
    # "The cat sat. It ran!" -> words: the(1) cat(1) sat(1) it(1)
    # ran(1) = 5 words, 5 syllables, 2 sentences
    df = spark.createDataFrame([(1, "The cat sat. It ran!")],
                               ["doc_id", "text"])
    r = text.readability(df).collect()[0]
    assert (r["n_words"], r["n_sentences"], r["n_syllables"]) == (5, 2, 5)
    wps, spw = 5 / 2, 5 / 5
    assert r["flesch"] == round(206.835 - 1.015 * wps - 84.6 * spw, 4)
    assert r["fk_grade"] == round(0.39 * wps + 11.8 * spw - 15.59, 4)


def test_readability_syllable_floor_and_vowel_groups(spark):
    # "rhythm" has no aeiouy-group except 'y' -> 1; "queue" -> 1
    # ("ueue" is one run); "banana" -> 3
    df = spark.createDataFrame([(1, "rhythm queue banana")],
                               ["doc_id", "text"])
    r = text.readability(df).collect()[0]
    assert r["n_words"] == 3
    assert r["n_syllables"] == 1 + 1 + 3
    assert r["n_sentences"] == 1  # no terminal punctuation -> floor 1


def test_readability_drops_wordless_docs(spark):
    df = spark.createDataFrame([(1, "12345 !!!"), (2, "words here.")],
                               ["doc_id", "text"])
    out = text.readability(df).collect()
    assert [r["doc_id"] for r in out] == [2]


def test_keyness_recovers_planted_vocabulary(spark):
    # source A over-uses 'zebra'; B over-uses 'yak'; shared filler
    filler = "the data point moves along the line "
    rows = ([(i, "A", filler + "zebra zebra") for i in range(30)]
            + [(100 + i, "B", filler + "yak yak") for i in range(30)])
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    out = text.keyness(df, group_col="source", k=3, min_count=5).collect()
    top = {r["source"]: [x["term"] for x in out if x["source"] == r["source"]]
           for r in out}
    assert top["A"][0] == "zebra" and top["B"][0] == "yak"
    za = [r for r in out if r["source"] == "A" and r["term"] == "zebra"][0]
    assert za["overused"] and za["n_group"] == 60 and za["n_rest"] == 0


def test_keyness_g2_manual(spark):
    # 2 groups, tiny exact counts: g2 for 'x' in A
    rows = ([(1, "A", "x x x y")] + [(2, "B", "y y y y")])
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    out = {(r["source"], r["term"]): r for r in
           text.keyness(df, group_col="source", k=5, min_count=1).collect()}
    a, t_tot, g_tot, n = 3.0, 3.0, 4.0, 8.0
    e1 = t_tot * g_tot / n
    g2 = 2 * (a * math.log(a / e1))  # b = 0 -> its term drops
    assert out[("A", "x")]["g2"] == pytest.approx(round(g2, 6))
    assert out[("A", "x")]["overused"]


def test_textrank_central_word_wins(spark):
    """A hub word co-occurring with many distinct contexts outranks a
    word that merely repeats inside one context."""
    from recdb_postgresql_spark.operators.text import textrank_keywords
    docs = [
        (1, "alpha bridge beta"), (2, "gamma bridge delta"),
        (3, "epsilon bridge zeta"), (4, "theta bridge iota"),
        # 'noise' repeats a lot but only ever next to 'kappa'
        (5, "noise kappa noise kappa noise kappa noise kappa"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = textrank_keywords(df, window=1, iterations=6, k=20, min_len=4)
    ranks = {r["word"]: r["rank"] for r in out.collect()}
    assert ranks["bridge"] == max(ranks.values())
    assert ranks["bridge"] > ranks["noise"]


def test_textrank_min_len_and_window(spark):
    from recdb_postgresql_spark.operators.text import textrank_keywords
    df = spark.createDataFrame(
        [(1, "the cat and dog ran the race")], ["doc_id", "text"])
    out = [r["word"] for r in
           textrank_keywords(df, window=1, k=20, min_len=4).collect()]
    # 3-letter words never enter the graph
    assert all(len(w) >= 4 for w in out)
    # positions keep the ORIGINAL sequence: 'race' (pos 7) is not
    # within window 1 of 'ran' (pos 5) despite 'the' being filtered
    assert "race" not in out and "ran" not in out


def test_collocations_pmi_and_floor(spark):
    import math

    from recdb_postgresql_spark.operators import text as T
    docs = spark.createDataFrame(
        [(1, "new york " * 3 + "alpha beta", "en", "s", 10),
         (2, "new york again and again", "en", "s", 10)],
        ["doc_id", "text", "lang", "source", "n_chars"])
    rows = {(r["w1"], r["w2"]): r
            for r in T.collocations(docs, k=10, min_count=2).collect()}
    # "new york" appears 4 times; hapax pairs are floored out
    assert ("alpha", "beta") not in rows
    r = rows[("new", "york")]
    assert r["n_pair"] == 4
    # corpus: 13 tokens doc1? -> compute exactly: doc1 has 8 tokens,
    # doc2 has 5 -> nu=13; bigrams per doc = len-1 -> nb=7+4=11
    expect = math.log((4 / 11) / ((4 / 13) * (4 / 13)))
    assert abs(r["pmi"] - round(expect, 6)) < 1e-9


def test_vocabulary_coverage_closed_forms(spark):
    from recdb_postgresql_spark.operators import text as T
    # tokens: a a a b b c d -> V=4, N=7, n1=2 (c,d), n2=1 (b)
    docs = spark.createDataFrame(
        [(1, "a a a b b c d", "en", "s", 13)],
        ["doc_id", "text", "lang", "source", "n_chars"])
    r = T.vocabulary_coverage(docs).collect()[0]
    assert (r["n_tokens"], r["vocab"], r["n1"], r["n2"]) == (7, 4, 2, 1)
    assert abs(r["missing_mass"] - 2 / 7) < 1e-6
    assert r["chao1"] == 4 + 2 * 2 / 2  # V + n1^2/(2 n2) = 6
