"""BPE tokenizer: deterministic merge learning on the classic low/lower
corpus, greedy encoding, round-trip, and degenerate-corpus stops."""

from __future__ import annotations

from pyspark.sql import functions as F

from australia_company_etl_pipeline_spark.operators import bpe


def _corpus(spark):
    return spark.createDataFrame(
        [("low low low low low",),
         ("lower lower newer newer newer newer",),
         ("newest widest",)],
        "text string")


def test_train_bpe_merge_order(spark):
    """Hand-computed first three merges: (l,o) wins the 7-count tie
    lexicographically, then (lo,w) the next tie, then (e,r) at 6."""
    merges = bpe.train_bpe(_corpus(spark), "text", n_merges=3)
    assert merges == [("l", "o"), ("lo", "w"), ("e", "r")]


def test_encode_greedy_and_roundtrip(spark):
    merges = bpe.train_bpe(_corpus(spark), "text", n_merges=3)
    df = spark.createDataFrame(
        [(0, "low"), (1, "lower"), (2, "newest"), (3, "low-er"),
         (4, None)],
        "id long, text string")
    got = {r.id: r.toks for r in
           df.select("id", bpe.encode(F.col("text"), merges)
                     .alias("toks")).collect()}
    assert got[0] == ["low"]
    assert got[1] == ["low", "er"]
    assert got[2] == ["n", "e", "w", "e", "s", "t"]
    assert got[3] == ["low", "-", "er"]        # punctuation is its own unit
    assert got[4] is None
    # lossless per unit: decode(encode) == unit concatenation
    back = {r.id: r.t for r in
            df.filter(F.col("text").isNotNull())
            .select("id", bpe.decode(bpe.encode(F.col("text"), merges))
                    .alias("t")).collect()}
    assert back == {0: "low", 1: "lower", 2: "newest", 3: "low-er"}


def test_token_count_vs_upper_bound(spark):
    """The trained count is at most the unit count times max word length
    and at least the unit count; with enough merges frequent words
    compress to one token."""
    corpus = _corpus(spark)
    merges = bpe.train_bpe(corpus, "text", n_merges=50)
    out = corpus.select(
        bpe.token_count(F.col("text"), merges).alias("n_bpe"),
        F.regexp_count(F.col("text"), F.lit(r"(?U)\w+|[^\w\s]"))
        .alias("n_units")).collect()
    for r in out:
        assert r.n_bpe >= r.n_units            # subwords ≥ whole words
    # every repeated word in the training corpus compresses fully
    single = spark.createDataFrame([("low lower newer",)], "text string")
    (row,) = single.select(
        bpe.encode(F.col("text"), merges).alias("t")).collect()
    assert row.t == ["low", "lower", "newer"]


def test_train_bpe_stops_when_no_pairs_repeat(spark):
    """All-distinct single-char words: nothing reaches min_pair_count."""
    df = spark.createDataFrame([("a b c d",)], "text string")
    assert bpe.train_bpe(df, "text", n_merges=10) == []
    # min_pair_count=1 lets singleton pairs merge (multi-char words)
    df2 = spark.createDataFrame([("ab",)], "text string")
    assert bpe.train_bpe(df2, "text", n_merges=10,
                         min_pair_count=1) == [("a", "b")]


def test_word_counts_ordering_and_cap(spark):
    wc = bpe.word_counts(_corpus(spark), "text", max_words=3).collect()
    assert [(r.word, r.n) for r in wc] == [
        ("low", 5), ("newer", 4), ("lower", 2)]


def test_bpe_roundtrip_fuzz(spark):
    """Property over a seeded adversarial corpus: for ANY merge table,
    decode(encode(text)) reproduces the pre-tokenization units verbatim
    (merges only ever concatenate adjacent symbols of one unit), and a
    trainer given min_pair_count=1 and enough merges compresses every
    corpus word to a single token."""
    import random
    import re as _re

    rng = random.Random(11)
    alphabet = "abcdeé日 x-.!"
    texts = ["".join(rng.choice(alphabet) for _ in range(rng.randint(0, 30)))
             for _ in range(150)] + ["", "   ", "aaaa aaaa", "é日é日",
                                     "a-b-c!", "x" * 200]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    # arbitrary (untrained) merge table exercising partial overlaps
    merges = [("a", "a"), ("aa", "a"), ("é", "日"), ("-", "."),
              ("b", "c"), ("a", "bc")]
    unit_re = _re.compile(r"\w+|[^\w\s]", _re.UNICODE)
    got = df.select("text",
                    bpe.decode(bpe.encode(F.col("text"), merges))
                    .alias("rt")).collect()
    for r in got:
        assert r.rt == "".join(unit_re.findall(r.text)), r.text
    full = bpe.train_bpe(df, "text", n_merges=2000, min_pair_count=1)
    enc = {r.text: r.t for r in
           df.select("text", bpe.encode(F.col("text"), full).alias("t"))
           .collect()}
    for t, toks in enc.items():
        assert toks == unit_re.findall(t), t   # every unit → ONE token


def test_unit_split_consistent_for_combining_marks(spark):
    """Java's (?U)\\w includes combining marks; Python's re does not.
    Training and encoding must use the SAME (Java) split, or merges
    learned over Indic/decomposed-accent words could never fire at
    encode time. 'हिन्दी' is one Java unit; with min_pair_count=1 the
    trained encoder must emit it as ONE token, and the round-trip must
    match the JVM-side unit concatenation."""
    df = spark.createDataFrame(
        [("हिन्दी हिन्दी éclair",)], "text string")
    merges = bpe.train_bpe(df, "text", n_merges=100, min_pair_count=1)
    (row,) = df.select(
        bpe.encode(F.col("text"), merges).alias("t"),
        bpe.decode(bpe.encode(F.col("text"), merges)).alias("rt"),
        F.array_join(
            F.regexp_extract_all(F.col("text"),
                                 F.lit(r"(?U)\w+|[^\w\s]"), 0), "")
        .alias("units")).collect()
    assert row.t == ["हिन्दी", "हिन्दी", "éclair"]
    assert row.rt == row.units


def test_registered_merge_table_chained_replace_equivalence(spark,
                                                            sf_dir):
    """The pack_docs kind='bpe' oracle simulates the greedy encoder by
    applying _BPE_MERGES in rank order via chained replaces. That is
    only equal to greedy lowest-rank-first encoding while the merge
    table stays well-formed (operands are chars or lower-ranked
    outputs) AND two replace passes reach the fixpoint for every word
    the corpus can produce — this pins both over the ACTUAL corpus
    vocabulary, so a testdata regen that breaks the equivalence fails
    here instead of as an opaque driver hash mismatch."""
    import re

    from australia_company_etl_pipeline_spark.catalog import table
    from australia_company_etl_pipeline_spark.operators.bpe import (
        _bpe_word)
    from australia_company_etl_pipeline_spark.plans.text import (
        _BPE_MERGES)

    # well-formedness: every operand is a single char or an
    # earlier-ranked merge's output, and outputs are unique
    outputs = []
    for x, y in _BPE_MERGES:
        for operand in (x, y):
            assert len(operand) == 1 or operand in outputs, \
                f"operand {operand!r} not produced by a lower rank"
        out = x + y
        assert out not in outputs, f"duplicate output {out!r}"
        outputs.append(out)

    ranks = {tuple(m): i for i, m in enumerate(_BPE_MERGES)}

    def chained(word: str, passes: int = 2) -> list[str]:
        s = " " + " ".join(word) + " "
        for x, y in _BPE_MERGES:
            pat, rep = f" {x} {y} ", f" {x}{y} "
            for _ in range(passes):
                s = s.replace(pat, rep)
        return s.split()

    texts = [r.text for r in
             table(spark, sf_dir, "documents").select("text").collect()]
    vocab = set()
    for t in texts:
        vocab.update(re.findall(r"\w+|[^\w\s]", t))
    assert vocab
    for w in sorted(vocab):
        assert _bpe_word(w, ranks, {}) == chained(w), w


def test_fertility_stats_hand_golden(spark):
    """Sums and ratios replayed by hand: merges [('a','b')] make 'ab'
    one token, everything else chars."""
    merges = [("a", "b")]
    rows = [(0, "en", "ab ab cd"),   # bpe: 1+1+2=4, ws: 3, ch: 8
            (1, "en", "ab"),         # bpe: 1, ws: 1, ch: 2
            (2, "de", "xyz"),        # bpe: 3, ws: 1, ch: 3
            (3, "de", None)]         # all zeros, still counted as a doc
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {r.lang: r for r in
           bpe.fertility_stats(df, merges).collect()}
    en, de = got["en"], got["de"]
    assert (en.n_docs, en.bpe_tokens, en.ws_tokens, en.chars) == (2, 5, 4, 10)
    assert en.tokens_per_word == round(5 / 4, 6)
    assert en.chars_per_token == round(10 / 5, 6)
    assert (de.n_docs, de.bpe_tokens, de.ws_tokens, de.chars) == (2, 3, 1, 3)
    # zero-denominator ratios stay NULL, never divide
    empty = spark.createDataFrame([(0, "fr", "")],
                                  "doc_id long, lang string, text string")
    r = bpe.fertility_stats(empty, merges).head()
    assert r.bpe_tokens == 0 and r.tokens_per_word is None \
        and r.chars_per_token is None
