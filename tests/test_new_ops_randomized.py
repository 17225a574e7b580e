"""Randomized adversarial batches for the round-5 second-pass operators —
one Spark job per test over a seeded corpus, checked row-for-row against an
independent pure-python oracle (the hypothesis-style strategy, batched so
Spark runs once, not per example)."""

import hashlib
import random
import re

from pyspark.sql import functions as F

from knowledge_graph_rag_spark.functions.pii import PII_PATTERNS, pii_doc_cols
from knowledge_graph_rag_spark.operators.decontam import decontaminate
from knowledge_graph_rag_spark.operators.sampling import train_val_test_split


def _random_pii_strings(n=400, seed=7):
    """Adversarial mix: digit runs, dots, dashes, @s, plausible and broken
    identifiers, boundary punctuation."""
    rng = random.Random(seed)
    frags = [
        "a@b.io", "x.y@z.example.com", "@nohost", "user@", "1.2.3.4",
        "999.999.999.999", "1.2.3", "12.34.56.78.90", "123-45-6789",
        "123-456-789", "4111-1111-1111-1234", "4111 1111 1111 1234",
        "4111-1111-1111", "+1-555-123-4567", "+44 207 946 0958",
        "+1-55-123-4567", "version 1.2.3", "pkg-1.2-3.4", "a-b-c-d",
        "ssn: 000-00-0000.", "(12.13.14.15)", "x", "", "  ", "...",
        "a@b.c@d.ee", "-123-45-6789-", "tel:+1-555-123-4567",
    ]
    words = ["alpha", "beta", "gamma", "42", "7.5", "x9", "--", "@", "."]
    out = []
    for _ in range(n):
        k = rng.randrange(1, 8)
        parts = [rng.choice(frags if rng.random() < 0.5 else words)
                 for _ in range(k)]
        out.append(" ".join(parts))
    return out


def test_pii_patterns_agree_with_python_re_on_adversarial_strings(spark):
    """The cross-engine-subset claim, stress-tested: for 400 adversarial
    strings, Spark's Java-regex counts and redaction equal Python re's
    (three engines total with the DuckDB oracle entry)."""
    texts = _random_pii_strings()
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i int, text string"
    )
    got = {
        r["i"]: r
        for r in df.withColumns(pii_doc_cols(F.col("text"))).collect()
    }
    for i, t in enumerate(texts):
        red = t
        for cls in ("email", "card", "ssn", "phone", "ipv4"):
            pat, tok = PII_PATTERNS[cls]
            assert got[i][f"pii_{cls}"] == len(re.findall(pat, t)), (i, cls, t)
        for cls in ("email", "card", "ssn", "phone", "ipv4"):
            pat, tok = PII_PATTERNS[cls]
            red = re.sub(pat, tok, red)
        assert got[i]["redacted_text"] == red, (i, t)


def test_decontaminate_random_corpus_matches_python(spark):
    """Random word-soup corpus + benchmark: per-doc gram counts, overlap
    counts and flags match the python set computation exactly."""
    rng = random.Random(23)
    vocab = [f"w{j}" for j in range(40)]
    mk = lambda n: " ".join(rng.choice(vocab) for _ in range(n))  # noqa: E731
    corpus = [(i, mk(rng.randrange(0, 25))) for i in range(150)]
    bench = [(1000 + i, mk(rng.randrange(5, 20))) for i in range(10)]

    def grams(t, n=3):
        w = [x for x in re.split(r"\W+", t.lower()) if x]
        return {" ".join(w[i:i + n]) for i in range(len(w) - n + 1)}

    bg = set().union(*(grams(t) for _, t in bench)) if bench else set()
    out = {
        r["doc_id"]: r
        for r in decontaminate(
            spark.createDataFrame(corpus, "doc_id int, text string"),
            spark.createDataFrame(bench, "doc_id int, text string"),
            n=3,
        ).collect()
    }
    for i, t in corpus:
        g = grams(t)
        if not g:
            assert i not in out
            continue
        hit = len(g & bg)
        assert out[i]["n_grams"] == len(g), i
        assert out[i]["n_contaminated"] == hit, i
        assert out[i]["contaminated"] == (hit > 0), i


def test_train_val_test_split_matches_python_md5(spark):
    """Assignment for arbitrary string keys equals the python md5-bucket
    computation under the same cumulative thresholds."""
    rng = random.Random(99)
    keys = [
        "".join(rng.choice("abcdef:/-.0123456789") for _ in range(rng.randrange(1, 20)))
        for _ in range(300)
    ]
    keys = list(dict.fromkeys(keys))  # unique
    weights = {"train": 0.7, "val": 0.2, "test": 0.1}
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    got = {r.k: r.split for r in train_val_test_split(df, "k", weights).collect()}
    for k in keys:
        b = int(hashlib.md5(k.encode()).hexdigest()[:4], 16)
        if b < int(0.7 * 65536):
            want = "train"
        elif b < int(0.9 * 65536):
            want = "val"
        else:
            want = "test"
        assert got[k] == want, (k, b)


def test_bigram_lm_scores_match_python_and_rank_gibberish(spark):
    """avg_nll equals a pure-python add-k bigram model to 1e-9 (pre-round),
    and a doc of corpus-atypical transitions scores strictly higher than a
    corpus-typical one."""
    import math
    from collections import Counter

    from knowledge_graph_rag_spark.operators.lmscore import bigram_lm_scores

    rng = random.Random(5)
    vocab = ["the", "cat", "sat", "on", "mat", "dog", "ran", "fast"]
    # corpus-typical docs: markov-ish chains over a small pattern
    rows = [
        (i, " ".join("the cat sat on the mat".split() * rng.randrange(1, 4)))
        for i in range(20)
    ]
    rows.append((100, " ".join(rng.choice(vocab) for _ in range(24))))  # shuffled
    rows.append((101, "mat fast ran dog zzz qqq"))                       # atypical
    rows.append((102, "single"))                                         # no bigrams
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r.doc_id: r for r in bigram_lm_scores(df, round_digits=9).collect()}

    # python oracle
    def toks(t):
        return [x for x in re.split(r"\W+", t.lower()) if x]

    all_toks = [toks(t) for _, t in rows]
    V = len({w for ws in all_toks for w in ws})
    bis = [(ws[i], ws[i + 1]) for ws in all_toks for i in range(len(ws) - 1)]
    c2, c1 = Counter(bis), Counter(w1 for w1, _ in bis)
    for (i, t), ws in zip(rows, all_toks):
        if len(ws) < 2:
            assert i not in got
            continue
        nlls = [
            -math.log((c2[(a, b)] + 0.5) / (c1[a] + 0.5 * V))
            for a, b in zip(ws, ws[1:])
        ]
        assert got[i].n_bigrams == len(nlls)
        assert abs(got[i].avg_nll - sum(nlls) / len(nlls)) < 1e-9, i
    # fluency ranking: typical << atypical
    assert got[0].avg_nll < got[101].avg_nll


def test_lexical_diversity_matches_python_and_ranks_repetition(spark, tmp_path):
    """Per-doc TTR and token entropy equal the python computation to 1e-9
    (pre-round), and a one-phrase-repeated doc scores strictly lower on
    both than a diverse doc."""
    import math
    from collections import Counter

    from knowledge_graph_rag_spark.plans.driver_queries import (
        lexical_diversity_scores,
    )

    rows = [
        (0, "spam spam spam spam spam spam spam spam"),
        (1, "eight entirely distinct words compose this varied sentence"),
        (2, "half half varied tokens appear appear in here"),
    ]
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    got = {
        r.doc_id: r
        for r in lexical_diversity_scores(spark, str(tmp_path)).collect()
    }

    for i, t in rows:
        c = Counter(re.split(r"\W+", t.lower()))
        c.pop("", None)
        n = sum(c.values())
        ttr = len(c) / n
        ent = math.log(n) - sum(v * math.log(v) for v in c.values()) / n
        assert got[i].n_tokens == n and got[i].n_types == len(c)
        assert abs(got[i].ttr - round(ttr, 4)) < 1e-9, i
        assert abs(got[i].entropy - round(ent, 4)) < 1e-9, i
    assert got[0].entropy < got[2].entropy < got[1].entropy
    assert got[0].ttr < got[1].ttr
