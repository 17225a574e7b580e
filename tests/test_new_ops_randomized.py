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
