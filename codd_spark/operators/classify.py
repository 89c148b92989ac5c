"""In-engine text classification: hashed n-gram features + a Naive-Bayes
log-ratio linear model — the fastText-shaped quality gate real curation
pipelines put in front of training data (score every crawl document,
keep above threshold).

Why NB log-ratios instead of gradient-descent logistic regression:
training is pure COUNTING — two aggregates over the corpus — so it is
(a) one shuffle, embarrassingly scalable, with a model bounded at
``n_features`` rows that broadcasts at scoring time, and (b) exactly
replayable by a SQL oracle (integer counts -> ln at the end), where an
iterative float gradient loop would accumulate cross-engine ulp drift.
The construction is the multinomial-NB decision function in log-linear
form (the count-ratio feature weighting of Wang & Manning, ACL'12 —
"NBSVM" without the SVM); on short-text/quality tasks it is the
standard strong-linear baseline.

Scale shape at 100 TB: feature extraction is expression-only
(tokens -> bigrams -> md5 hash -> modulo, all codegen); training is one
(feature)-keyed aggregate plus a 1-row totals aggregate; the model
(<= n_features rows, ~32 KB at 2048) broadcasts, so scoring is a
map-side join — no corpus-sized shuffle anywhere after the count.

Reference parity note: the reference engine has no classifier — this is
part of the LLM-pipeline extension surface (SURVEY.md §2 extensions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from codd_spark.functions.text import tokens


def _md5_60(c):
    """Portable 60-bit hash (top 60 bits of md5 as BIGINT) — the same
    cross-engine hash as winnowing/simhash contract variants; DuckDB
    replica: CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def hashed_text_features(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    n_features: int = 2048,
    bigrams: bool = True,
) -> DataFrame:
    """(id, feature, x): hashed bag-of-n-grams counts per document.

    Features are lowercase whitespace tokens plus (optionally) adjacent
    token bigrams joined with a single space; each hashes to
    ``md5_60(s) % n_features``. Counts keep multiplicity (multinomial
    model). Pure expressions end to end — tokenize, slide, hash, and
    count all stay in codegen."""
    toks = F.array_remove(
        F.transform(tokens(F.col(text_col)), lambda t: F.lower(t)), ""
    )
    feats = toks
    if bigrams:
        bi = F.zip_with(
            F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
            F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
            lambda a, b: F.concat_ws(" ", a, b),
        )
        feats = F.concat(toks, bi)
    return (
        df.select(F.col(id_col).alias("id"), F.explode(feats).alias("s"))
        .select("id", (_md5_60(F.col("s")) % n_features).alias("feature"))
        .groupBy("id", "feature")
        .agg(F.count("*").alias("x"))
    )


def nb_linear_train(
    df: DataFrame,
    label_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    n_features: int = 2048,
    alpha: float = 1.0,
    bigrams: bool = True,
    materialize: bool = True,
) -> DataFrame:
    """Train the NB log-ratio linear model on a labeled corpus
    (``label_col`` in {0, 1}). Returns the MODEL as a DataFrame —
    bounded at ``n_features + 1`` rows:

    - one row per OBSERVED feature: (feature, weight) with
      weight = ln(c1_f + a) - ln(C1 + aD) - ln(c0_f + a) + ln(C0 + aD),
      c/C = class-conditional feature count / total;
    - one row with feature = -1 carrying the scoring constants:
      weight = bias = ln(N1) - ln(N0) (class prior log-odds) and the
      unseen-feature weight w0 = ln(C0 + aD) - ln(C1 + aD) in the
      ``w_unseen`` column (NULL on ordinary rows).

    Everything except the final ln() is exact integer counting, so a
    SQL engine replays the trained weights bit-for-bit (to rounding)."""
    feats = hashed_text_features(
        df, id_col, text_col, n_features=n_features, bigrams=bigrams
    )
    labels = df.select(
        F.col(id_col).alias("id"), F.col(label_col).cast("int").alias("y")
    )
    fl = feats.join(labels, on="id")
    per_f = fl.groupBy("feature").agg(
        F.sum(F.when(F.col("y") == 1, F.col("x")).otherwise(0)).alias("c1"),
        F.sum(F.when(F.col("y") == 0, F.col("x")).otherwise(0)).alias("c0"),
    )
    totals = per_f.agg(
        F.sum("c1").alias("ct1"), F.sum("c0").alias("ct0")
    ).crossJoin(
        labels.agg(
            F.sum(F.col("y")).alias("N1"),
            F.sum(1 - F.col("y")).alias("N0"),
        )
    )
    aD = float(alpha) * n_features
    w = (
        per_f.crossJoin(F.broadcast(totals))
        .select(
            "feature",
            (
                F.log(F.col("c1") + F.lit(float(alpha)))
                - F.log(F.col("ct1") + F.lit(aD))
                - F.log(F.col("c0") + F.lit(float(alpha)))
                + F.log(F.col("ct0") + F.lit(aD))
            ).alias("weight"),
            F.lit(None).cast("double").alias("w_unseen"),
        )
    )
    consts = totals.select(
        F.lit(-1).cast("long").alias("feature"),
        (F.log(F.col("N1").cast("double")) - F.log(F.col("N0").cast("double"))).alias(
            "weight"
        ),
        (
            F.log(F.col("ct0") + F.lit(aD)) - F.log(F.col("ct1") + F.lit(aD))
        ).alias("w_unseen"),
    )
    # materialize the model NOW (bounded at n_features + 1 rows): the
    # scorer broadcasts the weights and the consts as SEPARATE broadcast
    # relations (three in the binary scorer), and each broadcast build of
    # a lazy model plan re-runs the whole training — featurization
    # included (r13 stage profile: 2-3 training evaluations per score).
    # materialize=False returns the LAZY training plan — the seam plan
    # tests use to assert the aggregate shape the checkpoint hides.
    model = w.unionByName(consts)
    return model.localCheckpoint(eager=True) if materialize else model


def nb_linear_score(
    df: DataFrame,
    model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    n_features: int = 2048,
    bigrams: bool = True,
) -> DataFrame:
    """(id, score, pred): NB log-odds score per document under a trained
    model; pred = 1 iff score > 0. The model is bounded, so it
    BROADCASTS — scoring is a map-side join over the feature stream
    plus a per-doc aggregate; unseen features take the model's w0
    constant, empty documents score the bias alone (every input id
    appears in the output)."""
    feats = hashed_text_features(
        df, id_col, text_col, n_features=n_features, bigrams=bigrams
    )
    consts = model.filter(F.col("feature") == -1).select(
        F.col("weight").alias("bias"), F.col("w_unseen").alias("w0")
    )
    weights = model.filter(F.col("feature") >= 0).select("feature", "weight")
    per_doc = (
        feats.join(F.broadcast(weights), on="feature", how="left")
        .crossJoin(F.broadcast(consts))
        .groupBy("id")
        .agg(
            F.sum(
                F.col("x") * F.coalesce(F.col("weight"), F.col("w0"))
            ).alias("dot")
        )
    )
    return (
        df.select(F.col(id_col).alias("id"))
        .join(per_doc, on="id", how="left")
        .crossJoin(F.broadcast(consts))
        .select(
            F.col("id").alias(id_col),
            F.round(F.coalesce(F.col("dot"), F.lit(0.0)) + F.col("bias"), 6).alias(
                "score"
            ),
            (
                (F.coalesce(F.col("dot"), F.lit(0.0)) + F.col("bias")) > 0
            ).cast("int").alias("pred"),
        )
    )


# three 16-word vocabularies for the planted-signal corpus below; module
# constants so the contract oracle and tests inline the same literals
SHARED_VOCAB = [
    "the", "a", "of", "to", "and", "in", "for", "on",
    "with", "by", "from", "at", "as", "is", "was", "are",
]
POS_VOCAB = [
    "excellent", "coherent", "thorough", "insightful", "precise",
    "elegant", "robust", "rigorous", "lucid", "nuanced", "polished",
    "cogent", "vivid", "deft", "astute", "refined",
]
NEG_VOCAB = [
    "spammy", "garbled", "broken", "noisy", "junk", "clickbait",
    "scammy", "bogus", "shoddy", "sloppy", "vapid", "trite",
    "hollow", "clumsy", "murky", "stale",
]


def planted_label_docs(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, y, text): a synthetic LABELED corpus with a real
    token-distribution signal, generated expression-only from ids (the
    q_pii_stats / gradient-PNG pattern — closed-form inputs an oracle
    reconstructs without seeing them). The shipped test corpus draws all
    documents from ONE token pool, so no text-derived label is learnable
    there; a classifier contract needs planted signal.

    Construction: y = doc_id % 2; n_tokens = 30 + doc_id % 20; token i
    draws r = (doc_id*104729 + i*7919) % 96 and picks SHARED_VOCAB[r%16]
    when r < 32, else the class vocabulary's [r%16] — so ~1/3 of tokens
    are class-neutral and ~2/3 are class-pure, trivially separable by
    any working linear trainer (held-out accuracy ~1.0, pinned in
    tests) while still exercising real count-based learning."""
    sh = F.array(*[F.lit(w) for w in SHARED_VOCAB])
    po = F.array(*[F.lit(w) for w in POS_VOCAB])
    ne = F.array(*[F.lit(w) for w in NEG_VOCAB])
    d = F.col(id_col)

    def word(i):
        r = (d * 104729 + i * 7919) % 96
        idx = (r % 16 + 1).cast("int")
        return (
            F.when(r < 32, F.element_at(sh, idx))
            .when(d % 2 == 1, F.element_at(po, idx))
            .otherwise(F.element_at(ne, idx))
        )

    toks = F.transform(F.sequence(F.lit(1), (F.lit(30) + d % 20).cast("int")), word)
    return ids.select(
        d.alias("doc_id"),
        (d % 2).cast("int").alias("y"),
        F.concat_ws(" ", toks).alias("text"),
    )


def _nb_features(
    df, id_col, text_col, *, n_features, bigrams, features
) -> DataFrame:
    """Featurizer dispatch shared by the multiclass trainer/scorer."""
    if features == "word":
        return hashed_text_features(
            df, id_col, text_col, n_features=n_features, bigrams=bigrams
        )
    if features == "char":
        return hashed_char_ngram_features(
            df, id_col, text_col, n_features=n_features
        )
    raise ValueError(f"features must be 'word' or 'char', got {features!r}")


def nb_multiclass_train(
    df: DataFrame,
    label_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    n_features: int = 2048,
    alpha: float = 1.0,
    bigrams: bool = True,
    features: str = "word",
    feats: DataFrame | None = None,
) -> DataFrame:
    """Multiclass multinomial NB — the K-way sibling of
    ``nb_linear_train`` (trained language ID, domain routing, K-way
    quality tiers). ``label_col`` holds small non-negative ints.
    ``features`` picks the featurizer: ``"word"`` = hashed lowercase
    uni+bigram tokens (domain routing, quality tiers); ``"char"`` =
    hashed character 2..4-grams (``hashed_char_ngram_features`` — the
    langid.py feature space, right for language ID).

    Returns the MODEL as a DataFrame bounded at K * (n_features + 1)
    rows:

    - one row per (label, OBSERVED feature): weight = the ADJUSTED
      class-conditional log-prob ln(c_lf + a) - ln(C_l + aD) MINUS the
      class's unseen weight — pre-subtracting w_unseen at train time is
      what lets scoring join ONLY observed rows (see below) instead of
      densifying K * n_features;
    - one const row per label (feature = -1): weight = ln(N_l) (the
      class log-prior) and ``w_unseen`` = ln(a) - ln(C_l + aD).

    Same exactness contract as the binary trainer: everything except
    the final ln() is integer counting, so a SQL oracle replays the
    learned weights to the rounding digit.

    ``feats`` (optional): a precomputed (id, feature, x) table from the
    SAME featurizer settings — pass it when one materialized
    featurization pass feeds both train and score (VERDICT r12 item 9;
    the feature hash is part of the model, so mismatched settings would
    silently misroute every feature). May cover a superset of ``df``'s
    ids: the label join restricts to the training split.
    """
    if feats is None:
        feats = _nb_features(
            df, id_col, text_col, n_features=n_features, bigrams=bigrams,
            features=features,
        )
    labels = df.select(
        F.col(id_col).alias("id"), F.col(label_col).cast("int").alias("y")
    )
    fl = feats.join(labels, on="id")
    per_lf = fl.groupBy("y", "feature").agg(F.sum("x").alias("cnt"))
    per_l = per_lf.groupBy("y").agg(F.sum("cnt").alias("cls_total")).join(
        labels.groupBy("y").agg(F.count("*").alias("n_docs")), on="y", how="right"
    )
    aD = float(alpha) * n_features
    # classes with no observed features at all still get consts rows
    # (cls_total null -> 0) so an all-empty class scores its prior
    consts = per_l.select(
        F.col("y").alias("label"),
        F.lit(-1).cast("long").alias("feature"),
        F.log(F.col("n_docs").cast("double")).alias("weight"),
        (
            F.log(F.lit(float(alpha)))
            - F.log(F.coalesce(F.col("cls_total"), F.lit(0)) + F.lit(aD))
        ).alias("w_unseen"),
    )
    w = (
        per_lf.join(per_l.select("y", "cls_total"), on="y")
        .select(
            F.col("y").alias("label"),
            "feature",
            # ln(cnt + a) - ln(a): the class-conditional log-prob with the
            # class's unseen weight pre-subtracted (the ln(cls_total + aD)
            # terms cancel exactly)
            (
                F.log(F.col("cnt") + F.lit(float(alpha)))
                - F.log(F.lit(float(alpha)))
            ).alias("weight"),
            F.lit(None).cast("double").alias("w_unseen"),
        )
    )
    # bounded model, materialized now — the scorer's two broadcast
    # builds (weights, consts) would otherwise each re-run the training
    # (see nb_linear_train)
    return w.unionByName(consts).localCheckpoint(eager=True)


def nb_multiclass_score(
    df: DataFrame,
    model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    n_features: int = 2048,
    bigrams: bool = True,
    features: str = "word",
    feats: DataFrame | None = None,
) -> DataFrame:
    """(id, pred, score): argmax-class prediction under a multiclass NB
    model (``features`` must match what the model was trained with);
    score = the winning class's log-joint ln N_l + sum_f x_f
    ln p_l(f), rounded to 6 (ties break to the smallest label, so the
    argmax is deterministic and SQL-replayable).

    Scoring never densifies: because observed weights were stored with
    the class's unseen weight pre-subtracted, the class score
    decomposes as  bias_l + X * w_unseen_l + sum over OBSERVED (l, f)
    of x_f * weight'_lf  — one inner join of the doc-feature stream
    against the broadcast model, one (id, label) aggregate, and a
    K-row-per-doc argmax. Empty documents score every class's prior
    (every input id appears in the output).

    ``feats`` (optional): a precomputed (id, feature, x) table from the
    SAME featurizer settings, restricted to (or a superset of) ``df``'s
    ids — the scored-id spine drops extra ids, but restrict the table
    for efficiency. The plan consumes the feature stream TWICE (weight
    join + per-doc totals), so pass a checkpointed/persisted table to
    pay featurization once."""
    if feats is None:
        feats = _nb_features(
            df, id_col, text_col, n_features=n_features, bigrams=bigrams,
            features=features,
        )
    consts = model.filter(F.col("feature") == -1).select(
        "label", F.col("weight").alias("bias"), F.col("w_unseen").alias("w0")
    )
    weights = model.filter(F.col("feature") >= 0).select(
        "label", "feature", "weight"
    )
    partial = (
        feats.join(F.broadcast(weights), on="feature")
        .groupBy("id", "label")
        .agg(F.sum(F.col("x") * F.col("weight")).alias("obs"))
    )
    totals = feats.groupBy("id").agg(F.sum("x").alias("X"))
    scored = (
        df.select(F.col(id_col).alias("id"))
        .join(totals, on="id", how="left")
        .crossJoin(F.broadcast(consts))
        .join(partial, on=["id", "label"], how="left")
        .select(
            "id",
            "label",
            F.round(
                F.col("bias")
                + F.coalesce(F.col("X"), F.lit(0)) * F.col("w0")
                + F.coalesce(F.col("obs"), F.lit(0.0)),
                6,
            ).alias("s"),
        )
    )
    best = scored.groupBy("id").agg(
        F.max(F.struct(F.col("s"), (-F.col("label")).alias("nl"))).alias("b")
    )
    return best.select(
        F.col("id").alias(id_col),
        (-F.col("b.nl")).cast("int").alias("pred"),
        F.col("b.s").alias("score"),
    )


def planted_class_docs(
    ids: DataFrame, n_classes: int = 4, id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, y, text): the K-class sibling of ``planted_label_docs``
    — a synthetic labeled corpus with real token-distribution signal,
    generated expression-only from ids. y = doc_id % K; token i draws
    r = (doc_id*104729 + i*7919) % 96 and picks SHARED_VOCAB[r % 16]
    when r < 32, else the closed-form class token 'c<y>w<r % 16>' — so
    ~1/3 of tokens are class-neutral and ~2/3 are class-pure, trivially
    separable by a working K-way trainer while exercising real
    count-based learning; every literal is id arithmetic an oracle
    reconstructs."""
    if n_classes < 2:
        raise ValueError("n_classes must be >= 2")
    sh = F.array(*[F.lit(w) for w in SHARED_VOCAB])
    d = F.col(id_col)
    y = d % n_classes

    def word(i):
        r = (d * 104729 + i * 7919) % 96
        return (
            F.when(r < 32, F.element_at(sh, (r % 16 + 1).cast("int")))
            .otherwise(
                F.concat(
                    F.lit("c"), y.cast("string"), F.lit("w"), (r % 16).cast("string")
                )
            )
        )

    toks = F.transform(F.sequence(F.lit(1), (F.lit(30) + d % 20).cast("int")), word)
    return ids.select(
        d.alias("doc_id"),
        y.cast("int").alias("y"),
        F.concat_ws(" ", toks).alias("text"),
    )


def hashed_char_ngram_features(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    n_features: int = 4096,
    n_min: int = 2,
    n_max: int = 4,
) -> DataFrame:
    """(id, feature, x): hashed character n-gram counts — the standard
    language-ID feature space (langid.py, Lui & Baldwin 2012, uses byte
    1..4-grams; CLD-class detectors use char 2..4-grams). Word features
    generalize poorly across languages — inflection explodes the vocab
    and many scripts don't whitespace-tokenize — while char 2..4-grams
    capture the orthographic signature (digraphs, affixes, script) in a
    bounded hashed space.

    Every position window of each length in [n_min, n_max] over the RAW
    text (no lowercasing or tokenization — case and whitespace ARE
    signal for LID) hashes to ``md5_60(g) % n_features``; counts keep
    multiplicity. Pure expressions end to end (sequence -> substr ->
    hash -> count, all codegen), exactly replayable in SQL."""
    if not (1 <= n_min <= n_max):
        raise ValueError(f"need 1 <= n_min <= n_max, got {n_min}..{n_max}")
    t = F.col(text_col)

    def grams_for(n: int):
        return F.when(
            F.length(t) >= n,
            F.transform(
                F.sequence(F.lit(1), F.length(t) - n + 1),
                lambda i: t.substr(i, F.lit(n)),
            ),
        ).otherwise(F.array().cast("array<string>"))

    allgrams = F.concat(*[grams_for(n) for n in range(n_min, n_max + 1)])
    return (
        df.select(F.col(id_col).alias("id"), F.explode(allgrams).alias("s"))
        .select("id", (_md5_60(F.col("s")) % n_features).alias("feature"))
        .groupBy("id", "feature")
        .agg(F.count("*").alias("x"))
    )


# Per-language syllable inventories for the closed-form multilingual
# synthesis (planted_lang_docs): ASCII orthographic signatures of four
# language families. Some syllables deliberately recur across languages
# ("che", "con", "ver", "ere", "und"/"un") so char-gram distributions
# overlap realistically and the trained model must weigh evidence, not
# match single tokens.
LANG_SYLLABLES = [
    # 0: English-ish
    ["the", "ing", "ion", "and", "ent", "ati", "for", "her",
     "ter", "tha", "ere", "ate", "his", "con", "res", "ver"],
    # 1: German-ish
    ["sch", "ein", "ich", "nde", "die", "und", "der", "che",
     "end", "gen", "sse", "ung", "cht", "das", "ver", "eit"],
    # 2: Italian-ish
    ["che", "ere", "zio", "del", "lla", "nte", "con", "per",
     "ato", "one", "ndo", "gli", "ess", "are", "ita", "men"],
    # 3: Finnish-ish
    ["en", "in", "ta", "ja", "ka", "sta", "lla", "aan",
     "sia", "nen", "ssa", "tte", "ksi", "uus", "iin", "ain"],
]


def planted_lang_docs(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, y, text): closed-form MULTILINGUAL synthesis for the
    char-gram language-ID contract. y = doc_id % 4 picks a language;
    word i concatenates two syllables from that language's inventory,
    chosen by independent id arithmetic (a = (id*104729 + i*7919) % 16,
    b = (id*52361 + i*104729) % 16 — no division, so DuckDB replays the
    exact strings). 30 + id % 20 words per document. The languages
    share several syllables, so character n-gram distributions overlap
    and separation requires aggregating evidence across the document —
    the actual shape of the LID problem — while staying a pure function
    of the id."""
    books = F.array(
        *[F.array(*[F.lit(s) for s in sy]) for sy in LANG_SYLLABLES]
    )
    d = F.col(id_col)
    y = d % 4
    lang = F.element_at(books, (y + 1).cast("int"))

    def word(i):
        a = ((d * 104729 + i * 7919) % 16 + 1).cast("int")
        b = ((d * 52361 + i * 104729) % 16 + 1).cast("int")
        return F.concat(F.element_at(lang, a), F.element_at(lang, b))

    toks = F.transform(F.sequence(F.lit(1), (F.lit(30) + d % 20).cast("int")), word)
    return ids.select(
        d.alias("doc_id"),
        y.cast("int").alias("y"),
        F.concat_ws(" ", toks).alias("text"),
    )


def nb_model_save(
    spark,
    model: DataFrame,
    state_dir: str,
    *,
    n_features: int = 2048,
    bigrams: bool = True,
) -> None:
    """Persist a trained quality-gate model (train once on the labeled
    set, score every crawl batch for months — the classifier member of
    the artifact-store family alongside the ANN indexes, Bloom sketches
    and BPE merges): the bounded (feature, weight, w_unseen) table goes
    to parquet under ``state_dir``, the FEATURE-EXTRACTION hyperparams
    (n_features, bigrams) ride the statefs manifest — scoring with the
    wrong hash width would silently misroute every feature, so the
    params travel WITH the weights. Any statefs scheme works; the
    manifest commit is the publish point."""
    _nb_save(spark, model, state_dir, "nb_linear", n_features, bigrams)


def _nb_save(spark, model, state_dir, kind, n_features, bigrams) -> None:
    from codd_spark.sources.statefs import resolve_statefs

    fs = resolve_statefs(spark, state_dir)
    if fs.manifest_exists() and fs.read_manifest().get("kind") != kind:
        raise ValueError(f"{state_dir} holds non-{kind} state — refusing to adopt")
    fs.mkdirs()
    model.write.mode("overwrite").parquet(fs.table_location("weights"))
    fs.commit_manifest(
        {
            "kind": kind,
            "n_features": int(n_features),
            "bigrams": bool(bigrams),
        }
    )


def nb_model_load(spark, state_dir: str) -> tuple[DataFrame, dict]:
    """Reload a model persisted by :func:`nb_model_save`. Returns
    ``(model, params)`` — pass the params through to
    :func:`nb_linear_score` so features hash identically to training:

        model, p = nb_model_load(spark, d)
        scored = nb_linear_score(batch, model, **p)
    """
    return _nb_load(spark, state_dir, "nb_linear")


def _nb_load(spark, state_dir, kind):
    from codd_spark.sources.statefs import resolve_statefs

    fs = resolve_statefs(spark, state_dir)
    if not fs.manifest_exists():
        raise ValueError(f"no classifier manifest at {state_dir}")
    m = fs.read_manifest()
    if m.get("kind") != kind:
        raise ValueError(
            f"{state_dir} holds {m.get('kind')!r} state, not an {kind} model"
        )
    model = spark.read.parquet(fs.table_location("weights"))
    return model, {"n_features": m["n_features"], "bigrams": m["bigrams"]}


def nb_multiclass_save(
    spark,
    model: DataFrame,
    state_dir: str,
    *,
    n_features: int = 2048,
    bigrams: bool = True,
) -> None:
    """Persist a trained multiclass model — same contract as
    :func:`nb_model_save` (bounded weight table as parquet, the
    feature-extraction hyperparams riding the statefs manifest so
    scoring hashes identically to training), distinguished by manifest
    kind so the two model families can never adopt each other's
    state."""
    _nb_save(spark, model, state_dir, "nb_multiclass", n_features, bigrams)


def nb_multiclass_load(spark, state_dir: str) -> tuple[DataFrame, dict]:
    """Reload a model persisted by :func:`nb_multiclass_save`; pass the
    returned params through to :func:`nb_multiclass_score`."""
    return _nb_load(spark, state_dir, "nb_multiclass")


# Real-text multilingual fixture (VERDICT r11 item 4): excerpts from the
# Universal Declaration of Human Rights (UN, public domain), ten
# single-sentence documents per language. The synthetic
# ``planted_lang_docs`` keeps the contract DuckDB-replayable from pure
# id arithmetic; THIS fixture makes the char-gram LID accuracy claim
# load-bearing on natural text in four real languages. Shared verbatim
# by the Spark query and the SQL oracle (one constant, no drift).
UDHR_SENTENCES: dict[int, list[str]] = {
    0: [  # English
        "All human beings are born free and equal in dignity and rights.",
        "They are endowed with reason and conscience and should act towards one another in a spirit of brotherhood.",
        "Everyone has the right to life, liberty and security of person.",
        "No one shall be held in slavery or servitude.",
        "No one shall be subjected to torture or to cruel, inhuman or degrading treatment or punishment.",
        "Everyone has the right to recognition everywhere as a person before the law.",
        "All are equal before the law and are entitled without any discrimination to equal protection of the law.",
        "Everyone has the right to an effective remedy by the competent national tribunals.",
        "No one shall be subjected to arbitrary arrest, detention or exile.",
        "Everyone has the right to freedom of movement and residence within the borders of each state.",
    ],
    1: [  # Spanish
        "Todos los seres humanos nacen libres e iguales en dignidad y derechos.",
        "Dotados como estan de razon y conciencia, deben comportarse fraternalmente los unos con los otros.",
        "Todo individuo tiene derecho a la vida, a la libertad y a la seguridad de su persona.",
        "Nadie estara sometido a esclavitud ni a servidumbre.",
        "Nadie sera sometido a torturas ni a penas o tratos crueles, inhumanos o degradantes.",
        "Todo ser humano tiene derecho, en todas partes, al reconocimiento de su personalidad juridica.",
        "Todos son iguales ante la ley y tienen, sin distincion, derecho a igual proteccion de la ley.",
        "Toda persona tiene derecho a un recurso efectivo ante los tribunales nacionales competentes.",
        "Nadie podra ser arbitrariamente detenido, preso ni desterrado.",
        "Toda persona tiene derecho a circular libremente y a elegir su residencia en el territorio de un estado.",
    ],
    2: [  # French
        "Tous les etres humains naissent libres et egaux en dignite et en droits.",
        "Ils sont doues de raison et de conscience et doivent agir les uns envers les autres dans un esprit de fraternite.",
        "Tout individu a droit a la vie, a la liberte et a la surete de sa personne.",
        "Nul ne sera tenu en esclavage ni en servitude.",
        "Nul ne sera soumis a la torture, ni a des peines ou traitements cruels, inhumains ou degradants.",
        "Chacun a le droit a la reconnaissance en tous lieux de sa personnalite juridique.",
        "Tous sont egaux devant la loi et ont droit sans distinction a une egale protection de la loi.",
        "Toute personne a droit a un recours effectif devant les juridictions nationales competentes.",
        "Nul ne peut etre arbitrairement arrete, detenu ni exile.",
        "Toute personne a le droit de circuler librement et de choisir sa residence a l'interieur d'un etat.",
    ],
    3: [  # German
        "Alle Menschen sind frei und gleich an Wuerde und Rechten geboren.",
        "Sie sind mit Vernunft und Gewissen begabt und sollen einander im Geist der Bruederlichkeit begegnen.",
        "Jeder hat das Recht auf Leben, Freiheit und Sicherheit der Person.",
        "Niemand darf in Sklaverei oder Leibeigenschaft gehalten werden.",
        "Niemand darf der Folter oder grausamer, unmenschlicher oder erniedrigender Behandlung oder Strafe unterworfen werden.",
        "Jeder hat das Recht, ueberall als rechtsfaehig anerkannt zu werden.",
        "Alle Menschen sind vor dem Gesetz gleich und haben ohne Unterschied Anspruch auf gleichen Schutz durch das Gesetz.",
        "Jeder hat Anspruch auf einen wirksamen Rechtsbehelf bei den zustaendigen innerstaatlichen Gerichten.",
        "Niemand darf willkuerlich festgenommen, in Haft gehalten oder des Landes verwiesen werden.",
        "Jeder hat das Recht, sich innerhalb eines Staates frei zu bewegen und seinen Aufenthaltsort frei zu waehlen.",
    ],
    4: [  # Russian (Cyrillic — non-Latin script exercised RAW, no
        #    transliteration; VERDICT r12 item 8)
        "Все люди рождаются свободными и равными в своем достоинстве и правах.",
        "Они наделены разумом и совестью и должны поступать в отношении друг друга в духе братства.",
        "Каждый человек имеет право на жизнь, на свободу и на личную неприкосновенность.",
        "Никто не должен содержаться в рабстве или в подневольном состоянии.",
        "Никто не должен подвергаться пыткам или жестоким, бесчеловечным или унижающим его достоинство обращению и наказанию.",
        "Каждый человек, где бы он ни находился, имеет право на признание его правосубъектности.",
        "Все люди равны перед законом и имеют право, без всякого различия, на равную защиту закона.",
        "Каждый человек имеет право на эффективное восстановление в правах компетентными национальными судами.",
        "Никто не может быть подвергнут произвольному аресту, задержанию или изгнанию.",
        "Каждый человек имеет право свободно передвигаться и выбирать себе местожительство в пределах каждого государства.",
    ],
    5: [  # Greek (second non-Latin script)
        "Ολοι οι ανθρωποι γεννιουνται ελευθεροι και ισοι στην αξιοπρεπεια και τα δικαιωματα.",
        "Ειναι προικισμενοι με λογικη και συνειδηση και οφειλουν να συμπεριφερονται μεταξυ τους με πνευμα αδελφοσυνης.",
        "Καθε ατομο εχει δικαιωμα στη ζωη, την ελευθερια και την προσωπικη του ασφαλεια.",
        "Κανεις δεν επιτρεπεται να ζει υπο καθεστως δουλειας, ολικης η μερικης.",
        "Κανεις δεν επιτρεπεται να υποβαλλεται σε βασανιστηρια ουτε σε ποινη η μεταχειριση σκληρη, απανθρωπη η ταπεινωτικη.",
        "Καθενας, οπου και αν βρισκεται, εχει δικαιωμα στην αναγνωριση της νομικης του προσωπικοτητας.",
        "Ολοι ειναι ισοι απεναντι στον νομο και εχουν δικαιωμα σε ιση προστασια του νομου.",
        "Καθενας εχει δικαιωμα να ασκει αποτελεσματικα ενδικα μεσα στα αρμοδια εθνικα δικαστηρια.",
        "Κανεις δεν μπορει να συλλαμβανεται, να κρατειται η να εξοριζεται αυθαιρετα.",
        "Καθενας εχει το δικαιωμα να κυκλοφορει ελευθερα και να εκλεγει τον τοπο της διαμονης του στο εσωτερικο ενος κρατους.",
    ],
}


def udhr_lang_docs(spark) -> DataFrame:
    """(doc_id, y, text) over the real-text UDHR fixture: doc_id =
    K*i + y (K = number of languages) interleaves the languages, so the
    contract's doc_id % 5 == 4 held-out split leaves two natural-text
    sentences per language for scoring (eight to train on; K and 5 are
    coprime for K=4 and K=6, which keeps the split exactly 2-per-y).
    The four Latin-script languages use ASCII transliteration
    (estan/egaux/Wuerde) and the Greek fixture is diacritic-stripped —
    accents are not what separates these languages under 2..4-char
    grams; the Russian fixture is raw Cyrillic (VERDICT r12 item 8:
    non-Latin scripts exercised through the SAME hashed char-gram
    space, no code change needed — that is the point)."""
    k = len(UDHR_SENTENCES)
    rows = [
        (k * i + y, y, s)
        for y, sents in sorted(UDHR_SENTENCES.items())
        for i, s in enumerate(sents)
    ]
    return spark.createDataFrame(rows, "doc_id long, y int, text string")
