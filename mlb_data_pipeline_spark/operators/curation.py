"""Training-data curation operators (north star, beyond the reference).

The operations a 100 TB pretraining-data pipeline runs AFTER dedup and
quality scoring: deterministic dataset splits, within-document
repetition signals, sequence packing, and PII-style redaction. The
reference's corpus handling stops at id-keyed upsert
(/root/reference/airflow/dags/mlb_pipeline/pipeline.py:58-77); these are
the standard curation passes layered on the same engine.

Everything here is Catalyst-only and md5-based where hashing is needed,
so every operator is oracle-checkable against DuckDB (same contract as
operators/dedup.py).

100 TB notes: hash_split and redaction are narrow (no shuffle);
repeated-ngram is a per-row expression over the existing shingle
machinery; packing is one window over the ordering key — at real scale
the ordering key is (shard, position) so the window partitions by shard
and never sees a global sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import shingle_set


def hash_bucket(col: Column | str, buckets: int = 100) -> Column:
    """Deterministic bucket in [0, buckets): first 4 hex chars of
    md5(value-as-string) mod buckets. Stable across engines, sessions,
    and partitionings — the property a train/val/test split must have
    (random() splits are neither reproducible nor consistent when rows
    are re-processed)."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.conv(F.substring(F.md5(c.cast("string").cast("binary")), 1, 4), 16, 10).cast("int")) % buckets


def hash_split(
    df: DataFrame, key_col: str, out_col: str = "split", train: int = 80, val: int = 10
) -> DataFrame:
    """Assign train/val/test by hash bucket of the key: [0,train) ->
    'train', [train,train+val) -> 'val', rest -> 'test'. Narrow (no
    shuffle); membership depends only on the key, so late-arriving rows
    for a known key land in the same split."""
    b = hash_bucket(key_col)
    split = (
        F.when(b < train, F.lit("train"))
        .when(b < train + val, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return df.withColumn(out_col, split)


def hash_keep(col: Column | str, fraction: float, salt: str = "") -> Column:
    """Deterministic Bernoulli keep-predicate: true iff the first 8 hex
    chars of md5(salt || key) fall below fraction * 16^8. Reproducible
    across engines/sessions/partitionings (the property `rand()`-based
    sampling lacks), and monotone in ``fraction``: a 10% sample is a
    subset of the 20% sample with the same salt — so downsampling a
    mixture never discards previously-selected rows. Different salts
    give independent samples from the same keys."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    c = F.col(col) if isinstance(col, str) else col
    v = F.conv(F.substring(F.md5(F.concat(F.lit(salt), c.cast("string")).cast("binary")), 1, 8), 16, 10).cast("long")
    return v < F.lit(int(fraction * 2**32))


def stratified_hash_sample(
    df: DataFrame, key_col: str, strata_col: str, fractions: dict[str, float], salt: str = ""
) -> DataFrame:
    """Dataset-mixing sampler: keep a per-stratum deterministic fraction
    (e.g. {"web": 0.3, "code": 1.0}) — the corpus-mixture step of a
    pretraining data recipe, reproducible by construction. Strata absent
    from ``fractions`` are DROPPED (an unlisted source must never leak
    into the mix silently). Narrow — one hash + comparison per row, no
    shuffle, no sampleBy seed-dependence."""
    expr = F.lit(None).cast("double")
    for stratum, frac in sorted(fractions.items()):
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for {stratum!r} must be in [0, 1], got {frac}")
        expr = F.when(F.col(strata_col) == stratum, F.lit(float(frac))).otherwise(expr)
    v = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string")).cast("binary")), 1, 8),
        16, 10,
    ).cast("long")
    return df.filter(v < (expr * F.lit(float(2**32))).cast("long"))


def repeated_ngram_fraction(text_col: Column | str, n: int = 3) -> Column:
    """Within-document repetition signal (the Gopher/C4-style quality
    rule): 1 - distinct_ngrams / total_ngrams. 0 = no repeated shingle;
    values near 1 flag boilerplate/spam. Short docs (< n tokens) score
    0.0 — nothing to repeat."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    toks = F.split(c, " ")
    total = F.size(toks) - (n - 1)
    distinct = F.size(shingle_set(c, n))
    return F.when(total > 0, 1.0 - distinct.cast("double") / total).otherwise(F.lit(0.0))


def pack_sequences(
    df: DataFrame,
    order_col: str,
    size_col: Column | str,
    budget: int,
    chunk_col: str = "chunk_id",
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """Streaming bin-fill sequence packing: rows in ``order_col`` order
    are assigned to fixed-budget chunks by cumulative size —
    chunk_id = floor(cumsum_before_this_row / budget). The batch-shaping
    pass that turns a token-counted corpus into pretraining sequences.

    This is the window-expressible form of greedy packing: a chunk can
    overflow by at most one document (the straddling row starts the
    next chunk's budget), which is the standard streaming approximation
    — exact first-fit packing is inherently sequential. Deterministic,
    so the DuckDB oracle computes the identical assignment.

    At scale pass ``partition_cols`` (e.g. the shard key): the window
    then partitions by shard and the global sort disappears — chunks
    are per-shard, which is how packed pretraining data is laid out
    anyway."""
    size = F.col(size_col) if isinstance(size_col, str) else size_col
    w = Window.orderBy(order_col) if not partition_cols else Window.partitionBy(*partition_cols).orderBy(order_col)
    cum_before = F.sum(size).over(w.rowsBetween(Window.unboundedPreceding, -1))
    # floor(), not cast-to-int: Spark's double->int cast truncates but
    # DuckDB's rounds — floor is identical in both for the nonneg domain
    return df.withColumn(chunk_col, F.floor(F.coalesce(cum_before, F.lit(0)) / budget).cast("bigint"))


# PII-style patterns: emails and US-phone shapes. Same regex dialect in
# Spark (Java) and DuckDB (RE2): character classes, +, {n} counts only.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\d{3}-\d{3}-\d{4}"


def redact(col: Column | str, patterns: dict[str, str] | None = None) -> Column:
    """Replace PII-shaped substrings with typed placeholder tokens —
    the scrubbing pass a public-corpus pipeline runs before training.
    Default patterns: emails -> <EMAIL>, phone numbers -> <PHONE>."""
    c = F.col(col) if isinstance(col, str) else col
    # `is None`, not falsy: an explicitly-passed {} means "redact nothing"
    pats = {EMAIL_RE: "<EMAIL>", PHONE_RE: "<PHONE>"} if patterns is None else patterns
    for pat, repl in pats.items():
        c = F.regexp_replace(c, pat, repl)
    return c


def redact_sql(expr: str, patterns: dict[str, str] | None = None) -> str:
    """DuckDB mirror of ``redact`` (same patterns, same order, 'g')."""
    pats = {EMAIL_RE: "<EMAIL>", PHONE_RE: "<PHONE>"} if patterns is None else patterns
    for pat, repl in pats.items():
        expr = f"regexp_replace({expr}, '{pat}', '{repl}', 'g')"
    return expr


def pseudonymize(col: Column | str, salt: str) -> Column:
    """Salted SHA-256 pseudonymization of an identifier column — the
    key-preserving half of the PII pass next to ``redact``'s pattern
    scrubbing: user/session/device ids must disappear from training
    data but KEEP their join/group semantics (same input -> same
    token; a different salt makes releases unlinkable). Narrow
    one-expression hash (sha2 over salt || value), engine-mirrorable
    (DuckDB ``sha256``); NULL stays NULL (a missing id must not
    collapse onto the hash of the bare salt)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(
        c.isNotNull(), F.sha2(F.concat(F.lit(salt), c.cast("string")).cast("binary"), 256)
    )


def pseudonymize_sql(expr: str, salt: str) -> str:
    """DuckDB mirror of ``pseudonymize`` (same salt||value input)."""
    if "'" in salt:
        raise ValueError("salt must not contain single quotes")
    return f"CASE WHEN {expr} IS NOT NULL THEN sha256('{salt}' || CAST({expr} AS VARCHAR)) END"


def chunk_text(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    size: int,
    overlap: int = 0,
    idx_col: str = "chunk_idx",
    start_col: str = "char_start",
    out_col: str = "chunk_text",
) -> DataFrame:
    """Overlapping sliding-window document chunking — the RAG /
    pretraining preprocessing step between scrape and embed (the
    reference embeds whole articles, pipeline.py:93-101; real corpora
    exceed the encoder context and need windows with overlap so no
    boundary-spanning passage is lost).

    One row per (doc, window): ``idx_col`` is the 0-based window
    ordinal, ``start_col`` the 0-based character offset, ``out_col``
    the ``size``-char substring (the last window is shorter). Window
    starts step by ``size - overlap``; empty texts produce zero chunks.

    100 TB shape: entirely NARROW — sequence + posexplode + substring
    inside whole-stage codegen; no shuffle, no UDF. Output row count is
    ~len/(size-overlap) per doc, and the explode preserves the input
    partitioning for a downstream embed stage. Offsets are plain
    character positions (code units), so chunks can be re-anchored into
    the source doc exactly.
    """
    if size <= 0 or overlap < 0 or overlap >= size:
        raise ValueError(f"need size > 0 and 0 <= overlap < size, got {size=} {overlap=}")
    step = size - overlap
    text = F.col(text_col)
    starts = F.when(
        F.length(text) > 0,
        F.sequence(F.lit(0), F.length(text) - 1, F.lit(step)),
    ).otherwise(F.array().cast("array<int>"))
    base = df.select(F.col(id_col), text.alias("__t"), starts.alias("__starts"))
    return base.select(
        id_col,
        "__t",
        F.posexplode("__starts").alias(idx_col, start_col),
    ).select(
        id_col,
        F.col(idx_col).cast("int").alias(idx_col),
        F.col(start_col).cast("int").alias(start_col),
        F.expr(f"substring(__t, {start_col} + 1, {size})").alias(out_col),
    )


def temperature_mix(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    *,
    temperature: float = 2.0,
    budget_rows_expr=None,
    salt: str = "",
):
    """Temperature-scaled corpus mixing (the multilingual-pretraining
    sampling knob, mT5/XLM-R style): stratum s with share p_s = n_s/N
    is sampled proportionally to p_s^(1/T) — T=1 reproduces the natural
    distribution, T->inf approaches uniform, intermediate T up-weights
    small strata without letting any single source dominate. Selection
    is the deterministic md5-threshold (``hash_keep`` semantics):
    reproducible, monotone in the budget, engine-mirrorable.

    Fully declarative — per-stratum counts, the normalizer, fractions,
    and the keep-filter are ONE lazy plan (two tiny aggregations
    broadcast back; the corpus is touched by exactly one narrow
    hash+filter pass after a broadcast join). No driver-side collect,
    so the operator composes under whatever the caller's sf is.
    ``budget_rows_expr`` is a Column for the target mixture size
    (default N/2). Downsampling only: fractions cap at 1.0 (no
    replication). Determinism note: with T=2 the weight is sqrt(p) —
    correctly rounded per IEEE, hence bit-mirrorable in an oracle;
    other temperatures go through pow(), whose last-ulp behavior is
    libm-specific (fine for production, not for the bit-exact tier).
    The cross-stratum normalizer folds in stratum-sorted order.

    Returns (kept_df, fractions_df) — the kept rows and the per-stratum
    (stratum, n, fraction) audit frame.
    """
    if temperature <= 0:
        raise ValueError(f"temperature must be > 0, got {temperature}")
    counts = df.groupBy(strata_col).agg(F.count("*").alias("__n"))
    # whole-frame totals as window aggregates over the tiny counts
    # frame (no self-join, no ambiguity, no second corpus scan): N is
    # an exact long sum (order-free); the double normalizer Z folds in
    # stratum-sorted order for engine neutrality.
    w_all = Window.partitionBy(F.lit(1))
    counts = counts.withColumn("__ntot", F.sum("__n").over(w_all))
    p = F.col("__n") / F.col("__ntot")
    w = F.sqrt(p) if temperature == 2.0 else F.pow(p, F.lit(1.0 / temperature))
    weighted = counts.withColumn("__w", w).withColumn(
        "__Z",
        F.aggregate(
            F.array_sort(F.collect_list(F.struct(strata_col, "__w")).over(w_all)),
            F.lit(0.0),
            lambda a, x: a + x["__w"],
        ),
    )
    budget = budget_rows_expr if budget_rows_expr is not None else F.col("__ntot") / F.lit(2.0)
    fractions = weighted.withColumn(
        "__frac", F.least(F.lit(1.0), (F.col("__w") / F.col("__Z") * budget) / F.col("__n"))
    ).select(strata_col, F.col("__n").alias("n"), F.col("__frac").alias("fraction"))
    hv = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string")).cast("binary")), 1, 8),
        16, 10,
    ).cast("long")
    kept = (
        df.join(F.broadcast(fractions), strata_col)
        .filter(hv < F.floor(F.col("fraction") * F.lit(4294967296.0)).cast("long"))
        .drop("n", "fraction")
    )
    return kept, fractions


def group_quota_sample(
    df: DataFrame, strata_cols: list[str], key_col: str, k: int, salt: str = ""
) -> DataFrame:
    """EXACT-k deterministic sample per stratum (the per-source quota
    step of a data recipe: "at most k docs from every domain"), the
    fixed-count sibling of ``stratified_hash_sample``'s fractions: keep
    the k rows whose md5(salt || key) sorts lowest within the stratum
    (ties broken by the key itself; rows sharing the SAME key value
    remain mutually unordered — pass a unique key, normally the
    primary id, for a fully deterministic sample).
    md5-ordering makes the sample uniform-ish, reproducible across runs
    AND engines (hex-string comparison is plain ASCII ordering), and
    nested: quota k' < k selects a subset of the k-sample under the
    same salt.

    Scale: one hash shuffle on the strata; ranking is a per-partition
    sort — the same single-window shape as ``top_k_per_group``. A
    pathologically hot stratum sorts within its partition (no global
    sort); raise spark.sql.shuffle.partitions or pre-cap hot strata if
    one source dominates the corpus."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    h = F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string")).cast("binary"))
    w = Window.partitionBy(*strata_cols).orderBy(h.asc(), F.col(key_col).asc())
    return (
        df.withColumn("__qr", F.row_number().over(w))
        .filter(F.col("__qr") <= k)
        .drop("__qr")
    )


def seeded_shuffle(
    df: DataFrame, key_col: str, n_shards: int, salt: str = ""
) -> DataFrame:
    """Deterministic global example shuffle -> (shard, position): the
    training-order step between curation and the shard write. Training
    runs need documents in a reproducible pseudo-random order that is
    independent of source/ingest order (adjacent same-source documents
    bias gradients) and re-derivable from (salt, key) alone — random()
    gives neither, and a global orderBy over md5 would range-shuffle
    the whole corpus through one sort.

    shard = int(md5(salt || key)[:4 hex]) mod n_shards spreads keys
    uniformly; position = rank of md5(salt || key) WITHIN the shard
    (ties broken by the key). Both depend only on (salt, key): adding
    documents never reorders existing (shard, position) pairs relative
    to each other, and a new salt is a fresh permutation. Cost is ONE
    hash shuffle on shard + per-shard sorts (each ~1/n_shards of the
    data — no global sort anywhere); downstream,
    ``write_partitioned(out, path, ["shard"])`` lands one training
    file per shard already in reading order.

    Rows sharing the same key value get distinct consecutive positions
    in an engine-arbitrary relative order (row_number must break the
    tie somehow) — pass a unique key (the primary id) for a fully
    deterministic order, same contract as ``group_quota_sample``."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    h = F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string")).cast("binary"))
    shard = (F.conv(F.substring(h, 1, 4), 16, 10).cast("int")) % n_shards
    out = df.withColumn("shard", shard)
    w = Window.partitionBy("shard").orderBy(h.asc(), F.col(key_col).asc())
    return out.withColumn("position", F.row_number().over(w))


def weighted_sample(
    df: DataFrame, key_col: str, weight_col: str, k: int, salt: str = ""
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement: k rows with
    inclusion probability proportional to ``weight_col`` (quality-biased
    corpus subsetting — "sample 1M docs, preferring the well-written
    ones"). Efraimidis-Spirakis A-Res: each row draws a uniform u from
    md5(salt || key), ranks by u^(1/w), and the top-k ranks win. Like
    every sampler in this module the draw depends only on (salt, key):
    reproducible across runs, engines, and partitionings, and re-salted
    per release.

    Engine-neutral form: u = (first 52 md5 bits + 1) / 2^52 is an EXACT
    double in (0, 1]; the rank u^(1/w) is compared through its log —
    ln(u)/w preserves the order, needs one transcendental instead of
    pow, and ln is floor-quantized at 1e-6 (the established JVM/libm
    contract) before the exact double division by w. Ties (same
    quantized rank) break by key. Rows with weight <= 0 or NULL are
    excluded — a zero-weight row must never be sampled, and A-Res is
    undefined there.

    Scale: one narrow projection + global top-k (TakeOrderedAndProject
    — no full sort); the output column ``__skey`` is dropped, callers
    wanting the rank for audit use the returned order."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    h = F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string")).cast("binary"))
    u = (F.conv(F.substring(h, 1, 13), 16, 10).cast("double") + F.lit(1.0)) / F.lit(
        float(2**52)
    )
    qln = F.floor(F.log(u) * F.lit(1000000.0)) / F.lit(1000000.0)
    skey = qln / F.col(weight_col).cast("double")
    return (
        df.filter(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn("__skey", skey)
        .orderBy(F.col("__skey").desc(), F.col(key_col).asc())
        .limit(k)
        .drop("__skey")
    )


def gumbel_topk(
    df: DataFrame, key_col: str, logweight_col: str, k: int, salt: str = ""
) -> DataFrame:
    """Deterministic sampling without replacement with inclusion
    probability proportional to exp(``logweight_col``) — the Gumbel-max
    trick: perturb each log weight with an independent Gumbel draw
    g = -ln(-ln u) and keep the k largest perturbed keys. This is the
    sampler DSIR-style data selection needs (importance weights live in
    log space; ``weighted_sample`` would require exponentiating them,
    overflowing for |logratio| beyond ~700 and breaking engine
    neutrality on the transcendental).

    Engine-neutral draws by the module's contract: u depends only on
    (salt, key) — u = (first 52 md5 bits + 1) / 2^53, an exact double
    in (0, 0.5], so ln(u) < 0 strictly and the outer ln's argument is
    always positive. Both lns are floor-quantized at 1e-6, every other
    step one correctly rounded IEEE op, ties break by key. NULL log
    weights are excluded (no weight, never sampled); any finite log
    weight (negative included) is valid.

    Scale: one narrow projection + global top-k
    (TakeOrderedAndProject, no full sort), same as the other samplers
    in this module."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    h = F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string")).cast("binary"))
    u = (F.conv(F.substring(h, 1, 13), 16, 10).cast("double") + F.lit(1.0)) / F.lit(
        float(2**53)
    )

    def _q(x):
        return F.floor(x * F.lit(1000000.0)) / F.lit(1000000.0)

    gumbel = -_q(F.log(-_q(F.log(u))))
    return (
        df.filter(F.col(logweight_col).isNotNull())
        .withColumn("__gkey", F.col(logweight_col).cast("double") + gumbel)
        .orderBy(F.col("__gkey").desc(), F.col(key_col).asc())
        .limit(k)
        .drop("__gkey")
    )


def shuffle_packs(
    df: DataFrame,
    pack_cols: list[str],
    n_shards: int,
    salt: str = "",
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """``seeded_shuffle`` at PACK granularity: every row of a pack gets
    the same (shard, position), so packed sequences stay contiguous
    while the packs themselves land in a reproducible pseudo-random
    training order (shuffling row-wise after packing would interleave
    documents of different packs — exactly what packing exists to
    prevent). The pack key hashes injection-proof — each pack column
    md5-digested separately, digests concatenated (no separator
    collisions, same rule as ``dataset_diff``) — then shard and
    within-shard order derive from md5(salt || key) exactly as in
    ``seeded_shuffle``; ``dense_rank`` gives all rows of a pack one
    position, consecutive packs consecutive positions. Pass
    ``partition_cols`` (e.g. the split) to rank positions contiguously
    per (partition, shard) — the layout a per-split training reader
    expects — instead of per shard across all partitions. One hash
    shuffle + per-shard sorts; write with
    ``write_partitioned(out, path, [..., "shard"])`` after a
    ``sortWithinPartitions("position")`` for files in reading order."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    key = F.concat(
        *[F.md5(F.col(c).cast("string").cast("binary")) for c in pack_cols]
    )
    h = F.md5(F.concat(F.lit(salt), key).cast("binary"))
    out = df.withColumn(
        "shard", (F.conv(F.substring(h, 1, 4), 16, 10).cast("int")) % n_shards
    ).withColumn("__pk", h)
    w = Window.partitionBy(*(partition_cols or []), "shard").orderBy(
        F.col("__pk").asc(), *[F.col(c).asc() for c in pack_cols]
    )
    return out.withColumn("position", F.dense_rank().over(w)).drop("__pk")


# Gopher-style quality rules (Rae et al. 2021, "Scaling Language Models:
# Methods, Analysis & Insights from Training Gopher", table A1 — public
# literature). Thresholds are the published ones; every ratio test is
# expressed as an INTEGER cross-multiplication (5*n_alpha >= 4*n_words
# instead of n_alpha/n_words >= 0.8) so the rule evaluation has no float
# in it at all — bit-identical across engines by construction.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_signals(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_stopwords: int = 2,
) -> DataFrame:
    """Per-document Gopher quality signals + rule verdicts.

    Adds integer signal columns (n_words, n_word_chars, n_alpha_words,
    n_stopwords, n_symbols, n_lines, n_bullet_lines, n_ellipsis_lines),
    one boolean per published rule (r_*) and ``gopher_pass`` = AND of
    all rules. One narrow projection — no shuffle, no UDF; the filter
    a 100 TB corpus runs doc-at-a-time during ingestion.

    Rules (integer form):
      r_word_count      min_words <= n_words <= max_words
      r_mean_word_len   3*n_words <= n_word_chars <= 10*n_words
      r_symbol_ratio    10*n_symbols <= n_words          (# and ellipsis)
      r_bullet_lines    10*n_bullet_lines <= 9*n_lines   (<= 90%)
      r_ellipsis_lines  10*n_ellipsis_lines <= 3*n_lines (<= 30%)
      r_alpha_words     5*n_alpha_words >= 4*n_words     (>= 80%)
      r_stopwords       n_stopwords >= min_stopwords
    """
    c = F.col(text_col)
    words = F.split(F.trim(c), r"\s+")
    lines = F.split(c, "\n")
    sym = (F.length(c) - F.length(F.replace(c, F.lit("#"), F.lit("")))) + (
        F.length(c) - F.length(F.replace(c, F.lit("…"), F.lit("")))
    )
    out = (
        df.withColumn("n_words", F.size(words))
        .withColumn(
            "n_word_chars",
            F.aggregate(words, F.lit(0), lambda acc, w: acc + F.length(w)),
        )
        .withColumn(
            "n_alpha_words", F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
        )
        .withColumn(
            "n_stopwords",
            F.size(F.filter(words, lambda w: F.lower(w).isin(*GOPHER_STOPWORDS))),
        )
        .withColumn("n_symbols", sym)
        .withColumn("n_lines", F.size(lines))
        .withColumn(
            "n_bullet_lines",
            F.size(F.filter(lines, lambda ln: F.trim(ln).rlike(r"^([-*•])"))),
        )
        .withColumn(
            "n_ellipsis_lines",
            F.size(F.filter(lines, lambda ln: ln.rlike(r"(\.\.\.|…)\s*$"))),
        )
    )
    rules = {
        "r_word_count": (F.col("n_words") >= min_words) & (F.col("n_words") <= max_words),
        "r_mean_word_len": (3 * F.col("n_words") <= F.col("n_word_chars"))
        & (F.col("n_word_chars") <= 10 * F.col("n_words")),
        "r_symbol_ratio": 10 * F.col("n_symbols") <= F.col("n_words"),
        "r_bullet_lines": 10 * F.col("n_bullet_lines") <= 9 * F.col("n_lines"),
        "r_ellipsis_lines": 10 * F.col("n_ellipsis_lines") <= 3 * F.col("n_lines"),
        "r_alpha_words": 5 * F.col("n_alpha_words") >= 4 * F.col("n_words"),
        "r_stopwords": F.col("n_stopwords") >= min_stopwords,
    }
    verdict = F.lit(True)
    for name, cond in rules.items():
        out = out.withColumn(name, cond)
        verdict = verdict & F.col(name)
    return out.withColumn("gopher_pass", verdict)


def time_split(
    df: DataFrame,
    time_col: str,
    train_end,
    *,
    embargo_days: int = 0,
    out_col: str = "split",
    drop_embargo: bool = True,
) -> DataFrame:
    """Temporal holdout split with an embargo gap — the time-axis
    complement to ``hash_split``. Rows strictly before ``train_end``
    are ``train``; rows at or after ``train_end + embargo_days`` are
    ``test``; rows inside the embargo window are DROPPED by default
    (or labeled ``embargo`` with ``drop_embargo=False``). The gap is
    the leakage buffer: for time-correlated data (user sessions, news
    cycles, market ticks) a zero-gap split lets near-boundary train
    rows leak the test period's signal — the standard fix in
    forecasting/financial ML evaluation (purged/embargoed splits).

    Narrow: one comparison per row, no shuffle. Note the labeled
    form is a CASE expression, which parquet cannot take as a pushed
    filter — a reader that wants only ONE side should use
    ``time_slice`` (plain boundary comparisons that DO push down and
    prune date-partitioned files).
    """
    if embargo_days < 0:
        raise ValueError(f"embargo_days must be >= 0, got {embargo_days}")
    t = F.col(time_col)
    cutoff = F.lit(train_end).cast(df.schema[time_col].dataType)
    # interval arithmetic (not date_add, which truncates timestamps to
    # dates): date + N days stays a date, timestamp stays a timestamp
    test_start = (
        cutoff + F.expr(f"INTERVAL {int(embargo_days)} DAY") if embargo_days else cutoff
    )
    split = (
        F.when(t < cutoff, F.lit("train"))
        .when(t >= test_start, F.lit("test"))
        .otherwise(F.lit("embargo"))
    )
    out = df.withColumn(out_col, split)
    if drop_embargo:
        out = out.filter(F.col(out_col) != "embargo")
    return out


def time_slice(
    df: DataFrame,
    time_col: str,
    train_end,
    part: str,
    *,
    embargo_days: int = 0,
) -> DataFrame:
    """One side of ``time_split`` as PLAIN boundary comparisons — the
    production reader path: ``t < cutoff`` / ``t >= cutoff + embargo``
    push down as parquet filters (pinned in tests/test_plan_shape.py),
    so a train-only scan prunes the test period's files/partitions at
    the source instead of labeling and discarding them."""
    if embargo_days < 0:
        raise ValueError(f"embargo_days must be >= 0, got {embargo_days}")
    if part not in {"train", "test"}:
        raise ValueError(f"part must be 'train' or 'test', got {part!r}")
    t = F.col(time_col)
    cutoff = F.lit(train_end).cast(df.schema[time_col].dataType)
    if part == "train":
        return df.filter(t < cutoff)
    start = (
        cutoff + F.expr(f"INTERVAL {int(embargo_days)} DAY") if embargo_days else cutoff
    )
    return df.filter(t >= start)


def length_buckets(
    df: DataFrame,
    len_col: str,
    boundaries: list[int],
    *,
    bucket_col: str = "bucket",
) -> DataFrame:
    """Assign each row to a length bucket (``boundaries`` are inclusive
    upper edges; one overflow bucket catches the rest) — the batching
    prep that keeps padding waste bounded: batching similar-length
    sequences together means each batch pads to ITS max, not the
    corpus max. Bucket label = the edge value (overflow = -1), so
    labels are stable as data grows. Narrow: one comparison chain per
    row, no shuffle — the downstream writer partitions by the bucket
    column and gets its shuffle there, once.
    """
    if not boundaries or sorted(boundaries) != list(boundaries) or len(set(boundaries)) != len(boundaries):
        raise ValueError(f"boundaries must be non-empty, strictly increasing, got {boundaries}")
    expr = F.lit(-1)
    for b in reversed(boundaries):
        expr = F.when(F.col(len_col) <= b, F.lit(b)).otherwise(expr)
    return df.withColumn(bucket_col, expr)


def padding_waste_report(
    df: DataFrame,
    len_col: str,
    boundaries: list[int],
) -> DataFrame:
    """Per-bucket padding economics for ``length_buckets``: rows, the
    bucket's observed max length, tokens padded-to-bucket-max vs
    padded-to-global-max, and the integer token savings — the report
    that justifies (or kills) a bucketed batching layout before anyone
    re-shards 100 TB. All sums are exact longs (combinable, one
    shuffle on the bucket key + one broadcast-back of the 1-row global
    max)."""
    bucketed = length_buckets(df, len_col, boundaries)
    gmax = bucketed.agg(F.max(len_col).alias("__gmax"))
    per = (
        bucketed.join(F.broadcast(gmax))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_rows"),
            F.max(len_col).alias("bucket_max"),
            F.sum(F.col(len_col).cast("bigint")).alias("real_tokens"),
            F.max("__gmax").alias("__gmax"),
        )
    )
    return per.select(
        "bucket",
        "n_rows",
        "bucket_max",
        (F.col("n_rows") * F.col("bucket_max") - F.col("real_tokens")).alias(
            "pad_bucketed"
        ),
        (F.col("n_rows") * F.col("__gmax") - F.col("real_tokens")).alias("pad_global"),
        (F.col("n_rows") * (F.col("__gmax") - F.col("bucket_max"))).alias(
            "tokens_saved"
        ),
    )


def mixture_allocation(
    df: DataFrame,
    strata_col: str,
    size_col: str,
    weights: dict[str, int],
    budget: int,
) -> DataFrame:
    """Token-budget allocation across sources for a pretraining mix:
    split ``budget`` tokens across strata proportional to integer
    ``weights`` (parts, e.g. {"web": 60, "code": 30, "wiki": 10}),
    capped by what each source actually has — the water-filling
    problem every data recipe solves before sampling. A source whose
    capacity falls short of its proportional share is SATURATED (takes
    everything it has); its unused share redistributes to the rest,
    recursively, which is exactly the classic closed form: order
    sources by capacity/weight ascending — the saturated set is always
    a prefix of that order — and test each prefix with integer
    cross-multiplication (avail_i * W_rest <= w_i * B_rest, no float
    in any verdict). Unsaturated sources get
    floor(w_i * B_rest / W_rest) exactly.

    One grouped agg over the data + window passes over the
    #strata-row summary (bounded by the mixture spec, never data
    size). Strata absent from ``weights`` are excluded (an unlisted
    source must never silently take budget). Returns (stratum, avail,
    weight, alloc, saturated) — feed ``alloc/avail`` per stratum into
    ``stratified_hash_sample``/``temperature_mix`` to realize the
    draw. The only floats are the ratio ORDER key (an exact-integer
    division, bit-identical across engines); every allocation verdict
    and value is integer arithmetic.
    """
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    if not weights or any(w <= 0 or w != int(w) for w in weights.values()):
        raise ValueError(f"weights must be positive integers, got {weights}")
    wexpr = F.lit(None).cast("long")
    for name, w in sorted(weights.items()):
        wexpr = F.when(F.col(strata_col) == name, F.lit(int(w))).otherwise(wexpr)
    per = (
        df.withColumn("__w", wexpr)
        .filter(F.col("__w").isNotNull())
        .groupBy(strata_col)
        .agg(
            F.sum(F.col(size_col).cast("bigint")).alias("avail"),
            F.max("__w").alias("weight"),
        )
    )
    w_rank = Window.partitionBy(F.lit(0)).orderBy(
        (F.col("avail") / F.col("weight")).asc(), F.col(strata_col).asc()
    )
    prior = w_rank.rowsBetween(Window.unboundedPreceding, -1)
    ranked = per.withColumn(
        "__cum_avail", F.coalesce(F.sum("avail").over(prior), F.lit(0))
    ).withColumn("__cum_w", F.coalesce(F.sum("weight").over(prior), F.lit(0)))
    tot = Window.partitionBy(F.lit(0))
    ranked = ranked.withColumn("__W", F.sum("weight").over(tot))
    # saturated iff capacity can't cover the proportional share of the
    # budget left after every earlier (poorer) source took its all:
    # avail_i * (W - cumw_i) <= w_i * (budget - cumavail_i) — a prefix
    # of the ratio order by the exchange argument, all-integer
    sat = F.col("avail") * (F.col("__W") - F.col("__cum_w")) <= F.col("weight") * (
        F.lit(budget) - F.col("__cum_avail")
    )
    ranked = ranked.withColumn("saturated", sat)
    ranked = ranked.withColumn(
        "__sat_avail", F.sum(F.when(sat, F.col("avail")).otherwise(0)).over(tot)
    ).withColumn("__sat_w", F.sum(F.when(sat, F.col("weight")).otherwise(0)).over(tot))
    b_rest = F.lit(budget) - F.col("__sat_avail")
    w_rest = F.col("__W") - F.col("__sat_w")
    alloc = F.when(F.col("saturated"), F.col("avail")).otherwise(
        F.floor(F.col("weight") * b_rest / w_rest).cast("bigint")
    )
    return ranked.select(
        F.col(strata_col), "avail", "weight", alloc.alias("alloc"), "saturated"
    )


def hash_fold(
    df: DataFrame, key_col: str, n_folds: int, *, out_col: str = "fold", salt: str = ""
) -> DataFrame:
    """K-fold cross-validation assignment by key hash: fold =
    md5-bucket of the key modulo ``n_folds`` — deterministic across
    engines/sessions/partitionings (the ``hash_keep`` contract), so
    every worker training on fold != i holds out EXACTLY the same
    fold-i rows. Key on a GROUP id (user, domain, document) rather
    than the row id when leakage between folds matters: all of a
    group's rows land in one fold by construction. Narrow, no
    shuffle."""
    if n_folds < 2:
        raise ValueError(f"n_folds must be >= 2, got {n_folds}")
    c = F.col(key_col)
    v = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), c.cast("string")).cast("binary")), 1, 8
        ),
        16,
        10,
    ).cast("long")
    return df.withColumn(out_col, F.pmod(v, F.lit(n_folds)).cast("int"))


def cdc_chunks(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    *,
    window: int = 8,
    divisor: int = 64,
) -> DataFrame:
    """Content-defined chunking: cut after every position whose
    trailing ``window`` characters hash to 0 mod ``divisor`` — chunk
    boundaries depend only on LOCAL content, so an insertion near the
    start shifts every boundary's position but not the characters they
    cut at: all downstream chunks keep their exact text, and
    chunk-level dedup (exact or near) still matches them against the
    unedited original. A fixed-stride chunker (``chunk_text``)
    misaligns every window after one inserted byte. Expected chunk
    length is ``divisor`` characters.

    All Catalyst higher-order functions — per doc: one sequence over
    positions, one md5 per position (bounded by doc length, the price
    of content-defined cuts), array slicing for the chunks; no UDF, no
    shuffle. The hash is md5 of the window substring (engine-neutral),
    so the r43 oracle replays cuts bit-exactly. Docs shorter than
    ``window`` come back as one chunk.

    Returns (id_col, chunk_idx, char_start 0-based, n_chars,
    chunk_text); empty trailing chunks are dropped.
    """
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    if divisor < 1:
        raise ValueError(f"divisor must be >= 1, got {divisor}")
    text = F.col(text_col)
    n = F.length(text)
    positions = F.when(n >= window, F.sequence(F.lit(window), n)).otherwise(
        F.array().cast("array<int>")
    )
    hashv = lambda i: F.conv(  # noqa: E731
        F.substring(
            F.md5(text.substr(i - F.lit(window) + 1, F.lit(window)).cast("binary")),
            1, 8,
        ),
        16, 10,
    ).cast("long")
    cuts = F.filter(positions, lambda i: F.pmod(hashv(i), F.lit(divisor)) == 0)
    starts = F.concat(F.array(F.lit(0).cast("int")), cuts.cast("array<int>"))
    ends = F.concat(cuts.cast("array<int>"), F.array(n.cast("int")))
    spans = F.filter(
        F.arrays_zip(starts.alias("s"), ends.alias("e")),
        lambda z: z["e"] > z["s"],
    )
    exploded = docs.select(
        F.col(id_col), text.alias("__t"), F.posexplode(spans).alias("chunk_idx", "__z")
    )
    return exploded.select(
        id_col,
        "chunk_idx",
        F.col("__z.s").alias("char_start"),
        (F.col("__z.e") - F.col("__z.s")).alias("n_chars"),
        F.col("__t").substr(F.col("__z.s") + 1, F.col("__z.e") - F.col("__z.s")).alias("chunk_text"),
    )


def duplicate_chunk_fraction(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    *,
    window: int = 8,
    divisor: int = 64,
) -> DataFrame:
    """Per-doc boilerplate signal at content-defined granularity: the
    fraction of a doc's CDC chunks whose exact text also appears in
    some OTHER doc — headers, footers, navigation, licence blocks and
    syndicated paragraphs score high chunk-by-chunk even when the doc
    as a whole is unique (doc-level near-dup misses partial
    boilerplate; span-level scanning sees fixed widths). Because the
    chunk boundaries are content-defined (``cdc_chunks``), the SAME
    boilerplate text chunks identically in every doc that carries it,
    wherever it sits.

    Cost: the chunking pass + ONE combinable aggregation over chunk
    hashes + one join back — the duplicate test joins on md5(chunk),
    never the chunk text. Output keeps the verdict exact-integer:
    (id_col, n_chunks, n_dup_chunks); callers threshold with a cross
    multiply (e.g. keep while 100*n_dup <= 30*n_chunks).
    """
    chunks = cdc_chunks(docs, id_col, text_col, window=window, divisor=divisor)
    keyed = chunks.select(F.col(id_col), F.md5("chunk_text").alias("__h")).distinct()
    spread = keyed.groupBy("__h").agg(F.count_distinct(id_col).alias("__docs"))
    return (
        keyed.join(spread, "__h")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum((F.col("__docs") > 1).cast("bigint")).alias("n_dup_chunks"),
        )
    )


def remove_duplicate_chunks(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    *,
    window: int = 8,
    divisor: int = 64,
) -> DataFrame:
    """Chunk-level boilerplate REMOVAL: rebuild each doc keeping a
    chunk's text only in its canonical owner (the min-id doc carrying
    that exact chunk) — shared footers/licence blocks/syndicated
    paragraphs survive exactly once in the corpus while every doc's
    unique prose is untouched. The rewrite complement of
    ``duplicate_chunk_fraction`` (which only scores), at
    content-defined granularity (``cdc_chunks``), so the same
    boilerplate is recognized wherever it sits — the fixed-width
    ``remove_duplicate_spans`` misses shifted copies.

    Deterministic: ownership is min id per chunk hash; within-doc
    repeats of an owned chunk all survive (ownership is a cross-doc
    rule). One chunking pass + one combinable min-agg on chunk hashes
    + one join back + a per-doc ordered rebuild (array_sort by chunk
    index, no window). Returns (id_col, n_chunks, n_removed,
    clean_text); a doc made entirely of others' boilerplate comes back
    with an empty clean_text, not a missing row.
    """
    chunks = cdc_chunks(docs, id_col, text_col, window=window, divisor=divisor)
    keyed = chunks.withColumn("__h", F.md5("chunk_text"))
    owner = keyed.groupBy("__h").agg(F.min(id_col).alias("__owner"))
    flagged = keyed.join(owner, "__h").withColumn(
        "__keep", F.col(id_col) == F.col("__owner")
    )
    return (
        flagged.groupBy(id_col)
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum((~F.col("__keep")).cast("bigint")).alias("n_removed"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("__keep"),
                                F.struct(F.col("chunk_idx"), F.col("chunk_text")),
                            )
                        )
                    ),
                    lambda s: s["chunk_text"],
                ),
                "",
            ).alias("clean_text"),
        )
    )


def build_boilerplate_store(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    path: str,
    *,
    window: int = 8,
    divisor: int = 64,
) -> None:
    """Persist the corpus's CDC chunk hashes — the day-2 leg of the
    boilerplate family: once built, a daily delta can drop every chunk
    the corpus has EVER seen without re-chunking (or even reading) the
    corpus text. Stores one md5 per distinct chunk; window/divisor are
    part of the store contract (chunks must be cut identically on both
    sides)."""
    chunks = cdc_chunks(docs, id_col, text_col, window=window, divisor=divisor)
    (
        chunks.select(F.md5("chunk_text").alias("h")).distinct()
        .withColumn("w", F.lit(window)).withColumn("d", F.lit(divisor))
        .write.mode("overwrite").parquet(path.rstrip("/"))
    )


def remove_known_boilerplate(
    delta: DataFrame, path: str, id_col: str, text_col: str
) -> DataFrame:
    """Rebuild each delta doc dropping every chunk whose hash the store
    has seen (the corpus owns it) and keeping within-delta duplicates
    only in their min-id delta doc — exactly ``remove_duplicate_chunks``
    over corpus ∪ delta restricted to the delta, with the corpus side
    touched ONLY through its hash store (a one-column semi-joinable
    parquet; the corpus text is never read). Returns (id_col, n_chunks,
    n_removed, clean_text), empty-not-missing for fully-boilerplate
    docs."""
    spark = delta.sparkSession
    store = spark.read.parquet(path.rstrip("/"))
    w, d = store.select("w", "d").first()
    chunks = cdc_chunks(delta, id_col, text_col, window=int(w), divisor=int(d))
    keyed = chunks.withColumn("__h", F.md5("chunk_text"))
    known = store.select(F.col("h").alias("__h")).distinct()
    owner = keyed.groupBy("__h").agg(F.min(id_col).alias("__owner"))
    flagged = (
        keyed.join(owner, "__h")
        .join(known.withColumn("__known", F.lit(True)), "__h", "left")
        .withColumn(
            "__keep",
            F.col("__known").isNull() & (F.col(id_col) == F.col("__owner")),
        )
    )
    return (
        flagged.groupBy(id_col)
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum((~F.col("__keep")).cast("bigint")).alias("n_removed"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("__keep"),
                                F.struct(F.col("chunk_idx"), F.col("chunk_text")),
                            )
                        )
                    ),
                    lambda s: s["chunk_text"],
                ),
                "",
            ).alias("clean_text"),
        )
    )


def append_boilerplate_store(delta: DataFrame, id_col: str, text_col: str, path: str) -> None:
    """Append the delta's chunk hashes so tomorrow's delta sees today's
    text as corpus. Append-only and naturally idempotent for the probe
    (which is an existence semi-join: duplicate hash rows change
    nothing); only hashes the store lacks are written, so replays add
    no files' worth of rows either."""
    spark = delta.sparkSession
    store = spark.read.parquet(path.rstrip("/"))
    w, d = store.select("w", "d").first()
    fresh = (
        cdc_chunks(delta, id_col, text_col, window=int(w), divisor=int(d))
        .select(F.md5("chunk_text").alias("h")).distinct()
        .join(store.select("h"), "h", "left_anti")
        .withColumn("w", F.lit(int(w))).withColumn("d", F.lit(int(d)))
    )
    fresh.write.mode("append").parquet(path.rstrip("/"))
