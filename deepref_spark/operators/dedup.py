"""Deduplication suite over the `documents` table: exact, MinHash+LSH,
SimHash, n-gram Jaccard (embedding near-dup lives in similarity.py).

Design for 100 TB:
  * exact dedup is a single hash-groupBy (map-side combined);
  * near-dup never goes quadratic — candidates come from band-bucket
    joins (LSH) whose block sizes AQE's skew handling bounds;
  * all hashing uses the portable md5 formulas so DuckDB oracles verify
    the exact same numbers.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from deepref_spark import portable
from deepref_spark.portable import SPARK, md5_mod

HASH_SPACE = 1_000_003


def _norm_text() -> str:
    return portable.norm_text("text", SPARK)


def exact_dedup(documents: DataFrame) -> DataFrame:
    """Exact duplicates by normalized-text md5: keep the smallest doc_id
    per group, report group size."""
    keyed = documents.select("doc_id", F.expr(f"md5({_norm_text()})").alias("content_hash"))
    return (
        keyed.groupBy("content_hash")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("n_dups"))
    )


def _with_shingles(documents: DataFrame, k: int = 3) -> DataFrame:
    """doc_id + token k-shingle array, with tokenization staged as a
    real column. The extra `_n` reference makes the tokens expression
    multi-referenced so CollapseProject (SPARK-36718 rule) cannot inline
    the regex chain back into the per-shingle lambda — keeping
    tokenization O(1) per row instead of O(#shingles) per row. (Never
    inline the tokenizer inside the per-element lambda: that form
    re-tokenizes the document for EVERY shingle index — measured 10x+
    slowdown at sf0.1.)"""
    toks = portable.norm_tokens("text", SPARK)
    staged = documents.select("doc_id", F.expr(toks).alias("_toks")).withColumn(
        "_n", F.size("_toks")
    )
    return staged.select(
        "doc_id",
        F.expr(
            f"transform(sequence(1, greatest(1, _n - {k - 1})), "
            f"i -> array_join(slice(_toks, i, {k}), ' '))"
        ).alias("shingles"),
    )


def minhash_band_keys(documents: DataFrame, n_bands: int = 8, k: int = 3) -> DataFrame:
    """(doc_id, band, sig): per-band minhash over token k-shingles —
    the shingle->minhash->band step of MinHash-LSH, all built-ins.
    ONE md5 per shingle; each band reads a disjoint 4-hex-char slice
    (n_bands <= 8), so hashing cost is flat in the band count."""
    from deepref_spark.portable import md5_slice_mod

    assert n_bands <= 8
    sh = _with_shingles(documents, k).select(
        "doc_id", F.expr("transform(shingles, s -> md5(s))").alias("hashes")
    )
    bands = [
        "array_min(transform(hashes, h -> {h})) as band_{b}".format(
            h=md5_slice_mod("h", 4 * b, HASH_SPACE), b=b
        )
        for b in range(n_bands)
    ]
    sig = sh.selectExpr("doc_id", *bands)
    return sig.selectExpr(
        "doc_id",
        "stack({n}, {pairs}) as (band, sig)".format(
            n=n_bands, pairs=", ".join(f"{b}, band_{b}" for b in range(n_bands))
        ),
    )


def minhash_lsh_pairs(documents: DataFrame, n_bands: int = 8, k: int = 3) -> DataFrame:
    """Candidate near-dup pairs: docs sharing any band bucket."""
    keys = minhash_band_keys(documents, n_bands, k).localCheckpoint(eager=False)
    a = keys.select("band", "sig", F.col("doc_id").alias("a"))
    b = keys.select("band", "sig", F.col("doc_id").alias("b"))
    return (
        a.join(b, ["band", "sig"]).where(F.col("a") < F.col("b"))
        .select("a", "b").distinct()
    )


def ngram_jaccard_pairs(documents: DataFrame, k: int = 3,
                        threshold: float = 0.8,
                        df_cap: int | None = None) -> DataFrame:
    """Exact shingle-Jaccard >= threshold, computed via an inverted
    shingle index (explode + join + group) — linear in total postings,
    never all-pairs. The scale path prefilters with minhash_lsh_pairs;
    this operator is the verifier.

    ``df_cap``: drop shingles whose document frequency exceeds the cap
    BEFORE the self-join (similarity is then defined over the reduced
    shingle universe, sizes included — the oracle applies the same
    rule). Without it a ubiquitous shingle's posting list makes the
    self-join quadratic in the hottest key; at 100 TB the cap is
    mandatory, locally it defaults off to keep the uncapped oracle."""
    sh = (
        _with_shingles(documents, k)
        .select("doc_id", F.explode("shingles").alias("shingle"))
        .distinct()
    )
    if df_cap is not None:
        # document frequency as a window count over the posting list —
        # one shuffle (no groupBy + rejoin), partition size bounded by
        # the corpus doc count per shingle
        from pyspark.sql import Window

        dfreq = F.count(F.lit(1)).over(Window.partitionBy("shingle"))
        sh = sh.withColumn("_df", dfreq).where(F.col("_df") <= df_cap).drop("_df")
    # the posting table feeds several consumers (sizes, both self-join
    # sides): stage it so the derivation runs exactly once
    sh = sh.localCheckpoint(eager=False)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    common = (
        sh.alias("x")
        .join(sh.alias("y"), "shingle")
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .groupBy(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    return (
        common
        .join(sizes.withColumnRenamed("doc_id", "a").withColumnRenamed("n_sh", "n_a"), "a")
        .join(sizes.withColumnRenamed("doc_id", "b").withColumnRenamed("n_sh", "n_b"), "b")
        .withColumn(
            "jaccard",
            F.col("common") / (F.col("n_a") + F.col("n_b") - F.col("common")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("a", "b", F.round("jaccard", 6).alias("jaccard"))
    )


def simhash(documents: DataFrame, bits: int = 16, k: int = 3) -> DataFrame:
    """Per-doc SimHash over token k-shingles: bit j of each shingle's
    md5-derived hash votes +/-; the fingerprint sets bit j when the
    votes are positive. Explode+pivot-free formulation: one aggregate
    per bit inside a single projection."""
    from deepref_spark.portable import md5_bit

    sh = _with_shingles(documents, k).select(
        "doc_id", F.expr("transform(shingles, s -> md5(s))").alias("hashes")
    )
    bit_terms = []
    for j in range(bits):
        # vote: +1 when md5 bit j is 1, -1 otherwise; one md5 per shingle
        bit_terms.append(
            f"CAST(CASE WHEN aggregate(hashes, 0, (acc, h) -> acc + (2 * {md5_bit('h', j)} - 1)) > 0 "
            f"THEN {1 << j} ELSE 0 END AS BIGINT)"
        )
    return sh.select(
        "doc_id", F.expr(" + ".join(bit_terms)).alias("simhash")
    )


def simhash64(documents: DataFrame, k: int = 3) -> DataFrame:
    """64-bit SimHash from the TRUE md5 bits (portable.md5_true_bit) —
    one md5 per shingle feeds all 64 votes. The 16-bit variant above
    stays for its oracle query; this is the scale fingerprint: at 10^10
    docs a 16-bit bucket holds ~10^6 docs and any within-bucket join
    goes quadratic, while 64 bits keep buckets sparse."""
    from deepref_spark.portable import md5_true_bit

    sh = _with_shingles(documents, k).select(
        "doc_id", F.expr("transform(shingles, s -> md5(s))").alias("hashes")
    )
    bit_terms = [
        f"CAST(CASE WHEN aggregate(hashes, 0, (acc, h) -> acc + (2 * {md5_true_bit('h', j)} - 1)) > 0 "
        f"THEN {1 << j} ELSE 0 END AS BIGINT)"
        for j in range(63)  # 63 vote bits keep the BIGINT non-negative
    ]
    return sh.select("doc_id", F.expr(" + ".join(bit_terms)).alias("simhash"))


def simhash_near_pairs(documents: DataFrame, max_hamming: int = 3,
                       k: int = 3, n_bands: int = 4) -> DataFrame:
    """Near-dup pairs at Hamming distance <= max_hamming over the 64-bit
    fingerprint: band the fingerprint into ``n_bands`` 16-bit slices
    (pigeonhole: any pair within distance n_bands - 1 shares at least
    one exact band), equi-join per band bucket, then verify with
    popcount(xor) — never an all-pairs comparison, and bucket
    cardinality stays bounded at web scale (the round-1 16-bit version
    went quadratic inside hot buckets)."""
    # fingerprints feed both self-join sides — stage once instead of
    # running the 63-vote aggregation twice
    # pigeonhole guarantee: a pair within max_hamming shares a band only
    # when the differing bits fit in n_bands - 1 bands
    assert max_hamming <= n_bands - 1, "recall guarantee needs max_hamming <= n_bands - 1"
    s = simhash64(documents, k).localCheckpoint(eager=False)
    width = 16
    bands = [
        f"(shiftright(simhash, {width * b}) & {(1 << width) - 1}) AS band_{b}"
        for b in range(n_bands)
    ]
    sig = s.selectExpr("doc_id", "simhash", *bands)
    keyed = sig.selectExpr(
        "doc_id", "simhash",
        "stack({n}, {pairs}) as (band, bval)".format(
            n=n_bands, pairs=", ".join(f"{b}, band_{b}" for b in range(n_bands))
        ),
    )
    a = keyed.select("band", "bval", F.col("doc_id").alias("a"), F.col("simhash").alias("sh_a"))
    b = keyed.select("band", "bval", F.col("doc_id").alias("b"), F.col("simhash").alias("sh_b"))
    cand = (
        a.join(b, ["band", "bval"]).where(F.col("a") < F.col("b"))
        .select("a", "b", "sh_a", "sh_b").distinct()
    )
    return (
        cand.withColumn("hamming", F.expr("bit_count(sh_a ^ sh_b)"))
        .where(F.col("hamming") <= max_hamming)
        .select("a", "b", F.col("hamming").cast("int").alias("hamming"))
    )


def passage_dedup(documents: DataFrame, min_words: int = 4) -> DataFrame:
    """Passage-level frequency index (boilerplate detection): split each
    doc on sentence boundaries, hash the normalized passage, count
    distinct docs per passage. The cleaning pass filters n_docs > its
    boilerplate threshold and anti-joins docs on the hash. The groupBy
    is map-side combined (one hash per passage occurrence) — strictly
    linear at any scale."""
    passages = documents.select(
        "doc_id",
        F.explode(F.expr("split(text, '[.!?]')")).alias("raw"),
    ).select(
        "doc_id",
        F.expr(f"trim(regexp_replace(lower(raw), '[^a-z0-9 ]', ' '))").alias("p"),
    ).where(
        F.expr(f"size(split(p, ' +')) >= {min_words}")
    ).select("doc_id", F.expr("md5(p)").alias("passage_hash")).distinct()
    return (
        passages.groupBy("passage_hash")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.min("doc_id").alias("first_doc_id"),
        )
    )


def near_dup_keep_map(documents: DataFrame, n_bands: int = 8, k: int = 3,
                      threshold: float = 0.8,
                      df_cap: int | None = None) -> DataFrame:
    """The dedup DECISION: LSH candidate pairs -> exact-Jaccard verify
    -> connected components over the surviving edges -> one keep doc
    (cluster min) per document. Docs with no near-dup keep themselves.
    This is the end-to-end removal artifact a cleaning pass anti-joins
    on — pairs alone (minhash_lsh_pairs) are only the candidate stage."""
    from deepref_spark.operators.linking import connected_components

    # at 100 TB pass df_cap (mandatory — see ngram_jaccard_pairs) so the
    # verifier's posting lists stay bounded; the local oracle runs uncapped
    verified = ngram_jaccard_pairs(documents, k=k, threshold=threshold, df_cap=df_cap)
    comps = connected_components(verified.select("a", "b"))  # numeric min labels
    ids = documents.select("doc_id").distinct()
    return (
        ids.join(comps.withColumnRenamed("entity", "doc_id"), "doc_id", "left")
        .select("doc_id", F.coalesce("component", "doc_id").alias("keep_doc_id"))
    )
