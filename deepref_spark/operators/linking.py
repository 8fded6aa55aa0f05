"""Entity linking + canonicalization (SURVEY.md §2.8 — new operators
with no reference counterpart; the reference receives gold entity ids).

Stages:
  1. surface forms -> char-ngram shingles -> MinHash band signatures
     (built-in expressions only: the minhash is a min-aggregate of a
     deterministic md5-based hash over the shingle array, so it runs
     inside whole-stage codegen and is reproducible in the DuckDB
     oracle — portable.md5_mod is the shared formula);
  2. LSH blocking: self-join on (band, signature) — candidate pairs
     only within blocks, never the quadratic all-pairs;
  3. edge filter: exact Jaccard over shingle sets on candidates only;
  4. connected components: iterative min-label propagation (small-star
     style) with localCheckpoint every few rounds to cut lineage —
     driver-controlled loop, executor-side joins;
  5. canonical id = lexicographically smallest member of the component.

Skew: the hot-entity head of the distribution makes the canonical
groupBy skewed; callers aggregate with the two-phase salted helper in
operators/skew.py.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from deepref_spark.portable import md5_mod

N_BANDS = 4
NGRAM = 3
HASH_SPACE = 1_000_003


def shingles_expr(col: str, n: int = NGRAM) -> str:
    """char n-gram array of a padded surface form (built-in only)."""
    padded = f"concat('^', {col}, '$')"
    return (
        f"transform(sequence(1, greatest(1, length({padded}) - {n - 1})), "
        f"i -> substring({padded}, i, {n}))"
    )


def minhash_signatures(forms: DataFrame, name_col: str = "entity",
                       n_bands: int = N_BANDS) -> DataFrame:
    """One row per (entity, band) with the band's minhash — the
    aggregate-over-array form keeps everything JVM-side."""
    sh = forms.withColumn("shingles", F.expr(shingles_expr(name_col)))
    bands = []
    for b in range(n_bands):
        h = md5_mod(f"concat('{b}:', s)", HASH_SPACE)
        bands.append(
            f"aggregate(shingles, {HASH_SPACE}, (acc, s) -> least(acc, {h})) as band_{b}"
        )
    sig = sh.selectExpr(name_col, "shingles", *bands)
    stacked = sig.selectExpr(
        name_col, "shingles",
        "stack({n}, {pairs}) as (band, sig)".format(
            n=n_bands,
            pairs=", ".join(f"{b}, band_{b}" for b in range(n_bands)),
        ),
    )
    return stacked


def candidate_pairs(signatures: DataFrame, name_col: str = "entity") -> DataFrame:
    """Self-join within (band, sig) blocks; a < b dedups the pair space.
    AQE's skew-join handles hot blocks."""
    left = signatures.select(
        F.col("band"), F.col("sig"),
        F.col(name_col).alias("a"), F.col("shingles").alias("sh_a"),
    )
    right = signatures.select(
        F.col("band"), F.col("sig"),
        F.col(name_col).alias("b"), F.col("shingles").alias("sh_b"),
    )
    return (
        left.join(right, ["band", "sig"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b", "sh_a", "sh_b")
        .dropDuplicates(["a", "b"])
    )


def similarity_edges(pairs: DataFrame, threshold: float = 0.6) -> DataFrame:
    """Exact shingle-set Jaccard on the blocked candidates only."""
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (
        pairs.withColumn("jaccard", inter / union)
        .where(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def connected_components(edges: DataFrame, max_iter: int = 20) -> DataFrame:
    """(a, b) undirected edges -> (entity, component) with component =
    min member label. Iterative label propagation; each round joins the
    current labels across edges and takes the min; convergence checked
    with a cheap agg. Lineage cut via localCheckpoint (SURVEY.md §4.2)."""
    # the symmetrization union reads `edges` twice — stage it so callers'
    # (possibly expensive) edge pipelines run once
    edges = edges.select("a", "b").localCheckpoint(eager=False)
    sym = edges.union(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
    labels = (
        sym.select(F.col("a").alias("entity"))
        .union(sym.select(F.col("b").alias("entity")))
        .distinct()
        .withColumn("component", F.col("entity"))
    )
    # lazy checkpoints: materialization rides the first action that
    # needs them instead of costing a dedicated job each (2 actions ->
    # 1 action per round; the driver-side loop is latency-bound at
    # small scale and action-count-bound at any scale)
    sym = sym.localCheckpoint(eager=False)
    labels = labels.localCheckpoint(eager=False)
    def one_hop(lbl: DataFrame) -> DataFrame:
        neighbor_min = (
            sym.join(lbl, sym["b"] == lbl["entity"])
            .groupBy(F.col("a").alias("entity"))
            .agg(F.min("component").alias("n_comp"))
        )
        return (
            lbl.join(neighbor_min, "entity", "left")
            .select(
                "entity",
                F.least(F.col("component"), F.coalesce("n_comp", "component")).alias("component"),
                # convergence flag computed in the SAME pass — the
                # round-1 version paid a second labels-sized join per
                # round just to probe for changes
                (F.coalesce("n_comp", "component") < F.col("component")).alias("_changed"),
            )
        )

    for i in range(max_iter):
        # two propagation hops per planned round: Catalyst planning +
        # checkpoint + convergence action are per-ROUND fixed costs (the
        # dominant cost at the small-graph end, measured), so batching
        # hops halves them. Min-label propagation is monotone, so the
        # LAST hop's no-change flag alone certifies the fixed point.
        hop1 = one_hop(labels).drop("_changed")
        new_labels = one_hop(hop1)
        # localCheckpoint each round: labels are one row per distinct
        # entity (small next to the corpus); cutting lineage every round
        # keeps plan depth O(1). Lazy: the convergence agg below is the
        # single action that materializes the round.
        new_labels = new_labels.localCheckpoint(eager=False)
        changed = new_labels.agg(F.max(F.col("_changed").cast("int"))).first()[0]
        labels = new_labels.drop("_changed")
        if not changed:
            break
    return labels


def canonical_map(entities: DataFrame, name_col: str = "entity",
                  threshold: float = 0.6) -> DataFrame:
    """entity -> canonical entity (component min). Singletons map to
    themselves."""
    ents = entities.select(F.col(name_col).alias("entity")).distinct().localCheckpoint(eager=False)
    # signatures feed BOTH sides of the LSH self-join — stage them so
    # the shingle/minhash derivation runs once, not per join side
    sigs = minhash_signatures(ents).localCheckpoint(eager=False)
    edges = similarity_edges(candidate_pairs(sigs), threshold)
    comps = connected_components(edges)
    return (
        ents.join(comps, "entity", "left")
        .select("entity", F.coalesce("component", "entity").alias("canonical"))
    )


def size_gated_broadcast(df: DataFrame, conf_key: str = "deepref.broadcast.max_entities",
                         default_limit: int = 1_000_000) -> tuple[DataFrame, int]:
    """Broadcast-hint ``df`` only when it is provably small.

    At 100 TB the distinct-entity table is NOT broadcast-sized, so an
    unconditional F.broadcast() (the round-1 shape) would OOM every
    executor; above the configured row limit the plain shuffle join
    (AQE handles skew) is the right plan. The count() is an action on
    what callers should already have cached/checkpointed. Returns
    (possibly-hinted df, row count)."""
    limit = int(df.sparkSession.conf.get(conf_key, str(default_limit)))
    n = df.count()
    if n <= limit:
        return F.broadcast(df), n
    return df, n
