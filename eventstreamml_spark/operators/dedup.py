"""Deduplication operators for training-data pipelines: exact,
MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.

Scale design:
- exact dedup is one hash-groupBy (map-side partial) on a digest, not
  on the full text — the shuffle carries 16-byte keys, not documents;
- MinHash/LSH turns O(n²) similarity into band-bucket equi-joins: the
  only shuffles are (doc → shingle → signature) aggregations and the
  bucket join, all key-partitioned;
- candidate pairs are verified with true Jaccard before acting —
  banding only proposes;
- hash functions are md5/xxhash64 (deterministic, seed-parameterized,
  available JVM-side); no Python in any hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def exact_dedup(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact duplicate groups by content digest: keeps the minimum id
    as the canonical representative.

    Returns (keep_id, n_dups, content_hash); join back with a semi-join
    on keep_id to materialize the deduplicated corpus.
    """
    return (
        docs.select(F.col(id_col), F.md5(F.col(text_col)).alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_dups"))
        .select("keep_id", "n_dups", "content_hash")
    )


def word_shingles(
    docs: DataFrame, k: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Distinct word k-gram shingles per document: (doc_id, shingle).

    Long-relation formulation (posexplode + self-equi-joins on position)
    so the whole thing stays in codegen'd joins — no Python loop over
    tokens, and the oracle can reproduce it relationally.
    """
    from eventstreamml_spark.operators.text import words_table

    w0 = words_table(docs, id_col, text_col)
    joined = w0.alias("w0")
    shingle_cols = [F.col("w0.word")]
    for i in range(1, k):
        wi = w0.alias(f"w{i}")
        joined = joined.join(
            wi,
            (F.col(f"w0.{id_col}") == F.col(f"w{i}.{id_col}"))
            & (F.col(f"w{i}.pos") == F.col("w0.pos") + i),
        )
        shingle_cols.append(F.col(f"w{i}.word"))
    return joined.select(
        F.col(f"w0.{id_col}").alias(id_col),
        F.concat_ws(" ", *shingle_cols).alias("shingle"),
    ).distinct()


def minhash_signatures(
    shingles: DataFrame, n_perm: int = 16, id_col: str = "doc_id"
) -> DataFrame:
    """MinHash signature per document: for permutation i, the minimum
    md5 of ``shingle || ':' || i`` (lexicographic min over hex — a
    uniform hash family, portable across engines).

    One explode (×n_perm) + one groupBy(doc) — the signature table is
    n_docs × n_perm rows of short strings.
    """
    perms = F.explode(F.sequence(F.lit(0), F.lit(n_perm - 1))).alias("perm")
    h = F.md5(F.concat_ws(":", F.col("shingle"), F.col("perm")))
    return (
        shingles.select(F.col(id_col), perms, F.col("shingle"))
        .groupBy(id_col, "perm")
        .agg(F.min(h).alias("minhash"))
    )


def lsh_candidate_pairs(
    signatures: DataFrame,
    n_perm: int = 16,
    n_bands: int = 4,
    id_col: str = "doc_id",
) -> DataFrame:
    """LSH banding: documents agreeing on ALL rows of any band become
    candidate pairs. Band hash = md5 of the band's concatenated
    minhashes; candidates come from an equi-join on (band, band_hash).

    Skew note: a super-common band hash (e.g. boilerplate docs) would
    hot-spot the join; AQE skew-join handles moderate cases, and an
    optional bucket-size cap can drop degenerate buckets.
    """
    rows_per_band = n_perm // n_bands
    banded = (
        signatures.withColumn("band", (F.col("perm") / F.lit(rows_per_band)).cast("int"))
        .groupBy(id_col, "band")
        .agg(F.md5(F.concat_ws("|", F.array_sort(F.collect_list(
            F.concat_ws(":", F.col("perm"), F.col("minhash"))
        )))).alias("band_hash"))
    )
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def jaccard_pairs(
    shingles: DataFrame,
    threshold: float = 0.0,
    id_col: str = "doc_id",
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard for pairs sharing ≥1 shingle (optionally
    restricted to LSH ``candidates`` with columns id_a/id_b).

    |A∩B| via self-equi-join on shingle; |A∪B| = |A|+|B|−|A∩B| from a
    broadcast size table. Emits (id_a, id_b, jaccard ≥ threshold).
    """
    sizes = shingles.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = shingles.alias("a"), shingles.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    if candidates is not None:
        inter = inter.join(candidates.select("id_a", "id_b"), ["id_a", "id_b"], "left_semi")
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    out = (
        inter.join(F.broadcast(sa), "id_a")
        .join(F.broadcast(sb), "id_b")
        .withColumn(
            "jaccard",
            F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return out.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


def simhash(
    shingles: DataFrame, bits: int = 64, id_col: str = "doc_id"
) -> DataFrame:
    """SimHash: per-document 64-bit signature where bit j is the sign of
    Σ_features (±1 depending on feature-hash bit j).

    Pure relational form: explode bit positions, map each shingle's
    xxhash64 bit to ±1, sum per (doc, bit), reassemble the signature as
    a bigint. n_docs × 64 intermediate rows, one shuffle.
    """
    bit = F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("bit")
    per_bit = (
        shingles.select(F.col(id_col), bit, F.xxhash64(F.col("shingle")).alias("_h"))
        .select(
            F.col(id_col), F.col("bit"),
            # shiftright with a *column* shift needs the SQL form
            F.when(F.expr("shiftright(_h, bit) & 1") == 1, 1).otherwise(-1).alias("contrib"),
        )
        .groupBy(id_col, "bit")
        .agg(F.sum("contrib").alias("s"))
    )
    return per_bit.groupBy(id_col).agg(
        F.sum(
            F.when(F.col("s") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), bit)"))
            .otherwise(F.lit(0).cast("long"))
        ).alias("simhash")
    )


def simhash_near_pairs(
    sims: DataFrame, max_hamming: int = 3, id_col: str = "doc_id"
) -> DataFrame:
    """Near-duplicate pairs by SimHash Hamming distance ≤ k, using the
    pigeonhole trick: split the 64-bit signature into (k+1) chunks —
    any pair within distance k agrees exactly on ≥1 chunk → equi-join
    per chunk, then verify with bit_count(xor)."""
    n_chunks = max_hamming + 1
    width = 64 // n_chunks
    chunk = F.explode(F.sequence(F.lit(0), F.lit(n_chunks - 1))).alias("chunk")
    chunks = sims.select(F.col(id_col), F.col("simhash"), chunk)
    if width >= 64:  # single full-width chunk (max_hamming == 0)
        chunks = chunks.withColumn("chunk_val", F.col("simhash"))
    else:
        mask = (1 << width) - 1
        chunks = chunks.withColumn(
            "chunk_val",
            F.expr(f"shiftright(simhash, CAST(chunk * {width} AS INT)) & {mask}"),
        )
    a, b = chunks.alias("a"), chunks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cand.withColumn("hamming", ham).filter(
        F.col("hamming") <= max_hamming
    ).select("id_a", "id_b", "hamming")


def embedding_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (brute force). Quadratic —
    intended for within-bucket verification after an LSH/IVF prefilter
    (see operators.similarity for the bucketed path)."""
    from eventstreamml_spark.operators.similarity import cosine

    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    out = pairs.withColumn("cosine", cosine(F.col("_va"), F.col("_vb")))
    return out.filter(F.col("cosine") >= threshold).select(
        "id_a", "id_b", F.round("cosine", 6).alias("cosine")
    )
