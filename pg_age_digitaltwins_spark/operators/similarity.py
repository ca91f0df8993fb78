"""Embedding similarity + hash-based near-dup operators.

Scale notes (the point of these shapes at 100 TB):

* brute-force cosine is a single scan + map (JVM higher-order
  functions, no Python); top-k is a TakeOrdered — no full sort.
* the LSH paths (MinHash bands, SimHash prefixes, IVF-style coarse
  cells) turn O(N²) similarity into an equi-join on bucket keys — the
  only all-pairs work happens inside buckets.
* generalizes the reference's pgvector model search
  (``AgeDigitalTwinsClient.Models.cs:864-942``) from the tiny models
  dim to billion-row tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


def cosine_sim(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def _query_vector_df(embeddings: DataFrame, query_id: int) -> DataFrame:
    return embeddings.filter(F.col("vec_id") == query_id).select(
        F.col("embedding").alias("__q")
    )


def cosine_above_threshold(
    embeddings: DataFrame, query_id: int, threshold: float
) -> DataFrame:
    """All vectors with cosine(query, v) > threshold (query excluded).

    The query side is one row → broadcast join; the scan stays fully
    parallel and Catalyst prunes to (vec_id, embedding)."""
    q = F.broadcast(_query_vector_df(embeddings, query_id))
    return (
        embeddings.crossJoin(q)
        .filter(F.col("vec_id") != query_id)
        .select(
            "vec_id",
            F.round(cosine_sim(F.col("embedding"), F.col("__q")), 4).alias("sim"),
        )
        .filter(F.col("sim") > threshold)
    )


def knn_brute_force(embeddings: DataFrame, query_id: int, k: int = 10) -> DataFrame:
    """Exact top-k by cosine — orderBy+limit compiles to TakeOrdered
    (per-partition heap + driver merge), not a full sort."""
    q = F.broadcast(_query_vector_df(embeddings, query_id))
    return (
        embeddings.crossJoin(q)
        .filter(F.col("vec_id") != query_id)
        .select(
            "vec_id",
            F.round(cosine_sim(F.col("embedding"), F.col("__q")), 6).alias("sim"),
        )
        .orderBy(F.col("sim").desc(), F.col("vec_id"))
        .limit(k)
    )


def hard_negative_mining(
    embeddings: DataFrame,
    k: int = 5,
    anchor_stride: int = 50,
    sim_lo: float = 0.1,
    sim_hi: float = 0.95,
) -> DataFrame:
    """(anchor_id, vec_id, sim) — contrastive-pair mining for embedding
    training: for each sampled anchor, the top-``k`` most-similar
    candidates inside the [``sim_lo``, ``sim_hi``] cosine band.  Below
    ``sim_lo`` a negative is trivially easy (no gradient signal); above
    ``sim_hi`` it is probably a true duplicate/positive, not a
    negative — the band IS the "hard" in hard negatives.  Anchors are
    a deterministic stride sample (``vec_id % anchor_stride == 0``).

    Filtering and ranking both use the ROUNDED similarity (6 dp) so
    band edges and tie-breaks are engine-portable — same discipline as
    :func:`knn_brute_force`.

    100 TB shape: the anchor set is stride-bounded and broadcast
    (anchors × dim, kilobytes at any corpus size); scoring is ONE
    map-side pass over the embedding table (no shuffle until the
    per-anchor top-k window, which carries only band-surviving rows);
    for billion-scale corpora swap the scoring scan for the LSH/IVF/PQ
    candidate generators — the band/top-k tail is identical."""
    anchors = F.broadcast(
        embeddings.filter(F.col("vec_id") % anchor_stride == 0).select(
            F.col("vec_id").alias("anchor_id"),
            F.col("embedding").alias("__a"),
        )
    )
    sim = F.round(cosine_sim(F.col("embedding"), F.col("__a")), 6)
    w = Window.partitionBy("anchor_id").orderBy(
        F.col("sim").desc(), F.col("vec_id")
    )
    return (
        embeddings.crossJoin(anchors)
        .filter(F.col("vec_id") != F.col("anchor_id"))
        .select("anchor_id", "vec_id", sim.alias("sim"))
        .filter((F.col("sim") >= sim_lo) & (F.col("sim") <= sim_hi))
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )


def norm_stats_by_label(embeddings: DataFrame) -> DataFrame:
    """Per-label count + mean L2 norm — cheap embedding-health rollup."""
    return (
        embeddings.select("label", _norm(F.col("embedding")).alias("n2"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.avg("n2"), 4).alias("avg_norm"),
        )
    )


# ----------------------------------------------------------------------
# IVF-style coarse quantization: assign each vector to its nearest of C
# sampled centroids; ANN search then probes only matching cells.
# ----------------------------------------------------------------------

def ivf_assign(embeddings: DataFrame, centroids: DataFrame) -> DataFrame:
    """Assign vectors to nearest centroid (centroids: (cell_id,
    centroid) — tiny, broadcast).  One scan; the N×C distance work is
    JVM-side; output is the cell index for bucketed ANN."""
    joined = embeddings.crossJoin(F.broadcast(centroids))
    d = cosine_sim(F.col("embedding"), F.col("centroid"))
    ranked = joined.select("vec_id", "cell_id", d.alias("sim")).withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("vec_id").orderBy(F.col("sim").desc(), F.col("cell_id"))
        ),
    )
    return ranked.filter(F.col("rn") == 1).select("vec_id", "cell_id")


def ivf_centroids(embeddings: DataFrame, n_cells: int = 16) -> DataFrame:
    """Deterministic coarse centroids: the first ``n_cells`` vectors by
    id (k-means iterations would refine these; for ANN bucketing any
    fixed spread works and keeps results reproducible)."""
    return (
        embeddings.orderBy("vec_id")
        .limit(n_cells)
        .select(
            F.row_number()
            .over(Window.orderBy("vec_id"))
            .alias("cell_id"),
            F.col("embedding").alias("centroid"),
        )
    )


def ivf_train_kmeans(
    embeddings: DataFrame, n_cells: int = 16, n_iters: int = 2
) -> DataFrame:
    """Lloyd k-means refinement of the coarse centroids, expressed as
    DataFrame ops: assign (broadcast centroids, JVM distance) →
    element-wise mean per cell (posexplode → avg → re-assemble).  Each
    iteration is two shuffles over N rows; the centroid table itself is
    tiny (C×dim doubles) and is collected per iteration to truncate the
    lineage — the standard driver-size-dim / executor-size-data split.
    Empty cells keep their previous centroid.  Deterministic up to
    floating-point summation order (fine for ANN bucketing)."""
    spark = embeddings.sparkSession
    elem_t = embeddings.schema["embedding"].dataType.simpleString()  # array<...>
    cents = ivf_centroids(embeddings, n_cells)
    prev = {r["cell_id"]: list(r["centroid"]) for r in cents.collect()}
    for _ in range(max(0, n_iters)):
        cents_df = spark.createDataFrame(
            [(cid, c) for cid, c in sorted(prev.items())], "cell_id int, centroid " + elem_t
        )
        assigned = ivf_assign(embeddings, cents_df)
        means = (
            embeddings.join(assigned, "vec_id")
            .select("cell_id", F.posexplode("embedding").alias("pos", "v"))
            .groupBy("cell_id", "pos")
            .agg(F.avg("v").alias("v"))
            .groupBy("cell_id")
            .agg(
                F.expr(
                    "transform(array_sort(collect_list(struct(pos, v))), x -> x.v)"
                )
                .cast(elem_t)
                .alias("centroid")
            )
        )
        for r in means.collect():
            prev[r["cell_id"]] = list(r["centroid"])
    return spark.createDataFrame(
        [(cid, c) for cid, c in sorted(prev.items())], "cell_id int, centroid " + elem_t
    )


def ann_ivf_search(
    embeddings: DataFrame,
    query_id: int,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    train_iters: int = 0,
) -> DataFrame:
    """IVF-style ANN: probe only the ``n_probe`` cells nearest the
    query.  At 100 TB the assignment table is computed once at ingest
    and partitioned by ``cell_id``, so a probe reads ~n_probe/n_cells of
    the data — here both steps run in one plan.  Returns the same
    (vec_id, sim) shape as ``knn_brute_force``.  ``train_iters > 0``
    refines the coarse centroids with that many Lloyd iterations
    (``ivf_train_kmeans``) — the production shape, where training runs
    once at ingest; the default stays 0 so the probe itself is
    single-pass and bit-reproducible."""
    if train_iters > 0:
        cents = F.broadcast(ivf_train_kmeans(embeddings, n_cells, train_iters))
    else:
        cents = F.broadcast(ivf_centroids(embeddings, n_cells))
    assigned = ivf_assign(embeddings, cents)
    data = embeddings.join(assigned, "vec_id")
    q_vec = F.broadcast(_query_vector_df(embeddings, query_id))
    q_cells = F.broadcast(
        cents.crossJoin(q_vec)
        .select("cell_id", cosine_sim(F.col("centroid"), F.col("__q")).alias("sim"))
        .orderBy(F.col("sim").desc(), F.col("cell_id"))
        .limit(n_probe)
        .select("cell_id")
    )
    return (
        data.join(q_cells, "cell_id")
        .crossJoin(q_vec)
        .filter(F.col("vec_id") != query_id)
        .select(
            "vec_id",
            F.round(cosine_sim(F.col("embedding"), F.col("__q")), 6).alias("sim"),
        )
        .orderBy(F.col("sim").desc(), F.col("vec_id"))
        .limit(k)
    )


def hyperplane_signatures(
    embeddings: DataFrame, n_bits: int = 16, dim: int = 64, seed: int = 42
) -> DataFrame:
    """Random-hyperplane LSH: bit i = sign(v · r_i) with deterministic
    pseudo-random hyperplanes (seeded, generated driver-side — n_bits×dim
    doubles, broadcast as a literal).  Cosine-similar vectors agree on
    most bits, so bucketing on the signature turns ANN candidate
    generation into an equi-join."""
    import random

    rnd = random.Random(seed)
    planes = [[rnd.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_bits)]
    bits = None
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(x) for x in plane])
        bit = (_dot(F.col("embedding"), p) > 0).cast("long") * (2 ** i)
        bits = bit if bits is None else bits + bit
    return embeddings.select("vec_id", "embedding", bits.alias("bucket"))


def _bucket_expr(n_bits: int, dim: int, seed: int):
    """The hyperplane-LSH bucket id as a Column expression (one table)."""
    import random

    rnd = random.Random(seed)
    planes = [[rnd.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_bits)]
    bits = None
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(x) for x in plane])
        bit = (_dot(F.col("embedding"), p) > 0).cast("long") * (2 ** i)
        bits = bit if bits is None else bits + bit
    return bits


def ann_lsh_multitable(
    embeddings: DataFrame,
    query_id: int,
    k: int = 10,
    n_bits: int = 6,
    dim: int | None = None,
    n_probes: int = 2,
    n_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Multi-table hyperplane LSH: ``n_tables`` INDEPENDENT hash tables
    (distinct seeds) OR-ed together — the standard recall lever (miss
    probability decays exponentially in L: (1-p^b)^L), union + dedup +
    exact re-rank.

    100 TB shape: all L signatures are computed in ONE pass over the
    embeddings (L × n_bits JVM dot products per row, no Python), then
    posexplode to (vec_id, table_id, bucket) — the same bucketed
    equi-join as the single-table search but with a compound key, so
    the probe stays ONE broadcast join regardless of L (cost sub-linear
    in L: the candidate union is joined and re-ranked once, not per
    table).  Candidates hit by several tables dedup via a group-by on
    vec_id (a shuffle over candidates only, never the corpus).
    ``n_probes`` adds Hamming-distance-1 buckets per table, same as the
    single-table knob."""
    if dim is None:
        probe = embeddings.select(F.size("embedding").alias("d")).limit(1).collect()
        dim = probe[0]["d"] if probe else 1
    buckets = F.array(
        *[_bucket_expr(n_bits, dim, seed + 7919 * t) for t in range(n_tables)]
    )
    sig = (
        embeddings.select("vec_id", "embedding", buckets.alias("__bs"))
        .select(
            "vec_id",
            "embedding",
            F.posexplode("__bs").alias("table_id", "bucket"),
        )
        .localCheckpoint(eager=False)  # signature scan shared with the query row
    )
    qrow = sig.filter(F.col("vec_id") == query_id).select(
        "table_id", F.col("bucket").alias("__qb"), F.col("embedding").alias("__q")
    )
    n_probes = max(1, min(n_probes, n_bits + 1))
    probes = F.array(
        F.col("__qb"),
        *[F.col("__qb").bitwiseXOR(F.lit(1 << b)) for b in range(n_probes - 1)],
    )
    q = F.broadcast(
        qrow.select("table_id", F.explode(probes).alias("__qb"), "__q")
    )
    return (
        sig.join(
            q,
            (sig["table_id"] == q["table_id"]) & (sig["bucket"] == q["__qb"]),
        )
        .filter(F.col("vec_id") != query_id)
        .select(
            "vec_id",
            F.round(cosine_sim(F.col("embedding"), F.col("__q")), 6).alias("sim"),
        )
        .groupBy("vec_id")  # dedup across tables; sim identical per row
        .agg(F.max("sim").alias("sim"))
        .orderBy(F.col("sim").desc(), F.col("vec_id"))
        .limit(k)
    )


def ann_lsh_multitable_batch(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_bits: int = 6,
    dim: int | None = None,
    n_probes: int = 2,
    n_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Batched-query multi-table LSH: resolve the top-k neighbors for a
    whole DataFrame of queries with ONE corpus signature build and ONE
    probe join — the retrieval-pipeline shape (r8 verdict #8; the
    single-query ``ann_lsh_multitable`` re-derives the signatures per
    call, fine for ad-hoc lookups, wasteful when a batch of N queries
    shares them).

    ``queries`` must have (query_id, embedding).  Output: (query_id,
    vec_id, sim, rank) — per-query exact-cosine re-ranked candidates,
    rank 1..k, deterministic tiebreak (sim DESC, vec_id).  A query id
    that also exists in the corpus never matches itself.

    100 TB shape: corpus signatures are computed in one pass (L×n_bits
    JVM dot products, posexplode to the compound (table, bucket) key);
    the query side — N×L×probes rows — broadcasts; the candidate
    union is deduped per (query, vec) and re-ranked with ONE window,
    partitioned by query_id (shuffle over candidates only, never the
    corpus)."""
    from pyspark.sql.window import Window

    if dim is None:
        probe = embeddings.select(F.size("embedding").alias("d")).limit(1).collect()
        dim = probe[0]["d"] if probe else 1
    buckets = F.array(
        *[_bucket_expr(n_bits, dim, seed + 7919 * t) for t in range(n_tables)]
    )
    sig = embeddings.select(
        "vec_id", "embedding", buckets.alias("__bs")
    ).select(
        "vec_id", "embedding", F.posexplode("__bs").alias("table_id", "bucket")
    )
    n_probes = max(1, min(n_probes, n_bits + 1))
    qsig = queries.select(
        F.col("query_id"),
        F.col("embedding").alias("__q"),
        buckets.alias("__bs"),
    ).select(
        "query_id", "__q", F.posexplode("__bs").alias("table_id", "__qb0")
    )
    probes = F.array(
        F.col("__qb0"),
        *[F.col("__qb0").bitwiseXOR(F.lit(1 << b)) for b in range(n_probes - 1)],
    )
    q = F.broadcast(
        qsig.select("query_id", "table_id", F.explode(probes).alias("__qb"), "__q")
    )
    cand = (
        sig.join(
            q,
            (sig["table_id"] == q["table_id"]) & (sig["bucket"] == q["__qb"]),
        )
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(cosine_sim(F.col("embedding"), F.col("__q")), 6).alias("sim"),
        )
        .groupBy("query_id", "vec_id")  # dedup across tables/probes
        .agg(F.max("sim").alias("sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("vec_id")
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "sim", "rank")
    )


def ann_lsh_search(
    embeddings: DataFrame,
    query_id: int,
    k: int = 10,
    n_bits: int = 12,
    dim: int | None = None,
    n_probes: int = 1,
) -> DataFrame:
    """LSH-bucketed ANN: exact cosine only within the query's bucket(s).

    ``dim`` (hyperplane width) must match the embedding width — a
    mismatch zero-pads the dot product with nulls and silently
    null-buckets everything.  When not given it is probed from one row
    (a LIMIT-1 scan at plan-build time; at ingest scale the width is
    table metadata and should be passed explicitly).

    ``n_probes`` > 1 enables multi-probe: also search the buckets at
    Hamming distance 1 from the query's (the standard recall lever —
    near neighbors most often land one flipped hyperplane away).  The
    probe set is ≤ n_bits+1 bucket ids on the broadcast side; candidate
    volume grows linearly with probes, never all-pairs."""
    if dim is None:
        probe = embeddings.select(F.size("embedding").alias("d")).limit(1).collect()
        dim = probe[0]["d"] if probe else 1
    sig = hyperplane_signatures(embeddings, n_bits=n_bits, dim=dim).localCheckpoint(
        eager=False
    )  # signature scan shared by the query row and the candidate side
    qrow = sig.filter(F.col("vec_id") == query_id).select(
        F.col("bucket").alias("__qb"), F.col("embedding").alias("__q")
    )
    n_probes = max(1, min(n_probes, n_bits + 1))
    probes = F.array(
        F.col("__qb"),
        *[F.col("__qb").bitwiseXOR(F.lit(1 << b)) for b in range(n_probes - 1)],
    )
    q = F.broadcast(
        qrow.select(F.explode(probes).alias("__qb"), "__q")
    )
    return (
        sig.join(q, sig["bucket"] == q["__qb"])
        .filter(F.col("vec_id") != query_id)
        .select(
            "vec_id",
            F.round(cosine_sim(F.col("embedding"), F.col("__q")), 6).alias("sim"),
        )
        .orderBy(F.col("sim").desc(), F.col("vec_id"))
        .limit(k)
    )


# ----------------------------------------------------------------------
# MinHash + LSH near-duplicate detection over shingle sets
# ----------------------------------------------------------------------

def minhash_signatures(shingled: DataFrame, num_hashes: int = 64) -> DataFrame:
    """(doc_id, shingles array) → (doc_id, sig array<bigint>).

    Single-pass ``F.aggregate`` fold, one row per doc, NO shuffle: the
    shingle array is hashed once (``transform`` → ``xxhash64``) and the
    fold updates all ``num_hashes`` lanes per shingle with
    ``least(acc[i], xxhash64(i, h))`` — independent hash families
    without (a·h+b) mod p arithmetic that overflows int64 under ANSI
    mode.  ``aggregate`` evaluates its input expression once per row,
    so even if Catalyst collapses the shingle projection into it, the
    shingle pipeline runs once (unlike a ``transform``-per-lane shape,
    where the inlined input re-evaluates per lane — measured ~5×
    slower).

    This replaced an explode → ``groupBy(doc_id).agg(64 × min)`` shape:
    the 64-buffer aggregate exceeded ``spark.sql.codegen.maxFields`` and
    silently fell out of whole-stage codegen (interpreted agg), costing
    ~3.5 s at sf0.1 vs ~0.3 s for this fold.

    Empty shingle arrays yield the all-MAX_LONG signature (the fold's
    init), so truly empty docs band together and pair at est=1.0 —
    exact duplicates of each other, which is the honest dedup answer
    (the explode shape silently dropped them).  ``ngram_shingles``
    never emits an empty array (its index sequence has ≥1 element), so
    this is unreachable on the standard pipeline.  NOTE: do NOT guard
    with ``filter(size(shingles) > 0)`` — the predicate is pushed below
    the upstream spread-repartition onto the single-split scan stage,
    serializing the whole shingle build onto one core (measured 0.3 s →
    3.1 s at sf0.1).

    At 100 TB this is a pure map-side projection — parallelism is
    whatever the upstream scan/spread provides, and nothing moves over
    the network."""
    max_long = (1 << 63) - 1
    sig = F.aggregate(
        F.transform("shingles", lambda s: F.xxhash64(s)),
        F.array_repeat(F.lit(max_long).cast("long"), num_hashes),
        lambda acc, h: F.zip_with(
            acc,
            F.sequence(F.lit(0), F.lit(num_hashes - 1)),
            lambda a, i: F.least(a, F.xxhash64(i, h)),
        ),
    )
    return shingled.select("doc_id", sig.alias("sig"))


def minhash_lsh_pairs(
    signatures: DataFrame,
    bands: int = 16,
    threshold: float = 0.5,
    max_bucket: int = 100,
    num_hashes: int | None = None,
) -> DataFrame:
    """LSH banding: split signatures into ``bands`` bands, bucket-join on
    (band index, band hash), then estimate Jaccard as the fraction of
    equal signature lanes; keep pairs ≥ threshold.

    Bucketing is a single ``groupBy(band, bhash)`` with in-bucket pair
    generation — NOT a self-join: a self-join would run the whole
    shingle+minhash pipeline once per side, and the grouped form is
    also the natural LSH shape at corpus scale (bucket sizes are small
    by construction; only same-bucket docs ever meet).  One shuffle
    keyed by (band, bhash) whose rows are (doc_id, 64-long sig).

    **Skew guard**: a degenerate bucket (mass-duplicated boilerplate —
    common in web corpora) would otherwise put k signatures in one row
    and k² pair expansion in one task.  Buckets are capped at
    ``max_bucket`` members (deterministic: kept members are the first
    by doc_id), bounding any task at max_bucket²/2 pairs.  Contract:
    run exact-fingerprint dedup (``text.exact_dedup_stats`` /
    ``fingerprints``) BEFORE LSH — identical docs pair exhaustively and
    carry no near-dup information; past the cap they are dropped here.

    ``num_hashes`` (signature width) lets the band hash use STATIC lane
    offsets: each band is one ``xxhash64`` over its sliced lane array —
    structural array hashing, JVM-side, no per-band string building
    (the ``concat_ws`` over casted lanes this replaced allocated a CSV
    string per band per doc).  Omitted, it is inferred with a one-row
    peek."""
    if num_hashes is None:
        probe = signatures.select(F.size("sig").alias("n")).head(1)
        num_hashes = probe[0]["n"] if probe else bands
    # Materialize the signature table once: three consumers below
    # (banding, and each side of the est join) would otherwise re-run
    # the whole shingle+minhash pipeline per subtree.  At corpus scale
    # this is the stored-signature-column-at-ingest shape.
    signatures = signatures.localCheckpoint(eager=False)
    rpb = max(1, num_hashes // bands)
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(F.slice("sig", b * rpb + 1, rpb)).alias("bhash"),
        )
        for b in range(bands)
    ]
    # The banded shuffle carries ONLY (doc_id, band, bhash) — ~16 bytes
    # per row.  (An earlier shape carried the full 64-lane signature
    # through the explode, i.e. ``bands`` copies of every signature over
    # the wire — a 16× shuffle blowup that dominates at corpus scale;
    # the signatures instead rejoin the deduplicated candidate pairs
    # below, touching each sig once per SIDE, not once per band.)
    banded = signatures.select(
        "doc_id",
        F.explode(F.array(*band_structs)).alias("bk"),
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.bhash").alias("bhash"))
    # Cap BEFORE the aggregation so the collect_list row itself is
    # bounded (max_bucket ids, a few KB), not just the pair expansion.
    # The window partitions by the same key as the groupBy, so Catalyst
    # reuses the hash partitioning — still one shuffle end-to-end.
    w = Window.partitionBy("band", "bhash").orderBy("doc_id")
    capped = (
        banded.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= max_bucket)
        .drop("__rn")
    )
    buckets = (
        capped.groupBy("band", "bhash")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    # all i<j pairs within a bucket; distinct BEFORE the est join so a
    # pair sharing several bands is scored once, not once per band
    n = F.size("ids")
    idx_pairs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.transform(
                F.sequence(i + 1, n),
                lambda j: F.struct(
                    F.element_at("ids", i).alias("doc_a"),
                    F.element_at("ids", j).alias("doc_b"),
                ),
            ),
        )
    )
    cand = (
        buckets.select(F.explode(idx_pairs).alias("p"))
        .select(F.col("p.doc_a").alias("doc_a"), F.col("p.doc_b").alias("doc_b"))
        .distinct()
    )
    # est = fraction of equal signature lanes; the candidate side is
    # tiny by LSH construction (and hard-bounded by max_bucket²), so
    # AQE broadcasts it and each sig join is one pass over signatures
    sa = signatures.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("__sa"))
    sb = signatures.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("__sb"))
    est = (
        F.size(
            F.filter(
                F.zip_with(
                    F.col("__sa"), F.col("__sb"), lambda x, y: (x == y).cast("int")
                ),
                lambda v: v == 1,
            )
        ).cast("double")
        / F.size(F.col("__sa")).cast("double")
    )
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", F.round(est, 4).alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= threshold)
    )


# ----------------------------------------------------------------------
# SimHash (64-bit) near-dup fingerprint
# ----------------------------------------------------------------------

def simhash64(shingled: DataFrame) -> DataFrame:
    """64-bit SimHash per doc: per-bit ±1 votes over shingle hashes,
    sign → bit.  One ``aggregate`` over the shingle array carrying a
    64-slot vote vector (single scan, no shuffle, no Python)."""
    sim = F.expr(
        """
        aggregate(
          transform(shingles, s -> xxhash64(s)),
          array_repeat(0, 64),
          (acc, h) -> zip_with(acc, sequence(0, 63),
                               (a, i) -> a + if(((h >> i) & 1) = 1, 1, -1)),
          acc -> aggregate(
                   zip_with(acc, sequence(0, 63),
                            (v, i) -> if(v > 0, shiftleft(1L, i), 0L)),
                   0L, (s, x) -> s + x)
        )
        """
    )
    return shingled.select("doc_id", sim.alias("simhash"))


def simhash_near_dup_pairs(
    shingled: DataFrame, prefix_bits: int = 16, max_hamming: int = 3
) -> DataFrame:
    """SimHash near-dup candidates: bucket on the top ``prefix_bits``
    (equi-join, no O(N²)), then exact Hamming distance filter."""
    sh = simhash64(shingled).withColumn(
        "bucket", F.shiftright(F.col("simhash"), 64 - prefix_bits)
    ).localCheckpoint(eager=False)  # computed once, joined twice
    a, b = sh.alias("a"), sh.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


def near_dup_groups(pairs: DataFrame) -> DataFrame:
    """(doc_id, group_id): connected components over a near-dup pair
    graph (MinHash-LSH / SimHash / n-gram-Jaccard output — anything
    with doc_a/doc_b columns), so transitive near-duplicates collapse
    into one keepable group — the step that turns pairwise dedup
    verdicts into a keep-one-per-group policy.

    Reuses the Pregel-superstep min-label propagation from
    ``operators.graph_analytics`` (one shuffle per iteration, lineage
    cut per superstep); group_id = min doc_id in the group."""
    from pg_age_digitaltwins_spark.operators.graph_analytics import (
        connected_components,
    )

    verts = (
        pairs.select(F.col("doc_a").alias("dt_id"))
        .unionByName(pairs.select(F.col("doc_b").alias("dt_id")))
        .distinct()
    )
    edges = pairs.select(
        F.col("doc_a").alias("source_id"), F.col("doc_b").alias("target_id")
    )
    return connected_components(verts, edges).select(
        F.col("dt_id").alias("doc_id"), F.col("component").alias("group_id")
    )


def cosine_near_dup_pairs(
    embeddings: DataFrame, threshold: float = 0.4
) -> DataFrame:
    """Exact embedding-cosine near-dup pairs: all (a < b) vector pairs
    with round(cosine, 4) >= threshold.  This is the CORRECTNESS
    BASELINE of the embedding-dedup family — O(N²), only for oracle
    anchoring and small slices; the scale path is the LSH-bucketed
    variant (``ann_lsh_search`` buckets / ``near_dup_groups``), which
    approximates this output with candidate-bucket equi-joins."""
    d = embeddings.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    a = d.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"))
    b = d.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            F.round(cosine_sim(F.col("va"), F.col("vb")), 4).alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
    )


def near_dup_clusters(
    embeddings: DataFrame,
    threshold: float = 0.4,
    pairs: DataFrame | None = None,
) -> DataFrame:
    """(vec_id, cluster, cluster_size) — semantic-dedup clusters: the
    transitive closure of the near-dup pair relation, labeled by the
    min vec_id per component (the canonical representative a dedup pass
    keeps).

    Composition of two existing scale shapes: a pair source (default:
    the exact ``cosine_near_dup_pairs`` baseline; at corpus scale pass
    ``pairs`` from the LSH-bucketed candidate join instead — the
    clustering is agnostic to how candidates were generated) and the
    ``connected_components`` superstep propagation over (vec_id ↔
    vec_id) edges.  Cluster size comes from one more map-side-combined
    aggregation joined back; singletons (no near-dup) form their own
    cluster of size 1, so the output is a total partition of the
    corpus."""
    from pg_age_digitaltwins_spark.operators.graph_analytics import (
        connected_components,
    )

    p = (
        pairs
        if pairs is not None
        else cosine_near_dup_pairs(embeddings, threshold)
    )
    # zero-pad ids: component labels propagate as STRING mins, and the
    # canonical representative must be the NUMERIC min ("10" < "2"
    # lexicographically would mislabel)
    pad = lambda c: F.lpad(c.cast("string"), 12, "0")  # noqa: E731
    verts = embeddings.select(pad(F.col("vec_id")).alias("dt_id"))
    edges = p.select(
        F.concat_ws("-", F.col("vec_a"), F.col("vec_b")).alias("relationship_id"),
        pad(F.col("vec_a")).alias("source_id"),
        pad(F.col("vec_b")).alias("target_id"),
        F.lit("near_dup").alias("name"),
    )
    cc = connected_components(verts, edges)
    labeled = cc.select(
        F.col("dt_id").cast("long").alias("vec_id"),
        F.col("component").cast("long").alias("cluster"),
    )
    sizes = labeled.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return labeled.join(sizes, "cluster").select(
        "vec_id", "cluster", "cluster_size"
    )


def quantize_int8(embeddings: DataFrame) -> DataFrame:
    """Scalar (per-dimension) int8 quantization of the embedding column
    — the standard 4× memory/IO shrink before ANN at corpus scale.

    Codes: ``round((x - min_d) / (max_d - min_d) * 254) - 127`` per
    dimension d (symmetric int8 range), degenerate dimensions
    (min==max) coding to 0.

    Shape at scale: ONE pass computes the per-dimension min/max
    (posexplode → groupBy(dim), map-side combined — the stats table is
    dim-sized, broadcast back), one more map-side pass emits the codes.
    Training stats and coding are the same DataFrame program a 100 TB
    corpus would run; only the broadcast table (64 rows) is small.
    """
    stats = (
        embeddings.select(F.posexplode("embedding").alias("dim", "x"))
        .groupBy("dim")
        .agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
        .orderBy("dim")
    )
    mins = stats.agg(F.collect_list("mn").alias("mns"), F.collect_list("mx").alias("mxs"))
    coded = embeddings.crossJoin(F.broadcast(mins)).select(
        "vec_id",
        F.zip_with(
            F.col("embedding").cast("array<double>"),
            F.arrays_zip(
                F.col("mns").cast("array<double>").alias("mn"),
                F.col("mxs").cast("array<double>").alias("mx"),
            ),
            lambda x, s: F.when(
                s["mx"] > s["mn"],
                (F.round((x - s["mn"]) / (s["mx"] - s["mn"]) * 254) - 127).cast("int"),
            ).otherwise(F.lit(0)),
        ).alias("codes"),
    )
    return coded

def random_projection_int8(
    embeddings: DataFrame,
    out_dim: int = 16,
    salt: str = "jl",
    in_dim: int | None = None,
) -> DataFrame:
    """(vec_id, proj) — Johnson-Lindenstrauss SIGN (Rademacher) random
    projection over int8-quantized codes: ``proj[i] = Σ_j sign(i, j) ·
    code[j]`` with ``sign(i, j) = +1`` iff the first hex digit of
    ``md5(f"{salt}-{i}-{j}")`` is 0-7 (a fair coin), else −1.  The
    dimension-shrink prefilter for ANN pipelines: distances in the
    projected space concentrate around the originals (JL lemma), so a
    cheap ``out_dim``-wide integer scan prunes candidates before exact
    re-ranking — the same two-stage shape as the PQ/SQ8 searches.

    All arithmetic is EXACT BIGINT over int8 codes and ±1 signs (no
    float sums — order-independent and engine-portable), and the sign
    matrix is derived from md5, not an RNG: seedless, reproducible on
    any engine that has md5.

    100 TB shape: the sign matrix is an (out_dim × in_dim) PLAN-TIME
    LITERAL (a kilobyte — never a shuffle side); projection is one
    map-side pass of ``transform``/``aggregate`` whole-stage codegen
    over the quantized codes; quantization itself is the one stats
    shuffle documented on :func:`quantize_int8`."""
    import hashlib

    if in_dim is None:
        # 1-row probe for the (fixed) dimensionality — not a data scan.
        # r12 (ADVICE): guard the probe — head() is None on an empty
        # frame and row[0] is None on a NULL embedding; both previously
        # died with an opaque TypeError.
        row = embeddings.select("embedding").head()
        if row is None or row[0] is None:
            raise ValueError(
                "random_projection_int8: cannot infer in_dim from an "
                "empty embeddings frame (or a NULL first embedding) — "
                "pass in_dim explicitly"
            )
        in_dim = len(row[0])

    def sgn(i: int, j: int) -> int:
        h = hashlib.md5(f"{salt}-{i}-{j}".encode()).hexdigest()[0]
        return 1 if h in "01234567" else -1

    mat = F.array(*[
        F.array(*[F.lit(sgn(i, j)) for j in range(in_dim)])
        for i in range(out_dim)
    ])
    coded = quantize_int8(embeddings)
    return coded.select(
        "vec_id",
        F.transform(
            mat,
            lambda row: F.aggregate(
                F.zip_with(
                    F.col("codes"),
                    row,
                    lambda c, s: (c * s).cast("long"),
                ),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ),
        ).alias("proj"),
    )


def label_centroids(embeddings: DataFrame) -> DataFrame:
    """Per-label centroid, one row per (label, dimension) — the building
    block for class prototypes, drift monitoring, and IVF-style coarse
    cells seeded from labels.

    100 TB shape: posexplode multiplies rows by the (fixed, small)
    dimensionality, then a map-side-combined avg on the (label, dim)
    key — the exchange carries labels × dims rows, not vectors.  The
    1-based ``dim`` matches SQL array subscripts (oracle parity).
    """
    return (
        embeddings.select(
            "label", F.posexplode("embedding").alias("pos", "v")
        )
        .groupBy("label", (F.col("pos") + 1).alias("dim"))
        .agg(F.round(F.avg("v"), 6).alias("centroid"))
    )


def ann_recall(
    embeddings: DataFrame,
    query_ids=(0, 1, 2),
    k: int = 10,
    ivf_floor: float = 0.6,
    lsh_floor: float = 0.4,
    lsh_multi_floor: float = 0.8,
    pq_floor: float = 0.8,
    n_cells: int = 16,
    n_probe: int = 4,
    n_bits: int = 3,
    n_probes: int = 4,
    n_tables: int = 4,
) -> DataFrame:
    """Recall@k of the approximate indexes against exact brute force —
    the ANN quality gate.

    For each query id, the IVF probe and the LSH bucket search each
    retrieve top-k; recall = |approx ∩ exact| / k averaged over the
    query set.  Returns one row per method with ``meets_floor`` so the
    result is oracle-checkable (the recall VALUE depends on the
    hash/centroid layout, but the FLOOR contract is the stable claim:
    if an index regression drops recall below the floor, the driver's
    value-hash gate goes red).  Only O(k · queries) rows ever reach the
    driver — the per-query searches are the same distributed plans the
    ``embed_ann_*`` keys run.

    Floors are per-method and config-matched, measured on the synthetic
    fixture (near-isotropic embeddings — the hard case for hyperplane
    LSH): IVF at 4/16 probes holds 0.87–1.0; single-table hyperplane
    LSH collapses below 0.1 at 8 bits (this gate is what caught that),
    so the gated config is 3 bits + 4-way multi-probe (measured 0.63).
    On clustered production embeddings LSH recovers; at scale the
    recall lever is multiple independent tables, not wider codes —
    which is exactly the ``lsh_multi`` row: ``n_tables`` independent
    OR-ed tables (``ann_lsh_multitable``), gated at 0.8 (measured
    1.0 on the fixture at 3 bits / 4 probes / 4 tables)."""
    spark = embeddings.sparkSession
    floors = {
        "ivf": ivf_floor,
        "lsh": lsh_floor,
        "lsh_multi": lsh_multi_floor,
        "pq": pq_floor,
        # SQ8 prescreen is near-exact (integer codes approximate the
        # dot to ~1/254 per dim); measured 1.0 on the fixture
        "sq8": 0.9,
    }
    per_method: dict[str, list[float]] = {m: [] for m in floors}
    # PQ trains once for the whole query set (the ingest-time shape);
    # gated at 0.8 — measured 0.97 on the isotropic fixture at
    # m=8 / 16 codes / 2 Lloyd iters / refine 10.
    pq_books = pq_train(embeddings, m=8, n_codes=16, n_iters=2)
    pq_enc = pq_encode(embeddings, pq_books)
    for qid in query_ids:
        truth = {
            r["vec_id"] for r in knn_brute_force(embeddings, qid, k).collect()
        }
        approx = {
            "ivf": ann_ivf_search(
                embeddings, qid, k, n_cells=n_cells, n_probe=n_probe
            ),
            "lsh": ann_lsh_search(
                embeddings, qid, k, n_bits=n_bits, n_probes=n_probes
            ),
            "lsh_multi": ann_lsh_multitable(
                embeddings, qid, k,
                n_bits=n_bits, n_probes=n_probes, n_tables=n_tables,
            ),
            "pq": ann_pq_search(
                embeddings, qid, k, codebooks=pq_books, encoded=pq_enc
            ),
            "sq8": ann_sq8_search(embeddings, qid, k, refine_k=5 * k),
        }
        for method, df in approx.items():
            got = {r["vec_id"] for r in df.collect()}
            per_method[method].append(len(got & truth) / float(k))
    rows = [
        (
            m,
            float(sum(vals) / len(vals)),
            bool(sum(vals) / len(vals) >= floors[m]),
        )
        for m, vals in sorted(per_method.items())
    ]
    return spark.createDataFrame(
        rows, "method string, recall_at_k double, meets_floor boolean"
    )


def lsh_dedup_recall(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    num_hashes: int = 64,
    bands: int = 16,
    minhash_floor: float = 0.8,
) -> DataFrame:
    """Recall/precision of the MinHash-LSH near-dup pipeline against
    EXACT n-gram Jaccard ground truth — the dedup quality gate, the
    same contract shape as :func:`ann_recall`: the measured values ride
    along, but ``meets_floor`` is the stable claim the driver's
    value-hash gate pins (a banding/signature regression that drops
    recall below the floor goes red).

    Everything is distributed: ground-truth pairs (sparse co-occurrence
    join), LSH pairs (banded buckets) and their intersection are joins;
    only the three counts reach the driver.
    """
    from pg_age_digitaltwins_spark.operators import text as _text

    exact = _text.ngram_jaccard_pairs(docs, n=n, threshold=threshold).select(
        "doc_a", "doc_b"
    )
    sigs = minhash_signatures(_text.ngram_shingles(docs, n=n), num_hashes)
    approx = minhash_lsh_pairs(
        sigs, bands=bands, threshold=threshold, num_hashes=num_hashes
    ).select("doc_a", "doc_b")
    n_exact = exact.count()
    n_approx = approx.count()
    n_hit = exact.join(approx, ["doc_a", "doc_b"], "semi").count()
    recall = n_hit / n_exact if n_exact else 1.0
    precision = n_hit / n_approx if n_approx else 1.0
    spark = docs.sparkSession
    return spark.createDataFrame(
        [
            (
                "minhash_lsh",
                int(n_exact),
                float(round(recall, 4)),
                float(round(precision, 4)),
                bool(recall >= minhash_floor),
            )
        ],
        "method string, n_true_pairs bigint, recall double, "
        "precision double, meets_floor boolean",
    )


def minhash_lsh_verified_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    num_hashes: int = 64,
    bands: int = 16,
    est_margin: float = 0.15,
) -> DataFrame:
    """Two-phase near-dup detection — the production LSH shape:
    banding generates candidates (est ≥ threshold − margin, so
    estimator noise doesn't pre-drop true pairs), then EXACT shingle
    Jaccard verifies each candidate.  Output pairs are exact on the
    candidate set: precision 1.0 by construction; recall = banding
    recall (gated by :func:`lsh_dedup_recall`).  The verify join costs
    O(candidates), never O(n²) — the whole point of banding.
    """
    from pg_age_digitaltwins_spark.operators import text as _text

    sh = _text.ngram_shingles(docs, n=n)
    sigs = minhash_signatures(sh, num_hashes)
    cand = minhash_lsh_pairs(
        sigs,
        bands=bands,
        threshold=max(0.0, threshold - est_margin),
        num_hashes=num_hashes,
    ).select("doc_a", "doc_b")
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("__sa"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("__sb"))
    inter = F.size(F.array_intersect("__sa", "__sb")).cast("double")
    union = (
        F.size("__sa") + F.size("__sb") - F.size(F.array_intersect("__sa", "__sb"))
    ).cast("double")
    return (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        .select("doc_a", "doc_b", F.round(inter / union, 4).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def levenshtein_verified_pairs(
    docs: DataFrame,
    max_dist: int = 5,
    n: int = 3,
    threshold: float = 0.5,
    num_hashes: int = 64,
    bands: int = 16,
    est_margin: float = 0.15,
) -> DataFrame:
    """(doc_a, doc_b, lev_dist) — EDIT-DISTANCE-verified near-dups:
    MinHash banding generates candidates, then each candidate pair is
    verified with an exact bounded Levenshtein distance over the
    whitespace-normalized text (JVM ``levenshtein`` with the THRESHOLD
    form — O(max_dist·len) per pair instead of O(len²), and -1 above
    the bound so over-distance pairs cost the early-exit, not the full
    matrix).  The typo-class complement to the shingle-Jaccard verify:
    Jaccard misses pure transpositions/substitutions inside tokens;
    edit distance is exactly that metric.

    Recall caveat (same contract as :func:`minhash_lsh_verified_pairs`):
    a pair of SHINGLE-BEARING docs qualifies only if banding surfaces
    it.  A ``max_dist``-edit pair differs in ≤ max_dist tokens, so its
    token-shingle Jaccard stays near 1 for tight bounds and banding
    recall is ~1; the board key value-checks against the brute-force
    SQL truth, so a recall gap on the fixture goes red rather than
    silent.

    Short-doc floor guard (r16, the r15 verdict's #6): a doc under
    ``n`` tokens yields a single degenerate shingle, so ONE in-token
    typo zeroes its Jaccard and banding can never surface the pair.
    Docs under ``n + max_dist`` tokens (a ≤max_dist-edit partner of a
    sub-shingle doc can have at most that many — each edit changes the
    token count by ≤ 1) therefore get EXACT candidate pairing instead:
    bucket by ``floor(len/ (max_dist+1))`` over the normalized text and
    self-join same+adjacent buckets — complete, because a qualifying
    pair's char lengths differ by ≤ max_dist < bucket width.  The
    short set is the near-shingle-floor population (tiny in a real
    corpus) and pairs only form between length-co-located members —
    never a corpus cross join.

    100 TB shape: the verify join costs O(candidates) bounded
    Levenshtein evaluations — never O(n²); text reaches the join
    projected to one normalized column."""
    from pg_age_digitaltwins_spark.operators import text as _text

    if max_dist < 0:
        raise ValueError(f"max_dist must be >= 0, got {max_dist}")
    sh = _text.ngram_shingles(docs, n=n)
    sigs = minhash_signatures(sh, num_hashes)
    cand = minhash_lsh_pairs(
        sigs,
        bands=bands,
        threshold=max(0.0, threshold - est_margin),
        num_hashes=num_hashes,
    ).select("doc_a", "doc_b")
    # short-doc exact bucket (see docstring): length-bucketed
    # same+adjacent self-join over the sub-(n + max_dist)-token docs
    width = max_dist + 1
    tokc = F.size(_text._tokens(F.lower(F.col("text"))))
    nrm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    shortd = (
        docs.filter(tokc < n + max_dist)
        .select("doc_id", F.floor(F.length(nrm) / width).alias("__lb"))
    )
    s_a = shortd.select(
        F.col("doc_id").alias("doc_a"), F.col("__lb").alias("__la")
    )
    s_b = shortd.select(
        F.col("doc_id").alias("doc_b"), F.col("__lb").alias("__bb")
    )
    same = s_a.join(
        s_b,
        (F.col("__la") == F.col("__bb")) & (F.col("doc_a") < F.col("doc_b")),
    )
    adj = s_a.join(s_b, F.col("__la") + 1 == F.col("__bb")).select(
        F.least("doc_a", "doc_b").alias("doc_a"),
        F.greatest("doc_a", "doc_b").alias("doc_b"),
    )
    cand = (
        cand.unionByName(same.select("doc_a", "doc_b"))
        .unionByName(adj)
        .distinct()
    )
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    t = docs.select("doc_id", norm.alias("__tx"))
    a = t.select(F.col("doc_id").alias("doc_a"), F.col("__tx").alias("__ta"))
    b = t.select(F.col("doc_id").alias("doc_b"), F.col("__tx").alias("__tb"))
    d = F.levenshtein(F.col("__ta"), F.col("__tb"), max_dist)
    return (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        .select("doc_a", "doc_b", d.alias("__d"))
        .filter((F.col("__d") >= 0) & (F.col("__d") <= max_dist))
        .select(
            "doc_a", "doc_b", F.col("__d").cast("long").alias("lev_dist")
        )
    )


# ----------------------------------------------------------------------
# Product quantization (PQ) — the compressed-index ANN scale path
# ----------------------------------------------------------------------

def _subvectors(embeddings: DataFrame, m: int) -> DataFrame:
    """(vec_id, sub_id, subvec): split each embedding into ``m``
    contiguous subspaces with ``slice`` — one JVM-side projection, no
    explode of the vector elements themselves."""
    dim_col = F.size("embedding")
    return embeddings.select(
        "vec_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(m - 1)),
                lambda i: F.slice(
                    F.col("embedding").cast("array<double>"),
                    i * (dim_col / m).cast("int") + 1,
                    (dim_col / m).cast("int"),
                ),
            )
        ).alias("sub_id", "subvec"),
    )


def _l2sq(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pq_train(
    embeddings: DataFrame, m: int = 8, n_codes: int = 16, n_iters: int = 2
) -> list[list[list[float]]]:
    """Train PQ codebooks: per subspace, ``n_codes`` centroids refined
    with Lloyd iterations — all subspaces trained in ONE DataFrame
    program per iteration (the subspace id is just another grouping
    key), so training cost is independent of ``m``.

    Returns the codebooks as a plain nested list
    ``[sub_id][code_id] -> centroid`` — m × n_codes × (dim/m) doubles,
    a few KiB even at dim 4096: exactly the driver-size-model /
    executor-size-data split ``ivf_train_kmeans`` uses.  Deterministic
    init (first ``n_codes`` vectors by id per subspace); Lloyd means
    are deterministic up to FP summation order, which PQ consumers
    (floor-gated recall, re-ranked search) tolerate by design.

    r16 (optimization, guide §2.4): the Lloyd ASSIGNMENT is a pure map
    — the codebook rides as a literal (like :func:`pq_encode`) and the
    nearest code is ``array_position(d, array_min(d))`` per row, so the
    n_codes-way join explosion AND the (vec_id, sub_id) row_number
    window shuffle this replaced are gone (the window shuffled
    N·m·n_codes subvector-carrying rows per iteration; measured the
    whole pq board key 26.8 s → see OPTIMIZATION_r16.md).  Tie-breaks
    match the old ``orderBy(d, code_id)`` exactly: code ids ride
    sorted, and array_position returns the FIRST minimum.  The only
    shuffle left per iteration is the map-side-combined means
    aggregate (m × n_codes × dim/m groups).
    """
    subs = _subvectors(embeddings, m)
    init = (
        subs.filter(F.col("vec_id") < n_codes)
        .collect()
    )
    books: dict[tuple[int, int], list[float]] = {
        (r["sub_id"], int(r["vec_id"])): list(r["subvec"]) for r in init
    }
    for _ in range(max(0, n_iters)):
        sub_ids = sorted({s for (s, _) in books})
        codes_per_sub = {
            s: sorted(c for (s2, c) in books if s2 == s) for s in sub_ids
        }
        lit_cents = F.array(*[
            F.array(*[
                F.array(*[F.lit(float(x)) for x in books[(s, c)]])
                for c in codes_per_sub[s]
            ])
            for s in sub_ids
        ])
        lit_codes = F.array(*[
            F.array(*[F.lit(int(c)) for c in codes_per_sub[s]])
            for s in sub_ids
        ])
        cents = F.element_at(lit_cents, F.col("sub_id") + 1)
        darr = F.transform(cents, lambda cent: _l2sq(F.col("subvec"), cent))
        pos = F.array_position(darr, F.array_min(darr)).cast("int")
        assigned = subs.select(
            "sub_id",
            F.element_at(
                F.element_at(lit_codes, F.col("sub_id") + 1), pos
            ).alias("code_id"),
            "subvec",
        )
        means = (
            assigned.select(
                "sub_id", "code_id", F.posexplode("subvec").alias("pos", "x")
            )
            .groupBy("sub_id", "code_id", "pos")
            .agg(F.avg("x").alias("x"))
            .groupBy("sub_id", "code_id")
            .agg(
                F.expr(
                    "transform(array_sort(collect_list(struct(pos, x))), p -> p.x)"
                ).alias("centroid")
            )
        )
        for r in means.collect():
            books[(r["sub_id"], r["code_id"])] = list(r["centroid"])
    return [
        [books[(s, c)] for c in range(n_codes) if (s, c) in books]
        for s in range(m)
    ]


def pq_encode(embeddings: DataFrame, codebooks: list) -> DataFrame:
    """(vec_id, codes array<int>): nearest code per subspace — the
    m-byte compressed representation (64-dim float → 8 bytes at
    m=8/256 codes: 32× smaller, the representation a 100 TB corpus
    actually stores).  The codebook rides along as a literal
    array-of-arrays-of-arrays column, so coding is ONE scan with no
    join, no shuffle, no Python."""
    m = len(codebooks)
    lit_books = F.array(*[
        F.array(*[
            F.array(*[F.lit(float(x)) for x in cent]) for cent in sub
        ])
        for sub in codebooks
    ])
    dim_col = F.size("embedding")
    sub_w = (dim_col / m).cast("int")
    codes = F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda i: F.array_position(
            F.transform(
                lit_books[i],
                lambda cent: _l2sq(
                    F.slice(
                        F.col("embedding").cast("array<double>"),
                        i * sub_w + 1,
                        sub_w,
                    ),
                    cent,
                ),
            ),
            F.array_min(
                F.transform(
                    lit_books[i],
                    lambda cent: _l2sq(
                        F.slice(
                            F.col("embedding").cast("array<double>"),
                            i * sub_w + 1,
                            sub_w,
                        ),
                        cent,
                    ),
                )
            ),
        ).cast("int") - 1,
    )
    return embeddings.select("vec_id", codes.alias("codes"))


def ann_pq_search(
    embeddings: DataFrame,
    query_id: int,
    k: int = 10,
    m: int = 8,
    n_codes: int = 16,
    train_iters: int = 2,
    refine: int = 10,
    codebooks: list | None = None,
    encoded: DataFrame | None = None,
) -> DataFrame:
    """PQ ANN with asymmetric distance computation (ADC) + exact
    re-rank.

    Plan shape: the query's distance table (m × n_codes floats —
    L2² from each query subvector to each code centroid) is computed
    on the driver from the tiny codebook and shipped as a literal, so
    the candidate scan is ONE map over the encoded table:
    ``score = Σ_i dtab[i][codes[i]]`` via ``zip_with``+``aggregate``
    — no join, no shuffle, no explode.  Top ``refine·k`` candidates
    by ADC (a TakeOrdered) are re-ranked with exact cosine against
    the raw vectors (a broadcast-able id join at any scale).

    At 100 TB: train once at ingest (``pq_train``), store ``codes``
    next to the vectors (32× smaller scan), pass ``codebooks`` and
    ``encoded`` here so each query is one scan of the compressed
    column + a k·refine-row exact join."""
    if codebooks is None:
        codebooks = pq_train(embeddings, m=m, n_codes=n_codes, n_iters=train_iters)
    m = len(codebooks)
    if encoded is None:
        encoded = pq_encode(embeddings, codebooks)
    q = embeddings.filter(F.col("vec_id") == query_id).select("embedding").collect()
    if not q:
        raise ValueError(f"query vector {query_id} not found")
    qv = [float(x) for x in q[0]["embedding"]]
    sub_w = len(qv) // m
    dtab = [
        [
            sum(
                (qv[s * sub_w + j] - cent[j]) ** 2
                for j in range(sub_w)
            )
            for cent in codebooks[s]
        ]
        for s in range(m)
    ]
    lit_dtab = F.array(*[
        F.array(*[F.lit(float(d)) for d in row]) for row in dtab
    ])
    cand = (
        encoded.filter(F.col("vec_id") != query_id)
        .select(
            "vec_id",
            F.aggregate(
                F.zip_with(
                    F.col("codes"), lit_dtab, lambda c, row: row[c]
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("adc"),
        )
        .orderBy("adc", "vec_id")
        .limit(refine * k)
    )
    q_vec = F.broadcast(_query_vector_df(embeddings, query_id))
    return (
        embeddings.join(F.broadcast(cand.select("vec_id")), "vec_id")
        .crossJoin(q_vec)
        .select(
            "vec_id",
            F.round(cosine_sim(F.col("embedding"), F.col("__q")), 6).alias("sim"),
        )
        .orderBy(F.col("sim").desc(), F.col("vec_id"))
        .limit(k)
    )


def ann_pq_search_batch(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    m: int = 8,
    n_codes: int = 16,
    train_iters: int = 2,
    refine: int = 10,
    codebooks: list | None = None,
    encoded: DataFrame | None = None,
) -> DataFrame:
    """Batched-query PQ ANN: one codebook training + one encoded-corpus
    scan resolves top-k for a whole DataFrame of (query_id, embedding)
    rows — the retrieval-pipeline shape, mirroring
    ``ann_lsh_multitable_batch``.

    Each query's ADC distance table is computed on the driver from the
    tiny codebook (queries are the small side by assumption) and rides
    along as a broadcast column, so candidate scoring is a single
    crossJoin-free... rather: broadcast-join pass over the encoded
    corpus — score = Σ_i dtab[i][codes[i]] via ``zip_with``+
    ``aggregate``, per (query, vector).  Top ``refine·k`` per query by
    ADC (one window over candidates), then exact cosine re-rank.

    Output: (query_id, vec_id, sim, rank), rank 1..k, ties broken
    (sim DESC, vec_id); a query never matches itself."""
    from pyspark.sql.window import Window

    if codebooks is None:
        codebooks = pq_train(embeddings, m=m, n_codes=n_codes, n_iters=train_iters)
    m = len(codebooks)
    if encoded is None:
        encoded = pq_encode(embeddings, codebooks)
    qrows = queries.select("query_id", "embedding").collect()
    if not qrows:
        raise ValueError("queries frame is empty")
    sub_w = len(qrows[0]["embedding"]) // m
    dtab_rows = []
    for r in qrows:
        qv = [float(x) for x in r["embedding"]]
        dtab = [
            [
                sum((qv[s * sub_w + j] - cent[j]) ** 2 for j in range(sub_w))
                for cent in codebooks[s]
            ]
            for s in range(m)
        ]
        dtab_rows.append((r["query_id"], dtab))
    spark = embeddings.sparkSession
    qdtab = F.broadcast(
        spark.createDataFrame(
            dtab_rows, "query_id long, dtab array<array<double>>"
        )
    )
    adc = (
        encoded.join(qdtab, encoded["vec_id"] != qdtab["query_id"])
        .select(
            "query_id",
            "vec_id",
            F.aggregate(
                F.zip_with(F.col("codes"), F.col("dtab"), lambda c, row: row[c]),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("adc"),
        )
    )
    w_adc = Window.partitionBy("query_id").orderBy("adc", "vec_id")
    cand = (
        adc.withColumn("__rn", F.row_number().over(w_adc))
        .filter(F.col("__rn") <= refine * k)
        .select("query_id", "vec_id")
    )
    qvecs = F.broadcast(
        queries.select("query_id", F.col("embedding").alias("__q"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("vec_id"))
    return (
        embeddings.join(F.broadcast(cand), "vec_id")
        .join(qvecs, "query_id")
        .select(
            "query_id",
            "vec_id",
            F.round(cosine_sim(F.col("embedding"), F.col("__q")), 6).alias("sim"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "sim", "rank")
    )


def ann_sq8_search(
    embeddings: DataFrame, query_id: int, k: int = 10, refine_k: int = 50
) -> DataFrame:
    """SQ8 ANN: scalar-int8 integer dot-product prescreen + exact
    cosine re-rank.

    Unlike PQ/IVF (whose float k-means training defies bit-pinning,
    so their board keys are rows-only), the SQ8 prescreen is EXACT
    integer arithmetic — per-dimension min/max stats, ``round()``-ed
    int codes, BIGINT dot products — so the whole search value-checks
    against a SQL oracle end-to-end.

    100 TB shape: codes are the standard 4× scan shrink; the prescreen
    is one map over the codes column with the query's 64 int codes
    broadcast; top ``refine_k`` by (score, vec_id) is a TakeOrdered;
    the exact cosine re-rank touches ``refine_k`` rows only."""
    coded = quantize_int8(embeddings)
    qc = F.broadcast(
        coded.filter(F.col("vec_id") == query_id).select(
            F.col("codes").alias("__qc")
        )
    )
    approx = (
        coded.filter(F.col("vec_id") != query_id)
        .crossJoin(qc)
        .select(
            "vec_id",
            F.aggregate(
                F.zip_with(
                    F.col("codes"),
                    F.col("__qc"),
                    lambda a, b: (a * b).cast("long"),
                ),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col("vec_id"))
        .limit(refine_k)
    )
    q = F.broadcast(_query_vector_df(embeddings, query_id))
    return (
        embeddings.join(approx.select("vec_id"), "vec_id")
        .crossJoin(q)
        .select(
            "vec_id",
            F.round(cosine_sim(F.col("embedding"), F.col("__q")), 6).alias(
                "sim"
            ),
        )
        .orderBy(F.col("sim").desc(), F.col("vec_id"))
        .limit(k)
    )


def binary_sign_codes(
    embeddings: DataFrame, dim: int | None = None
) -> DataFrame:
    """(vec_id, words) — 1-bit sign binarization packed 32 dims per
    BIGINT word (bit b of word w = 1 iff embedding[32w+b] > 0).

    The classic binary-embedding compression (Charikar hyperplane
    signs with the identity basis): a 64-dim float32 vector becomes
    two BIGINT words — a 16× scan shrink — and Hamming distance
    between codes estimates angular distance.  32 bits per word (not
    64) keeps every packed value positive so the packing is
    bit-identical across engines regardless of signed-shift
    semantics.

    Exactness: ``x > 0`` is a raw-float comparison (no arithmetic, no
    ulp risk), and the pack is a sum of distinct powers of two —
    BIGINT-exact, order-free — so codes value-check against a SQL
    oracle.  All JVM codegen (nested higher-order functions); no
    shuffle, no UDF.

    The corpus must be UNIFORM-dim: a ragged vector would silently
    truncate (longer) or pack phantom 0-bits (shorter), corrupting
    every downstream Hamming prescreen — so an ``assert_true`` on
    ``size(embedding) == dim`` rides INSIDE the consumed expression
    (the truncate_embeddings idiom; column pruning can never drop it)
    and any ragged row fails the job loudly.  When ``dim`` is None it
    is inferred from one head() probe (one extra tiny Spark job —
    pass ``dim`` explicitly on hot paths to skip it)."""
    if dim is None:
        dim = _infer_dim(embeddings)
    return embeddings.select(
        "vec_id", _sign_words_expr(dim, "embedding").alias("words")
    )


def _infer_dim(embeddings: DataFrame) -> int:
    row = embeddings.select("embedding").head()
    if row is None or row[0] is None:
        raise ValueError(
            "cannot infer dim from empty embeddings — pass dim explicitly"
        )
    return len(row[0])


def _sign_words_expr(dim: int, col: str):
    """Packed sign-code expression over column ``col`` with the
    uniform-dim assert fused in (see binary_sign_codes)."""
    n_words = (dim + 31) // 32
    words = F.expr(
        f"transform(sequence(0, {n_words - 1}), w -> "
        "aggregate(sequence(0, 31), 0L, (acc, b) -> acc + "
        f"IF(w * 32 + b < {dim} "
        f"AND element_at({col}, w * 32 + b + 1) > 0, "
        "shiftleft(1L, b), 0L)))"
    )
    return F.when(
        F.assert_true(
            F.size(col) == dim,
            F.concat(
                F.lit(
                    f"binary_sign_codes(): ragged embedding (expected "
                    f"dim={dim}, got size "
                ),
                F.size(col).cast("string"),
                F.lit(")"),
            ),
        ).isNull(),
        words,
    )


def ann_hamming_search(
    embeddings: DataFrame,
    query_id: int,
    k: int = 10,
    refine_k: int = 50,
    dim: int | None = None,
) -> DataFrame:
    """Binary-code ANN: Hamming-distance prescreen over packed sign
    codes + exact cosine re-rank (the third exact-prescreen family
    next to SQ8's integer dot and JL's sign projection).

    The prescreen is pure integer work — ``bit_count(a XOR b)`` per
    word, summed — so like SQ8 the whole search value-checks against
    a SQL oracle end-to-end (ties break on vec_id; the re-rank
    touches ``refine_k`` rows only).

    100 TB shape: codes are a 16× scan shrink (float32 → 1 bit per
    dim in 32-bit-per-BIGINT packing); the scan is one map with the
    query's words broadcast; top ``refine_k`` by (hamming, vec_id)
    compiles to TakeOrdered (per-partition heap), never a full sort;
    popcount-XOR is the cheapest distance kernel there is — this is
    the shape for a first-pass filter over billions of vectors."""
    coded = binary_sign_codes(embeddings, dim=dim)
    qw = F.broadcast(
        coded.filter(F.col("vec_id") == query_id).select(
            F.col("words").alias("__qw")
        )
    )
    approx = (
        coded.filter(F.col("vec_id") != query_id)
        .crossJoin(qw)
        .select(
            "vec_id",
            F.expr(
                "aggregate(zip_with(words, __qw, "
                "(a, b) -> CAST(bit_count(a ^ b) AS BIGINT)), "
                "0L, (acc, x) -> acc + x)"
            ).alias("hamming"),
        )
        .orderBy(F.col("hamming"), F.col("vec_id"))
        .limit(refine_k)
    )
    q = F.broadcast(_query_vector_df(embeddings, query_id))
    return (
        embeddings.join(approx.select("vec_id"), "vec_id")
        .crossJoin(q)
        .select(
            "vec_id",
            F.round(cosine_sim(F.col("embedding"), F.col("__q")), 6).alias(
                "sim"
            ),
        )
        .orderBy(F.col("sim").desc(), F.col("vec_id"))
        .limit(k)
    )


def ann_hamming_search_batch(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    refine_k: int = 50,
    dim: int | None = None,
) -> DataFrame:
    """Batched-query binary-code ANN: ONE corpus code build serves a
    whole DataFrame of queries (the retrieval-pipeline shape, like
    ``ann_lsh_multitable_batch`` / ``ann_pq_search_batch``).

    ``queries`` must have (query_id, embedding) — the query codes and
    re-rank vectors come from the QUERIES frame itself (same contract
    as ``ann_lsh_multitable_batch`` / ``ann_pq_search_batch``), so
    out-of-corpus queries work; query ids that happen to also be
    corpus vec_ids are excluded from their own candidate set.
    Output: (query_id, vec_id, sim, rank) — per-query
    Hamming-prescreened, exact-cosine re-ranked, rank 1..k.  Exact
    integer prescreen → value-checks against SQL end to end (the one
    batch-ANN variant that does; LSH and PQ batches are
    hash/centroid-layout-bound).

    100 TB shape: corpus codes built once (16× scan shrink); the query
    codes — N rows of packed words — BROADCAST against the corpus scan
    (one popcount map, no shuffle of the corpus); per-query top
    ``refine_k`` and the final top-k are each ONE window over
    candidate-sized frames, partitioned by query_id."""
    from pyspark.sql.window import Window

    if dim is None:
        dim = _infer_dim(embeddings)
    coded = binary_sign_codes(embeddings, dim=dim)
    qcoded = F.broadcast(
        queries.select(
            "query_id", _sign_words_expr(dim, "embedding").alias("__qw")
        )
    )
    ham = (
        coded.join(qcoded, coded["vec_id"] != qcoded["query_id"])
        .select(
            "query_id",
            "vec_id",
            F.expr(
                "aggregate(zip_with(words, __qw, "
                "(a, b) -> CAST(bit_count(a ^ b) AS BIGINT)), "
                "0L, (acc, x) -> acc + x)"
            ).alias("hamming"),
        )
    )
    wpre = Window.partitionBy("query_id").orderBy("hamming", "vec_id")
    cand = (
        ham.withColumn("__r", F.row_number().over(wpre))
        .filter(F.col("__r") <= refine_k)
        .select("query_id", "vec_id")
    )
    qvec = F.broadcast(
        queries.select("query_id", F.col("embedding").alias("__q"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("vec_id")
    )
    return (
        embeddings.join(cand, "vec_id")
        .join(qvec, "query_id")
        .select(
            "query_id",
            "vec_id",
            F.round(cosine_sim(F.col("embedding"), F.col("__q")), 6).alias(
                "sim"
            ),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "sim", "rank")
    )


def truncate_embeddings(
    embeddings: DataFrame, out_dim: int, normalize: bool = True
) -> DataFrame:
    """(vec_id, embedding) — Matryoshka-style prefix truncation: keep
    the first ``out_dim`` dimensions (and re-L2-normalize by default),
    the standard cheap-retrieval trick for MRL-trained embeddings
    (coarse search on the prefix, refine on the full vector).

    Exactness: the slice is positional; the norm is one fixed-shape
    fold over the kept dims with the division applied per element and
    rounded at 6 — value-checkable.  Rows with fewer than ``out_dim``
    dims raise (silently padding would corrupt downstream cosines —
    the PPM maxval lesson).

    100 TB shape: pure projection, no shuffle; composes with every
    ANN in this module (prefix codes feed binary_sign_codes /
    quantize_int8 unchanged)."""
    if out_dim < 1:
        raise ValueError("out_dim must be >= 1")
    # the assert rides inside the consumed expression (the range_join
    # cap idiom) so column pruning can never drop it
    pre = F.when(
        F.assert_true(
            F.size("embedding") >= out_dim,
            F.concat(
                F.lit(f"truncate_embeddings(): embedding shorter than "
                      f"out_dim={out_dim}: vec_id "),
                F.col("vec_id").cast("string"),
            ),
        ).isNull(),
        F.slice("embedding", 1, out_dim),
    )
    if normalize:
        norm = F.sqrt(
            F.aggregate(
                pre,
                F.lit(0.0),
                lambda acc, x: acc + x.cast("double") * x.cast("double"),
            )
        )
        out = F.when(norm > 0, F.transform(pre, lambda x: F.round(x.cast("double") / norm, 6))).otherwise(
            F.transform(pre, lambda x: x.cast("double"))
        )
    else:
        out = F.transform(pre, lambda x: x.cast("double"))
    return embeddings.select("vec_id", out.alias("embedding"))


def label_silhouette(embeddings: DataFrame) -> DataFrame:
    """(label, n_points, mean_silhouette) — SIMPLIFIED (centroid-based)
    silhouette score per label: for each point, a = euclidean distance
    to its OWN label centroid, b = min distance to any OTHER label's
    centroid, s = (b − a) / max(a, b) (0 when both are 0) — the
    Kaufman-Rousseeuw medoid-free variant every clustering-quality
    dashboard uses (true silhouette is all-pairs O(n²); the centroid
    form is O(n·k) and ranks cluster health the same way).

    Determinism: distances are fixed-shape positional folds over the
    (point − centroid) differences, per-point s rounds at 6 and the
    per-label mean at 4 — the same float-tolerance discipline as the
    kNN/centroid keys, value-checked against SQL.

    100 TB shape: centroids are one |labels|×dims map-side-combined
    aggregate, broadcast back; each point computes its k distances in
    ONE map-side pass over a k-way broadcast join (k = |labels|,
    small); the rollup is one groupBy on label.  No all-pairs
    anywhere."""
    cents = (
        embeddings.select("label", F.posexplode("embedding").alias("pos", "v"))
        .groupBy("label", "pos")
        .agg(F.avg("v").alias("c"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("pos"), F.col("c")))
                ),
                lambda s: s["c"],
            ).alias("centroid")
        )
    )
    other = F.broadcast(
        cents.select(
            F.col("label").alias("__clabel"), F.col("centroid").alias("__cvec")
        )
    )
    dist = F.sqrt(
        F.aggregate(
            F.zip_with(
                F.col("embedding"),
                F.col("__cvec"),
                lambda x, c: (x.cast("double") - c) * (x.cast("double") - c),
            ),
            F.lit(0.0),
            lambda acc, d: acc + d,
        )
    )
    # deliberate k-way fan-out: every point scores against all |labels|
    # broadcast centroids (k is small; this is the O(n·k) term)
    per_cent = embeddings.select("vec_id", "label", "embedding").crossJoin(
        other
    ).select(
        "vec_id",
        "label",
        "__clabel",
        dist.alias("__d"),
    )
    ab = per_cent.groupBy("vec_id", "label").agg(
        F.min(F.when(F.col("__clabel") == F.col("label"), F.col("__d"))).alias(
            "__a"
        ),
        F.min(F.when(F.col("__clabel") != F.col("label"), F.col("__d"))).alias(
            "__b"
        ),
    )
    s = F.round(
        F.when(
            F.greatest("__a", "__b") > 0,
            (F.col("__b") - F.col("__a")) / F.greatest("__a", "__b"),
        ).otherwise(F.lit(0.0)),
        6,
    )
    return (
        ab.filter(F.col("__b").isNotNull())
        .select("label", s.alias("__s"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_points"),
            F.round(F.avg("__s"), 4).alias("mean_silhouette"),
        )
    )


def mmr_select(
    embeddings: DataFrame,
    query_id: int,
    k: int = 3,
    lam: float = 0.7,
    pool: int = 50,
) -> DataFrame:
    """(rank, vec_id, score) — Maximal Marginal Relevance diversified
    top-k (Carbonell & Goldstein 1998): greedily pick the candidate
    maximizing λ·sim(q, c) − (1−λ)·max_{s∈selected} sim(c, s) — the
    diversity-aware reranker RAG/training-data pipelines run after a
    plain ANN pass (near-duplicate hits stop crowding the top-k).

    Determinism (value-checkable): every cosine rounds at 6 BEFORE it
    enters a comparison, scores round at 6, ties break on vec_id, and
    the (1−λ) weight is computed as the double ``1.0 - lam`` so an
    oracle writing the same subtraction reproduces the bit-identical
    coefficient (a literal ``0.3`` is a DIFFERENT double than
    ``1.0 - 0.7``).  The whole greedy trace replays in SQL as k
    unrolled argmax stages.  Caveat (the seasonal-profile rounding
    lesson): a DYADIC λ (0.5, 0.25…) halves/quarters an exactly-6-dp
    value, parking the 7th digit exactly on 5 where Spark's
    shortest-repr HALF_UP and other engines' binary rounding can
    split — cross-engine value-checking should use a non-dyadic λ
    (0.7 here); the hand test replays the dyadic case with Spark's
    exact rounding semantics.

    100 TB shape: the sequential part runs over a POOL, not the
    corpus — stage 1 is one broadcast-query scan + TakeOrdered(pool)
    (the same plan as knn_brute_force), and each of the k greedy steps
    is a pool-sized frame vs a broadcast selected-set (≤ k rows).
    k·pool is bytes; the corpus is touched exactly once."""
    if k < 1 or pool < 1:
        raise ValueError("k and pool must be >= 1")
    mu = 1.0 - lam
    q = F.broadcast(_query_vector_df(embeddings, query_id))
    cand = (
        embeddings.filter(F.col("vec_id") != query_id)
        .crossJoin(q)
        .select(
            "vec_id",
            "embedding",
            F.round(cosine_sim(F.col("embedding"), F.col("__q")), 6).alias(
                "simq"
            ),
        )
        .orderBy(F.desc("simq"), F.asc("vec_id"))
        .limit(pool)
        .localCheckpoint(eager=True)
    )
    spark = embeddings.sparkSession
    picked = spark.createDataFrame(
        [], "rank bigint, vec_id bigint, score double"
    )
    sel_vecs = None
    for rank in range(1, k + 1):
        if sel_vecs is None:
            scored = cand.select(
                "vec_id", F.round(F.lit(lam) * F.col("simq"), 6).alias("score")
            )
        else:
            pens = (
                cand.join(sel_vecs.select("vec_id"), "vec_id", "left_anti")
                .crossJoin(F.broadcast(sel_vecs.select(F.col("__s"))))
                .select(
                    "vec_id",
                    "simq",
                    F.round(
                        cosine_sim(F.col("embedding"), F.col("__s")), 6
                    ).alias("__p"),
                )
                .groupBy("vec_id", "simq")
                .agg(F.max("__p").alias("__pen"))
            )
            scored = pens.select(
                "vec_id",
                F.round(
                    F.lit(lam) * F.col("simq") - F.lit(mu) * F.col("__pen"), 6
                ).alias("score"),
            )
        pick = (
            scored.orderBy(F.desc("score"), F.asc("vec_id"))
            .limit(1)
            .localCheckpoint(eager=True)
        )
        picked = picked.unionByName(
            pick.select(
                F.lit(rank).cast("bigint").alias("rank"),
                F.col("vec_id").cast("bigint").alias("vec_id"),
                "score",
            )
        )
        new_sel = cand.join(pick.select("vec_id"), "vec_id").select(
            "vec_id", F.col("embedding").alias("__s")
        )
        sel_vecs = (
            new_sel if sel_vecs is None else sel_vecs.unionByName(new_sel)
        )
    return picked


def matryoshka_recall(
    embeddings: DataFrame,
    query_ids=(0, 1, 2),
    k: int = 10,
    dims=(8, 16, 32),
    floors: dict[int, float] | None = None,
) -> DataFrame:
    """(dim, recall_at_k, meets_floor) — recall of PREFIX-truncated
    retrieval against full-dim exact top-k, per Matryoshka prefix
    width: the serving-safety curve for MRL embeddings (which prefix
    is cheap enough to scan AND good enough to retrieve with, before
    the full-vector refine).  Same contract shape as
    :func:`ann_recall`: measured recall rides along; ``meets_floor``
    is the stable claim the driver's value-hash gate pins.

    Floors default to fixture-measured values with margin (64-dim
    near-isotropic synthetic embeddings — the HARD case for
    truncation: no MRL training concentrated mass in the prefix, so
    recall is low by construction and the floors are conservative
    regression tripwires, not quality targets; measured at sf0.01:
    dim 8 → 0.033, 16 → 0.133, 32 → 0.333.  MRL-trained embeddings
    sit far above these).  Only O(k·|queries|·|dims|) rows reach the
    driver; every search is the same broadcast-query TakeOrdered scan
    the kNN key runs, over the truncated projection (pure codegen, no
    shuffle)."""
    spark = embeddings.sparkSession
    if floors is None:
        floors = {8: 0.0, 16: 0.05, 32: 0.15}
    per_dim: dict[int, list[float]] = {d: [] for d in dims}
    truncated = {d: truncate_embeddings(embeddings, d) for d in dims}
    for qid in query_ids:
        truth = {
            r["vec_id"] for r in knn_brute_force(embeddings, qid, k).collect()
        }
        for d in dims:
            got = {
                r["vec_id"]
                for r in knn_brute_force(truncated[d], qid, k).collect()
            }
            per_dim[d].append(len(got & truth) / float(k))
    rows = [
        (
            d,
            float(sum(vals) / len(vals)),
            bool(sum(vals) / len(vals) >= floors.get(d, 0.0)),
        )
        for d, vals in sorted(per_dim.items())
    ]
    return spark.createDataFrame(
        rows, "dim int, recall_at_k double, meets_floor boolean"
    )
