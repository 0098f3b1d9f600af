"""Corpus-construction operators: near-dup cluster resolution, test-set
decontamination, stratified domain mixing, repetition quality signals.

These close the loop the pairwise dedup operators (``operators.dedup``)
open: LSH/Jaccard emit *pairs*, but a training pipeline must pick ONE
canonical document per duplicate cluster, drop documents that leak the
eval set, and mix domains at target rates. None of this exists in the
reference (icerunner.py delegates all querying to DuckDB and has no
corpus tooling); SURVEY.md §2.C mandates it for the 100 TB target.

Scale notes:
- The duplicate graph is tiny relative to the corpus (only near-dup
  pairs survive LSH), so iterating over it is cheap even at 100 TB of
  text; each label-propagation round shuffles the EDGE set, never the
  documents.
- Decontamination broadcasts the eval-set n-grams (eval sets are MBs,
  corpora are TBs) so the corpus side stays a narrow map + one
  broadcast-hash semi-join — no corpus shuffle at all.
- Stratified sampling is a pure narrow filter on a deterministic
  md5-derived hex bucket: reproducible on any engine, no RNG state,
  no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from icerunner_spark.functions.text import (
    md5_bucket,
    rate_to_hex_threshold,
    tokens,
    word_ngrams,
)


# --------------------------------------------------------------------------- #
# Connected components over the near-dup pair graph
# --------------------------------------------------------------------------- #


def connected_components(
    pairs: DataFrame,
    id1: str = "id1",
    id2: str = "id2",
    *,
    max_iter: int = 25,
    algorithm: str = "propagation",
) -> DataFrame:
    """(node, component) for the undirected graph given by ``pairs``;
    component = minimum node id reachable from the node.

    Two algorithms, same contract:

    - ``"propagation"`` (default): min-label propagation — every node
      repeatedly adopts the smallest label among itself and its
      neighbors until fixpoint. O(component diameter) rounds; near-dup
      clusters are dense (LSH links most members pairwise), so
      diameters are small in practice and each round is cheap (one
      shuffle of the edge set + one of the label set).
    - ``"two-phase"``: alternating large-star/small-star contractions
      (Kiveris et al., "Connected Components in MapReduce and
      Beyond") — O(log n) rounds regardless of diameter. The scale
      choice when the graph can contain long chains (e.g. transitive
      near-dup edges at loose thresholds).

    Both iterate over the PAIR graph only, never the corpus, and
    ``localCheckpoint`` each round so the plan doesn't grow
    quadratically. Nodes appearing in no pair are absent from the
    result — callers treat missing as singleton (see
    ``resolve_near_duplicates``).
    """
    if algorithm == "two-phase":
        return _cc_two_phase(pairs, id1, id2, max_iter=max_iter)
    if algorithm != "propagation":
        raise ValueError(f"unknown algorithm: {algorithm}")
    edges = (
        # BOTH edge directions from ONE pass over pairs (posexplode of a
        # two-struct array) — the r10 union-of-two-selects form gave the
        # pair pipeline two lineages, and with a broadcast-joined pair
        # plan there is no exchange for ReuseExchange to dedup, so the
        # caller's whole pair generation executed twice inside the
        # union's single job (r11 optimization round, guide §2.4).
        pairs.select(
            F.explode(
                F.array(
                    F.struct(F.col(id1).alias("src"), F.col(id2).alias("dst")),
                    F.struct(F.col(id2).alias("src"), F.col(id1).alias("dst")),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .distinct()
        # materialize ONCE: edges are re-joined in EVERY round, twice
        # (neighbor-min + the changed check), so a lazy lineage re-runs
        # the caller's whole pair-generation pipeline per round —
        # measured 187 s -> 26 s on dedup_cluster_resolution at sf0.1,
        # where the uncached exact-Jaccard inverted-index join (~18 s)
        # replayed every iteration. Same eager-localCheckpoint contract
        # as _cc_two_phase below and pagerank: no CacheManager entry,
        # blocks GC-released with the frame.
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("nlabel"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.src, "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("nlabel", "label")).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select("node", F.col("label").alias("component"))


def _cc_two_phase(
    pairs: DataFrame, id1: str, id2: str, *, max_iter: int
) -> DataFrame:
    """Large-star/small-star connected components (Kiveris et al.).

    Maintains a directed edge set (child -> tentative parent). Each round:

    - large-star: every node u connects its STRICTLY LARGER neighbors to
      m(u) = min(neighbors(u) ∪ {u}) — halves long chains;
    - small-star: every node u connects its smaller-or-equal neighbors
      (and itself) to m(u) — flattens local stars.

    Both steps are a groupBy-min plus one join over the edge set.
    Converges (edge set fixpoint) in O(log n) rounds; the fixpoint is a
    star forest where every node points at its component's minimum id.
    """
    edges = (
        pairs.select(F.col(id1).alias("u"), F.col(id2).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def star(e: DataFrame, large: bool) -> DataFrame:
        nbr = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        m = nbr.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
        keep = F.col("v") > F.col("u") if large else F.col("v") <= F.col("u")
        out = (
            nbr.where(keep)
            .join(m, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        if not large:
            # small-star also links each node itself to its minimum —
            # without this, a node whose neighbors are all smaller would
            # drop off the graph and split its component
            out = out.unionByName(m.select(F.col("u"), F.col("m").alias("v")))
        return out.where(F.col("u") != F.col("v")).distinct()

    for _ in range(max_iter):
        new_edges = star(star(edges, large=True), large=False).localCheckpoint(
            eager=True
        )
        changed = (
            new_edges.exceptAll(edges).limit(1).count()
            or edges.exceptAll(new_edges).limit(1).count()
        )
        edges = new_edges
        if changed == 0:
            break
    # fixpoint is a star forest: u -> root. Roots map to themselves.
    roots = edges.select(F.col("v").alias("node")).distinct().withColumn(
        "component", F.col("node")
    )
    children = edges.select(F.col("u").alias("node"), F.col("v").alias("component"))
    return children.unionByName(roots).distinct()


def resolve_near_duplicates(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    *,
    id1: str = "id1",
    id2: str = "id2",
    max_iter: int = 25,
) -> DataFrame:
    """Attach ``cluster_id`` / ``is_canonical`` to every document.

    cluster_id = min document id in the document's near-dup component
    (own id for singletons); the cluster's minimum-id member is the
    canonical survivor. Filtering ``is_canonical`` yields exactly one
    document per duplicate cluster — the dedup DELETE step a training
    pipeline actually executes, downstream of any pair generator
    (MinHash-LSH, SimHash, exact Jaccard).
    """
    comp = connected_components(pairs, id1, id2, max_iter=max_iter)
    joined = df.join(comp, df[id_col] == comp.node, "left")
    return joined.select(
        df["*"],
        F.coalesce(comp.component, df[id_col]).alias("cluster_id"),
    ).withColumn("is_canonical", F.col(id_col) == F.col("cluster_id"))


# --------------------------------------------------------------------------- #
# Test-set decontamination
# --------------------------------------------------------------------------- #


def ngram_overlap_flags(
    corpus: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 8,
) -> DataFrame:
    """Per-corpus-document count of word n-grams shared with an eval set.

    The standard contamination test (GPT-3 appendix C / PaLM-style):
    a training document leaks a benchmark if it shares any length-n
    token run with it. The eval side is collapsed to DISTINCT n-grams
    and broadcast (eval sets are ~MBs against a ~TB corpus); the corpus
    side is a narrow explode + broadcast-hash join + re-aggregate on
    doc id — the corpus text itself never shuffles. Returns
    (id_col, overlap_grams, contaminated).
    """
    from icerunner_spark.operators.spread import spread_if_narrow

    eval_grams = (
        eval_df.select(F.explode(F.array_distinct(word_ngrams(text_col, n))).alias("gram"))
        .distinct()
    )
    # spread before the gram explode: single-file fixtures scan as one
    # partition, serializing the per-doc n-gram build; SKIPPED when the
    # corpus scan is already >= cores partitions (r12 — the exchange
    # carries the full text, corpus-sized at scale)
    corpus_grams = spread_if_narrow(corpus, id_col).select(
        F.col(id_col),
        F.explode(F.array_distinct(word_ngrams(text_col, n))).alias("gram"),
    )
    hits = (
        corpus_grams.join(F.broadcast(eval_grams), "gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("overlap_grams"))
    )
    return (
        corpus.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("overlap_grams", F.lit(0)).alias("overlap_grams"),
        )
        .withColumn("contaminated", F.col("overlap_grams") > 0)
    )


# --------------------------------------------------------------------------- #
# Stratified sampling / domain mixing
# --------------------------------------------------------------------------- #


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    rates: dict[str, float],
    key_col: str,
    *,
    salt: str = "mix",
    default_rate: float = 1.0,
) -> DataFrame:
    """Deterministic per-stratum downsampling at target rates.

    Domain mixing for training corpora: keep a document iff its
    md5-derived hex bucket sorts below the stratum's threshold. The
    decision depends only on (key, salt, rate): re-running the
    pipeline, re-partitioning, or re-computing on another engine keeps
    the SAME documents — unlike ``df.sample`` whose output depends on
    partition layout. Pure narrow filter, codegen, no shuffle.
    """
    bucket = md5_bucket(key_col, salt)
    threshold: Column = F.lit(rate_to_hex_threshold(default_rate))
    for stratum, rate in sorted(rates.items()):
        threshold = F.when(
            F.col(stratum_col) == stratum, F.lit(rate_to_hex_threshold(rate))
        ).otherwise(threshold)
    return df.where(bucket < threshold)


def temperature_mixture(
    df: DataFrame,
    source_col: str,
    token_col: str,
    key_col: str,
    *,
    total_budget: int,
    alpha: float = 0.5,
    max_sources: int = 10_000,
    salt: str = "temp",
) -> DataFrame:
    """Temperature-scaled source mixing: each source's share of a total
    token budget is proportional to ``mass_i ** alpha`` (alpha=1 keeps
    the natural distribution; alpha -> 0 flattens toward uniform — the
    multilingual-sampling rule from the mT5/XLM-R line of work), and
    documents fill each source's budget in deterministic md5 order.

    Cross-engine exactness: the only floating-point step is
    ``round(sqrt-like pow * 1e6)`` per source — everything after is
    64-bit integer arithmetic (``budget_i = total * m_i // S`` with
    ``m_i = round(mass_i**alpha * 1e6)`` and ``S = sum m_i``), so the
    selected set is bit-identical on any engine and any partitioning.

    Scale shape: one map-side-combinable agg over ``source_col`` (the
    per-source token masses — at most ``max_sources`` rows, enforced),
    budgets joined back via broadcast, then ONE window per source
    (running token total in md5 order) and a filter. The corpus
    shuffles once, on the source key; document text never needs to be
    in ``df`` at all. Returns the kept rows plus ``cum_tokens`` and
    ``budget`` columns."""
    masses = (
        df.groupBy(source_col)
        .agg(F.sum(F.col(token_col).cast("long")).alias("__mass"))
        .withColumn(
            "__m",
            F.round(F.pow(F.col("__mass").cast("double"), F.lit(alpha)) * 1e6)
            .cast("long"),
        )
    )
    # bounded driver transfer: at most max_sources tiny rows (the same
    # documented-bound pattern as the k-means centroid collect)
    rows = masses.limit(max_sources + 1).collect()
    if len(rows) > max_sources:
        raise ValueError(
            f"temperature_mixture: more than {max_sources} sources; "
            "raise max_sources if the cardinality is intentional"
        )
    s_total = sum(r["__m"] for r in rows)
    budgets = [
        (r[source_col], int(total_budget * r["__m"] // s_total)) for r in rows
    ]
    spark = df.sparkSession
    bdf = spark.createDataFrame(budgets, [source_col, "budget"])
    from pyspark.sql.window import Window as _W

    w = _W.partitionBy(source_col).orderBy(
        F.md5(F.concat(F.col(key_col).cast("string"), F.lit(salt))), key_col
    )
    out = (
        df.join(F.broadcast(bdf), source_col)
        .withColumn(
            "cum_tokens", F.sum(F.col(token_col).cast("long")).over(w)
        )
        .filter(F.col("cum_tokens") <= F.col("budget"))
    )
    return out


def leakage_safe_split(
    df: DataFrame,
    id_col: str,
    text_col: str | None = None,
    *,
    weights: dict[str, float] | None = None,
    groups: DataFrame | None = None,
    group_col: str = "cluster_id",
    salt: str = "split",
) -> DataFrame:
    """Train/val/test assignment that cannot leak duplicates across
    splits: the md5 split bucket is computed from the document's
    DUPLICATE-GROUP key, not its id, so every member of a group lands in
    the same split (a near-dup of a training doc can never sit in the
    eval set).

    Group key, strongest available first: pass ``groups`` — an
    (``id_col``, ``group_col``) frame such as
    :func:`resolve_near_duplicates`'s cluster ids — for near-dup-safe
    splits; without it the key is the exact-dup equivalence class
    (``normalize_ws(text_col)``, the same normalization the fingerprint
    dedup uses). ``weights`` is an ordered {split_name: fraction} map
    summing to 1 (insertion order defines the threshold ladder).

    Deterministic and engine-portable (md5 over the group key + salt —
    the same contract as :func:`stratified_sample`): re-running, re-
    partitioning, or recomputing on another engine assigns the SAME
    splits, and expected split sizes follow the weights in GROUPS (so
    heavily-duplicated corpora should prefer the ``groups`` form, where
    a mega-cluster moves as one unit). Narrow projection (+ one
    broadcast-shaped join when ``groups`` is given) — no shuffle of the
    corpus. Returns ``df`` plus a ``split`` column."""
    from icerunner_spark.functions.text import normalize_ws

    weights = dict(weights or {"train": 0.9, "val": 0.05, "test": 0.05})
    if not weights or abs(sum(weights.values()) - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1: {weights}")
    if groups is None and text_col is None:
        raise ValueError("pass text_col (exact-dup key) or groups")
    if groups is not None:
        # one row per id: a duplicate id in a user-supplied groups frame
        # would otherwise fan out corpus rows through the left join
        g = groups.select(
            F.col(id_col).alias("__sid"),
            F.col(group_col).cast("string").alias("__gkey"),
        ).dropDuplicates(["__sid"])
        df = df.join(g, df[id_col] == g["__sid"], "left").drop("__sid")
        key = F.col("__gkey")
    else:
        key = normalize_ws(text_col)
    # NULL-key guard: a null group key / null text would yield a null
    # md5 bucket, every when() branch would evaluate null, and the row
    # would silently fall through otherwise() into the LAST split —
    # skewing it with exactly the undefined-key rows. Fall back to the
    # id (ungrouped but deterministic); rows where the id is null too
    # share the empty-string key and land together in one split, which
    # is the documented behavior for undefined keys.
    key = F.coalesce(key, F.col(id_col).cast("string"), F.lit(""))
    bucket = md5_bucket(key, salt)
    names = list(weights)
    cum = 0.0
    expr: Column | None = None
    for name in names[:-1]:
        cum += weights[name]
        th = rate_to_hex_threshold(cum)
        branch = F.when(bucket < F.lit(th), F.lit(name))
        expr = branch if expr is None else expr.when(
            bucket < F.lit(th), F.lit(name)
        )
    split = (
        expr.otherwise(F.lit(names[-1]))
        if expr is not None
        else F.lit(names[-1])
    )
    out = df.withColumn("split", split)
    return out.drop("__gkey") if groups is not None else out


# --------------------------------------------------------------------------- #
# Context-window chunking
# --------------------------------------------------------------------------- #


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Split documents into overlapping token windows (context-window
    chunking: the preprocessing step for embedding long documents or
    splitting them to a model's sequence length; ``pack_sequences`` then
    bins the short pieces). Chunk k covers tokens
    [k*(chunk-overlap), k*(chunk-overlap)+chunk).

    Pure higher-order array expressions + posexplode: a narrow map —
    each document expands to ~n_tokens/(chunk-overlap) rows with no
    shuffle, so chunking streams at scan speed at any corpus size.
    Returns (id_col, chunk_idx, n_chunk_tokens, chunk_text).
    """
    if chunk_tokens <= overlap:
        raise ValueError("chunk_tokens must exceed overlap")
    step = chunk_tokens - overlap
    # let-bind the token array before the per-chunk lambda (the CSE
    # boundary functions.text.word_ngrams documents): the naive capture
    # re-ran the tokenize regex once per CHUNK
    chunks = F.element_at(
        F.transform(
            F.array(tokens(text_col)),
            lambda tk: F.transform(
                F.sequence(
                    F.lit(1),
                    F.greatest(F.size(tk), F.lit(1)),
                    F.lit(step),
                ),
                lambda s: F.slice(tk, s, chunk_tokens),
            ),
        ),
        1,
    )
    return df.select(
        F.col(id_col),
        F.posexplode(chunks).alias("chunk_idx", "__chunk"),
    ).select(
        id_col,
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.size("__chunk").cast("long").alias("n_chunk_tokens"),
        F.concat_ws(" ", "__chunk").alias("chunk_text"),
    )


# --------------------------------------------------------------------------- #
# Repetition quality signals (Gopher-style)
# --------------------------------------------------------------------------- #


def repetition_cols(text_col: str) -> dict[str, Column]:
    """Within-document repetition ratios (Gopher/MassiveText quality
    filters): fraction of duplicate tokens and duplicate word 2-grams.
    High values mark boilerplate / generated spam for the quality
    gate. Pure higher-order array expressions — scan-speed, no UDF."""
    toks = tokens(text_col)
    grams2 = word_ngrams(text_col, 2)
    dup_ratio = lambda arr: F.when(  # noqa: E731 — local shaping helper
        F.size(arr) > 0,
        1.0 - F.size(F.array_distinct(arr)) / F.size(arr),
    ).otherwise(F.lit(0.0))
    return {
        "n_tokens": F.size(toks),
        "dup_token_ratio": dup_ratio(toks),
        "dup_2gram_ratio": dup_ratio(grams2),
    }


# --------------------------------------------------------------------------- #
# Hard-negative mining (retrieval / embedding training pairs)
# --------------------------------------------------------------------------- #


def mine_hard_negatives(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    ngram: int = 3,
    df_max: int = 64,
    min_shared: int = 3,
    jaccard_max: float = 0.5,
    per_anchor: int = 3,
) -> DataFrame:
    """Mine hard NEGATIVES for contrastive retrieval training: for each
    anchor document, the documents that share rare vocabulary (lexically
    close — the negatives a BM25-ish retriever would wrongly surface)
    but are NOT near-duplicates (which would be false negatives). The
    standard recipe for training dense retrievers / embedding models:
    random negatives are too easy, duplicates are poison, and the value
    is in the band between.

    Candidate generation is an inverted-index self-join restricted to
    INFORMATIVE units — distinct word ``ngram``-grams with document
    frequency in ``[2, df_max]`` (n-grams, not single tokens: template-
    heavy corpora have tiny unigram vocabularies where every token is a
    stopword, while n-gram df still separates shared phrasing from
    boilerplate) — which is both the relevance signal and the scale
    bound: a gram at df = d contributes d·(d-1)/2 candidate pairs, so
    total candidates are bounded by ``df_max × total_postings`` —
    LINEAR in the corpus, never all-pairs.
    Near-dup exclusion and scoring reuse the same informative-gram
    sets: pairs with informative-Jaccard >= ``jaccard_max`` are dropped
    as duplicates, the rest rank per anchor by summed integer gram
    rarity ``n_docs DIV df`` (integer arithmetic end-to-end — like
    :func:`temperature_mixture`, the selected pairs are bit-identical
    on any engine and any partitioning; no float sums whose association
    could differ).

    Shuffles: grams hash once for df, once for the pair aggregation;
    document text never shuffles. The informative postings table is
    materialized ONCE (eager ``localCheckpoint`` — it feeds both
    self-join sides plus the per-doc size aggregate, and without the
    cut each consumer re-runs the tokenize + df lineage); its size is
    bounded by ``df_max x |informative grams|`` narrow rows. Returns
    ``(anchor_id, negative_id, shared_terms, rarity_score)`` with at
    most ``per_anchor`` rows per anchor.
    """
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(word_ngrams(text_col, ngram))).alias(
            "tok"
        ),
    )
    n_docs = df.select(F.count(F.lit(1)).alias("n_docs"))
    tdf = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("dfreq"))
        .filter((F.col("dfreq") >= 2) & (F.col("dfreq") <= df_max))
    )
    posts = (
        toks.join(tdf, "tok")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "tok",
            # integer rarity: floor(n_docs / df). Exact in doubles for
            # any corpus < 2^53 docs, and integer thereafter — the
            # cross-engine-deterministic stand-in for log-IDF
            F.floor(F.col("n_docs") / F.col("dfreq")).alias("w"),
        )
        .localCheckpoint(eager=True)
    )
    sizes = posts.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a, b = posts.alias("a"), posts.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("id1"), F.col("b.doc_id").alias("id2")
        )
        .agg(
            F.count(F.lit(1)).alias("shared"),
            F.sum(F.col("a.w")).alias("score"),
        )
    )
    s1 = sizes.select(F.col("doc_id").alias("id1"), F.col("sz").alias("sz1"))
    s2 = sizes.select(F.col("doc_id").alias("id2"), F.col("sz").alias("sz2"))
    flt = (
        pairs.join(s1, "id1")
        .join(s2, "id2")
        .filter(
            (F.col("shared") >= min_shared)
            & (
                F.col("shared")
                / (F.col("sz1") + F.col("sz2") - F.col("shared"))
                < jaccard_max
            )
        )
        .select("id1", "id2", "shared", "score")
    )
    # both directions carry the same (shared, score), so a single
    # explode replaces the union — a union re-runs the whole pair
    # pipeline once per branch, an explode emits both rows in one pass
    directed = flt.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("id1").alias("anchor_id"),
                    F.col("id2").alias("negative_id"),
                ),
                F.struct(
                    F.col("id2").alias("anchor_id"),
                    F.col("id1").alias("negative_id"),
                ),
            )
        ).alias("__d"),
        "shared",
        "score",
    ).select("__d.anchor_id", "__d.negative_id", "shared", "score")
    from pyspark.sql import Window

    w = Window.partitionBy("anchor_id").orderBy(
        F.desc("score"), F.desc("shared"), F.asc("negative_id")
    )
    return (
        directed.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= per_anchor)
        .select(
            "anchor_id",
            "negative_id",
            F.col("shared").alias("shared_terms"),
            F.col("score").alias("rarity_score"),
        )
    )


# --------------------------------------------------------------------------- #
# Cross-source duplication forensics
# --------------------------------------------------------------------------- #


def source_overlap(
    df: DataFrame,
    source_col: str,
    text_col: str,
    *,
    ngram: int | None = None,
    key: Column | None = None,
) -> DataFrame:
    """Pairwise cross-source duplication matrix: for every pair of
    sources, how many duplication-unit classes they share, and the
    overlap coefficient ``shared / min(classes_a, classes_b)``. The
    corpus-forensics question behind source selection ("which crawl
    dumps/mirrors duplicate each other, and how much of the smaller one
    is redundant?") — answered BEFORE committing to a mixture, since a
    source largely contained in another contributes little new text but
    full storage/compute cost.

    The duplication unit, strictest first:
    - default: the whole-document exact-dup class
      (``md5(normalize_ws(text))`` — same normalization as the exact
      dedup operators, md5 so any engine replays it);
    - ``ngram=n``: distinct word n-grams (md5-hashed), the CCNet-style
      shared-phrase measure that also sees partial/containment overlap
      exact doc classes miss — the right unit for crawl-dump forensics.

    Scale shape: one distinct over (key, source) — the only corpus-
    proportional exchange, carrying 32-hex md5 keys, never text — then
    a self-equi-join on the key. Per-key join fan-out is bounded by the
    number of sources carrying that key (thousands at most, and only
    keys on >= 2 sources survive), so the pair stage is answer-shaped:
    at most sources^2 output rows regardless of corpus size."""
    from icerunner_spark.functions.text import normalize_ws

    if key is None:
        if ngram is not None:
            key = F.explode(
                F.array_distinct(
                    F.transform(
                        word_ngrams(text_col, ngram), lambda g: F.md5(g)
                    )
                )
            )
        else:
            key = F.md5(normalize_ws(text_col))
    ks = df.select(
        key.alias("__k"), F.col(source_col).alias("__src")
    ).distinct()
    per_source = ks.groupBy("__src").agg(F.count(F.lit(1)).alias("__n"))
    a = ks.select(F.col("__k"), F.col("__src").alias("source_1"))
    b = ks.select(F.col("__k").alias("__k2"), F.col("__src").alias("source_2"))
    pairs = (
        a.join(b, (a["__k"] == b["__k2"]) & (F.col("source_1") < F.col("source_2")))
        .groupBy("source_1", "source_2")
        .agg(F.count(F.lit(1)).alias("shared_classes"))
    )
    n1 = per_source.select(
        F.col("__src").alias("source_1"), F.col("__n").alias("__n1")
    )
    n2 = per_source.select(
        F.col("__src").alias("source_2"), F.col("__n").alias("__n2")
    )
    return (
        pairs.join(n1, "source_1")
        .join(n2, "source_2")
        .select(
            "source_1",
            "source_2",
            "shared_classes",
            F.round(
                F.col("shared_classes") / F.least("__n1", "__n2"), 6
            ).alias("overlap_coeff"),
        )
    )
