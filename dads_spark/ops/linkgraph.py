"""Hyperlink extraction and domain-graph analytics for web corpora.

A crawl's link structure is a first-class training-data signal: in-link
counts feed quality weighting (pages nobody links to are
disproportionately spam), and PageRank-style centrality is the classic
crawl-prioritization / corpus-weighting score. Both reduce to operations
over a (src_domain, dst_domain) edge table that is tiny relative to the
corpus (domains ~ 1e8 even when pages ~ 1e12), so the expensive step is
the one pass over the pages that EMITS edges; everything after runs on
the small graph.

- ``extract_links``: pure JVM regex over the html/text column
  (``regexp_extract_all``) — codegen map stage, composes with the scan,
  zero shuffles, scales with corpus bytes.
- ``domain_edges``: dedup to distinct (src, dst) — one shuffle keyed by
  the edge, output bounded by |domains|^2 in theory, |observed links| in
  practice.
- ``pagerank``: iterative power method on the edge table. Each round is
  one join edges⋈ranks on src (broadcast-able when the rank vector of
  |domains| rows fits, which at domain granularity it usually does) plus
  one groupBy dst — both keyed shuffles on the small graph, never on the
  corpus. Lineage is cut per round with ``localCheckpoint`` (same
  rationale as ops/components.py: iterative plans otherwise re-derive
  round k from round 0). Dangling mass (nodes with no out-edges) is
  redistributed uniformly each round — the standard stochastic-matrix
  fix — via one scalar aggregate per round.

Reference analog: none (DADS is a pure time-series engine); this is part
of the training-data-pipeline suite over web text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: href attribute values in single or double quotes; absolute http(s) only
HREF_PATTERN = r'href=["\'](https?://[^"\'\s>]+)["\']'


def extract_links(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """One row per (id, *keep, link_url) for every absolute href in
    ``html_col``.

    ``regexp_extract_all`` + ``explode`` — all JVM expression work; the
    only data movement is the explode's row expansion inside the same
    stage. ``keep`` carries extra columns (e.g. the page's own domain)
    through the explode so downstream edge construction needs no join
    back onto the corpus. Relative links are out of scope (they need the
    page's own URL to resolve; compose with ops/urltools for that).
    """
    links = F.regexp_extract_all(
        F.col(html_col).cast("string"), F.lit(HREF_PATTERN), F.lit(1)
    )
    return df.select(
        F.col(id_col), *keep, F.explode(links).alias("link_url")
    )


def domain_edges(
    links: DataFrame,
    src_col: str = "src_domain",
    url_col: str = "link_url",
) -> DataFrame:
    """Distinct (src, dst) domain edges from extracted link URLs.

    ``parse_url(..., 'HOST')`` is JVM-side; the distinct is one shuffle
    keyed by the edge pair. Self-loops are dropped (a site linking to
    itself carries no cross-site signal).
    """
    dst = F.lower(F.parse_url(F.col(url_col), F.lit("HOST")))
    return (
        links.select(
            F.col(src_col).alias("src"), dst.alias("dst")
        )
        .where(F.col("dst").isNotNull() & (F.col("dst") != F.col("src")))
        .distinct()
    )


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """(node, pr) after ``iterations`` synchronous power-method rounds.

    pr_{k+1}(v) = (1-d)/N + d * (sum_{u->v} pr_k(u)/outdeg(u) + D_k/N)

    where D_k is the total rank mass on dangling nodes (outdeg 0) at
    round k. Uniform init pr_0 = 1/N. Deterministic up to float summation
    order — callers comparing across engines should round (see the
    ``link_pagerank`` gate entry, 6 dp).

    Scale shape: ``ranks`` has |nodes| rows (domains, not pages) — the
    join below broadcasts it when small enough and AQE handles it
    otherwise; the per-round shuffles are keyed on node ids of the SMALL
    graph. The dangling-node set is static and computed once; each
    round's dangling MASS stays inside the plan as a broadcast 1-row
    aggregate (cross join), so a round costs exactly one Spark job (the
    eager ``localCheckpoint`` that also cuts lineage) with zero driver
    round-trips — the iteration never synchronizes on the driver.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_nodes = nodes.count()
    # size the iteration's parallelism to the GRAPH, not the corpus: the
    # rollup that produced `edges` ran wide, but |nodes| is orders of
    # magnitude smaller — at 108 domains one task beats 32, at 1e8 domains
    # this yields ~1000 partitions. Narrow coalesce, no extra shuffle.
    part = max(1, n_nodes // 100_000)
    nodes = nodes.coalesce(part)
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # per-edge share denominator, joined once (outdeg is static)
    e_w = (
        e.join(outdeg, "src")
        .select("src", "dst", "outdeg")
        .repartition(part, "src")
        .localCheckpoint(eager=True)
    )
    # static dangling-node set: appears as dst but never as src
    dang_nodes = (
        nodes.join(outdeg, nodes.node == outdeg.src, "left_anti")
        .localCheckpoint(eager=True)
    )
    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("pr"))
    base = (1.0 - damping) / n_nodes
    for _ in range(iterations):
        dang_mass = ranks.join(F.broadcast(dang_nodes), "node").agg(
            F.coalesce(F.sum("pr"), F.lit(0.0)).alias("dm")
        )
        contrib = (
            e_w.join(ranks, e_w.src == ranks.node)
            .groupBy("dst")
            .agg(F.sum(F.col("pr") / F.col("outdeg")).alias("in_mass"))
        )
        ranks = (
            nodes.join(contrib, nodes.node == contrib.dst, "left")
            .crossJoin(F.broadcast(dang_mass))
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("in_mass"), F.lit(0.0))
                        + F.col("dm") / F.lit(float(n_nodes))
                    )
                ).alias("pr"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks


def trustrank(
    edges: DataFrame,
    seeds: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    seed_col: str = "node",
) -> DataFrame:
    """TrustRank (Gyongyi, Garcia-Molina, Pedersen, VLDB 2004): PageRank
    with the teleport vector restricted to a manually-vetted TRUSTED seed
    set, so trust flows outward from known-good sites and spam farms —
    which real sites rarely link to — starve. The standard
    web-corpus-quality companion to ``pagerank``: the ratio pr/tr (or the
    gap in ranks) is the classic spam-mass estimate.

    t_{k+1}(v) = (1-d)*s(v) + d * (sum_{u->v} t_k(u)/outdeg(u) + D_k*s(v))

    with s uniform over the seed set (0 elsewhere) and the dangling mass
    D_k redistributed BY THE SEED DISTRIBUTION (not uniformly): teleport
    and dangling restarts must agree or trust leaks to untrusted nodes —
    this is the personalized-PageRank convention. t_0 = s.

    Scale shape: identical to ``pagerank`` — every per-round join/groupBy
    keys on the SMALL domain graph; the seed set joins in once as a
    static broadcast column; one Spark job per round via eager
    localCheckpoint, zero driver round-trips inside a round. Scores are
    damping-weighted float sums — callers hashing across engines round
    (the gate entry uses 6 dp, like ``link_pagerank``).

    Reference analog: none (pure web-corpus op); SURVEY §2.4 suite.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_nodes = nodes.count()
    part = max(1, n_nodes // 100_000)
    nodes = nodes.coalesce(part)
    s_nodes = seeds.select(F.col(seed_col).alias("node")).distinct()
    n_seeds = s_nodes.count()
    if n_seeds == 0:
        raise ValueError("trustrank needs a non-empty seed set")
    # static per-node teleport mass: 1/|S| on seeds, 0 elsewhere
    nodes_s = (
        nodes.join(
            F.broadcast(s_nodes.withColumn("_s", F.lit(1.0 / n_seeds))),
            "node",
            "left",
        )
        .select("node", F.coalesce(F.col("_s"), F.lit(0.0)).alias("s"))
        .localCheckpoint(eager=True)
    )
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    e_w = (
        e.join(outdeg, "src")
        .select("src", "dst", "outdeg")
        .repartition(part, "src")
        .localCheckpoint(eager=True)
    )
    dang_nodes = (
        nodes.join(outdeg, nodes.node == outdeg.src, "left_anti")
        .localCheckpoint(eager=True)
    )
    ranks = nodes_s.select("node", F.col("s").alias("tr"))
    for _ in range(iterations):
        dang_mass = ranks.join(F.broadcast(dang_nodes), "node").agg(
            F.coalesce(F.sum("tr"), F.lit(0.0)).alias("dm")
        )
        contrib = (
            e_w.join(ranks, e_w.src == ranks.node)
            .groupBy("dst")
            .agg(F.sum(F.col("tr") / F.col("outdeg")).alias("in_mass"))
        )
        ranks = (
            nodes_s.join(contrib, nodes_s.node == contrib.dst, "left")
            .crossJoin(F.broadcast(dang_mass))
            .select(
                "node",
                "s",
                (
                    F.lit(1.0 - damping) * F.col("s")
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("in_mass"), F.lit(0.0))
                        + F.col("dm") * F.col("s")
                    )
                ).alias("tr"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select("node", "tr")


def triangle_counts(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Per-node triangle counts + local clustering coefficient over the
    UNDIRECTED simple graph induced by the edge table — link-farm rings
    and mutual-citation cliques (triangle-dense neighborhoods) are a
    spam/SEO signal the per-node scores (degree, PageRank) cannot see.

    Standard distributed shape (the MapReduce "node-iterator++"):
    canonicalize each edge to (lo, hi) and dedup; count each triangle
    once by joining edge (a<b) with edge (b<c) on the shared middle node
    and probing (a<c) — every join keys on a node of the SMALL graph, so
    the corpus is never touched and skew is bounded by the max degree.
    (At web scale the classic refinement — orienting edges by degree so
    the join fans out from the LOW-degree endpoint — drops the cost to
    O(m^1.5); at domain granularity the plain oriented join suffices and
    keeps the plan three hash joins.)

    Output: (node, degree, triangles, lcc) with lcc = 2T / (d(d-1)),
    0.0 for degree < 2; lcc rounded to 6 dp for cross-engine hashing.
    """
    und = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
    )
    # wedges a-b-c with a<b<c via (a,b)⋈(b,c); close with probe (a,c)
    e1 = und.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = und.select(F.col("a").alias("y"), F.col("b").alias("z"))
    wedges = e1.join(e2, "y")
    tri = wedges.join(
        und.select(F.col("a").alias("x"), F.col("b").alias("z")), ["x", "z"]
    )
    per_node = (
        tri.select(F.explode(F.array("x", "y", "z")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("triangles"))
    )
    return (
        deg.join(per_node, "node", "left")
        .select(
            "node",
            "degree",
            F.coalesce(F.col("triangles"), F.lit(0)).cast("long").alias("triangles"),
            F.when(
                F.col("degree") >= 2,
                F.round(
                    2.0
                    * F.coalesce(F.col("triangles"), F.lit(0))
                    / (F.col("degree") * (F.col("degree") - 1)),
                    6,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("lcc"),
        )
    )


#: one <a> element: absolute href (group 1) and its anchor text (group 2).
#: No backreferences — identical semantics under Java regex and RE2.
ANCHOR_PATTERN = r'<a [^>]*href=["\'](https?://[^"\'\s>]+)["\'][^>]*>([^<]*)</a>'


def anchor_terms(
    df: DataFrame,
    html_col: str = "html",
    top_k: int = 5,
) -> DataFrame:
    """Top anchor-text terms per TARGET domain — the classic off-page
    relevance signal (what the web calls a page is better evidence than
    what the page calls itself; anchor aggregation powered early web
    ranking and still feeds crawl prioritization and query-independent
    quality scores).

    Shape: the corpus pass is a single codegen map stage — two
    ``regexp_extract_all`` over the html (hrefs and anchor texts come out
    index-aligned, ``arrays_zip`` pairs them), one explode per link, one
    explode per term. The only shuffle is the (domain, term) count, whose
    key space is bounded by vocabulary x domains actually LINKED — orders
    of magnitude under the corpus — with map-side partials. The top-k
    ranking windows over the counted table, not the corpus; Spark pushes
    the rank filter under the exchange (WindowGroupLimit).

    Output: (dst_domain, term, n, rank), rank 1..top_k per domain, ties
    broken on term for engine-independent ordering. Counts are exact
    integers — no float surface.

    Reference analog: none (pure web-corpus op); SURVEY §2.4 suite.
    """
    from pyspark.sql import Window as W

    html = F.col(html_col).cast("string")
    pairs = F.arrays_zip(
        F.regexp_extract_all(html, F.lit(ANCHOR_PATTERN), F.lit(1)).alias("u"),
        F.regexp_extract_all(html, F.lit(ANCHOR_PATTERN), F.lit(2)).alias("a"),
    )
    links = df.select(F.explode(pairs).alias("p")).select(
        F.lower(F.parse_url(F.col("p.u"), F.lit("HOST"))).alias("dst_domain"),
        F.col("p.a").alias("anchor"),
    )
    terms = links.select(
        "dst_domain",
        F.explode(F.split(F.lower(F.col("anchor")), " ")).alias("term"),
    ).where(F.col("term") != "")
    counted = terms.groupBy("dst_domain", "term").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = W.partitionBy("dst_domain").orderBy(F.col("n").desc(), "term")
    return (
        counted.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
    )


def hits(
    edges: DataFrame,
    iterations: int = 3,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Kleinberg HITS hubs/authorities over the domain graph, EXACT.

    Runs the power iteration UNNORMALIZED from hub_0 = 1: per-round
    normalization in HITS only divides by scalars, so the k-round
    normalized vector equals the unnormalized one up to a single final
    scalar — rankings identical, and the unnormalized scores stay exact
    BIGINTs (auth_1 is just in-degree; magnitudes grow like degree^k, so
    3 rounds over a domain graph are nowhere near long overflow). Zero
    float surface — bit-identical on any engine, no rounding discipline
    needed (contrast pagerank's round-6 damping arithmetic).

    auth_k(d) = sum of hub_{k-1}(s) over in-edges (s,d);
    hub_k(s)  = sum of auth_k(d)    over out-edges (s,d).

    Scale shape: every join/groupBy is keyed on the SMALL domain graph
    (the corpus pass already happened in extract_links); lineage is cut
    per round with localCheckpoint like pagerank. Nodes with no in-edges
    (resp. out-edges) keep auth 0 (resp. hub 0) via the final left join.

    Output: (node, auth, hub) as exact longs.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select("dst"))
        .distinct()
    )
    hub = nodes.select("node", F.lit(1).cast("long").alias("h"))
    auth = None
    for _ in range(iterations):
        auth = (
            e.join(hub.withColumnRenamed("node", "src"), "src")
            .groupBy("dst")
            .agg(F.sum("h").alias("a"))
            .withColumnRenamed("dst", "node")
            .localCheckpoint(eager=False)
        )
        hub = (
            e.join(auth.withColumnRenamed("node", "dst"), "dst")
            .groupBy("src")
            .agg(F.sum("a").alias("h"))
            .withColumnRenamed("src", "node")
            .localCheckpoint(eager=False)
        )
    return (
        nodes.join(auth, "node", "left")
        .join(hub, "node", "left")
        .select(
            "node",
            F.coalesce("a", F.lit(0)).alias("auth"),
            F.coalesce("h", F.lit(0)).alias("hub"),
        )
    )


def label_propagation(
    edges: DataFrame,
    rounds: int = 3,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Synchronous label-propagation community detection (Raghavan et
    al. 2007) over the UNDIRECTED simple graph — the cheap community
    signal beside connected components: components find reachability,
    LPA finds densely-linked clusters (site networks, mutual-citation
    cliques) inside one component. Used in web pipelines to group
    domains into site families for per-family caps and dedup scoping.

    DETERMINISTIC variant: every node starts labeled with itself; each
    synchronous round relabels every node with its neighbors' most
    frequent label, ties broken by MINIMUM label. No randomized update
    order (the classic async LPA is run-order-dependent — useless for a
    cross-engine gate); fixed ``rounds``, so the result is a pure
    function of the edge set.

    Scale shape: per round, one join of the bidirectional neighbor list
    against the label table (both |E| / |V| sized — the corpus never
    appears) and one two-level aggregate: count per (node, label), then
    min_by over a (−count, label) struct picks the winner without a
    window sort. Lineage cut per round like ``pagerank``.

    Returns (node, label) after ``rounds`` rounds; label is the
    community representative. Exact strings/longs — no float surface.
    """
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    nbr = (
        und.select(F.col("a").alias("node"), F.col("b").alias("nbr"))
        .unionAll(und.select(F.col("b").alias("node"), F.col("a").alias("nbr")))
        .localCheckpoint(eager=True)
    )
    labels = nbr.select("node").distinct().withColumn("label", F.col("node"))
    for _ in range(rounds):
        counted = (
            nbr.join(
                labels.select(
                    F.col("node").alias("nbr"), F.col("label").alias("nlbl")
                ),
                "nbr",
            )
            .groupBy("node", "nlbl")
            .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        )
        labels = (
            counted.groupBy("node")
            .agg(
                F.expr(
                    "min_by(nlbl, struct(-cnt, nlbl))"
                ).alias("label")
            )
            .localCheckpoint(eager=True)
        )
    return labels


def core_numbers(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 100,
) -> DataFrame:
    """Exact k-core numbers per node over the undirected simple graph —
    coreness is the robust density signal beside degree (a node of
    degree 1000 hanging off a star has core 1; a member of a dense
    link-farm has high core regardless of its own degree), the standard
    graph feature for spam detection and crawl prioritization.

    Distributed algorithm: the H-OPERATOR fixed point (Lu, Zhou, Zhang,
    Stanley — Nat. Commun. 2016): start every node at its degree and
    iterate c(v) <- H({c(u): u ~ v}), the h-index of the neighbor
    values; the sequence is non-increasing and converges exactly to the
    core number. The h-index is relational: sort each node's neighbor
    values descending, h = max(min(rank, value)) — one join of the
    neighbor list against the label table + one per-node window, all on
    the SMALL graph (the corpus pass happened in extract_links).
    Exact integers throughout; the round loop stops at the fixed point
    (one driver-side change count per round, same convergence discipline
    as ops/components.py).

    Returns (node, core) as exact longs.
    """
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    nbr = (
        und.select(F.col("a").alias("node"), F.col("b").alias("nbr"))
        .unionAll(und.select(F.col("b").alias("node"), F.col("a").alias("nbr")))
        .localCheckpoint(eager=True)
    )
    from pyspark.sql import Window as W

    cur = (
        nbr.groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("core"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_rounds):
        joined = nbr.join(
            cur.select(F.col("node").alias("nbr"), F.col("core").alias("nval")),
            "nbr",
        )
        w = W.partitionBy("node").orderBy(F.col("nval").desc(), "nbr")
        nxt = (
            joined.withColumn("rank", F.row_number().over(w).cast("long"))
            .groupBy("node")
            .agg(F.max(F.least(F.col("rank"), F.col("nval"))).alias("core"))
            .localCheckpoint(eager=True)
        )
        changed = (
            nxt.join(cur.withColumnRenamed("core", "_old"), "node")
            .filter(F.col("core") != F.col("_old"))
            .count()
        )
        cur = nxt
        if changed == 0:
            break
    return cur


def covisitation(
    df: DataFrame,
    user_col: str,
    item_col: str,
    max_items_per_user: int = 20,
    min_weight: int = 2,
) -> DataFrame:
    """Item-item co-occurrence projection of the (user, item) bipartite
    graph — the collaborative-filtering / related-pages signal: two items
    are linked with weight = number of distinct users who touched both.

    The all-pairs hazard lives in heavy users (a user with d distinct
    items contributes d^2 pairs); the standard bound is the HEAVY-USER
    CUT: users with more than ``max_items_per_user`` distinct items are
    excluded entirely (their co-occurrences are dominated by bots/power
    users and poison the signal anyway — the same role the hot-bucket
    cap plays in minhash_lsh). Per-user pair fan-out is then <= C^2 by
    construction, so the self-join is bounded at any corpus size.

    Plan: distinct (user, item) -> per-user degree (window over the same
    shuffle) -> filtered self-join keyed on user -> pair count with
    map-side partials. Returns (item_a, item_b, weight) with
    item_a < item_b and weight >= min_weight.
    """
    from pyspark.sql import Window as W

    ui = df.select(user_col, item_col).distinct()
    deg = W.partitionBy(user_col)
    kept = (
        ui.withColumn("_d", F.count(F.lit(1)).over(deg))
        .where(F.col("_d") <= max_items_per_user)
        .drop("_d")
    )
    a = kept.select(F.col(user_col).alias("_u"), F.col(item_col).alias("item_a"))
    b = kept.select(F.col(user_col).alias("_u"), F.col(item_col).alias("item_b"))
    return (
        a.join(b, "_u")
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("long").alias("weight"))
        .where(F.col("weight") >= min_weight)
    )


def link_prediction(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    min_common: int = 2,
) -> DataFrame:
    """Common-neighbor link prediction over the undirected domain graph:
    for every NON-adjacent pair sharing >= ``min_common`` neighbors,
    emit the common-neighbor count and neighborhood Jaccard (permille,
    integer floor) — the classic "which hosts will link next" /
    related-site signal (Liben-Nowell & Kleinberg 2003), kept in exact
    integers (the Adamic-Adar 1/log(deg) variant adds a cross-engine
    float log; common-neighbors + Jaccard carry the same ranking signal
    for bounded-degree web graphs).

    Output: src, dst (src < dst), common, deg_src, deg_dst,
    jaccard_permille.

    Scale shape: the wedge join (pairs through a shared neighbor) is the
    standard triangle-counting shape — shuffle keyed on the neighbor;
    hub neighbors fan out quadratically, so production use caps or
    samples hubs exactly like minhash_lsh's hot-bucket gate. Degrees
    join back as one row per node (broadcast-eligible); existing edges
    are removed by one anti-join.
    """
    und = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .where(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
        )
        .distinct()
    )
    adj = und.select("a", "b").union(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    deg = adj.groupBy("a").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    wedges = (
        adj.select(F.col("b").alias("w"), F.col("a").alias("u"))
        .alias("l")
        .join(
            adj.select(F.col("b").alias("w"), F.col("a").alias("v")).alias("r"),
            "w",
        )
        .where(F.col("u") < F.col("v"))
        .groupBy(F.col("u").alias("src"), F.col("v").alias("dst"))
        .agg(F.count(F.lit(1)).cast("long").alias("common"))
        .where(F.col("common") >= int(min_common))
    )
    non_edges = wedges.join(
        und.select(F.col("a").alias("src"), F.col("b").alias("dst")),
        ["src", "dst"],
        "left_anti",
    )
    ds = deg.select(F.col("a").alias("src"), F.col("deg").alias("deg_src"))
    dd = deg.select(F.col("a").alias("dst"), F.col("deg").alias("deg_dst"))
    out = non_edges.join(ds, "src").join(dd, "dst")
    jac = F.expr(
        "(common * 1000) DIV (deg_src + deg_dst - common)"
    )
    return out.select(
        "src",
        "dst",
        "common",
        "deg_src",
        "deg_dst",
        jac.cast("long").alias("jaccard_permille"),
    )


def link_reciprocity(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Per-host link reciprocity — the classic link-farm smell: organic
    sites link asymmetrically (news -> source), while paid link rings
    reciprocate densely, so a host whose out-edges are mostly returned
    is the first candidate for the spam queue (the degree-level
    complement of trustrank's propagation view).

    Exact integers per src host: n_out (distinct out-edges, self-loops
    excluded), n_recip (those whose reverse edge exists), and
    recip_permille = 1000 * n_recip DIV n_out.  One distinct + one
    self-equi-join on the reversed pair + one agg — the join keys on the
    (dst, src) pair, so the shuffle is edge-sized, never host-squared.
    """
    e = (
        edges.select(
            F.col(src_col).alias("a"), F.col(dst_col).alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    rev = e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    flagged = e.join(
        rev.withColumn("_r", F.lit(1)), ["a", "b"], "left"
    )
    return flagged.groupBy(F.col("a").alias("src")).agg(
        F.count(F.lit(1)).cast("long").alias("n_out"),
        F.sum(F.coalesce(F.col("_r"), F.lit(0))).cast("long").alias(
            "n_recip"
        ),
    ).withColumn(
        "recip_permille",
        F.expr("CAST(1000 * n_recip AS BIGINT) DIV n_out"),
    )


def degree_assortativity(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Directed degree assortativity of the link graph — the Pearson
    correlation, over edges, between the source's out-degree and the
    target's in-degree (Newman 2002, the out/in variant).  Healthy web
    graphs are mildly disassortative (hubs link to the long tail);
    r drifting positive is the signature of link farms wiring
    high-degree nodes to each other, so the scalar is a standing
    corpus-health gauge next to reciprocity/trustrank.

    All five Pearson moments are EXACT LONGS over the deduplicated edge
    set (m, sum x, sum y, sum xy, sum x^2, sum y^2 with x = out-degree
    of src, y = in-degree of dst); the correlation is emitted as r_q6 =
    sign * floor(|num / (sqrt(dx) * sqrt(dy))| * 1e6 + 0.5) where num =
    m*Sxy - Sx*Sy and dx/dy are the centered second moments — every
    operand of the float steps is an exact integer, and sqrt/divide are
    correctly-rounded IEEE ops, so the quantized value is engine-
    independent.  Degenerate graphs (constant degree on either side)
    emit r_q6 = 0.

    Scale shape: one distinct on edges, two edge-keyed degree
    aggregations joined back on src / dst (shuffles keyed by host, edge-
    sized), one global 6-long reduce.  The corpus is never touched.
    """
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    dout = e.groupBy("src").agg(F.count(F.lit(1)).alias("_x"))
    din = e.groupBy("dst").agg(F.count(F.lit(1)).alias("_y"))
    ed = e.join(dout, "src").join(din, "dst")
    mom = ed.agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum("_x").cast("long").alias("sx"),
        F.sum("_y").cast("long").alias("sy"),
        F.sum(F.col("_x") * F.col("_y")).cast("long").alias("sxy"),
        F.sum(F.col("_x") * F.col("_x")).cast("long").alias("sxx"),
        F.sum(F.col("_y") * F.col("_y")).cast("long").alias("syy"),
    )
    num = F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy")
    dx = F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")
    dy = F.col("m") * F.col("syy") - F.col("sy") * F.col("sy")
    # sqrt(dx)*sqrt(dy) instead of sqrt(dx*dy): the product can pass 2^63
    # while each factor is exact in double to 2^53
    r = num / (F.sqrt(dx.cast("double")) * F.sqrt(dy.cast("double")))
    r_q6 = F.when(
        (dx > 0) & (dy > 0),
        F.signum(r).cast("long") * F.floor(F.abs(r) * 1e6 + F.lit(0.5)),
    ).otherwise(F.lit(0))
    return mom.select(
        "m", "sx", "sy", "sxy", "sxx", "syy",
        r_q6.cast("long").alias("r_q6"),
    )


def modularity(
    edges: DataFrame,
    labels: DataFrame,
    src: str = "src",
    dst: str = "dst",
    node: str = "node",
    label: str = "label",
) -> DataFrame:
    """Newman modularity Q of a community assignment over the
    UNDIRECTED simple graph — the single number that says whether the
    detected communities are real structure or noise (Q ~ 0: no better
    than random given the degree sequence; Q > ~0.3: strong
    clustering).  Completes the graph-health suite: LPA finds the
    communities, THIS scores them.

        Q = sum_c [ e_c/m - (d_c/(2m))^2 ]
          = sum_c (4*m*e_c - d_c^2) / (4*m^2)

    with e_c intra-community edges, d_c the community degree sum, m
    total undirected edges — so Q is an EXACT integer fraction:
    num = sum_c (4*m*e_c - d_c^2) and den = 4*m^2 are exact longs,
    and q_q6 is a signed half-up integer division.  No float
    anywhere.

    Caller bound: 2e6*|num| < 2^63, i.e. m < ~3e7 edges for the q6
    emission — the per-community exact columns (e_intra, d_sum,
    m_edges) carry the pin beyond that.

    Scale shape: degrees and community sums are edge-sized keyed
    aggregates; the intra-edge count joins the edge list against the
    (|V|-sized) label table twice — both equi-keyed on node; the
    global (m, num) scalars broadcast back onto the per-community
    rows.

    Returns one row per community:
    (label, n_nodes, e_intra, d_sum, m_edges, q_q6) — q_q6 repeated
    globally.
    """
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    lab = labels.select(
        F.col(node).alias("_n"), F.col(label).alias("label")
    )
    deg = (
        und.select(F.col("a").alias("_n"))
        .unionAll(und.select(F.col("b").alias("_n")))
        .groupBy("_n")
        .agg(F.count(F.lit(1)).alias("_d"))
    )
    percom = (
        lab.join(deg, "_n")
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.sum("_d").alias("d_sum"),
        )
    )
    intra = (
        und.join(
            lab.select(F.col("_n").alias("a"), F.col("label").alias("_la")),
            "a",
        )
        .join(
            lab.select(F.col("_n").alias("b"), F.col("label").alias("_lb")),
            "b",
        )
        .filter(F.col("_la") == F.col("_lb"))
        .groupBy(F.col("_la").alias("label"))
        .agg(F.count(F.lit(1)).alias("e_intra"))
    )
    com = percom.join(intra, "label", "left").select(
        "label",
        "n_nodes",
        F.coalesce("e_intra", F.lit(0)).cast("long").alias("e_intra"),
        F.col("d_sum").cast("long").alias("d_sum"),
    )
    m_df = und.agg(F.count(F.lit(1)).cast("long").alias("m_edges"))
    g = (
        com.crossJoin(F.broadcast(m_df))
        .agg(
            F.sum(
                F.lit(4) * F.col("m_edges") * F.col("e_intra")
                - F.col("d_sum") * F.col("d_sum")
            ).alias("num"),
            F.max(
                F.lit(4) * F.col("m_edges") * F.col("m_edges")
            ).alias("den"),
        )
        .select(
            (
                F.when(F.col("num") < 0, F.lit(-1)).otherwise(F.lit(1))
                * F.expr("(2 * 1000000 * abs(num) + den) DIV (2 * den)")
            ).cast("long").alias("q_q6")
        )
    )
    return (
        com.crossJoin(F.broadcast(m_df))
        .crossJoin(F.broadcast(g))
        .select(
            "label", "n_nodes", "e_intra", "d_sum", "m_edges", "q_q6"
        )
    )


def bfs_hops(
    edges: DataFrame,
    seeds: list[str],
    max_hops: int = 15,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Multi-source BFS: (node, hops) = the minimum hop count from any
    seed domain, for every node reachable within ``max_hops``.

    The crawl-scheduler / spam-containment primitive ("how far is this
    host from the trusted core?" — TrustRank's hard-radius cousin) and
    the reachability half of link-graph hygiene audits.

    Frontier algorithm, exact integers end to end: round k joins ONLY
    the hop-(k-1) frontier against the edge list, anti-joins the
    already-settled set, and settles the survivors at hop k. Work per
    round ∝ newly-reached nodes (never the settled set, never the
    corpus); rounds stop at the first empty frontier or ``max_hops``.
    Each round localCheckpoints the (small, node-sized) settled set to
    cut lineage — the same discipline as :func:`pagerank`. The per-round
    ``isEmpty`` driver sync reads one boolean, matching BFS's inherent
    level-synchronous barrier.

    Equivalent ANSI form (the oracle): WITH RECURSIVE walk(node, d)
    UNION-deduped with d < max_hops, then min(d) per node — bitwise
    identical because hop counts are exact longs.
    """
    spark = edges.sparkSession
    e = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
    settled = spark.createDataFrame(
        [(s, 0) for s in sorted(set(seeds))], "node string, hops long"
    ).localCheckpoint(eager=True)
    frontier = settled
    for k in range(1, max_hops + 1):
        nxt = (
            frontier.join(e, frontier["node"] == e["_s"])
            .select(F.col("_d").alias("node"))
            .distinct()
            .join(settled, "node", "left_anti")
            .select("node", F.lit(k).cast("long").alias("hops"))
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        settled = settled.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return settled
