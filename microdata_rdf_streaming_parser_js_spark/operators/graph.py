"""Graph analytics over the constructed KG (nodes/edges DataFrames).

- :func:`connected_components` — alternating large-star / small-star
  (Kiveris et al., "Connected Components in MapReduce and Beyond",
  SoCC'14): each node's component label is the smallest node id
  reachable from it. Unlike plain min-label propagation (O(diameter)
  rounds — web-graph diameters run into the hundreds), the star
  operations contract the graph toward per-component stars in
  O(log n) rounds, each round two groupBy-min shuffles + two joins,
  all JVM-side. ``localCheckpoint`` every few rounds truncates
  lineage; the per-iteration plan contains no Python.
- :func:`degree_stats` — in/out/total degree per node, one shuffle.
- :func:`pagerank` — fixed-iteration PageRank in micro-units
  (integer-exact: every per-edge contribution is floored to a long
  before the sum, so distributed fold order cannot drift the result;
  the DuckDB oracle unrolls the same iterations with ``//``).

These are the "iterative algorithm" representatives: SQL cannot
express the fixpoint directly, but DuckDB's recursive CTE (components)
or unrolled CTE chain (pagerank) can — the driver oracles in
plans/queries.py use exactly that, so even the iterative operators are
value-checked cross-engine.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import Window
from pyspark.sql import functions as F

if TYPE_CHECKING:
    from pyspark.sql import DataFrame


def _large_small_star_round(cur: "DataFrame") -> "DataFrame":
    """One alternation on a (large, small)-oriented edge set:

    - large-star: symmetrize, compute m(u) = min(N(u) ∪ {u}), emit
      (v, m(u)) for every neighbor v > u — strictly larger neighbors
      re-hang onto u's minimum;
    - small-star: on the (still-oriented) output, compute m(u) = min
      of u's smaller neighbors, re-hang those neighbors and u itself
      onto m(u).

    Output stays oriented and distinct. The intermediate large-star
    result is NOT deduped — duplicates are harmless under the min
    aggregates and skipping the extra exchange saves a shuffle per
    round; the final distinct restores set semantics (which the
    fixpoint checksum relies on)."""
    sym = cur.union(cur.select(F.col("b").alias("a"), F.col("a").alias("b")))
    l_min = (
        sym.groupBy("a")
        .agg(F.min("b").alias("mn"))
        .select("a", F.least("a", "mn").alias("m"))
    )
    large = (
        sym.join(l_min, "a")
        .where(F.col("b") > F.col("a"))
        .select(F.col("b").alias("a"), F.col("m").alias("b"))
        .where(F.col("a") != F.col("b"))
    )
    s_min = large.groupBy("a").agg(F.min("b").alias("m"))
    return (
        large.join(s_min, "a")
        .select(F.col("b").alias("a"), F.col("m").alias("b"))
        .union(s_min.select("a", F.col("m").alias("b")))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )


def connected_components(
    nodes: "DataFrame",
    edges: "DataFrame",
    id_col: str = "iri",
    src_col: str = "subj",
    dst_col: str = "obj",
    max_iter: int = 50,
    check_every: int = 2,
) -> "DataFrame":
    """(iri, comp) with comp = min node id in the undirected component.

    Alternating large-star / small-star contraction (see
    :func:`_large_small_star_round`). ``check_every`` rounds execute
    lazily inside ONE job, then the edge set is localCheckpoint-
    materialized (truncating lineage) and a fixpoint checksum runs on
    the cached blocks — exact count plus two independently seeded
    xxhash64 bit-xors — so driver round-trips and persist bookkeeping
    are paid once per check, not once per round. Keep ``check_every``
    at 2: each un-checkpointed round nests union+2 joins+2 aggregates,
    and three-plus nested rounds blow up Catalyst optimization time
    superlinearly (measured 12 s at check_every=2 vs 78-115 s at 3 on
    the diameter-99 5k-node stress graph) — the knob trades job count
    against plan depth, and plan depth loses much sooner. Rounds to fixpoint
    are O(log n) regardless of diameter, so ``max_iter=50`` covers any
    graph that fits on disk; the RuntimeError guard stays because
    returning silently-unconverged labels would split real components.
    (Detection needs one extra stable check, so max_iter must exceed
    the converging round count by at least ``check_every``.)

    Returned labels are localCheckpoint-materialized; no persisted
    frames are handed to (or owed by) the caller — checkpoint blocks
    are released when their frames are garbage collected.
    """
    # orient (large, small), drop self-loops, dedup
    cur = (
        edges.select(F.col(src_col).alias("x"), F.col(dst_col).alias("y"))
        .where(F.col("x") != F.col("y"))
        .select(F.greatest("x", "y").alias("a"), F.least("x", "y").alias("b"))
        .distinct()
        .localCheckpoint()
    )
    # seed universe from nodes UNION edge endpoints: an endpoint
    # missing from `nodes` must still appear (and be eligible as the
    # component minimum)
    all_nodes = (
        nodes.select(F.col(id_col).alias("node"))
        .union(cur.select(F.col("a").alias("node")))
        .union(cur.select(F.col("b").alias("node")))
        .distinct()
    )
    check_every = max(1, check_every)
    prev_sig = None
    converged = False
    done = 0
    while done < max_iter and not converged:
        for _ in range(min(check_every, max_iter - done)):
            cur = _large_small_star_round(cur)
            done += 1
        cur = cur.localCheckpoint()
        # overflow-proof under ANSI mode: two independent 64-bit xors
        # (seeded differently via a literal prefix) + exact count
        sig_row = cur.agg(
            F.count("*").alias("n"),
            F.bit_xor(F.xxhash64("a", "b")).alias("x1"),
            F.bit_xor(F.xxhash64(F.lit("s2"), "a", "b")).alias("x2"),
        ).collect()[0]
        sig = (sig_row["n"], sig_row["x1"], sig_row["x2"])
        converged = sig == prev_sig
        prev_sig = sig
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} "
            "iterations; raise max_iter — unconverged labels would "
            "silently split real components"
        )
    # at fixpoint every non-root points straight at its component
    # minimum; roots and isolated nodes self-label
    stars = cur.groupBy("a").agg(F.min("b").alias("comp"))
    return (
        all_nodes.join(stars.withColumnRenamed("a", "node"), "node", "left")
        .select(
            F.col("node").alias(id_col),
            F.coalesce("comp", F.col("node")).alias("comp"),
        )
        .localCheckpoint()
    )


def pagerank(
    nodes: "DataFrame",
    edges: "DataFrame",
    id_col: str = "iri",
    src_col: str = "subj",
    dst_col: str = "obj",
    iterations: int = 5,
    scale: int = 1_000_000,
    damping_u: int = 850_000,
) -> "DataFrame":
    """(id, rank_u) after ``iterations`` rounds of damped PageRank,
    in integer micro-units (scale = 1e6).

    Determinism contract: rank(0) = scale div N; each round every edge
    u->v contributes ``(rank_u(u) * damping_u) div (outdeg(u) * scale)``
    — floored to a long BEFORE the per-node sum — and
    rank(v) = (scale - damping_u) div N + sum(contribs). Integer sums
    are fold-order-free, so the result is identical on any partitioning
    and reproducible in DuckDB with ``//`` (the driver oracle unrolls
    the same rounds). Dangling-node mass is dropped (not redistributed)
    — documented simplification, mirrored by the oracle. Parallel edges
    contribute once each.

    Scale shape: outdeg and the per-round message join both shuffle on
    src; the contribution sum shuffles on dst — the standard Pregel
    messaging pattern, O(iterations) shuffles total, all JVM-side
    integer exprs. N reaches the plan as a broadcast 1-row frame (no
    driver collect); the static edge||outdeg frame and each round's
    ranks are lazily localCheckpoint'ed so the plan stays shallow and
    the scan work is paid once.
    """
    ids = nodes.select(F.col(id_col).alias("id"))
    n_df = ids.agg(F.count("*").alias("n")).localCheckpoint(eager=False)
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    ew = (
        e.join(e.groupBy("src").agg(F.count("*").alias("outdeg")), "src")
        .localCheckpoint(eager=False)
    )
    teleport_u = F.expr(f"{scale - damping_u} div n")
    ranks = ids.crossJoin(F.broadcast(n_df)).select(
        "id", F.expr(f"{scale} div n").alias("rank_u")
    )
    for _ in range(iterations):
        msgs = (
            ew.join(ranks.withColumnRenamed("id", "src"), "src")
            .select(
                F.col("dst").alias("id"),
                F.expr(f"(rank_u * {damping_u}) div (outdeg * {scale})").alias("c"),
            )
            .groupBy("id")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            ids.join(msgs, "id", "left")
            .crossJoin(F.broadcast(n_df))
            .select(
                "id",
                (teleport_u + F.coalesce(F.col("s"), F.lit(0))).alias("rank_u"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks.select(F.col("id").alias(id_col), "rank_u")


def degree_stats(
    edges: "DataFrame", src_col: str = "subj", dst_col: str = "obj"
) -> "DataFrame":
    """(iri, out_deg, in_deg, total_deg) — one union + one shuffle."""
    out_d = edges.groupBy(F.col(src_col).alias("iri")).agg(
        F.count("*").alias("out_deg")
    )
    in_d = edges.groupBy(F.col(dst_col).alias("iri")).agg(
        F.count("*").alias("in_deg")
    )
    return (
        out_d.join(in_d, "iri", "full_outer")
        .select(
            "iri",
            F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
            F.coalesce("in_deg", F.lit(0)).alias("in_deg"),
        )
        .withColumn("total_deg", F.col("out_deg") + F.col("in_deg"))
    )


def triangle_counts(
    nodes: "DataFrame",
    edges: "DataFrame",
    id_col: str = "iri",
    src_col: str = "subj",
    dst_col: str = "obj",
) -> "DataFrame":
    """(id, n_triangles) — exact per-node triangle counts on the
    undirected simplification of ``edges`` (self-loops dropped,
    direction and multiplicity collapsed).

    Algorithm: degree-ordered orientation (node-iterator++ / the
    "compact-forward" join of Schank & Wagner 2005, the shape every
    distributed triangle counter uses). Each undirected edge is
    oriented from its lower-(degree, id) endpoint to the higher one;
    every triangle then has exactly one source vertex u with u -> v,
    u -> w, v -> w, so it is found once by joining the oriented edge
    list with itself on the wedge vertex and semi-closing with the
    third edge. Orientation bounds the per-vertex out-degree by
    O(sqrt(m)) regardless of hub skew — the property that makes the
    wedge join survive power-law web graphs where a raw neighbor join
    on a 10^7-degree hub would explode quadratically.

    Shuffles: dedup (1), degree agg (1), two orientation joins keyed
    on the edge endpoints, wedge join + closing join (AQE-planned;
    the closing join's build side is the oriented edge list itself).
    No driver-side data; counts stay distributed.
    """
    e = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        e.select(F.col("a").alias("v"))
        .unionAll(e.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("deg"))
    )
    da = deg.select(F.col("v").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("v").alias("b"), F.col("deg").alias("deg_b"))
    lower_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    oe = (
        e.join(da, "a")
        .join(db, "b")
        .select(
            F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("w"),
        )
    )
    o1 = oe.select(F.col("u").alias("t_u"), F.col("w").alias("t_v"))
    o2 = oe.select(F.col("u").alias("t_v"), F.col("w").alias("t_w"))
    o3 = oe.select(F.col("u").alias("t_u"), F.col("w").alias("t_w"))
    wedges = o1.join(o2, "t_v")
    tri = wedges.join(o3, ["t_u", "t_w"])
    verts = (
        tri.select(
            F.explode(F.array("t_u", "t_v", "t_w")).alias(id_col)
        )
        .groupBy(id_col)
        .agg(F.count("*").alias("n_triangles"))
    )
    return nodes.join(verts, id_col, "left").select(
        id_col,
        F.coalesce("n_triangles", F.lit(0)).cast("long").alias("n_triangles"),
    )


def kcore(
    nodes: "DataFrame",
    edges: "DataFrame",
    k: int,
    id_col: str = "iri",
    src_col: str = "subj",
    dst_col: str = "obj",
    max_iter: int = 100,
    check_every: int = 2,
) -> "DataFrame":
    """(id, in_kcore) — membership in the k-core, the maximal subgraph
    where every vertex keeps degree >= k (undirected, self-loops and
    multiplicity collapsed). The spam/link-farm robustness filter for
    web graphs: cores survive pendant-chain inflation, which raw
    degree does not.

    Algorithm: parallel peeling (Matula & Beck 1983) — repeatedly drop
    vertices with current degree < k and the edges touching them until
    stable. Each round is a degree aggregation + two semi-joins; like
    :func:`connected_components`, ``check_every`` rounds run lazily in
    one job, then the edge set is localCheckpoint-materialized and an
    exact checksum (count + two seeded xxhash64 xors) detects the
    fixpoint. Peel rounds equal the graph's degeneracy-peel depth —
    small for web graphs (hubs hold cores together); the guard raises
    rather than returning a half-peeled core.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    cur = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .where(F.col("a") != F.col("b"))
        .select(F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b"))
        .distinct()
        .localCheckpoint()
    )
    check_every = max(1, check_every)
    prev_sig = None
    converged = False
    done = 0
    while done < max_iter and not converged:
        for _ in range(min(check_every, max_iter - done)):
            deg = (
                cur.select(F.col("a").alias("v"))
                .unionAll(cur.select(F.col("b").alias("v")))
                .groupBy("v")
                .agg(F.count("*").alias("deg"))
            )
            keep = deg.where(F.col("deg") >= k).select("v")
            cur = cur.join(
                keep.withColumnRenamed("v", "a"), "a", "left_semi"
            ).join(keep.withColumnRenamed("v", "b"), "b", "left_semi")
            done += 1
        cur = cur.localCheckpoint()
        sig_row = cur.agg(
            F.count("*").alias("n"),
            F.bit_xor(F.xxhash64("a", "b")).alias("x1"),
            F.bit_xor(F.xxhash64(F.lit("s2"), "a", "b")).alias("x2"),
        ).collect()[0]
        sig = (sig_row["n"], sig_row["x1"], sig_row["x2"])
        converged = sig == prev_sig
        prev_sig = sig
    if not converged:
        raise RuntimeError(
            f"kcore did not converge in {max_iter} iterations; raise "
            "max_iter — a half-peeled core over-reports membership"
        )
    members = (
        cur.select(F.col("a").alias(id_col))
        .unionAll(cur.select(F.col("b").alias(id_col)))
        .distinct()
        .withColumn("in_kcore", F.lit(True))
    )
    return nodes.join(members, id_col, "left").select(
        id_col, F.coalesce("in_kcore", F.lit(False)).alias("in_kcore")
    )


def hits(
    nodes: "DataFrame",
    edges: "DataFrame",
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 2,
    scale: int = 1_000_000,
) -> "DataFrame":
    """(id, auth_u, hub_u) after ``iterations`` rounds of HITS
    (Kleinberg 1999) in integer micro-units.

    Determinism contract: hub(0) = scale for every node; each round
    auth_raw(v) = sum of hub(u) over in-edges (long sum,
    fold-order-free), then auth(v) = (auth_raw(v) * scale) div
    max(auth_raw) — max-normalization instead of the usual L2 norm so
    the update stays in exact integer arithmetic a DuckDB oracle can
    unroll with ``//`` — and hub is updated symmetrically from the NEW
    auth scores. Nodes without in-(out-)edges score 0. Overflow bound:
    exact while max_in_degree * scale^2 < 2^63 (in-degree < ~9.2e6 at
    scale 1e6); shrink ``scale`` for hub-ier graphs.

    Scale shape: the classic two-phase Pregel pattern — each round one
    shuffle on dst (auth sum) and one on src (hub sum); the per-round
    max is a 1-row broadcast, never a driver collect. Edges are
    localCheckpoint'ed once; per-round scores are checkpointed so the
    plan depth stays O(1) per round.
    """
    ids = nodes.select(F.col(id_col).alias("id"))
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).localCheckpoint(eager=False)
    hubs = ids.select("id", F.lit(scale).cast("long").alias("hub_u"))
    auths = ids.select("id", F.lit(0).cast("long").alias("auth_u"))
    for _ in range(iterations):
        a_raw = (
            e.join(hubs.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("hub_u").alias("raw"))
        )
        a_max = a_raw.agg(
            F.greatest(F.max("raw"), F.lit(1)).cast("long").alias("mx")
        )
        auths = (
            ids.join(a_raw, "id", "left")
            .crossJoin(F.broadcast(a_max))
            .select(
                "id",
                F.expr(f"(coalesce(raw, 0L) * {scale}) div mx").alias("auth_u"),
            )
            .localCheckpoint(eager=False)
        )
        h_raw = (
            e.join(auths.withColumnRenamed("id", "dst"), "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(F.sum("auth_u").alias("raw"))
        )
        h_max = h_raw.agg(
            F.greatest(F.max("raw"), F.lit(1)).cast("long").alias("mx")
        )
        hubs = (
            ids.join(h_raw, "id", "left")
            .crossJoin(F.broadcast(h_max))
            .select(
                "id",
                F.expr(f"(coalesce(raw, 0L) * {scale}) div mx").alias("hub_u"),
            )
            .localCheckpoint(eager=False)
        )
    return auths.join(hubs, "id").select(
        F.col("id").alias(id_col), "auth_u", "hub_u"
    )


def personalized_pagerank(
    nodes: "DataFrame",
    edges: "DataFrame",
    seeds: "DataFrame",
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 5,
    scale: int = 1_000_000,
    damping_u: int = 850_000,
) -> "DataFrame":
    """(id, rank_u): personalized PageRank — PageRank whose teleport
    mass returns ONLY to the seed set, so rank measures proximity to
    the seeds (the entity-importance / related-pages primitive:
    "rank every page by relevance to these trusted domains").

    Same determinism contract as :func:`pagerank` (per-edge integer
    contributions floored before the fold-order-free sum; the oracle
    unrolls identical rounds with ``//``), with rank(0) = scale div
    n_seeds on seeds / 0 elsewhere, and the per-round teleport
    (scale - damping_u) div n_seeds added on seed rows only. Dangling
    mass is dropped, mirroring pagerank. Same Pregel shape: two
    shuffles per round, seeds arrive as a broadcast-joined flag, no
    driver collect.
    """
    ids = nodes.select(F.col(id_col).alias("id"))
    sd = seeds.select(F.col(id_col).alias("id")).distinct()
    ns_df = sd.agg(F.count("*").alias("ns")).localCheckpoint(eager=False)
    flagged = (
        ids.join(sd.withColumn("_seed", F.lit(1)), "id", "left")
        .select("id", F.coalesce("_seed", F.lit(0)).alias("is_seed"))
        .localCheckpoint(eager=False)
    )
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    ew = (
        e.join(e.groupBy("src").agg(F.count("*").alias("outdeg")), "src")
        .localCheckpoint(eager=False)
    )
    teleport_u = F.expr(f"is_seed * ({scale - damping_u} div ns)")
    ranks = flagged.crossJoin(F.broadcast(ns_df)).select(
        "id", F.expr(f"is_seed * ({scale} div ns)").alias("rank_u")
    )
    for _ in range(iterations):
        msgs = (
            ew.join(ranks.withColumnRenamed("id", "src"), "src")
            .select(
                F.col("dst").alias("id"),
                F.expr(f"(rank_u * {damping_u}) div (outdeg * {scale})").alias("c"),
            )
            .groupBy("id")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            flagged.join(msgs, "id", "left")
            .crossJoin(F.broadcast(ns_df))
            .select(
                "id",
                (teleport_u + F.coalesce(F.col("s"), F.lit(0))).alias("rank_u"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks.select(F.col("id").alias(id_col), F.col("rank_u").cast("long").alias("rank_u"))


def bfs_hops(
    edges: "DataFrame",
    seeds: "DataFrame",
    id_col: str = "id",
    src_col: str = "subj",
    dst_col: str = "obj",
    max_hops: int = 4,
    checkpoint_every: int = 2,
) -> "DataFrame":
    """(id, dist) shortest-hop distance from the nearest seed, bounded
    at ``max_hops`` — multi-source BFS over a directed edge set
    (crawl-frontier reachability, link-distance features). Nodes not
    reached within the bound are absent from the result.

    Shape per hop: frontier-join on ``src_col`` plus a min-combine
    groupBy — two shuffles per hop, both map-side combined, and the
    distance table never exceeds |reachable nodes| rows. The hop count
    is FIXED (not run-to-fixpoint) so the DuckDB oracle can unroll the
    same rounds as CTEs and match exactly; lineage is truncated every
    ``checkpoint_every`` hops, same rationale as connected_components
    (nested union+join+agg plans blow up Catalyst superlinearly).
    """
    if max_hops < 0:
        raise ValueError(f"max_hops must be >= 0, got {max_hops}")
    e = edges.select(F.col(src_col).alias("subj"), F.col(dst_col).alias("obj"))
    dist = seeds.select(
        F.col(id_col).alias("node"), F.lit(0).cast("long").alias("dist")
    ).distinct()
    for i in range(max_hops):
        nxt = (
            dist.join(e, dist["node"] == e["subj"])
            .select(
                F.col("obj").alias("node"),
                (F.col("dist") + F.lit(1)).alias("dist"),
            )
        )
        dist = (
            dist.unionByName(nxt)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
        )
        if (i + 1) % max(1, checkpoint_every) == 0:
            dist = dist.localCheckpoint(eager=False)
    return dist.select(F.col("node").alias(id_col), "dist")


def transitive_closure(
    edges: "DataFrame",
    src_col: str = "subj",
    dst_col: str = "obj",
    max_depth: int = 16,
    reflexive: bool = True,
) -> "DataFrame":
    """All-pairs reachability (src, dst) over a directed edge set,
    bounded at path length ``max_depth`` — the ontology-closure
    operator (rdfs:subClassOf*, skos:broader*, SPARQL `p+`/`p*`
    property paths). ``reflexive=True`` includes the `p*` identity
    pairs; False gives `p+` semantics (depth-1.. paths only).

    Doubling construction: R_0 = I ∪ E, R_{k+1} = R_k ∘ R_k (distinct),
    so ``ceil(log2(max_depth))`` join+distinct rounds cover every path
    up to 2^rounds edges — O(log depth) shuffles instead of O(depth)
    for the naive frontier loop. Intended for SCHEMA-sized relations
    (ontologies, vocabulary hierarchies: thousands of rows that then
    broadcast onto billion-row instance tables), not for the web graph
    itself — all-pairs closure of a large cyclic graph is quadratic
    output by definition; use connected_components / bfs_hops there.

    Reference scope note: microdata-rdf-streaming-parser.js emits
    rdf:type triples from @itemtype (MicrodataRdfParser.ts ~L233) but
    leaves schema inference to downstream consumers; this operator is
    that downstream step re-expressed for Spark.
    """
    if max_depth < 1:
        raise ValueError(f"max_depth must be >= 1, got {max_depth}")
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct()
    ident = (
        e.select(F.col("src").alias("n"))
        .unionByName(e.select(F.col("dst").alias("n")))
        .distinct()
        .select(F.col("n").alias("src"), F.col("n").alias("dst"))
    )
    paths = ident.unionByName(e).distinct()
    rounds = max(1, (max_depth - 1).bit_length())
    for _ in range(rounds):
        hop = (
            paths.alias("a")
            .join(paths.alias("b"), F.col("a.dst") == F.col("b.src"))
            .select(F.col("a.src").alias("src"), F.col("b.dst").alias("dst"))
        )
        paths = paths.unionByName(hop).distinct().localCheckpoint(eager=False)
    if not reflexive:
        # DAG assumption: dropping src == dst removes exactly the
        # injected identity pairs (a cyclic graph would also lose real
        # length>=1 self-paths; ontology hierarchies are acyclic).
        paths = paths.where(F.col("src") != F.col("dst"))
    return paths.select(
        F.col("src").alias(src_col), F.col("dst").alias(dst_col)
    )


def transitive_closure_fixpoint(
    edges: "DataFrame",
    src_col: str = "subj",
    dst_col: str = "obj",
    reflexive: bool = True,
    max_rounds: int = 64,
) -> "DataFrame":
    """All-pairs reachability with NO depth guess: the doubling rounds
    of :func:`transitive_closure` run until the path set stops growing
    — the `rdfs:subClassOf*` / `owl:sameAs*` closure an ontology of
    unknown depth needs (round-3 review item 7).

    Fixpoint detection is exact and cheap: under R ∪ (R ∘ R) the path
    SET is monotone non-decreasing, so a round that leaves ``count()``
    unchanged has added nothing — one count per round, no hashing
    needed (unlike connected_components, whose labels mutate in
    place). Each round squares the coverable path length, so a
    diameter-D relation converges in ceil(log2 D) + 1 rounds;
    ``max_rounds=64`` therefore bounds nothing real (2^64-edge paths)
    and exists only to turn a pathological non-convergence into an
    error instead of an infinite loop. Rounds localCheckpoint so the
    iterative lineage never stacks.

    Same scale contract as the bounded variant: SCHEMA-sized relations
    that then broadcast onto instance tables, not the web graph (see
    transitive_closure's docstring; reference scope note ibid.).
    """
    if max_rounds < 1:
        raise ValueError(f"max_rounds must be >= 1, got {max_rounds}")
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct()
    ident = (
        e.select(F.col("src").alias("n"))
        .unionByName(e.select(F.col("dst").alias("n")))
        .distinct()
        .select(F.col("n").alias("src"), F.col("n").alias("dst"))
    )
    paths = ident.unionByName(e).distinct().localCheckpoint()
    prev_n = paths.count()
    converged = False
    for _ in range(max_rounds):
        hop = (
            paths.alias("a")
            .join(paths.alias("b"), F.col("a.dst") == F.col("b.src"))
            .select(F.col("a.src").alias("src"), F.col("b.dst").alias("dst"))
        )
        paths = paths.unionByName(hop).distinct().localCheckpoint()
        n = paths.count()
        if n == prev_n:
            converged = True
            break
        prev_n = n
    if not converged:
        raise RuntimeError(
            f"transitive_closure_fixpoint: no fixpoint after "
            f"{max_rounds} doubling rounds (path set still growing at "
            f"{prev_n} rows) — the relation is far larger than any "
            "schema-sized closure this operator is for."
        )
    if not reflexive:
        # DAG assumption, as in transitive_closure: dropping src == dst
        # removes exactly the injected identity pairs.
        paths = paths.where(F.col("src") != F.col("dst"))
    return paths.select(
        F.col("src").alias(src_col), F.col("dst").alias(dst_col)
    )


def label_propagation(
    edges: "DataFrame",
    rounds: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
) -> "DataFrame":
    """(node, label): community detection by SYNCHRONOUS label
    propagation (Raghavan et al. 2007) with a deterministic total
    tie-break — the cheap community pass run over web/host graphs
    before per-community processing.

    Every node starts labeled with itself; each round every node
    adopts the most frequent label among its (undirected, deduped)
    neighbors, ties broken label-ascending, isolated nodes keep their
    label. The classic algorithm breaks ties randomly and iterates to
    convergence; fixing the rounds and the tie-break makes the result
    a pure function of the graph — reproducible across reruns AND
    replayable by the DuckDB oracle as unrolled CTEs (the PageRank
    contract).

    Scale shape: 2 map-side-combinable shuffles per round (neighbor-
    label count on dst, argmax window on node), never a collect; the
    round count bounds total work at rounds x O(|E|). Self-loops are
    kept (a node is then its own neighbor) — same rule both engines.
    """
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    fwd = edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
    und = fwd.union(
        fwd.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct()
    labels = (
        und.select(F.col("a").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
    )
    for _ in range(rounds):
        nbr = und.join(
            labels.withColumnRenamed("node", "_n"), F.col("b") == F.col("_n")
        ).select(F.col("a").alias("node"), "label")
        cnt = nbr.groupBy("node", "label").agg(F.count("*").alias("c"))
        w = Window.partitionBy("node").orderBy(
            F.col("c").desc(), F.col("label").asc()
        )
        new = (
            cnt.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") == 1)
            .select("node", F.col("label").alias("_new"))
        )
        labels = labels.join(new, "node", "left").select(
            "node", F.coalesce(F.col("_new"), F.col("label")).alias("label")
        )
    return labels


def random_walks(
    edges: "DataFrame",
    steps: int = 4,
    src_col: str = "src",
    dst_col: str = "dst",
    salt: str = "walk-v1",
) -> "DataFrame":
    """(walk_id, step, node): one deterministic uniform random walk
    per start node — the corpus-generation stage of DeepWalk/node2vec
    KG-embedding training (walks become 'sentences' for a skip-gram
    model).

    Step t from node v picks the neighbor at index
    ``md5(salt:walk_id:t) mod outdeg(v)`` of v's dst-ascending-ranked
    adjacency — an engine-portable draw (no RNG, no engine hash), so
    the whole trajectory is a pure function of (graph, salt) and the
    DuckDB oracle replays it exactly. Walks stop early at sink nodes
    (no out-edges).

    Scale shape: per step, ONE equi-join of the frontier against the
    ranked adjacency on (node, rank) plus a broadcastable outdeg
    lookup; state is one row per live walk. ``steps`` is fixed, so
    total work is steps x O(|walks| + |E| probe) — the standard
    distributed walk-table construction.
    """
    if steps < 1:
        raise ValueError(f"steps must be >= 1, got {steps}")
    fwd = edges.select(
        F.col(src_col).alias("a"), F.col(dst_col).alias("b")
    ).distinct()
    w = Window.partitionBy("a").orderBy("b")
    adj = fwd.select("a", "b", F.row_number().over(w).alias("rk"))
    deg = fwd.groupBy("a").agg(F.count("*").alias("deg"))
    cur = fwd.select(F.col("a").alias("walk_id")).distinct().select(
        "walk_id", F.col("walk_id").alias("node")
    )
    out = cur.select(
        "walk_id", F.lit(0).cast("long").alias("step"), "node"
    )
    for t in range(1, steps + 1):
        h = F.md5(
            F.concat(
                F.lit(f"{salt}:"),
                F.col("walk_id").cast("string"),
                F.lit(f":{t}"),
            )
        )
        picked = (
            cur.join(deg, cur.node == deg.a)
            .select(
                "walk_id",
                "node",
                (
                    F.pmod(
                        F.conv(F.substring(h, 1, 8), 16, 10).cast("long"),
                        F.col("deg"),
                    )
                    + 1
                ).alias("_pick"),
            )
            .join(
                adj,
                (F.col("node") == adj.a) & (F.col("_pick") == adj.rk),
            )
            .select("walk_id", F.col("b").alias("node"))
        )
        out = out.unionByName(
            picked.select(
                "walk_id", F.lit(t).cast("long").alias("step"), "node"
            )
        )
        cur = picked
    return out


def ktruss(
    edges: "DataFrame",
    k: int = 4,
    rounds: int = 2,
    src_col: str = "src",
    dst_col: str = "dst",
) -> "DataFrame":
    """(a, b): the edges surviving ``rounds`` synchronous k-truss peel
    rounds — each round computes per-edge triangle support on the
    CURRENT edge set and removes every edge in fewer than k-2
    triangles (Cohen 2008). The k-truss is the standard
    cohesive-subgraph mining step above k-core: cores bound degree,
    trusses bound triangle embedding, which is what separates genuine
    communities from hub stars in web/host graphs.

    Fixed synchronous rounds (not run-to-fixpoint) keep the operator a
    pure function of (graph, k, rounds) that the DuckDB oracle unrolls
    exactly — the same contract as pagerank/kcore/LPA. Each round is
    the degree-light triangle enumeration: E(u,v) joins E(v,w) on the
    shared middle vertex, a semi-join against E(u,w) closes the wedge,
    and every triangle credits its three edges via one explode +
    groupBy — two shuffles per round on the (a, b) edge key, all
    JVM-side.
    """
    if k < 3:
        raise ValueError(f"k must be >= 3, got {k}")
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    cur = (
        edges.select(F.col(src_col).alias("x"), F.col(dst_col).alias("y"))
        .where(F.col("x") != F.col("y"))
        .select(
            F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b")
        )
        .distinct()
    )
    for _ in range(rounds):
        e1 = cur.select(F.col("a").alias("u"), F.col("b").alias("v"))
        e2 = cur.select(F.col("a").alias("v"), F.col("b").alias("w"))
        e3 = cur.select(F.col("a").alias("u"), F.col("b").alias("w"))
        tri = e1.join(e2, "v").join(e3, ["u", "w"])
        sup = (
            tri.select(
                F.explode(
                    F.array(
                        F.struct(
                            F.col("u").alias("a"), F.col("v").alias("b")
                        ),
                        F.struct(
                            F.col("v").alias("a"), F.col("w").alias("b")
                        ),
                        F.struct(
                            F.col("u").alias("a"), F.col("w").alias("b")
                        ),
                    )
                ).alias("e")
            )
            .select("e.a", "e.b")
            .groupBy("a", "b")
            .agg(F.count("*").alias("_sup"))
        )
        cur = (
            cur.join(sup, ["a", "b"], "left")
            .where(F.coalesce(F.col("_sup"), F.lit(0)) >= k - 2)
            .select("a", "b")
        )
    return cur


def scc_bounded(
    edges: "DataFrame",
    src_col: str = "subj",
    dst_col: str = "obj",
    max_depth: int = 8,
) -> "DataFrame":
    """(node, scc_id): strongly-connected-component labels under a
    BOUNDED mutual-reachability semantic — u and v share an scc_id iff
    each reaches the other along a directed path of <= ``max_depth``
    edges; the label is the smallest node id in the mutual-reach set.
    For any graph whose SCC diameters are <= ``max_depth`` this equals
    textbook SCC (cycle detection in redirect chains, sameAs loops,
    template link rings); larger components split by design, and the
    bound is what lets the DuckDB oracle replay the identical rounds.

    Shape: one doubling closure (:func:`transitive_closure`,
    O(log depth) join+distinct shuffles), one self-join of the closure
    with its reverse to keep mutual pairs, one min-groupBy. The
    closure is the cost driver — like :func:`transitive_closure` this
    is sized for schema/host-level graphs (redirect tables, sameAs
    graphs, vocabulary imports), not the raw page graph; bounded-reach
    output is O(|V| * avg out-reach within 2^rounds hops).

    Reference scope note: microdata-rdf-streaming-parser.js emits the
    triples (MicrodataRdfParser.ts ~L233); cycle/SCC analysis over
    them is the downstream consumer re-expressed for Spark.
    """
    closure = transitive_closure(
        edges, src_col=src_col, dst_col=dst_col,
        max_depth=max_depth, reflexive=True,
    )
    fwd = closure.select(
        F.col(src_col).alias("u"), F.col(dst_col).alias("v")
    )
    rev = fwd.select(F.col("u").alias("rv"), F.col("v").alias("ru"))
    mutual = fwd.join(
        rev, (F.col("u") == F.col("ru")) & (F.col("v") == F.col("rv"))
    ).select("u", "v")
    return (
        mutual.groupBy("v")
        .agg(F.min("u").alias("scc_id"))
        .select(F.col("v").alias("node"), "scc_id")
    )


def link_prediction(
    edges: "DataFrame",
    src_col: str = "src",
    dst_col: str = "dst",
    min_common: int = 2,
    max_wedge_degree: int | None = None,
    max_hub_degree_uncapped: int | None = 10_000,
) -> "DataFrame":
    """(u, w, common, jaccard_u): link-prediction candidates — pairs
    of non-adjacent nodes scored by common-neighbor count and integer
    micro-unit neighborhood Jaccard floor(common * 1e6 / (deg_u +
    deg_w - common)) — the classic unsupervised link predictor
    (Liben-Nowell & Kleinberg 2003) used to propose missing KG edges
    and related-page candidates. Integer scoring keeps the result a
    pure function of the graph (no double fold-order), so DuckDB
    replays it exactly with ``//``.

    Shape: undirected dedup (1 shuffle), degree agg (1), wedge
    self-join keyed on the shared neighbor, pair-count groupBy (1),
    left_anti against the edge set to drop existing links, two keyed
    degree joins. ``min_common`` prunes the wedge tail before the
    degree joins, but the wedge JOIN itself is quadratic in the hub's
    degree — at web scale a 10^6-degree hub alone emits 10^12 wedges
    (the orientation trick of :func:`triangle_counts` does not apply:
    both wedge endpoints are needed regardless of degree order). Set
    ``max_wedge_degree`` for that regime: centers above the cap are
    excluded from wedge generation (the standard hub exclusion — a
    celebrity page "connecting" two others is no evidence of a
    missing link anyway), bounding the join at O(|E| x cap). The cap
    changes ONLY which common neighbors are counted; degrees in the
    Jaccard denominator stay exact. Still a pure function of
    (graph, cap), so the oracle replays it with one extra WHERE.

    The uncapped path (``max_wedge_degree=None``) is GUARDED the same
    way as :func:`..dedup.ngram_jaccard_pairs`: a one-row max-degree
    probe (linear agg — vs the quadratic wedge join it gates) raises
    when any hub exceeds ``max_hub_degree_uncapped``, so the silent
    10^12-wedge regime is unreachable by default. Disable explicitly
    with ``max_hub_degree_uncapped=None`` (test-scale baselines), or
    pass ``max_wedge_degree`` — the production shape.
    """
    if min_common < 1:
        raise ValueError(f"min_common must be >= 1, got {min_common}")
    if max_wedge_degree is not None and max_wedge_degree < 1:
        raise ValueError(
            f"max_wedge_degree must be >= 1, got {max_wedge_degree}"
        )
    fwd = edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
    und = (
        fwd.union(fwd.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = und.groupBy("a").agg(F.count("*").alias("deg"))
    if max_wedge_degree is None and max_hub_degree_uncapped is not None:
        row = deg.agg(F.max("deg").alias("m")).first()
        hub = row["m"] if row is not None else None
        if hub is not None and hub > max_hub_degree_uncapped:
            raise ValueError(
                f"link_prediction: uncapped wedge join over a graph "
                f"whose max degree {hub} exceeds "
                f"{max_hub_degree_uncapped} — the self-join is "
                "quadratic in hub degree (a 10^6-degree hub alone "
                "emits 10^12 wedges). Pass max_wedge_degree (hub "
                "exclusion, the production shape) or explicitly "
                "disable the guard with max_hub_degree_uncapped=None."
            )
    e1 = und.select(F.col("a").alias("z"), F.col("b").alias("u"))
    e2 = und.select(F.col("a").alias("z"), F.col("b").alias("w"))
    if max_wedge_degree is not None:
        allowed = deg.where(F.col("deg") <= F.lit(int(max_wedge_degree)))
        centers = allowed.select(F.col("a").alias("z"))
        e1 = e1.join(centers, "z", "semi")
        e2 = e2.join(centers, "z", "semi")
    wedges = e1.join(e2, "z").where(F.col("u") < F.col("w"))
    cn = (
        wedges.groupBy("u", "w")
        .agg(F.count("*").alias("common"))
        .where(F.col("common") >= F.lit(min_common))
    )
    cand = cn.join(
        und.select(F.col("a").alias("u"), F.col("b").alias("w")),
        ["u", "w"],
        "left_anti",
    )
    du = deg.select(F.col("a").alias("u"), F.col("deg").alias("deg_u"))
    dw = deg.select(F.col("a").alias("w"), F.col("deg").alias("deg_w"))
    return (
        cand.join(du, "u")
        .join(dw, "w")
        .select(
            "u",
            "w",
            F.col("common").cast("long").alias("common"),
            F.floor(
                F.col("common") * F.lit(1_000_000)
                / (F.col("deg_u") + F.col("deg_w") - F.col("common"))
            ).cast("long").alias("jaccard_u"),
        )
    )


def harmonic_centrality(
    edges: "DataFrame",
    seeds: "DataFrame",
    max_hops: int = 6,
    src_col: str = "subj",
    dst_col: str = "obj",
    checkpoint_every: int = 2,
) -> "DataFrame":
    """(node, centrality_u, n_seeds_reached): landmark harmonic
    centrality — for each node, sum over seed landmarks s that reach
    it within ``max_hops`` of floor(1e6 / dist(s, node)) — the
    standard scalable stand-in for exact closeness/harmonic
    centrality (Boldi & Vigna, "Axioms for centrality": harmonic
    handles disconnected graphs where closeness degenerates; landmark
    sampling is how it is run on web-scale graphs, exact all-pairs
    being O(nm)). Integer micro-unit contributions, so the
    distributed fold order cannot drift the sum and DuckDB replays it
    with ``//``.

    Unlike :func:`bfs_hops` (which collapses to the NEAREST seed),
    the distance table here is keyed (seed, node) — all landmarks
    advance in the same two shuffles per hop (frontier join + min
    combine), so cost is hops x O(|E| x seeds-reaching-frontier),
    not a per-seed job storm. State is bounded by
    |seeds| x |reachable|; lineage truncates every
    ``checkpoint_every`` hops as in the other fixpoint loops.
    """
    if max_hops < 1:
        raise ValueError(f"max_hops must be >= 1, got {max_hops}")
    e = edges.select(F.col(src_col).alias("subj"), F.col(dst_col).alias("obj"))
    dist = seeds.select(
        F.col("seed"),
        F.col("seed").alias("node"),
        F.lit(0).cast("long").alias("dist"),
    ).distinct()
    for i in range(max_hops):
        nxt = dist.join(e, dist["node"] == e["subj"]).select(
            "seed",
            F.col("obj").alias("node"),
            (F.col("dist") + F.lit(1)).alias("dist"),
        )
        dist = (
            dist.unionByName(nxt)
            .groupBy("seed", "node")
            .agg(F.min("dist").alias("dist"))
        )
        if (i + 1) % max(1, checkpoint_every) == 0:
            dist = dist.localCheckpoint(eager=False)
    return (
        dist.where(F.col("dist") >= 1)
        .groupBy("node")
        .agg(
            F.sum(F.expr("1000000 div dist")).cast("long").alias(
                "centrality_u"
            ),
            F.count("*").cast("long").alias("n_seeds_reached"),
        )
    )


def walk_skipgrams(
    walks: "DataFrame",
    window: int = 2,
) -> "DataFrame":
    """(center, context, n_pairs): skip-gram co-occurrence counts over
    a walk table from :func:`random_walks` — the final
    corpus-preparation step of DeepWalk/node2vec KG-embedding
    training (walk positions within ``window`` of each other become
    (center, context) training pairs, exactly the word2vec window
    over walk 'sentences'; counts are what an embedding trainer's
    negative-sampling loader consumes).

    Both directions are counted (position before AND after), matching
    word2vec. Shape: one equi-join of the walk table with itself on
    walk_id — safe because a walk is at most steps+1 rows, so the
    per-key blow-up is bounded by the FIXED walk length, never the
    graph — then one map-side-combined pair count. No driver state.
    """
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    a = walks.select(
        "walk_id", F.col("step").alias("_sc"), F.col("node").alias("center")
    )
    b = walks.select(
        "walk_id", F.col("step").alias("_sx"), F.col("node").alias("context")
    )
    d = F.abs(F.col("_sc") - F.col("_sx"))
    return (
        a.join(b, "walk_id")
        .where((d >= 1) & (d <= F.lit(int(window))))
        .groupBy("center", "context")
        .agg(F.count("*").cast("long").alias("n_pairs"))
    )


def modularity(
    edges: "DataFrame",
    labels: "DataFrame",
    src_col: str = "src",
    dst_col: str = "dst",
    node_col: str = "node",
    label_col: str = "label",
) -> "DataFrame":
    """(label, n_nodes, e_in, k_sum, m, q_num): Newman modularity of a
    community assignment, exact-rational by construction — the quality
    score that decides whether a label-propagation / host-clustering
    pass produced real structure or noise.

    Contract (shared verbatim with the oracle): the graph is the
    deduped undirected closure of ``edges`` (both directions,
    distinct); deg(v) = number of undirected partners (a self-loop
    counts once); the edge universe P = canonical pairs (a <= b),
    m = |P|; per community c: e_in = pairs inside c, k_sum = sum of
    member degrees. Global modularity
    Q = sum_c q_num / (4 m^2) with q_num = 4*m*e_in - k_sum^2 —
    returned as INTEGER numerators (q_num can be negative) and the
    shared denominator piece m, so no engine ever divides: consumers
    fold sum(q_num)/(4 m^2) at the precision they need.

    Scale shape: two map-side-combined shuffles (degrees, pair-label
    counts) plus the label lookups — labels join on node (AQE
    broadcasts community tables that fit); m is a 1-row broadcast.
    Overflow-exact while k_sum^2 < 2^63 (community degree sums up to
    ~3e9; split mega-communities first at that point).
    """
    fwd = edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
    und = fwd.union(
        fwd.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct()
    lab = labels.select(
        F.col(node_col).alias("node"), F.col(label_col).alias("lbl")
    )
    deg = und.groupBy(F.col("a").alias("node")).agg(
        F.count("*").cast("long").alias("deg")
    )
    pairs = und.where(F.col("a") <= F.col("b"))
    m_df = pairs.agg(F.count("*").cast("long").alias("m"))
    e_in = (
        pairs.join(lab.withColumnRenamed("node", "a"), "a")
        .withColumnRenamed("lbl", "la")
        .join(
            lab.withColumnRenamed("node", "b").withColumnRenamed("lbl", "lb"),
            "b",
        )
        .where(F.col("la") == F.col("lb"))
        .groupBy(F.col("la").alias("lbl"))
        .agg(F.count("*").cast("long").alias("e_in"))
    )
    per_c = (
        lab.join(deg, "node", "left")
        .groupBy("lbl")
        .agg(
            F.count("*").cast("long").alias("n_nodes"),
            F.sum(F.coalesce("deg", F.lit(0))).cast("long").alias("k_sum"),
        )
        .join(e_in, "lbl", "left")
        .select(
            "lbl",
            "n_nodes",
            F.coalesce("e_in", F.lit(0)).cast("long").alias("e_in"),
            "k_sum",
        )
    )
    return per_c.crossJoin(F.broadcast(m_df)).select(
        F.col("lbl").alias("label"),
        "n_nodes",
        "e_in",
        "k_sum",
        "m",
        (4 * F.col("m") * F.col("e_in") - F.col("k_sum") * F.col("k_sum"))
        .cast("long")
        .alias("q_num"),
    )


def cocitation_pairs(
    edges: "DataFrame",
    src_col: str = "src",
    dst_col: str = "dst",
    direction: str = "in",
    min_common: int = 2,
    max_center_degree: int | None = None,
    max_center_degree_uncapped: int | None = 10_000,
) -> "DataFrame":
    """(u, w, common, dice_u): directed neighborhood-sharing
    similarity over a web/citation graph.

    ``direction='in'`` is co-citation (Small 1973): u and w are
    related because the SAME pages link to both (shared in-neighbors;
    the wedge center is the citing source). ``direction='out'`` is
    bibliographic coupling (Kessler 1963): u and w are related because
    they link to the SAME pages (shared out-neighbors; the center is
    the cited target). The classic related-page / KG-entity-similarity
    pair — and unlike :func:`link_prediction` (undirected, adjacency
    excluded) existing edges stay eligible: two mutually-linked pages
    co-cited by many others are still related.

    Score: integer micro-unit Dice ``floor(2 * common * 1e6 /
    (deg_u + deg_w))`` where deg is the direction-relevant degree
    (in-degree for co-citation, out-degree for coupling) — a pure
    function of the graph, so DuckDB replays it exactly with ``//``.

    Shape: directed distinct (1 shuffle), center-keyed self-join,
    pair-count groupBy (1), two keyed degree joins. The self-join is
    quadratic in the CENTER's fanout (a hub page linking to 10^5
    targets emits 10^10 co-citation wedges on its own), so the same
    two-tier protection as :func:`link_prediction` applies:
    ``max_center_degree`` excludes high-fanout centers from wedge
    generation (a directory page citing everything carries no
    similarity signal anyway; endpoint degrees in the Dice denominator
    stay exact), and the uncapped path is GUARDED by a one-row
    max-fanout probe that raises above ``max_center_degree_uncapped``.
    Disable explicitly with ``max_center_degree_uncapped=None``
    (test-scale baselines) or pass ``max_center_degree`` (the
    production shape).
    """
    if direction not in ("in", "out"):
        raise ValueError(f"direction must be 'in' or 'out', got {direction!r}")
    if min_common < 1:
        raise ValueError(f"min_common must be >= 1, got {min_common}")
    if max_center_degree is not None and max_center_degree < 1:
        raise ValueError(
            f"max_center_degree must be >= 1, got {max_center_degree}"
        )
    if direction == "in":
        zv = edges.select(F.col(src_col).alias("z"), F.col(dst_col).alias("v"))
    else:
        zv = edges.select(F.col(dst_col).alias("z"), F.col(src_col).alias("v"))
    zv = zv.where(F.col("z") != F.col("v")).distinct()
    deg = zv.groupBy("v").agg(F.count("*").alias("deg"))
    fanout = zv.groupBy("z").agg(F.count("*").alias("fan"))
    if max_center_degree is None and max_center_degree_uncapped is not None:
        row = fanout.agg(F.max("fan").alias("m")).first()
        hub = row["m"] if row is not None else None
        if hub is not None and hub > max_center_degree_uncapped:
            raise ValueError(
                f"cocitation_pairs: uncapped center self-join over a "
                f"graph whose max center fanout {hub} exceeds "
                f"{max_center_degree_uncapped} — the wedge join is "
                "quadratic in center fanout. Pass max_center_degree "
                "(hub exclusion, the production shape) or explicitly "
                "disable the guard with max_center_degree_uncapped=None."
            )
    e1 = zv.select("z", F.col("v").alias("u"))
    e2 = zv.select("z", F.col("v").alias("w"))
    if max_center_degree is not None:
        centers = fanout.where(
            F.col("fan") <= F.lit(int(max_center_degree))
        ).select("z")
        e1 = e1.join(centers, "z", "semi")
        e2 = e2.join(centers, "z", "semi")
    cn = (
        e1.join(e2, "z")
        .where(F.col("u") < F.col("w"))
        .groupBy("u", "w")
        .agg(F.count("*").alias("common"))
        .where(F.col("common") >= F.lit(min_common))
    )
    du = deg.select(F.col("v").alias("u"), F.col("deg").alias("deg_u"))
    dw = deg.select(F.col("v").alias("w"), F.col("deg").alias("deg_w"))
    return (
        cn.join(du, "u")
        .join(dw, "w")
        .select(
            "u",
            "w",
            F.col("common").cast("long").alias("common"),
            F.floor(
                2 * F.col("common") * F.lit(1_000_000)
                / (F.col("deg_u") + F.col("deg_w"))
            ).cast("long").alias("dice_u"),
        )
    )


def adamic_adar_pairs(
    edges: "DataFrame",
    min_common: int = 1,
    src_col: str = "subj",
    dst_col: str = "obj",
    max_wedge_degree: int | None = None,
    max_hub_degree_uncapped: int | None = 10_000,
) -> "DataFrame":
    """(u, w, common, aa_u, ra_u): weighted-common-neighbor link
    prediction — Adamic-Adar (2003) down-weights each shared neighbor
    z by 1/log(deg(z)) so promiscuous hubs stop dominating the score,
    and Resource Allocation (Zhou et al. 2009) by 1/deg(z). Both are
    kept integer-exact so DuckDB replays them bit-identically:

    - ``ra_u``  = sum over common z of  1e6 div deg(z)   (exactly
      rational — plain integer division);
    - ``aa_u``  = sum over common z of  1e6 div floor(log2(deg(z))),
      with floor(log2(d)) computed as length(bin(d)) - 1 — an INTEGER
      bit-length, not a float log, so there is no IEEE/libm
      cross-engine divergence. A wedge center has degree >= 2 (it
      touches both endpoints), so the divisor is >= 1.

    Same shape and guards as :func:`link_prediction` (which scores by
    neighborhood Jaccard instead): undirected dedup, degree agg, the
    wedge self-join keyed on the shared neighbor — quadratic in hub
    degree, so the uncapped path carries the same raise-by-default
    max-degree probe and ``max_wedge_degree`` is the production hub
    exclusion. Weights join the CENTER before grouping (one extra
    keyed join vs link_prediction), so the pair-group sums stay
    map-side combinable.
    """
    if min_common < 1:
        raise ValueError(f"min_common must be >= 1, got {min_common}")
    if max_wedge_degree is not None and max_wedge_degree < 1:
        raise ValueError(
            f"max_wedge_degree must be >= 1, got {max_wedge_degree}"
        )
    fwd = edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
    und = (
        fwd.union(fwd.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = und.groupBy("a").agg(F.count("*").alias("deg"))
    if max_wedge_degree is None and max_hub_degree_uncapped is not None:
        row = deg.agg(F.max("deg").alias("m")).first()
        hub = row["m"] if row is not None else None
        if hub is not None and hub > max_hub_degree_uncapped:
            raise ValueError(
                f"adamic_adar_pairs: uncapped wedge join over a graph "
                f"whose max degree {hub} exceeds "
                f"{max_hub_degree_uncapped} — the self-join is "
                "quadratic in hub degree. Pass max_wedge_degree (hub "
                "exclusion, the production shape) or explicitly "
                "disable the guard with max_hub_degree_uncapped=None."
            )
    e1 = und.select(F.col("a").alias("z"), F.col("b").alias("u"))
    e2 = und.select(F.col("a").alias("z"), F.col("b").alias("w"))
    if max_wedge_degree is not None:
        allowed = deg.where(F.col("deg") <= F.lit(int(max_wedge_degree)))
        centers = allowed.select(F.col("a").alias("z"))
        e1 = e1.join(centers, "z", "semi")
        e2 = e2.join(centers, "z", "semi")
    # degree-1 nodes can never center a wedge (one neighbor -> no
    # u<w pair), so drop them BEFORE the weight expression: bin(1)
    # has bit-length 1 and the AA divisor would be log2(1) = 0.
    wts = deg.where(F.col("deg") >= 2).select(
        F.col("a").alias("z"),
        F.expr("1000000 div (length(bin(deg)) - 1)").alias("aa_w"),
        F.expr("1000000 div deg").alias("ra_w"),
    )
    wedges = (
        e1.join(e2, "z").where(F.col("u") < F.col("w")).join(wts, "z")
    )
    cn = (
        wedges.groupBy("u", "w")
        .agg(
            F.count("*").alias("common"),
            F.sum("aa_w").alias("aa_u"),
            F.sum("ra_w").alias("ra_u"),
        )
        .where(F.col("common") >= F.lit(min_common))
    )
    return cn.join(
        und.select(F.col("a").alias("u"), F.col("b").alias("w")),
        ["u", "w"],
        "left_anti",
    ).select(
        "u",
        "w",
        F.col("common").cast("long").alias("common"),
        F.col("aa_u").cast("long").alias("aa_u"),
        F.col("ra_u").cast("long").alias("ra_u"),
    )
