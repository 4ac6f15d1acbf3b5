package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph operators over document-similarity graphs (SURVEY §2 F53).
  *
  * Connected components (F19, Dedup.scala) collapse a similarity graph
  * into dup groups; PageRank ranks WITHIN it — the web-graph authority
  * idea applied to a corpus duplication graph, a real curation signal
  * (documents whose text is re-shared across many distinct documents
  * are hubs of boilerplate or of genuinely canonical content; either
  * way the rank is the right input to a sampling policy, the same role
  * URL-graph PageRank plays in CommonCrawl-derived corpora).
  *
  * Scale design: grams collapse to 64-bit hashes BEFORE anything
  * shuffles; per-gram fan-out is bounded by the document-frequency cap
  * (a gram shared by n docs yields n·(n−1) directed pairs, n ≤ dfCap —
  * corpus-wide boilerplate is excluded by the cap, exactly the winnow
  * df-cap argument); the edge list is built once, re-partitioned by
  * `src` and locally checkpointed, so each of the K iterations shuffles
  * only the (doc_id, pr) rank frame — one row per document — while the
  * edges stay pinned. That is the Pregel message-passing shape on
  * DataFrames: K rounds, each one bounded shuffle of the small side.
  */
object Graph {

  /** F53: PageRank over the shared-gram document graph, in EXACT integer
    * PPM fixed-point so both engines agree bit-for-bit with zero float
    * folding (the dedup_soft convention): every per-edge contribution is
    * floored BEFORE the sum — `(pr·w) div W` — making the aggregate
    * order-independent, and the damping update is
    * `pr' = 150_000 + (850_000 · inflow) div 1_000_000` (d = 0.85 in
    * PPM; floor losses and isolated-node teleport mass are part of the
    * declared recurrence, replayed identically by the oracle).
    *
    * Graph: nodes = all documents; a directed edge u→v (and v→u, by
    * symmetry of the construction) with weight = number of DISTINCT
    * word 8-grams shared by u and v, counting only grams whose corpus
    * document frequency lies in [2, dfCap].
    *
    * Reference analogue: the reference has no graph operator — this is
    * part of the mandated beyond-the-reference training-data surface.
    */
  def pagerank(spark: SparkSession, dir: String, k: Int = 8, dfCap: Int = 32,
               iters: Int = 5): DataFrame =
    pagerankOf(Tables(spark, dir).documents, k, dfCap, iters)

  /** The F53 compute over any (doc_id, text) frame — specs feed synthetic
    * corpora with hand-replayable graph structure through the SAME code
    * path the registered query runs. */
  /** The shared-gram similarity graph every graph operator builds on:
    * (docs, pairs) where `docs` is the checkpointed one-row-per-doc
    * frame and `pairs` the SYMMETRIC directed edge list (src, dst, w),
    * w = number of distinct shared word k-grams with corpus df in
    * [2, dfCap]. Lazy — each consumer pins (checkpoints) the stage it
    * iterates over. Factored from F53 so triangles (F71) and label
    * propagation (F72) measure the SAME graph PageRank ranks.
    *
    * PRECONDITION (r17 ADVICE): exactly ONE row per doc_id — the
    * gramHashes kernel's within-doc distinct stands in for the old
    * global (doc_id, gh) `.distinct()`, which is only sound when no
    * doc_id repeats (see [[graft.operators.TextAnalysis.textNoveltyOf]]). */
  def gramPairs(documents: DataFrame, k: Int, dfCap: Int): (DataFrame, DataFrame) = {
    // one row per doc, checkpointed ONCE: every iteration joins against
    // this frame, and without the pin each round would re-scan (and
    // re-spread) the source parquet
    val docs = documents.select(col("doc_id")).localCheckpoint(true)
    // (1) distinct (doc, gram-hash) incidence — hashes only from here on
    // (8-byte keys through every shuffle). r17: the gramHashes kernel
    // dedups per doc BEFORE the explode (one codegen call, zero gram
    // strings), making the exploded rows the distinct pairs directly —
    // the old explode→xxhash64→.distinct() exchange is redundant
    // (within-doc distinct ⇒ pair-distinct) and dropped.
    val occ = documents
      .select(col("doc_id"),
        explode(graft.functions.TextKernels.gramHashesCol(col("text"), k)).as("gh"))
    // (2) shared grams with bounded fan-out: df in [2, dfCap]. The dup
    // set is small (shared keys only) and broadcasts into the semi join.
    val shared = occ.groupBy(col("gh")).agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs").between(2, dfCap))
    val hits = occ.join(shared.select(col("gh")), Seq("gh"), "left_semi")
    // (3) edge list: self-join on the gram hash (per-key fan-out ≤ dfCap²
    // by construction), collapsed to (src, dst, w).
    val pairs = hits.as("a").join(hits.as("b"),
        col("a.gh") === col("b.gh") && col("a.doc_id") =!= col("b.doc_id"))
      .groupBy(col("a.doc_id").as("src"), col("b.doc_id").as("dst"))
      .agg(count(lit(1)).as("w"))
    (docs, pairs)
  }

  def pagerankOf(documents: DataFrame, k: Int, dfCap: Int, iters: Int): DataFrame = {
    val (docs, pairs) = gramPairs(documents, k, dfCap)
    val outw = pairs.groupBy(col("src")).agg(sum(col("w")).as("out_w"))
    val edges = pairs.join(outw, Seq("src"))
      .repartition(col("src"))
      .localCheckpoint(true)
    // (4) K power-iteration rounds. Integer fixed-point: pr ≤ total
    // corpus mass (n_docs · 1e6), so pr·w and 850_000·inflow stay far
    // inside LONG for any realistic corpus.
    //
    // r18 refutations (both A/B'd isolated at sf0.1, REVERTED):
    // (a) SHUFFLE_HASH hints on the rank-vector side of both per-round
    // joins (to drop the sort-merge sorts) — graph_pagerank 3.11 →
    // 3.89 s: the per-round hash-table builds cost more than the small
    // sorted-run merges they replaced; (b) dropping the pre-checkpoint
    // repartition(src) as "plan-invisible" — 3.11 → 3.40 s: the
    // src-clustered block layout still pays off physically even though
    // the checkpoint scan reports UnknownPartitioning. Sort-merge +
    // clustered checkpoint stay.
    var pr = docs.withColumn("pr", lit(1000000L))
    for (_ <- 1 to iters) {
      val inflow = edges.join(pr, edges("src") === pr("doc_id"))
        .groupBy(col("dst").as("doc_id"))
        .agg(sum(expr("(pr * w) div out_w")).as("infl"))
      // truncate lineage EVERY round — measured against a two-round
      // cadence (8.0 s vs 5.6 s at sf0.1): the deeper tail re-plans two
      // join+agg layers per materialization and loses more than the
      // saved checkpoint costs
      pr = docs.join(inflow, Seq("doc_id"), "left")
        .select(col("doc_id"),
          (lit(150000L) + expr("(850000 * coalesce(infl, 0L)) div 1000000")).as("pr"))
        .localCheckpoint(true)
    }
    // degree report from the CHECKPOINTED edges (edges = pairs ⋈ outw is
    // row-preserving) — deriving it from `pairs` would re-run the whole
    // gram/self-join pipeline a second time
    val deg = edges.groupBy(col("src").as("doc_id"))
      .agg(count(lit(1)).as("n_neighbors"), sum(col("w")).as("out_weight"))
    docs.join(deg, Seq("doc_id"), "left")
      .join(pr, Seq("doc_id"))
      .select(col("doc_id"),
        coalesce(col("n_neighbors"), lit(0L)).as("n_neighbors"),
        coalesce(col("out_weight"), lit(0L)).as("out_weight"),
        col("pr").as("pr_ppm"))
      .orderBy(col("doc_id"))
  }

  /** F71: per-document triangle count + clustering coefficient over the
    * shared-gram graph — the local-density signal PageRank (global
    * authority) and connected components (reachability) both miss: a
    * document whose neighbors are also neighbors of EACH OTHER sits in
    * a tight boilerplate clique (template farms, mirrored site
    * families), while a high-degree / low-clustering document is a
    * genuine hub. Clustering coefficient = 2·T·1e6 div (deg·(deg−1)) in
    * exact integer PPM.
    *
    * Scale design — degree-ordered orientation (the compact-forward
    * algorithm): every undirected edge orients from the lower
    * (degree, id) endpoint to the higher, so each triangle is counted
    * exactly once at its minimum-order vertex and the wedge join's
    * per-node fan-out is the ORIENTED out-degree, which is O(√m) for
    * any graph (a hub of degree d contributes d² wedges undirected but
    * only its forward-forward pairs oriented). Both joins are
    * hash-partitioned on doc ids; nothing driver-sized. */
  def triangles(spark: SparkSession, dir: String, k: Int = 8,
      dfCap: Int = 32): DataFrame =
    trianglesOf(Tables(spark, dir).documents, k, dfCap)

  /** The F71 compute over any (doc_id, text) frame — specs feed planted
    * cliques through the SAME path as the registered query. */
  def trianglesOf(documents: DataFrame, k: Int, dfCap: Int): DataFrame = {
    val (docs, pairs) = gramPairs(documents, k, dfCap)
    // undirected edge set, one row per edge, pinned once: the wedge
    // join, the closure join and the degree rollup all reuse it
    val und = pairs.filter(col("src") < col("dst"))
      .select(col("src").as("a"), col("dst").as("b"))
      .localCheckpoint(true)
    val deg = und.select(col("a").as("doc_id"))
      .union(und.select(col("b").as("doc_id")))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("deg"))
    // orientation: u → v iff (deg(u), u) < (deg(v), v) — total order, so
    // exactly one direction per edge survives
    val dmap = deg.withColumnRenamed("doc_id", "n").withColumnRenamed("deg", "d")
    val ord = und
      .join(dmap.as("da"), col("a") === col("da.n"))
      .join(dmap.as("db"), col("b") === col("db.n"))
      .select(
        when(col("da.d") < col("db.d") ||
          (col("da.d") === col("db.d") && col("a") < col("b")),
          struct(col("a").as("u"), col("b").as("v")))
          .otherwise(struct(col("b").as("u"), col("a").as("v"))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
      .localCheckpoint(true)
    // wedges at the min-order vertex: (u→v1, u→v2) with ord(v1)<ord(v2)
    // is (v1 < v2 by the SAME total order); closure checks v1→v2
    val wedges = ord.as("e1").join(ord.as("e2"),
        col("e1.u") === col("e2.u") && col("e1.v") =!= col("e2.v"))
      .join(dmap.as("d1"), col("e1.v") === col("d1.n"))
      .join(dmap.as("d2"), col("e2.v") === col("d2.n"))
      .filter(col("d1.d") < col("d2.d") ||
        (col("d1.d") === col("d2.d") && col("e1.v") < col("e2.v")))
      .select(col("e1.u").as("ta"), col("e1.v").as("tb"), col("e2.v").as("tc"))
    val tris = wedges.join(ord.as("cl"),
        col("tb") === col("cl.u") && col("tc") === col("cl.v"), "left_semi")
    // each triangle credits all three corners
    val perNode = tris
      .select(explode(array(col("ta"), col("tb"), col("tc"))).as("doc_id"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_triangles"))
    docs.join(deg, Seq("doc_id"), "left")
      .join(perNode, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("deg"), lit(0L)).as("degree"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
      .withColumn("clustering_ppm",
        when(col("degree") >= 2L,
          expr("n_triangles * 2000000 div (degree * (degree - 1))"))
          .otherwise(lit(0L)))
      .orderBy(col("doc_id"))
  }

  /** F72: weighted synchronous label propagation over the shared-gram
    * graph — community detection where connected components is too
    * coarse (one shared boilerplate gram fuses two communities; LPA
    * needs a MAJORITY of shared weight to merge them). R synchronous
    * rounds, every node adopting the label with the largest incident
    * weight sum (tie → smallest label, the deterministic convention);
    * isolated nodes keep their own id as label.
    *
    * Scale shape: labels are one row per doc; each round shuffles the
    * (doc, label) frame through one join with the pinned edges and one
    * hash agg — the Pregel shape F53 established, K bounded rounds,
    * lineage truncated per round. */
  def labelProp(spark: SparkSession, dir: String, k: Int = 8,
      dfCap: Int = 32, rounds: Int = 4): DataFrame =
    labelPropOf(Tables(spark, dir).documents, k, dfCap, rounds)

  /** The F72 compute over any (doc_id, text) frame. */
  def labelPropOf(documents: DataFrame, k: Int, dfCap: Int,
      rounds: Int): DataFrame = {
    val (docs, pairs) = gramPairs(documents, k, dfCap)
    val edges = pairs.repartition(col("src")).localCheckpoint(true)
    var labels = docs.withColumn("lbl", col("doc_id"))
    for (_ <- 1 to rounds) {
      val votes = edges.join(labels, edges("dst") === labels("doc_id"))
        .groupBy(edges("src").as("node"), col("lbl"))
        .agg(sum(col("w")).as("vote_w"))
      // argmax as ONE hash aggregate (max of (weight, -label) picks the
      // heaviest label, ties to the smallest) — a window here would add
      // a sort exchange per round (measured 6.8 s → the agg form below)
      val winner = votes.groupBy(col("node"))
        .agg(max_by(col("lbl"), struct(col("vote_w"), (-col("lbl")).as("neg")))
          .as("new_lbl"))
        .select(col("node").as("doc_id"), col("new_lbl"))
      labels = labels.join(winner, Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("new_lbl"), col("lbl")).as("lbl"))
        .localCheckpoint(true)
    }
    val sizes = labels.groupBy(col("lbl")).agg(count(lit(1)).as("community_size"))
    labels.join(sizes, Seq("lbl"))
      .select(col("doc_id"), col("lbl").as("label"), col("community_size"))
      .orderBy(col("doc_id"))
  }

  /** F81: k-core decomposition over the shared-gram graph — synchronous
    * bounded-round peeling: every round simultaneously removes ALL
    * surviving nodes whose degree among survivors is < coreK, until a
    * fixpoint (or the declared round cap — extra oracle rounds past the
    * fixpoint are no-ops, so early convergence and the cap replay
    * identically). The core is the classic density signal on a
    * duplication graph: a document inside a dense k-core sits in a
    * tightly inter-duplicated cluster (template farms, mirrored
    * boilerplate) — exactly the region a curation policy samples DOWN —
    * while peel round is a coreness proxy (late removal = deeper
    * embedding in the dense region).
    *
    * Output per document: initial degree, the round it was peeled
    * (0 = survived) and the core membership flag; isolated documents
    * peel in round 1 by construction.
    *
    * Scale shape: edges build once (df-capped fan-out, the F53
    * argument) and then only SHRINK — each round is one hash agg over
    * the live edges plus three anti joins against the round's (small)
    * drop set, all frames checkpointed per round so lineage stays flat;
    * the per-round driver decision is one count() of the drop set
    * (bounded by |docs|, nothing row-proportional crosses the driver).
    * Synchronous peeling needs O(diameter) rounds on pathological
    * chain graphs — the cap bounds that, and the cap itself is part of
    * the declared (and oracle-replayed) semantics. */
  def kcore(spark: SparkSession, dir: String, k: Int = 8, dfCap: Int = 32,
      coreK: Int = 3, maxRounds: Int = 12): DataFrame =
    kcoreOf(Tables(spark, dir).documents, k, dfCap, coreK, maxRounds)

  /** The F81 compute over any (doc_id, text) frame. */
  def kcoreOf(documents: DataFrame, k: Int, dfCap: Int, coreK: Int,
      maxRounds: Int): DataFrame = {
    val (docs, pairs) = gramPairs(documents, k, dfCap)
    val edges = pairs.select(col("src"), col("dst"))
      .repartition(col("src")).localCheckpoint(true)
    val deg0 = edges.groupBy(col("src").as("doc_id"))
      .agg(count(lit(1)).as("degree"))
    var alive = docs
    var live = edges
    var removed = docs.limit(0)
      .select(col("doc_id"), lit(0L).as("removed_round"))
    var round = 0
    var changed = true
    while (changed && round < maxRounds) {
      round += 1
      val deg = live.groupBy(col("src").as("doc_id"))
        .agg(count(lit(1)).as("d"))
      val drop = alive.join(deg, Seq("doc_id"), "left")
        .filter(coalesce(col("d"), lit(0L)) < coreK)
        .select(col("doc_id")).localCheckpoint(true)
      if (drop.isEmpty) changed = false
      else {
        removed = removed.unionByName(
          drop.select(col("doc_id"), lit(round.toLong).as("removed_round")))
        alive = alive.join(drop, Seq("doc_id"), "left_anti")
          .localCheckpoint(true)
        live = live
          .join(drop.withColumnRenamed("doc_id", "src"), Seq("src"), "left_anti")
          .join(drop.withColumnRenamed("doc_id", "dst"), Seq("dst"), "left_anti")
          .select(col("src"), col("dst")).localCheckpoint(true)
      }
    }
    docs.join(deg0, Seq("doc_id"), "left")
      .join(removed, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("degree"), lit(0L)).as("degree"),
        coalesce(col("removed_round"), lit(0L)).as("removed_round"),
        col("removed_round").isNull.cast("int").as("in_core"))
      .orderBy(col("doc_id"))
  }

  /** F86: multi-source BFS hop distance over the SYMMETRIZED embedding
    * kNN graph (F63's neighborhoods, both directions) — the
    * PROVENANCE-RADIUS signal the other graph ops don't give: seeds are
    * a certified/trusted example set (the deterministic planted rule
    * `vec_id % 47 == 0` — in production the curated allowlist), and
    * every vector reports its MINIMUM hop count to any seed within
    * `maxHops` rounds, or −1 outside the radius. Hop distance through
    * semantic neighborhoods is the seed-expansion curation primitive:
    * hop 1–2 is near-certified content (trust its labels, sample UP),
    * unreachable is semantically novel-or-orphaned (route to the
    * quality models). PageRank (F53) gives global authority, components
    * (F19) reachability-as-equivalence, LOF (F77) pointwise density;
    * BFS gives GRADED proximity to a CHOSEN set. The shared-gram doc
    * graph is deliberately not the substrate — its edges are rare
    * (dup pairs only), so seed radii would be empty; the kNN graph is
    * connected within every IVF list by construction.
    *
    * Scale shape: the edge list is the already-bounded F63 within-list
    * join (k rows per vector), symmetrized by one union+distinct,
    * repartitioned on src, checkpointed once. Each round expands ONLY
    * the frontier — vectors first reached the previous round — through
    * one hash join with the pinned edges, one distinct, and one anti
    * join against the known-distance frame; all frames ≤ one row per
    * vector, checkpointed per round (flat lineage). K bounded Pregel
    * rounds; an empty frontier makes remaining rounds free no-ops, so
    * the round cap is part of the declared (oracle-replayed)
    * semantics exactly as in F81. */
  def bfs(spark: SparkSession, dir: String, kNbrs: Int = 3,
      maxHops: Int = 4): DataFrame = {
    val knn = Similarity.knnGraph(spark, dir, kNbrs)
      .select(col("vec_id").as("src"), col("nbr_id").as("dst"))
    val edges = knn.unionByName(
      knn.select(col("dst").as("src"), col("src").as("dst"))).distinct()
    val nodes = Similarity.vectors(spark, dir).select(col("vec_id").as("id"))
    val seeds = nodes.filter(col("id") % 47 === 0)
    bfsCore(nodes, edges, seeds, maxHops)
      .select(col("id").as("vec_id"), col("hops"),
        (col("id") % 47 === 0).cast("int").as("is_seed"))
      .orderBy(col("vec_id"))
  }

  /** The F86 frontier-expansion core over any (id) node frame, (src,
    * dst) edge frame and (id) seed frame — specs plant a path graph
    * with a hop count past the cap and an isolated node. Returns
    * (id, hops) with −1 for nodes outside the radius. */
  def bfsCore(nodes: DataFrame, edges0: DataFrame, seeds: DataFrame,
      maxHops: Int): DataFrame = {
    val edges = edges0.select(col("src"), col("dst"))
      .repartition(col("src")).localCheckpoint(true)
    var dist = seeds.select(col("id"), lit(0L).as("hops"))
      .localCheckpoint(true)
    var frontier = dist
    for (r <- 1 to maxHops) {
      val reached = edges
        .join(frontier.select(col("id").as("src")), Seq("src"))
        .select(col("dst").as("id")).distinct()
      frontier = reached.join(dist, Seq("id"), "left_anti")
        .select(col("id"), lit(r.toLong).as("hops"))
        .localCheckpoint(true)
      dist = dist.unionByName(frontier).localCheckpoint(true)
    }
    nodes.join(dist, Seq("id"), "left")
      .select(col("id"), coalesce(col("hops"), lit(-1L)).as("hops"))
  }

  /** F87: neighbor-set JACCARD node similarity over the symmetrized
    * embedding kNN graph (F86's substrate) — STRUCTURAL similarity as a
    * first-class signal, complementary to the embedding cosine that
    * built the graph: two vectors are structurally similar when their
    * NEIGHBORHOODS overlap, even if they are not each other's nearest
    * neighbors (the link-prediction / entity-resolution primitive: a
    * high-Jaccard non-edge is a candidate missing link; a high-Jaccard
    * edge is a redundant near-twin the curation sampler can collapse).
    * Jaccard(u,v) = |N(u)∩N(v)| / |N(u)∪N(v)| with open neighborhoods.
    *
    * Scale shape: candidate pairs come ONLY from wedges — two edges
    * sharing an endpoint (the F71 oriented-wedge join on the
    * checkpointed edge list, fan-out bounded by the kNN degree, itself
    * IVF-list-bounded) — never an all-pairs scan; the union size
    * assembles from broadcast-joined degrees (deg_u + deg_v − shared),
    * one correctly-rounded division per surviving pair, and the
    * direct-edge flag is one more hash join against the same pinned
    * edge list. */
  def jaccard(spark: SparkSession, dir: String, kNbrs: Int = 3,
      simBar: Double = 0.4): DataFrame = {
    val knn = Similarity.knnGraph(spark, dir, kNbrs)
      .select(col("vec_id").as("src"), col("nbr_id").as("dst"))
    val edges = knn.unionByName(
      knn.select(col("dst").as("src"), col("src").as("dst"))).distinct()
    jaccardOf(edges, simBar)
  }

  /** F90: ADAMIC–ADAR link prediction over the kNN graph — F87's
    * neighbor-overlap score with the right weighting: a shared neighbor
    * that is itself a HUB (high degree) is weak evidence two nodes are
    * related (everything meets at a hub), a shared LOW-degree neighbor
    * is strong evidence. AA(u,v) = Σ_{w∈N(u)∩N(v)} 1/ln(deg w) — the
    * classic link-prediction baseline; pairs NOT already adjacent with
    * high AA are the predicted edges (`is_edge` = 0 rows).
    *
    * Determinism contract: each neighbor's weight quantizes ONCE to
    * integer PPM (floor(1e6/ln deg) — deg ≥ 2 for any shared neighbor
    * by construction, so ln > 0); scores are SUMS OF INTEGERS, so
    * accumulation order cannot flip a rounding (the order-independence
    * the raw double sum wouldn't have).
    *
    * Scale shape: the F87 wedge shape — symmetric kNN edges pinned
    * once and repartitioned on src; each shared-neighbor pair comes
    * from ONE self-join at the common w (fan-out bounded by deg(w)² ≤
    * (2k)² on a kNN graph, never corpus²); degree weights join at the
    * wedge center BEFORE the pair agg. Report thresholded at `barPpm`. */
  def adamicAdar(spark: SparkSession, dir: String, kNbrs: Int = 3,
      barPpm: Long = 1500000L): DataFrame = {
    val knn = Similarity.knnGraph(spark, dir, kNbrs)
      .select(col("vec_id").as("src"), col("nbr_id").as("dst"))
    val edges = knn.unionByName(
      knn.select(col("dst").as("src"), col("src").as("dst"))).distinct()
    adamicAdarOf(edges, barPpm)
  }

  /** The F90 compute over any SYMMETRIC (src, dst) edge frame — specs
    * plant hub-vs-leaf wires with closed-form weights. */
  def adamicAdarOf(edges0: DataFrame, barPpm: Long): DataFrame = {
    val edges = edges0.select(col("src"), col("dst"))
      .repartition(col("src")).localCheckpoint(true)
    val deg = edges.groupBy(col("src").as("id"))
      .agg(count(lit(1)).cast("long").as("deg"))
    // a degree-1 node has a single neighbor, so it can never be a wedge
    // center — filtering it here also keeps ln(deg) > 0 for the weight
    val wts = deg.filter(col("deg") >= 2L).select(col("id"),
      floor(lit(1000000.0) / log(col("deg").cast("double"))).cast("long")
        .as("w_ppm"))
    val scored = edges.select(col("src").as("w"), col("dst").as("u"))
      .join(edges.select(col("src").as("w"), col("dst").as("v")), Seq("w"))
      .filter(col("u") < col("v"))
      .join(wts.withColumnRenamed("id", "w"), Seq("w"))
      .groupBy(col("u"), col("v"))
      .agg(count(lit(1)).cast("long").as("n_shared"),
        sum(col("w_ppm")).cast("long").as("aa_ppm"))
      .filter(col("aa_ppm") >= barPpm)
    scored
      .join(edges.select(col("src").as("u"), col("dst").as("v"), lit(1).as("e")),
        Seq("u", "v"), "left")
      .select(col("u").as("vec_a"), col("v").as("vec_b"), col("n_shared"),
        col("aa_ppm"), coalesce(col("e"), lit(0)).as("is_edge"))
      .orderBy(col("vec_a"), col("vec_b"))
  }

  /** The F87 compute over any SYMMETRIC (src, dst) edge frame — specs
    * plant graphs with closed-form overlaps. */
  def jaccardOf(edges0: DataFrame, simBar: Double): DataFrame = {
    val edges = edges0.select(col("src"), col("dst"))
      .repartition(col("src")).localCheckpoint(true)
    val deg = edges.groupBy(col("src").as("id"))
      .agg(count(lit(1)).cast("long").as("deg"))
    val shared = edges.select(col("src").as("w"), col("dst").as("u"))
      .join(edges.select(col("src").as("w"), col("dst").as("v")), Seq("w"))
      .filter(col("u") < col("v"))
      .groupBy(col("u"), col("v"))
      .agg(count(lit(1)).cast("long").as("n_shared"))
    shared
      .join(deg.select(col("id").as("u"), col("deg").as("deg_a")), Seq("u"))
      .join(deg.select(col("id").as("v"), col("deg").as("deg_b")), Seq("v"))
      .withColumn("jaccard", round(col("n_shared").cast("double")
        / (col("deg_a") + col("deg_b") - col("n_shared")), 4))
      .filter(col("jaccard") >= simBar)
      .join(edges.select(col("src").as("u"), col("dst").as("v"), lit(1).as("e")),
        Seq("u", "v"), "left")
      .select(col("u").as("vec_a"), col("v").as("vec_b"), col("n_shared"),
        col("deg_a"), col("deg_b"), col("jaccard"),
        coalesce(col("e"), lit(0)).as("is_edge"))
      .orderBy(col("vec_a"), col("vec_b"))
  }
}
