package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Graph analytics over relationship graphs the relational tables
  * imply. Connected components (the dedup use) lives in [[Dedup]];
  * this is the eigenvector-style side: fixed-iteration PageRank.
  *
  * The reference has no graph surface (its one job is wordcount —
  * SURVEY §2); these are engine-provided extensions in the same
  * deterministic-oracle discipline as the rest of the extension
  * family: per-iteration contributions are rounded then decimal-
  * summed, so the result is identical at any partitioning and the
  * unrolled-CTE oracle hashes it exactly.
  */
object Graph {

  val Damping = 0.85
  val PrIters = 3

  /** Weighted trade graph: supplier-nation → customer-nation edges,
    * weight = number of lineitems flowing between them. The heavy,
    * genuinely-distributed part: a lineitem-scale join chain (orders
    * on the key, both dims broadcast-sized) collapsed by a map-side-
    * partial hash agg to ≤ |nations|² edge rows. */
  private def tradeEdges(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_suppkey"))
      .join(Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(spark, dir)
        .select(col("c_custkey"), col("c_nationkey").as("v"))),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.supplier(spark, dir)
        .select(col("s_suppkey"), col("s_nationkey").as("u"))),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy("u", "v").agg(count(lit(1)).as("w"))

  /** PageRank over the nation trade graph, exactly [[PrIters]] power
    * iterations with damping [[Damping]] from the uniform vector —
    * "which nations sit at the center of the trade flow".
    *
    * Determinism: every contribution pr(u)·frac(u,v) is rounded to 12
    * decimals and summed through a decimal cast (partition-order-free),
    * and each iteration's pr is rounded to 9 — the oracle unrolls the
    * same three iterations and hashes identically. Dangling nations
    * (no outbound edges) leak their mass — the standard simplification,
    * mirrored by the oracle.
    *
    * Scale shape: the edge build is the only input-sized work. The
    * iteration loop joins the edge table to the rank vector — here
    * broadcast-sized; at web scale the same loop shuffle-joins on u
    * and localCheckpoints per iteration (the dedup_groups discipline).
    * The edge table and node list are localCheckpoint'ed so three
    * iterations don't replay the lineitem join chain. */
  def pagerankNations(spark: SparkSession, dir: String): DataFrame = {
    // count-asserted bounds: edges ≤ |nation|² = 625, nodes = 25 at
    // ANY TPC-H scale — the broadcast audit accepts only these tags
    val edges = graft.BoundedCheckpoint(tradeEdges(spark, dir), 1024)
    val outW = edges.groupBy("u").agg(sum("w").as("wout"))
    val e = graft.BoundedCheckpoint(edges.join(outW, "u")
      .select(col("u"), col("v"),
        (col("w").cast("double") / col("wout").cast("double")).as("frac")),
      1024)
    val nodes = graft.BoundedCheckpoint(Tables.nation(spark, dir)
      .select(col("n_nationkey").as("v"), col("n_name")), 64)
    val n = nodes.count() // |nations|: bounded domain, 1-row driver read
    var pr = nodes.select(col("v"), lit(1.0 / n).as("pr"))
    for (_ <- 1 to PrIters) {
      val contrib = e.join(broadcast(pr.withColumnRenamed("v", "u")
          .withColumnRenamed("pr", "pru")), Seq("u"))
        .select(col("v"), round(col("pru") * col("frac"), 12).as("t"))
        .groupBy("v")
        .agg(sum(col("t").cast(DecimalType(28, 14))).cast("double").as("s"))
      pr = nodes.select(col("v")).join(contrib, Seq("v"), "left")
        .select(col("v"),
          round(lit(0.15 / n) +
            lit(Damping) * coalesce(col("s"), lit(0.0)), 9).as("pr"))
    }
    nodes.join(pr, Seq("v"))
      .select(col("n_name"), col("pr").as("pagerank"))
      .orderBy("n_name")
  }

  val LpaIters = 3

  /** Community detection on the undirected nation trade graph by
    * synchronous label propagation — [[LpaIters]] rounds of "adopt the
    * label carrying the most edge weight among my neighbors", the
    * near-linear community heuristic (Raghavan et al. 2007) that
    * complements [[pagerankNations]] (centrality) and the dedup CC
    * fold (reachability): LPA finds DENSITY structure, which
    * reachability cannot (the trade graph is one connected component).
    *
    * Determinism (the classic LPA pitfall, solved the engine way):
    * updates are SYNCHRONOUS (all nodes read round t−1, so no
    * partition-order dependence) and argmax ties break to the
    * smallest label — expressed as max(struct(mass, −label)), a plain
    * hash aggregate. Isolated nodes keep their previous label.
    *
    * Scale shape: the edge build is the only input-sized work (the
    * same lineitem-scale join chain as pagerank, collapsed to
    * ≤ |nations|² rows). Each round is one join of the edge table
    * against the label vector — broadcast here; at web scale the same
    * loop shuffle-joins on the node key with per-round checkpoints
    * (the dedup_groups discipline), still O(|E|) per round with no
    * windows. */
  def lpaCommunities(spark: SparkSession, dir: String): DataFrame = {
    val e0 = tradeEdges(spark, dir).filter(col("u") =!= col("v"))
    val und = e0.select(col("u"), col("v"), col("w"))
      .unionByName(e0.select(col("v").as("u"), col("u").as("v"), col("w")))
      .groupBy("u", "v").agg(sum("w").as("w"))
      .transform(graft.BoundedCheckpoint(_, 1024)) // ≤ |nation|² = 625
    val nodes = graft.BoundedCheckpoint(Tables.nation(spark, dir)
      .select(col("n_nationkey").as("v"), col("n_name")), 64) // = 25
    var lbl = nodes.select(col("v"), col("v").as("lbl"))
    for (_ <- 1 to LpaIters) {
      // two-stage argmax: per (node, label) mass, then max(struct)
      val mass = und
        .join(broadcast(lbl.select(col("v").as("nbr"), col("lbl"))),
          col("v") === col("nbr"))
        .groupBy(col("u"), col("lbl")).agg(sum("w").as("mass"))
      val next = mass
        .groupBy(col("u"))
        .agg(max(struct(col("mass"), (-col("lbl")).as("nl"))).as("m"))
        .select(col("u").as("v"), (-col("m").getField("nl")).as("lbl2"))
      lbl = graft.BoundedCheckpoint(lbl.join(next, Seq("v"), "left")
        .select(col("v"), coalesce(col("lbl2"), col("lbl")).as("lbl")),
        64) // ≤ |nation| = 25 labels per round
    }
    val sizes = lbl.groupBy("lbl").agg(count(lit(1)).as("community_size"))
    nodes.join(lbl, Seq("v")).join(broadcast(sizes), Seq("lbl"))
      .select(col("n_name"), col("lbl").cast("long").as("community"),
        col("community_size"))
      .orderBy("n_name")
  }

  def lpaCommunitiesOracle: String = {
    val base =
      """WITH e0 AS (SELECT s.s_nationkey AS u, c.c_nationkey AS v,
        |    CAST(COUNT(*) AS BIGINT) AS w
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  GROUP BY 1, 2),
        |und AS (SELECT u, v, CAST(SUM(w) AS BIGINT) AS w FROM (
        |    SELECT u, v, w FROM e0 WHERE u <> v
        |    UNION ALL SELECT v, u, w FROM e0 WHERE u <> v) t
        |  GROUP BY 1, 2),
        |l0 AS (SELECT n_nationkey AS v, n_nationkey AS lbl FROM nation)""".stripMargin
    val rounds = (1 to LpaIters).map { i =>
      val p = i - 1
      s"""m$i AS (SELECT und.u, l$p.lbl, CAST(SUM(und.w) AS BIGINT) AS mass
         |  FROM und JOIN l$p ON und.v = l$p.v GROUP BY 1, 2),
         |w$i AS (SELECT u AS v, lbl, row_number()
         |    OVER (PARTITION BY u ORDER BY mass DESC, lbl) AS rk FROM m$i),
         |l$i AS (SELECT l$p.v, COALESCE(w$i.lbl, l$p.lbl) AS lbl
         |  FROM l$p LEFT JOIN w$i ON l$p.v = w$i.v AND w$i.rk = 1)"""
        .stripMargin
    }.mkString(",\n")
    s"""$base,
       |$rounds,
       |sz AS (SELECT lbl, CAST(COUNT(*) AS BIGINT) AS community_size
       |  FROM l$LpaIters GROUP BY 1)
       |SELECT n.n_name, CAST(l.lbl AS BIGINT) AS community,
       |  sz.community_size
       |FROM nation n
       |JOIN l$LpaIters l ON n.n_nationkey = l.v
       |JOIN sz ON l.lbl = sz.lbl
       |ORDER BY n.n_name""".stripMargin
  }

  val HitsIters = 3

  /** HITS hubs & authorities (Kleinberg 1999) over the DIRECTED
    * weighted trade graph — the directionality lens PageRank's single
    * score collapses: a hub nation SHIPS to many authorities
    * (supplier side), an authority nation RECEIVES from many hubs
    * (customer side). Exactly [[HitsIters]] synchronous mutual-
    * reinforcement rounds from the all-ones vector: a ← Σ_{u→v} w·h(u)
    * then h ← Σ_{u→v} w·a(v), each max-normalized (the standard HITS
    * normalization, and max is order-free — no sum-normalization
    * nondeterminism).
    *
    * Determinism: contributions round to 9 before an exact decimal
    * sum (partition-order-free — the [[pagerankNations]] discipline),
    * scores round to 9 after each normalization; the oracle unrolls
    * the identical rounds and hashes bit-for-bit.
    *
    * Scale shape: the edge build is the only input-sized work (the
    * same lineitem-scale chain as pagerank, collapsed to ≤ |nations|²
    * rows and checkpointed once for all rounds). Each round is one
    * join of the edge table against a score vector — broadcast here;
    * at web scale the same loop shuffle-joins on the node key with
    * per-round checkpoints, O(|E|) per round. The max-normalizer runs
    * over the node-sized frame (declared bounded). */
  def hitsNations(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val e = graft.BoundedCheckpoint(
      tradeEdges(spark, dir).filter(col("u") =!= col("v"))
        .select(col("u"), col("v"), col("w").cast("double").as("w")),
      1024) // ≤ |nation|² = 625
    val nodes = graft.BoundedCheckpoint(Tables.nation(spark, dir)
      .select(col("n_nationkey").as("id"), col("n_name")), 64) // = 25
    def pull(scores: DataFrame, scoreCol: String,
             from: String, to: String): DataFrame = {
      val raw = e
        .join(broadcast(scores.withColumnRenamed("id", from)), Seq(from))
        .select(col(to).as("id"),
          round(col("w") * col(scoreCol), 9).as("t"))
        .groupBy("id")
        .agg(sum(col("t").cast(DecimalType(38, 12))).cast("double").as("s"))
      raw.withColumn("mx", max(col("s")).over(graft.BoundedWindow.all))
        .select(col("id"), round(col("s") / col("mx"), 9).as(scoreCol))
    }
    // only h carries an initial state (all-ones); a is derived from h
    // in the first half-step, so it has no independent starting vector
    var h = nodes.select(col("id"), lit(1.0).as("h"))
    var a: DataFrame = null
    for (_ <- 1 to HitsIters) {
      a = pull(h, "h", "u", "v").withColumnRenamed("h", "a")
      h = pull(a, "a", "v", "u").withColumnRenamed("a", "h")
    }
    nodes
      .join(h, Seq("id"), "left")
      .join(a, Seq("id"), "left")
      .select(col("n_name"),
        round(coalesce(col("h"), lit(0.0)), 6).as("hub"),
        round(coalesce(col("a"), lit(0.0)), 6).as("authority"))
      .orderBy("n_name")
  }

  def hitsNationsOracle: String = {
    val rounds = (1 to HitsIters).map { i =>
      val p = i - 1
      s"""ar$i AS (SELECT e0.v AS id,
         |    CAST(SUM(CAST(round(e0.w * h$p.h, 9) AS DECIMAL(38,12)))
         |      AS DOUBLE) AS s
         |  FROM e0 JOIN h$p ON e0.u = h$p.id GROUP BY 1),
         |a$i AS (SELECT id, round(s / (SELECT MAX(s) FROM ar$i), 9) AS a
         |  FROM ar$i),
         |hr$i AS (SELECT e0.u AS id,
         |    CAST(SUM(CAST(round(e0.w * a$i.a, 9) AS DECIMAL(38,12)))
         |      AS DOUBLE) AS s
         |  FROM e0 JOIN a$i ON e0.v = a$i.id GROUP BY 1),
         |h$i AS (SELECT id, round(s / (SELECT MAX(s) FROM hr$i), 9) AS h
         |  FROM hr$i)""".stripMargin
    }.mkString(",\n")
    s"""WITH e0 AS (SELECT u, v, CAST(w AS DOUBLE) AS w FROM (
       |    SELECT s.s_nationkey AS u, c.c_nationkey AS v,
       |      CAST(COUNT(*) AS BIGINT) AS w
       |    FROM lineitem l
       |    JOIN orders o ON l.l_orderkey = o.o_orderkey
       |    JOIN customer c ON o.o_custkey = c.c_custkey
       |    JOIN supplier s ON l.l_suppkey = s.s_suppkey
       |    GROUP BY 1, 2) t WHERE u <> v),
       |h0 AS (SELECT n_nationkey AS id, CAST(1.0 AS DOUBLE) AS h
       |  FROM nation),
       |$rounds
       |SELECT n.n_name,
       |  round(COALESCE(h$HitsIters.h, 0.0), 6) AS hub,
       |  round(COALESCE(a$HitsIters.a, 0.0), 6) AS authority
       |FROM nation n
       |LEFT JOIN h$HitsIters ON n.n_nationkey = h$HitsIters.id
       |LEFT JOIN a$HitsIters ON n.n_nationkey = a$HitsIters.id
       |ORDER BY n.n_name""".stripMargin
  }

  val TrMinFreq = 5
  val TrTopK = 30

  /** TextRank keyword extraction (Mihalcea & Tarau 2004): PageRank
    * over the word CO-OCCURRENCE graph — nodes are corpus tokens with
    * frequency ≥ [[TrMinFreq]] (the vocabulary cut that bounds the
    * graph and drops hapax noise), edges are adjacent-token bigrams
    * weighted by count, symmetrized (co-occurrence is undirected).
    * Keywords = the [[TrTopK]] highest-scoring words after [[PrIters]]
    * damped power iterations — centrality in the co-occurrence graph,
    * the classic unsupervised tagger a curation pipeline runs to label
    * shards.
    *
    * Scale shape: the bigram build is the corpus-sized work — one
    * token-sequence scan exploded to (prev, next) pairs and hash-
    * aggregated to ≤ |V|² edge rows (map-side partials); the frequency
    * cut makes |V| a VOCABULARY, not a corpus, so the rank vector
    * broadcasts (at 100 TB with a huge V the same loop shuffle-joins
    * on the word key — the pagerank note). Same determinism contract
    * as [[pagerankNations]]: contributions rounded 12 + decimal-
    * summed, ranks rounded 9, dangling mass leaks, mirrored by the
    * unrolled oracle; the final top-k is a bounded
    * TakeOrderedAndProject with ties broken by word. */
  def textrankKeywords(spark: SparkSession, dir: String): DataFrame = {
    val ws = Tables.documents(spark, dir)
      .select(TextAnalysis.tokens(col("text")).as("ws"))
    val vf = ws.select(explode(col("ws")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .filter(col("c") >= TrMinFreq).select("w").localCheckpoint()
    val bi = ws.filter(size(col("ws")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(ws) - 1), i -> struct(ws[i-1] AS a, ws[i] AS b))"))
        .as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .filter(col("a") =!= col("b"))
      .join(broadcast(vf.withColumnRenamed("w", "a")), Seq("a"), "left_semi")
      .join(broadcast(vf.withColumnRenamed("w", "b")), Seq("b"), "left_semi")
      .groupBy("a", "b").agg(count(lit(1)).as("w"))
    val und = bi.select(col("a").as("u"), col("b").as("v"), col("w"))
      .unionByName(bi.select(col("b").as("u"), col("a").as("v"), col("w")))
      .groupBy("u", "v").agg(sum("w").as("w")).localCheckpoint()
    val outW = und.groupBy("u").agg(sum("w").cast("double").as("wout"))
    val e = und.join(outW, Seq("u"))
      .select(col("u"), col("v"),
        (col("w").cast("double") / col("wout")).as("frac"))
      .localCheckpoint()
    val n = vf.count() // |vocab ≥ minfreq|: bounded, 1-long driver read
    var pr = vf.select(col("w").as("v"), lit(1.0 / n).as("pr"))
    for (_ <- 1 to PrIters) {
      val contrib = e.join(broadcast(pr.withColumnRenamed("v", "u")
          .withColumnRenamed("pr", "pru")), Seq("u"))
        .select(col("v"), round(col("pru") * col("frac"), 12).as("t"))
        .groupBy("v")
        .agg(sum(col("t").cast(DecimalType(28, 14))).cast("double").as("s"))
      pr = vf.select(col("w").as("v")).join(contrib, Seq("v"), "left")
        .select(col("v"),
          round(lit(0.15 / n) +
            lit(Damping) * coalesce(col("s"), lit(0.0)), 9).as("pr"))
    }
    pr.select(col("v").as("word"), col("pr").as("score"))
      .orderBy(col("score").desc, col("word"))
      .limit(TrTopK)
  }

  def textrankKeywordsOracle: String = {
    def iter(i: Int): String =
      s"""c$i AS (SELECT e.v,
         |  CAST(SUM(CAST(round(p.pr * e.frac, 12) AS DECIMAL(28,14))) AS DOUBLE) AS s
         |  FROM e JOIN p${i - 1} p ON e.u = p.v GROUP BY e.v),
         |p$i AS (SELECT vf.w AS v,
         |  round(CAST(0.15 AS DOUBLE) / nn.n +
         |        CAST(0.85 AS DOUBLE) * COALESCE(c$i.s, CAST(0 AS DOUBLE)), 9) AS pr
         |  FROM vf CROSS JOIN nn LEFT JOIN c$i ON c$i.v = vf.w)"""
        .stripMargin
    s"""WITH tk AS (SELECT ${graft.ext.TextAnalysis.tokensSqlShared} AS ws
       |  FROM documents),
       |vf AS (SELECT g AS w FROM (SELECT unnest(ws) AS g FROM tk) t
       |  GROUP BY 1 HAVING COUNT(*) >= $TrMinFreq),
       |bg AS (SELECT p['a'] AS a, p['b'] AS b FROM (
       |    SELECT unnest(list_transform(range(len(ws) - 1),
       |      i -> {'a': ws[i+1], 'b': ws[i+2]})) AS p
       |    FROM tk) t),
       |e0 AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS w FROM bg
       |  WHERE a <> b AND a IN (SELECT w FROM vf)
       |    AND b IN (SELECT w FROM vf)
       |  GROUP BY 1, 2),
       |und AS (SELECT u, v, CAST(SUM(w) AS BIGINT) AS w FROM (
       |    SELECT a AS u, b AS v, w FROM e0
       |    UNION ALL SELECT b, a, w FROM e0) t GROUP BY 1, 2),
       |ow AS (SELECT u, CAST(SUM(w) AS DOUBLE) AS wout FROM und GROUP BY u),
       |e AS (SELECT und.u, und.v, CAST(und.w AS DOUBLE) / ow.wout AS frac
       |      FROM und JOIN ow USING (u)),
       |nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM vf),
       |p0 AS (SELECT w AS v, CAST(1.0 AS DOUBLE) / nn.n AS pr
       |       FROM vf CROSS JOIN nn),
       |${(1 to PrIters).map(iter).mkString(",\n")}
       |SELECT p.v AS word, p.pr AS score FROM p$PrIters p
       |ORDER BY score DESC, word LIMIT $TrTopK""".stripMargin
  }

  // ── triangle census ──

  /** Triangle count + global clustering coefficient of the undirected
    * nation trade graph. Canonical distributed shape: orient every
    * undirected edge toward its higher-(degree, id) endpoint, then
    * triangles = one wedge equi-join on the low-order vertex plus one
    * closing equi-join on the (middle, high) pair — each triangle
    * counted exactly once, from its minimum-order vertex. Degree
    * ordering (not id order) is the skew guard at scale: wedges form
    * at the LOW-degree end of each edge, so a high-degree hub's
    * out-neighborhood — and with it the wedge join's worst key — is
    * bounded by O(√|E|) instead of the hub's full degree. The count is
    * orientation-invariant, so the id-ordered oracle hashes identical.
    * Clustering = 3·triangles / wedges, wedges = Σ deg·(deg−1)/2 —
    * integers until the final division, rounded to 6. */
  def triangleNations(spark: SparkSession, dir: String): DataFrame = {
    val und = tradeEdges(spark, dir).filter(col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("a"),
        greatest(col("u"), col("v")).as("b"))
      .distinct().localCheckpoint()
    val degrees = und.select(explode(array(col("a"), col("b"))).as("n"))
      .groupBy("n").agg(count(lit(1)).as("deg"))
    val wedges = degrees
      .agg(sum(col("deg") * (col("deg") - 1) / 2).cast("long").as("wedges"),
        count(lit(1)).as("n_nodes"))
    val oriented = orientByDegree(und).localCheckpoint()
    val tri = oriented.as("e1")
      .join(oriented.as("e2"),
        col("e1.s") === col("e2.s") && col("e1.okt") < col("e2.okt"))
      .select(col("e1.t").as("x"), col("e2.t").as("z"))
      .join(oriented.as("e3"), col("x") === col("e3.s") && col("z") === col("e3.t"))
      .agg(count(lit(1)).as("triangles"))
    val edges = und.agg(count(lit(1)).as("n_edges"))
    tri.crossJoin(broadcast(edges)).crossJoin(broadcast(wedges))
      .select(col("n_nodes"), col("n_edges"), col("triangles"),
        round(lit(3.0) * col("triangles") / col("wedges"), 6)
          .as("clustering_coeff"))
  }

  /** Orient a canonical undirected edge frame (columns a < b, deduped)
    * toward the HIGHER-(degree, id) endpoint — the actual skew guard
    * (not id order, which leaves the highest-id hub its full wedge
    * set on a hub-skewed graph): every node's out-degree is bounded
    * by O(√|E|) under degree ordering, so the wedge join key `s`
    * never explodes on a hub. The (deg, id) struct is a total order,
    * so exactly one orientation of every edge exists and each
    * triangle is generated once — from its minimum-order vertex, with
    * the closing edge oriented middle → maximum (compare `okt`).
    * Returns (s, t, okt); GraphSpec's star probe pins the wedge-side
    * boundedness this buys (0 hub wedges vs m·(m−1)/2 id-ordered). */
  private[graft] def orientByDegree(und: DataFrame): DataFrame = {
    val degrees = und.select(explode(array(col("a"), col("b"))).as("n"))
      .groupBy("n").agg(count(lit(1)).as("deg"))
    val ok = degrees.select(col("n"), struct(col("deg"), col("n")).as("ok"))
    und
      .join(ok.select(col("n").as("a"), col("ok").as("oka")), Seq("a"))
      .join(ok.select(col("n").as("b"), col("ok").as("okb")), Seq("b"))
      .select(
        when(col("oka") < col("okb"), col("a")).otherwise(col("b")).as("s"),
        when(col("oka") < col("okb"), col("b")).otherwise(col("a")).as("t"),
        greatest(col("oka"), col("okb")).as("okt"))
  }

  def triangleNationsOracle: String =
    """WITH e0 AS (SELECT DISTINCT s.s_nationkey AS u, c.c_nationkey AS v
      |  FROM lineitem l
      |  JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  WHERE s.s_nationkey <> c.c_nationkey),
      |und AS (SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b FROM e0),
      |deg AS (SELECT n, CAST(COUNT(*) AS BIGINT) AS deg FROM (
      |    SELECT a AS n FROM und UNION ALL SELECT b AS n FROM und) x
      |  GROUP BY n),
      |w AS (SELECT CAST(SUM(deg * (deg - 1) / 2) AS BIGINT) AS wedges,
      |             CAST(COUNT(*) AS BIGINT) AS n_nodes FROM deg),
      |tri AS (SELECT CAST(COUNT(*) AS BIGINT) AS triangles
      |  FROM und e1 JOIN und e2 ON e1.b = e2.a
      |  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
      |ne AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM und)
      |SELECT w.n_nodes, ne.n_edges, tri.triangles,
      |  round(3.0 * tri.triangles / w.wedges, 6) AS clustering_coeff
      |FROM tri, ne, w""".stripMargin

  // ── BFS hop distance ──

  val BfsIters = 4

  /** Single-source BFS over the DIRECTED trade graph: minimum hop
    * count from nation 0 to every nation, exactly [[BfsIters]] rounds
    * of frontier relaxation (dist_{k+1}(v) = min(dist_k(v),
    * min_{u→v} dist_k(u)+1)) — the iterative-join shape every
    * distributed BFS/shortest-path uses. Each round is one equi join of
    * the edge list with the current distance vector plus a min-agg;
    * here both are broadcast-sized, at scale the same loop shuffles on
    * the join key and localCheckpoints per round (the dedup_groups
    * discipline). Unreached nations report hops = -1 (fixture nations
    * all trade, but the query must not silently drop them). */
  def bfsTradeHops(spark: SparkSession, dir: String): DataFrame = {
    val e = graft.BoundedCheckpoint(
      tradeEdges(spark, dir).filter(col("u") =!= col("v")).select("u", "v"),
      1024) // ≤ |nation|² = 625
    val nodes = graft.BoundedCheckpoint(Tables.nation(spark, dir)
      .select(col("n_nationkey").as("v"), col("n_name")), 64) // = 25
    var dist = nodes.select(col("v"),
      when(col("v") === 0, lit(0L)).as("d")) // null = unreached
    for (_ <- 1 to BfsIters) {
      val relaxed = e.join(broadcast(dist.filter(col("d").isNotNull)
          .withColumnRenamed("v", "u").withColumnRenamed("d", "du")), Seq("u"))
        .groupBy("v").agg(min(col("du") + 1).as("via"))
      dist = dist.join(relaxed, Seq("v"), "left")
        .select(col("v"), least(coalesce(col("d"), col("via")),
          coalesce(col("via"), col("d"))).as("d"))
    }
    nodes.join(dist, Seq("v"), "left")
      .select(col("n_name"), coalesce(col("d"), lit(-1L)).as("hops"))
      .orderBy("n_name")
  }

  def bfsTradeHopsOracle: String = {
    def iter(i: Int): String =
      s"""r$i AS (SELECT e.v, MIN(p.d + 1) AS via
         |  FROM e JOIN d${i - 1} p ON e.u = p.v AND p.d IS NOT NULL
         |  GROUP BY e.v),
         |d$i AS (SELECT d.v,
         |  least(COALESCE(d.d, r$i.via), COALESCE(r$i.via, d.d)) AS d
         |  FROM d${i - 1} d LEFT JOIN r$i ON d.v = r$i.v)""".stripMargin
    s"""WITH e AS (SELECT DISTINCT s.s_nationkey AS u, c.c_nationkey AS v
       |  FROM lineitem l
       |  JOIN orders o ON l.l_orderkey = o.o_orderkey
       |  JOIN customer c ON o.o_custkey = c.c_custkey
       |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
       |  WHERE s.s_nationkey <> c.c_nationkey),
       |d0 AS (SELECT n_nationkey AS v,
       |  CASE WHEN n_nationkey = 0 THEN CAST(0 AS BIGINT) END AS d FROM nation),
       |${(1 to BfsIters).map(iter).mkString(",\n")}
       |SELECT n.n_name, COALESCE(d.d, -1) AS hops
       |FROM nation n LEFT JOIN d$BfsIters d ON n.n_nationkey = d.v
       |ORDER BY n.n_name""".stripMargin
  }

  def pagerankNationsOracle: String = {
    // one unrolled iteration: p{i} from p{i-1}
    def iter(i: Int): String =
      s"""c$i AS (SELECT e.v,
         |  CAST(SUM(CAST(round(p.pr * e.frac, 12) AS DECIMAL(28,14))) AS DOUBLE) AS s
         |  FROM e JOIN p${i - 1} p ON e.u = p.v GROUP BY e.v),
         |p$i AS (SELECT n.n_nationkey AS v,
         |  round(CAST(0.15 AS DOUBLE) / nn.n +
         |        CAST(0.85 AS DOUBLE) * COALESCE(c$i.s, CAST(0 AS DOUBLE)), 9) AS pr
         |  FROM nation n CROSS JOIN nn LEFT JOIN c$i ON c$i.v = n.n_nationkey)"""
        .stripMargin
    s"""WITH e0 AS (SELECT s.s_nationkey AS u, c.c_nationkey AS v,
       |    CAST(COUNT(*) AS BIGINT) AS w
       |  FROM lineitem l
       |  JOIN orders o ON l.l_orderkey = o.o_orderkey
       |  JOIN customer c ON o.o_custkey = c.c_custkey
       |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
       |  GROUP BY 1, 2),
       |ow AS (SELECT u, CAST(SUM(w) AS DOUBLE) AS wout FROM e0 GROUP BY u),
       |e AS (SELECT e0.u, e0.v, CAST(e0.w AS DOUBLE) / ow.wout AS frac
       |      FROM e0 JOIN ow USING (u)),
       |nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nation),
       |p0 AS (SELECT n_nationkey AS v, CAST(1.0 AS DOUBLE) / nn.n AS pr
       |       FROM nation CROSS JOIN nn),
       |${(1 to PrIters).map(iter).mkString(",\n")}
       |SELECT n.n_name, p.pr AS pagerank
       |FROM nation n JOIN p$PrIters p ON p.v = n.n_nationkey
       |ORDER BY n.n_name""".stripMargin
  }
}
