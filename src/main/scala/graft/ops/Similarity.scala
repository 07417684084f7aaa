package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.cosine_sim

/** Similarity search over embedding columns (array<float>).
  *
  * Two paths:
  *  - brute-force exact top-k (baseline): query-set × corpus join with
  *    the codegen'd cosine expression, ranked per query.  The corpus
  *    side streams — at 100 TB the query set broadcasts and the scan
  *    stays a single pass, so "exact" is viable whenever |queries| is
  *    small (evaluation, dedup refine).
  *  - LSH-bucketed ANN (scale path): 16-bit random-hyperplane sketch →
  *    multi-probe bucket join → exact cosine refine.  Hyperplanes are
  *    derived from a seeded hash, not Random, so results are stable
  *    across runs/executors.
  */
object Similarity {

  /** Rank candidate rows (query_id, corpus_id, cos) per query —
    * deterministic (higher cos first, smaller corpus_id on ties) — and
    * keep the top k.  The single ranked-top-k device every ANN variant
    * (brute/LSH/IVF/quantized) funnels through.
    */
  def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("cos"), asc("corpus_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("corpus_id"),
        round(col("cos"), 6).as("cos"))
  }

  /** Exact cosine top-k: for each query vector, the k nearest corpus
    * vectors (excluding itself when ids collide).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cvec"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("corpus_id") =!= col("query_id"))
      .select(col("query_id"), col("corpus_id"),
        cosine_sim(col("qvec"), col("cvec")).as("cos"))
    rankTopK(scored, k)
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * xxhash64 → uniform in [-1, 1).  Cheap, seedable, identical on every
    * executor without shipping a matrix.
    */
  private def planeComponent(plane: Int, dim: Column): Column =
    (xxhash64(lit(plane), dim).cast("double") / lit(Long.MaxValue.toDouble))

  /** nBits-bit sign sketch of an embedding under seeded hyperplanes. */
  def hyperplaneSketch(vec: Column, nBits: Int = 16): Column =
    (0 until nBits).map { p =>
      val dot = aggregate(
        zip_with(vec, transform(sequence(lit(0), size(vec) - 1),
          i => planeComponent(p, i)), (x, h) => x.cast("double") * h),
        lit(0.0), (acc, v) => acc + v)
      when(dot >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** ANN via LSH buckets: candidates share the sketch bucket; refine
    * with exact cosine and rank.  Recall is tunable via nBits (fewer
    * bits → bigger buckets → higher recall, more compute).
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nBits: Int = 12, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cvec"),
      hyperplaneSketch(col(vecCol), nBits).as("bucket"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"),
      hyperplaneSketch(col(vecCol), nBits).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("corpus_id") =!= col("query_id"))
      .select(col("query_id"), col("corpus_id"),
        cosine_sim(col("qvec"), col("cvec")).as("cos"))
    rankTopK(scored, k)
  }

  /** IVF (inverted-file) ANN: partition the corpus into cells around
    * deterministic seed centroids, then search only the nProbe cells
    * whose centroids are nearest the query.  Centroid set is tiny →
    * broadcast; the corpus is scanned once to assign cells (at scale
    * you persist the assignment as a bucketed table and amortize it
    * across queries).
    */
  /** Deterministic k-means++-STYLE IVF coarse centroids (round 12 —
    * replaces the id-modulus seed pick, which took arbitrary early-id
    * data points and left cells badly spread):
    *
    *  1. candidate POOL: the `64·nCells` corpus vectors with the
    *     smallest `xxhash64(id)` — a deterministic uniform sample of
    *     the id space, one TakeOrdered scan, no RNG;
    *  2. greedy FARTHEST-POINT init over the pool (the deterministic
    *     analog of k-means++'s D² seeding — Arthur & Vassilvitskii '07,
    *     argmax instead of sampling): seed 1 is the min-hash vector;
    *     each next seed maximizes its squared distance to the nearest
    *     already-chosen seed, ties to the smaller id;
    *  3. Lloyd refinement ON THE POOL (driver arithmetic, fixed
    *     iteration order → deterministic): farthest-point alone picks
    *     OUTLIERS as centers (the k-center criterion), which unbalances
    *     cells; a few mean-update rounds over the pool pull centers
    *     into the mass of their clusters — the same fix k-means++
    *     sampling + Lloyd applies, without RNG.
    *
    * The only collect is the pool (64·nCells vectors — codebook-sized,
    * the [[Pq]] convention); the result is a LocalRelation of exactly
    * ≤nCells rows, so every downstream centroid broadcast is provably
    * bounded in the plan (PlanLintSpec's broadcast lint).  The greedy +
    * Lloyd passes are O(pool·nCells·d·iters) driver arithmetic on
    * 1024-vector pools.
    */
  def ivfCentroids(corpus: DataFrame, nCells: Int = 16,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    val pool: Array[Array[Double]] = corpus
      .select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<double>").as("v"))
      .orderBy(xxhash64(col("id")), col("id"))
      .limit(64 * nCells)
      .collect()
      .map(_.getSeq[Double](1).toArray)
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    val k = math.min(nCells, pool.length)
    var centers = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    if (pool.nonEmpty) {
      // farthest-point init (ties → earlier pool position, i.e. smaller hash)
      centers += pool.head
      val minD2 = pool.map(d2(_, pool.head))
      while (centers.size < k) {
        var best = -1; var bestD = -1.0
        var i = 0
        while (i < pool.length) {
          if (minD2(i) > bestD) { bestD = minD2(i); best = i }
          i += 1
        }
        centers += pool(best)
        i = 0
        while (i < pool.length) {
          val d = d2(pool(i), pool(best))
          if (d < minD2(i)) minD2(i) = d
          i += 1
        }
      }
      // Lloyd over the pool: assignment ties → smaller cell id; an
      // emptied cell keeps its previous center (standard small-k guard)
      for (_ <- 0 until 8) {
        val sums = Array.fill(k)(new Array[Double](pool.head.length))
        val cnts = new Array[Long](k)
        pool.foreach { v =>
          var bc = 0; var bd = d2(v, centers(0))
          var j = 1
          while (j < k) {
            val d = d2(v, centers(j))
            if (d < bd) { bd = d; bc = j }
            j += 1
          }
          cnts(bc) += 1
          var t = 0
          while (t < v.length) { sums(bc)(t) += v(t); t += 1 }
        }
        centers = centers.zipWithIndex.map { case (c, j) =>
          if (cnts(j) == 0) c
          else sums(j).map(_ / cnts(j))
        }
      }
    }
    import spark.implicits._
    centers.toSeq.zipWithIndex
      .map { case (v, i) => (i.toLong, v.map(_.toFloat).toSeq) }
      .toDF("cell_id", "centroid")
      .select(col("cell_id"), col("centroid").cast("array<float>").as("centroid"))
  }

  /** IVF INDEX: every corpus vector assigned to its nearest centroid in
    * ONE corpus pass — broadcast-expand by nCells, then max_by with
    * map-side partial aggregation (the shuffle carries |corpus| rows,
    * not |corpus|×nCells like a window/rank formulation would).
    * At scale this is the persisted artifact: write it bucketed by
    * cell_id once, amortize across every query batch.
    */
  def ivfIndex(corpus: DataFrame, centroids: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cvec"))
      .crossJoin(broadcast(centroids))
      .select(col("corpus_id"), col("cvec"), col("cell_id"),
        cosine_sim(col("cvec"), col("centroid")).as("csim"))
      .groupBy(col("corpus_id"))
      .agg(
        // deterministic argmax: higher csim wins, smaller cell on ties
        max_by(col("cell_id"),
          struct(col("csim").as("s"), (-col("cell_id")).as("nc"))).as("cell_id"),
        // every expanded row carries the same vector for this id
        first(col("cvec")).as("cvec"))
      .select(col("cell_id"), col("corpus_id"), col("cvec"))

  /** IVF SEARCH over a prebuilt (cell_id, corpus_id, cvec) index. */
  def ivfSearch(index: DataFrame, centroids: DataFrame, queries: DataFrame,
      k: Int, nProbe: Int = 4, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    // pick nProbe nearest cells per query
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(desc("qsim"), asc("cell_id"))
    val probes = q.crossJoin(broadcast(centroids))
      .withColumn("qsim", cosine_sim(col("qvec"), col("centroid")))
      .withColumn("r", row_number().over(wProbe))
      .filter(col("r") <= nProbe)
      .select(col("query_id"), col("qvec"), col("cell_id"))
    // search only the probed cells
    rankTopK(index.join(broadcast(probes), Seq("cell_id"))
      .filter(col("corpus_id") =!= col("query_id"))
      .select(col("query_id"), col("corpus_id"),
        cosine_sim(col("qvec"), col("cvec")).as("cos")), k)
  }

  /** One-shot IVF ANN: build centroids + index, then search.  See
    * [[ivfCentroids]]/[[ivfIndex]]/[[ivfSearch]] for the split form a
    * production pipeline persists.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nCells: Int = 16, nProbe: Int = 4, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val centroids = ivfCentroids(corpus, nCells, idCol, vecCol)
    val index = ivfIndex(corpus, centroids, idCol, vecCol)
    ivfSearch(index, centroids, queries, k, nProbe, idCol, vecCol)
  }

  /** Binary-sketch ANN: 64-bit sign sketch ([[graft.functions.sign_pack64]],
    * one codegen pass), banded into four 16-bit words for candidate
    * generation — by pigeonhole, any corpus vector within Hamming
    * radius <= 3 of the query agrees with it on at least one band, so
    * the four equi-joins are a COMPLETE filter for that radius (the
    * multi-index Hamming layout; cf. Norouzi et al., "Fast Search in
    * Hamming Space with Multi-Index Hashing", CVPR'12).  Survivors are
    * cut to `radius` with the popcount kernel and reranked by exact
    * cosine.
    *
    * Scale design: the corpus side carries one 8-byte sketch per
    * vector; candidate generation is an equi-join on (band, 16-bit
    * word) against the broadcast query side — no corpus shuffle, one
    * scan.  At billions of vectors the banded sketch table is the
    * persisted artifact (bucket by band word); radius bounds the
    * refine fan-in regardless of corpus size.
    */
  def hammingTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      radius: Int = 3, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(radius >= 0 && radius <= 3,
      s"4x16-bit bands are complete only for radius <= 3, got $radius")
    import graft.functions.{hamming64, sign_pack64}
    def banded(df: DataFrame, idAs: String, sigAs: String): DataFrame =
      df.select(col(idCol).as(idAs), sign_pack64(col(vecCol)).as(sigAs))
        .select(col(idAs), col(sigAs),
          posexplode(array((0 until 4).map(b =>
            shiftrightunsigned(col(sigAs), 16 * b)
              .bitwiseAND(lit(0xFFFFL))): _*)).as(Seq("__band", "__word")))
    // candidate generation carries only (id, 8-byte sketch) — the
    // popcount cut happens BEFORE the pair dedup, so the dedup shuffle
    // moves 16-byte id pairs, never vectors
    val pairs = banded(corpus, "corpus_id", "csig")
      .join(broadcast(banded(queries, "query_id", "qsig")),
        Seq("__band", "__word"))
      .filter(col("corpus_id") =!= col("query_id"))
      .filter(hamming64(col("qsig"), col("csig")) <= radius)
      .select(col("query_id"), col("corpus_id")).distinct()
    // vectors re-join only for the radius-bounded survivor set (AQE
    // broadcasts the tiny pair table against the corpus scan)
    val scored = pairs
      .join(corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cvec")),
        Seq("corpus_id"))
      .join(broadcast(queries.select(col(idCol).as("query_id"),
        col(vecCol).as("qvec"))), Seq("query_id"))
      .select(col("query_id"), col("corpus_id"),
        cosine_sim(col("qvec"), col("cvec")).as("cos"))
    rankTopK(scored, k)
  }

  /** Embedding near-duplicate pairs: cosine >= threshold, found via
    * sketch-bucket self-join (hamming-0 probe) + exact refine.
    */
  def cosineNearDupPairs(df: DataFrame, threshold: Double,
      nBits: Int = 12, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val s = df.select(col(idCol).as("id"), col(vecCol).as("vec"),
      hyperplaneSketch(col(vecCol), nBits).as("bucket"))
    val l = s.select(col("bucket"), col("id").as("id_a"), col("vec").as("vec_a"))
    val r = s.select(col("bucket"), col("id").as("id_b"), col("vec").as("vec_b"))
    l.join(r, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(cosine_sim(col("vec_a"), col("vec_b")), 6).as("cos"))
      .filter(col("cos") >= threshold)
      .distinct()
  }

  /** Hard-negative mining for contrastive training: for each query
    * vector, the k most-similar corpus vectors with a DIFFERENT label
    * (the negatives a random sample would almost never surface), plus
    * the query's best same-label cosine so the (positive − negative)
    * margin is read off the same row.
    *
    * Scale shape: ONE query×corpus pass computes every cosine; the
    * label split happens after scoring, so negatives ranking and the
    * positive max reuse the same scored frame.  The query set
    * broadcasts (mining runs per training batch / eval slice — small
    * by construction); the corpus streams, and the negatives window is
    * partitioned per query (parallel, k-bounded output).  Ranking ties
    * break on corpus id — deterministic on any cluster.
    */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      labelCol: String = "label"): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"),
      col(vecCol).as("cvec"), col(labelCol).as("clab"))
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).as("qvec"), col(labelCol).as("qlab"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("corpus_id") =!= col("query_id"))
      .select(col("query_id"), col("qlab"), col("corpus_id"), col("clab"),
        cosine_sim(col("qvec"), col("cvec")).as("__cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("__cos"), asc("corpus_id"))
    val negs = scored.filter(col("clab") =!= col("qlab"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("corpus_id"),
        round(col("__cos"), 6).as("neg_cos"))
    val pos = scored.filter(col("clab") === col("qlab"))
      .groupBy(col("query_id"))
      .agg(round(max(col("__cos")), 6).as("pos_cos"))
    negs.join(pos, Seq("query_id"), "left")
      .select(col("query_id"), col("rank"), col("corpus_id"),
        col("neg_cos"), col("pos_cos"),
        round(col("pos_cos") - col("neg_cos"), 6).as("margin"))
  }

  /** Matryoshka truncation fidelity (Kusupati et al. 2022, "Matryoshka
    * Representation Learning"): how faithfully the first `m` dims of
    * an embedding preserve the full-dim neighbor structure — the
    * go/no-go measurement before shrinking a 100 TB vector store.
    *
    * Per query: overlap@k between the exact top-k under full-dim
    * cosine and under first-`m`-dim cosine (both deterministic,
    * corpus-id tiebreak), plus the squared-norm energy the prefix
    * retains.  Two brute passes over the corpus with a broadcast query
    * set — same single-scan contract as [[bruteForceTopK]]; the
    * overlap join is k·|queries| rows.
    *
    * @return one row per query: (query_id, n_overlap ∈ [0,k],
    *         energy_ratio = ‖v[:m]‖²/‖v‖² rounded to 6)
    */
  def truncationOverlap(corpus: DataFrame, queries: DataFrame, k: Int,
      m: Int, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(m >= 1, s"truncation dim must be >= 1, got $m")
    val full = bruteForceTopK(corpus, queries, k, idCol, vecCol)
    def truncated(df: DataFrame): DataFrame =
      df.withColumn(vecCol, slice(col(vecCol), 1, m))
    val trunc = bruteForceTopK(truncated(corpus), truncated(queries),
      k, idCol, vecCol)
    val overlap = full.as("f").join(trunc.as("t"),
        col("f.query_id") === col("t.query_id") &&
          col("f.corpus_id") === col("t.corpus_id"))
      .groupBy(col("f.query_id").as("query_id"))
      .agg(count(lit(1)).as("n_overlap"))
    def sumSq(v: Column): Column =
      aggregate(transform(v, x => x.cast("double")), lit(0.0d),
        (acc, x) => acc + x * x)
    val energy = queries.select(col(idCol).as("query_id"),
      round(sumSq(slice(col(vecCol), 1, m)) / sumSq(col(vecCol)), 6)
        .as("energy_ratio"))
    energy.join(overlap, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        col("energy_ratio"))
  }

  /** Rank-aware truncation fidelity: EXACT average overlap (Webber et
    * al. 2010's AO — the p→1 limit of rank-biased overlap) between the
    * full-dim and prefix-dim exact top-k rankings, per query.  Where
    * [[truncationOverlap]] counts set overlap at depth k only, AO
    * averages the overlap at EVERY depth 1..k, so it penalizes a
    * prefix index that finds the right k neighbors in the wrong order.
    *
    * Exactness device: AO = (1/k)·Σ_d X_d/d where X_d is the common
    * count at depth d; a common doc at ranks (ra, rb) contributes to
    * every d ≥ max(ra, rb), so its weight is the INTEGER suffix sum
    * c(m) = Σ_{d=m..k} L/d with L = lcm(1..k) — the whole score is one
    * integral division (the Krippendorff weight-scaling device).
    *
    * Scale shape: two broadcast-query brute passes (the
    * [[truncationOverlap]] contract — bounded query batch, corpus
    * streams), one k·|Q|-row equi-join, one per-query aggregation.
    *
    * @return one row per query: (query_id, n_common, ao_ppm)
    */
  def rankedTruncationOverlap(corpus: DataFrame, queries: DataFrame,
      k: Int, m: Int, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(k >= 1 && k <= 12, s"k must be in 1..12, got $k")
    require(m >= 1, s"truncation dim must be >= 1, got $m")
    val L = (1 to k).foldLeft(BigInt(1))((a, d) =>
      a * d / a.gcd(BigInt(d))).toLong
    // c(rank) = sum_{d=rank..k} L/d — integer by construction.
    val suffix = (1 to k).map(r => (r to k).map(L / _).sum)
    val full = bruteForceTopK(corpus, queries, k, idCol, vecCol)
      .select(col("query_id"), col("corpus_id"), col("rank").as("__ra"))
    def truncated(df: DataFrame): DataFrame =
      df.withColumn(vecCol, slice(col(vecCol), 1, m))
    val trunc = bruteForceTopK(truncated(corpus), truncated(queries),
        k, idCol, vecCol)
      .select(col("query_id"), col("corpus_id"), col("rank").as("__rb"))
    val weighted = full.join(trunc, Seq("query_id", "corpus_id"))
      .select(col("query_id"),
        element_at(
          array(suffix.map(lit): _*),
          greatest(col("__ra"), col("__rb")).cast("int")).as("__w"))
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_common"),
        sum(col("__w")).cast("long").as("__ws"))
    queries.select(col(idCol).as("query_id"))
      .join(weighted, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_common"), lit(0L)).as("n_common"),
        expr(s"CAST(coalesce(__ws, 0) * 1000000 div ${L * k} AS BIGINT)")
          .as("ao_ppm"))
  }

  /** kNN label agreement — the embedding-space label-noise audit (the
    * cheap, exact cousin of confident learning): does each query
    * vector's own label match the majority label of its k exact
    * nearest neighbors?  Disagreements flag mislabeled rows, duplicate
    * collisions, or an embedding space that doesn't separate the
    * classes — the go/no-go read BEFORE training a filter model on
    * those labels.
    *
    * Majority is deterministic: most votes first, then the SMALLER
    * label — and comes from a k-row-per-query vote frame through the
    * bounded-heap [[graft.plans.TopKPerKey]], never a window over
    * candidates.
    *
    * Scale shape: inherits [[bruteForceTopK]]'s contract — the query
    * batch must be bounded (it broadcasts; evaluation-sized batches),
    * the corpus streams in one scan.  The neighbor-label join is
    * k·|queries| rows against the (id, label) projection.
    *
    * @return one row per query: (query_id, own_label, majority_label,
    *         n_votes ∈ [1,k], agree)
    */
  def knnLabelAgreement(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      labelCol: String = "label"): DataFrame = {
    val top = bruteForceTopK(corpus, queries, k, idCol, vecCol)
    val lbl = corpus.select(col(idCol).as("corpus_id"),
      col(labelCol).cast("long").as("__nl"))
    val votes = top.join(lbl, "corpus_id")
      .groupBy(col("query_id"), col("__nl"))
      .agg(count(lit(1)).as("n_votes"))
    val best = graft.plans.TopK.perKey(votes, Seq(col("query_id")),
        Seq(col("n_votes").desc, col("__nl").asc), k = 1)
      .select(col("query_id"), col("__nl").as("majority_label"),
        col("n_votes"))
    best.join(queries.select(col(idCol).as("query_id"),
        col(labelCol).cast("long").as("own_label")), Seq("query_id"))
      .select(col("query_id"), col("own_label"), col("majority_label"),
        col("n_votes"),
        (col("majority_label") === col("own_label")).as("agree"))
  }

  /** Margin-based bitext mining (Artetxe & Schwenk 2019, "Margin-based
    * Parallel Corpus Mining with Multilingual Sentence Embeddings",
    * ACL) — the parallel-pair miner for multilingual curation.  Raw
    * cosine retrieval suffers hubness (some vectors are near
    * everything); the RATIO margin divides each candidate cosine by
    * the mean of both endpoints' top-k neighborhoods,
    * `margin(x,y) = cos(x,y) / ((avgK(x) + avgK(y)) / 2)`, and a pair
    * is mined when x and y pick each other (mutual best).
    *
    * Exactness: cosines quantize to integer micro per pair, the
    * neighborhood penalties are exact integer sums over bounded-heap
    * [[graft.plans.TopKPerKey]] top-k (never a corpus-wide window),
    * and the margin is a sign-split integral ppm division — every
    * ranking and the mutual test are integer-total and
    * engine-identical.  A non-positive combined penalty yields the
    * −2·10⁹ sentinel (margin undefined; such a pair is never mined in
    * practice).
    *
    * Scale contract: `sideA` is the bounded probe batch (broadcast —
    * the [[bruteForceTopK]] contract); sideB streams in one scan.  At
    * corpus×corpus scale, bucket with [[lshTopK]]/[[ivfTopK]] first
    * and feed each bucket through this kernel.
    *
    * @return one row per probe: (a_id, b_id = forward-best candidate,
    *         cos_micro, margin_ppm, mutual)
    */
  def bitextMargin(sideA: DataFrame, sideB: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(k >= 1 && k <= 64, s"k must be in [1, 64], got $k")
    val a = sideA.select(col(idCol).as("a_id"), col(vecCol).as("__av"))
    val b = sideB.select(col(idCol).as("b_id"), col(vecCol).as("__bv"))
    val scored = b.crossJoin(broadcast(a))
      .select(col("a_id"), col("b_id"),
        round(cosine_sim(col("__av"), col("__bv")) * lit(1000000d), 0)
          .cast("long").as("cos_micro"))
    val penA = graft.plans.TopK.perKey(scored, Seq(col("a_id")),
        Seq(col("cos_micro").desc, col("b_id").asc), k)
      .groupBy(col("a_id")).agg(sum(col("cos_micro")).as("__pa"))
    val penB = graft.plans.TopK.perKey(scored, Seq(col("b_id")),
        Seq(col("cos_micro").desc, col("a_id").asc), k)
      .groupBy(col("b_id")).agg(sum(col("cos_micro")).as("__pb"))
    val margins = scored.join(penA, Seq("a_id")).join(penB, Seq("b_id"))
      .withColumn("margin_ppm", expr(
        s"""CASE WHEN __pa + __pb <= 0 THEN CAST(-2000000000 AS BIGINT)
           |  WHEN cos_micro < 0 THEN CAST(
           |    -((CAST(-cos_micro AS DECIMAL(38,0)) * ${2 * k} * 1000000)
           |      div (__pa + __pb)) AS BIGINT)
           |  ELSE CAST(
           |    (CAST(cos_micro AS DECIMAL(38,0)) * ${2 * k} * 1000000)
           |      div (__pa + __pb) AS BIGINT) END""".stripMargin))
    val fwd = graft.plans.TopK.perKey(margins, Seq(col("a_id")),
      Seq(col("margin_ppm").desc, col("b_id").asc), k = 1)
    val bwd = graft.plans.TopK.perKey(margins, Seq(col("b_id")),
        Seq(col("margin_ppm").desc, col("a_id").asc), k = 1)
      .select(col("a_id"), col("b_id"), lit(true).as("__mut"))
    fwd.join(bwd, Seq("a_id", "b_id"), "left")
      .select(col("a_id"), col("b_id"), col("cos_micro"),
        col("margin_ppm"), coalesce(col("__mut"), lit(false)).as("mutual"))
  }
}
