package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ChatOpsSpec extends SparkSpec {
  import spark.implicits._

  private def turns(rows: (Long, Long, Long, String, Long)*) =
    rows.toDF("conv", "ts", "turn", "role", "cost")

  test("contextTruncate keeps the longest suffix under budget, exact fit") {
    // conv 1: costs oldest->newest 50, 100, 60, 40; budget 200 keeps
    // the last three exactly (100+60+40 = 200), drops the oldest.
    val df = turns(
      (1L, 10L, 1L, "user", 50L), (1L, 20L, 2L, "assistant", 100L),
      (1L, 30L, 3L, "user", 60L), (1L, 40L, 4L, "assistant", 40L))
    val r = ChatOps.contextTruncate(df, "conv", "ts", "turn", "role",
      "cost", budget = 200L).as[(Long, Long, Long, Long, Long, Long)]
      .collect().head
    assert(r === ((1L, 4L, 3L, 200L, 2L, 0L)))
  }

  test("contextTruncate: nothing fits -> zero kept, null first turn; " +
      "role repeats counted on the FULL transcript") {
    val df = turns(
      (7L, 1L, 1L, "user", 300L), (7L, 2L, 2L, "user", 400L))
    val r = ChatOps.contextTruncate(df, "conv", "ts", "turn", "role",
      "cost", budget = 200L).collect().head
    assert(r.getLong(1) === 2L)            // n_turns
    assert(r.getLong(2) === 0L)            // n_kept
    assert(r.getLong(3) === 0L)            // kept_cost
    assert(r.isNullAt(4))                  // first_kept_event
    assert(r.getLong(5) === 1L)            // user,user adjacency
  }

  test("contextTruncate: ts ties broken by turn id; suffix is by the " +
      "combined order") {
    val df = turns(
      (2L, 5L, 1L, "user", 80L), (2L, 5L, 2L, "assistant", 80L),
      (2L, 5L, 3L, "user", 80L))
    val r = ChatOps.contextTruncate(df, "conv", "ts", "turn", "role",
      "cost", budget = 160L).as[(Long, Long, Long, Long, Long, Long)]
      .collect().head
    // keeps turns 2 and 3 (the suffix under the tie-broken order)
    assert(r === ((2L, 3L, 2L, 160L, 2L, 0L)))
  }

  test("contextTruncate rejects a negative cost loudly") {
    val df = turns((3L, 1L, 1L, "user", -5L))
    val e = intercept[Exception] {
      ChatOps.contextTruncate(df, "conv", "ts", "turn", "role",
        "cost", budget = 10L).collect()
    }
    assert(e.getMessage.contains("negative cost"))
  }

  test("contextTruncate rejects a NULL cost with a null-specific " +
      "message, not the negative-cost one") {
    val df = turns((3L, 1L, 1L, "user", -5L))
      .withColumn("cost", org.apache.spark.sql.functions.lit(null)
        .cast("long"))
    val e = intercept[Exception] {
      ChatOps.contextTruncate(df, "conv", "ts", "turn", "role",
        "cost", budget = 10L).collect()
    }
    assert(e.getMessage.contains("null cost"))
    assert(!e.getMessage.contains("negative cost"))
  }

  test("bestOfN: score tie goes to the smaller id; acceptance counts " +
      "use >= threshold") {
    val cands = Seq(
      (1L, 11L, 0.9), (1L, 10L, 0.9), (1L, 12L, 0.2),
      (2L, 20L, 0.1), (2L, 21L, 0.5))
      .toDF("prompt", "cand", "score")
    val r = ChatOps.bestOfN(cands, "prompt", "cand", "score",
      threshold = 0.5).orderBy("prompt")
      .as[(Long, Long, Double, Long, Long)].collect().toSeq
    assert(r === Seq((1L, 10L, 0.9, 3L, 2L), (2L, 21L, 0.5, 2L, 1L)))
  }

  test("bestOfN plans the bounded-heap TopKPerKey, not a window") {
    val cands = Seq((1L, 1L, 0.5)).toDF("prompt", "cand", "score")
    val plan = ChatOps.bestOfN(cands, "prompt", "cand", "score", 0.0)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan.take(500))
    assert(!plan.contains("Window"), plan.take(500))
  }

  test("frequentUnitRemoval cuts corpus-frequent lines, keeps rare " +
      "ones, preserves order, handles the all-boilerplate doc") {
    val docs = Seq(
      (1L, "COOKIE BANNER\nreal content one\nfooter"),
      (2L, "COOKIE BANNER\nreal content two\nfooter"),
      (3L, "COOKIE BANNER\nfooter"),
      (4L, "unique only"))
      .toDF("doc_id", "text")
    val r = Dedup.frequentUnitRemoval(docs, "doc_id", "text",
      delim = "\n", minDocs = 3).orderBy("doc_id")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(r === Seq(
      (1L, "real content one", 3L, 2L),
      (2L, "real content two", 3L, 2L),
      (3L, "", 2L, 2L),
      (4L, "unique only", 1L, 0L)))
  }

  test("frequentUnitRemoval counts DISTINCT docs: within-doc repeats " +
      "don't reach the threshold, but all repeats are cut together") {
    val docs = Seq(
      (1L, "spam\nspam\nspam\nkeep"),   // 3 in-doc repeats, 1 doc
      (2L, "spam\nother"))               // 2nd distinct doc
      .toDF("doc_id", "text")
    // threshold 3 distinct docs: 'spam' appears in only 2 -> kept
    val keep = Dedup.frequentUnitRemoval(docs, "doc_id", "text",
      "\n", minDocs = 3).orderBy("doc_id")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(keep.head === ((1L, "spam\nspam\nspam\nkeep", 4L, 0L)))
    // threshold 2: both docs contain it -> every occurrence cut
    val cut = Dedup.frequentUnitRemoval(docs, "doc_id", "text",
      "\n", minDocs = 2).orderBy("doc_id")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(cut === Seq((1L, "keep", 4L, 3L), (2L, "other", 2L, 1L)))
  }

  test("truncationOverlap: identical prefixes -> full overlap and " +
      "exact energy ratio") {
    // 4 vectors whose first 2 dims fully determine cosine order.
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (3L, Array(0.1f, 0.9f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val r = Similarity.truncationOverlap(vecs,
        vecs.filter(col("vec_id") === 0L), k = 2, m = 2)
      .as[(Long, Long, Double)].collect().head
    assert(r._1 === 0L && r._2 === 2L)
    assert(r._3 === 1.0)                    // all energy in dims 1-2
  }

  test("truncationOverlap detects neighbor churn when the tail dims " +
      "carry the signal") {
    // Query q: prefix says (a) is nearest; full says (b) is.
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 1.0f)),            // q
      (1L, Array(1.0f, 0.0f, -1.0f)),           // a: prefix-close, full-far
      (2L, Array(0.6f, 0.8f, 0.75f)))           // b: full-close
      .toDF("vec_id", "embedding")
    val r = Similarity.truncationOverlap(vecs,
        vecs.filter(col("vec_id") === 0L), k = 1, m = 2)
      .as[(Long, Long, Double)].collect().head
    assert(r._2 === 0L, s"expected zero overlap, got $r")
    assert(r._3 === 0.5)                    // 1.0 of 2.0 squared norm
  }

  test("templateAudit: every violation class counted once; a clean " +
      "transcript is ok") {
    val turns = Seq(
      ("A", 1L, 1L, "user", "hi"), ("A", 2L, 2L, "assistant", "yo"),
      ("A", 3L, 3L, "assistant", "dup"),      // role repeat
      ("A", 4L, 4L, "weird", ""),             // bad role + empty text
      ("A", 5L, 5L, "system", "late"),        // late system
      ("B", 1L, 1L, "system", "s"), ("B", 2L, 2L, "user", "q"),
      ("B", 3L, 3L, "assistant", "a"))
      .toDF("conv", "ts", "tie", "role", "text")
    val got = ChatOps.templateAudit(turns, "conv", "ts", "tie",
        "role", "text")
      .as[(String, Long, String, Long, Long, Long, Long, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(got("A") === (("A", 5L, "user", 1L, 1L, 1L, 1L, false)))
    assert(got("B") === (("B", 3L, "system", 0L, 0L, 0L, 0L, true)))
  }

  test("linearizeTree: branched chat flattens to one path per leaf; " +
      "root-leaf included; orphans drop; depth overflow fails loudly") {
    def opt(l: Long): java.lang.Long = java.lang.Long.valueOf(l)
    val nodes = Seq(
      (1L, null.asInstanceOf[java.lang.Long], "sys"),
      (2L, opt(1L), "a1"), (3L, opt(1L), "a2"),   // branch point
      (4L, opt(2L), "u1"),
      (9L, null.asInstanceOf[java.lang.Long], "lonely"),  // root-leaf
      (7L, opt(99L), "orphan"))                   // unreachable
      .toDF("id", "par", "pl")
    val got = ChatOps.linearizeTree(nodes, "id", "par", "pl", 5)
      .as[(Long, Long, String)].collect().toSet
    assert(got === Set((3L, 2L, "sys>a2"), (4L, 3L, "sys>a1>u1"),
      (9L, 1L, "lonely")))
    val e = intercept[IllegalStateException] {
      ChatOps.linearizeTree(nodes, "id", "par", "pl", 2)
    }
    assert(e.getMessage.contains("maxDepth=2"))
  }

  test("rankedTruncationOverlap: identical order scores exactly 1e6; " +
      "a rank SWAP drops AO while set overlap stays full") {
    // prefix-identical vectors -> AO = 1.0 exactly.
    val same = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f, 0.0f, 0.0f)),
      (2L, Array(0.8f, 0.2f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val a = Similarity.rankedTruncationOverlap(same,
        same.filter(col("vec_id") === 0L), k = 2, m = 2)
      .as[(Long, Long, Long)].collect().head
    assert(a === ((0L, 2L, 1000000L)))
    // tail dims swap ranks 1 and 2: full order (1, 2), prefix order
    // (2, 1).  X_1 = 0, X_2 = 2 -> AO = (0/1 + 2/2)/2 = 1/2 exactly;
    // plain set overlap at k=2 is still 2/2.
    val churn = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(0.90f, 0.10f, 0.30f, 0.0f)),
      (2L, Array(0.89f, 0.11f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val c = Similarity.rankedTruncationOverlap(churn,
        churn.filter(col("vec_id") === 0L), k = 2, m = 2)
      .as[(Long, Long, Long)].collect().head
    assert(c === ((0L, 2L, 500000L)), s"swap must halve AO: $c")
  }

  test("knnLabelAgreement: clean point agrees, mislabeled point is " +
      "flagged, majority tie goes to the smaller label") {
    // cluster A (label 0) at x-axis, cluster B (label 1) at y-axis;
    // id 7 sits IN cluster A but carries label 1 (the mislabel).
    val corpus = Seq(
      (1L, Array(1.0f, 0.00f), 0), (2L, Array(1.0f, 0.01f), 0),
      (3L, Array(1.0f, 0.02f), 0),
      (4L, Array(0.0f, 1.00f), 1), (5L, Array(0.01f, 1.0f), 1),
      (6L, Array(0.02f, 1.0f), 1),
      (7L, Array(1.0f, 0.03f), 1)).toDF("vec_id", "embedding", "label")
    val got = Similarity.knnLabelAgreement(corpus,
        corpus.filter(col("vec_id").isin(1L, 7L)), k = 3)
      .as[(Long, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    // query 1: neighbors {2,3,7} -> labels {0,0,1} -> majority 0 agree
    assert(got(1L) === ((1L, 0L, 0L, 2L, true)))
    // query 7: neighbors {3,2,1} -> all label 0 -> own label 1 flagged
    assert(got(7L) === ((7L, 1L, 0L, 3L, false)))
    // real tie: query 1 at k=4 sees labels {0,0,1,1} (neighbors
    // 2,3,7 then 6, the nearest of cluster B) -> 2-2 tie -> the
    // SMALLER label (0) wins deterministically.
    val tie = Similarity.knnLabelAgreement(corpus,
        corpus.filter(col("vec_id") === 1L), k = 4)
      .as[(Long, Long, Long, Long, Boolean)].collect().head
    assert(tie === ((1L, 0L, 0L, 2L, true)))
  }
}
