package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Duplicate-cluster resolution: the pair lists the near-dup family emits
  * ([[Dedup.minhashLsh]], [[Dedup.simhashDup]], [[Dedup.ngramJaccard]],
  * [[Dedup.windowDup]], [[Dedup.embeddingDup]]) are EDGES, not clusters —
  * "A~B, B~C" must collapse to ONE surviving document even though (A, C) was
  * never emitted as a pair. That closure is connected components over the
  * dup graph, the canonical final step of every web-scale dedup pipeline
  * (the MapReduce-CC setting of Kiveris et al., "Connected Components in
  * MapReduce and Beyond", SoCC'14).
  *
  * Reference analogue: Tenzir's `deduplicate` is exact/keyed only
  * (`/root/reference/libtenzir/builtins/operators/deduplicate.cpp:107-205`);
  * transitive near-dup closure is part of the web-scale extension the north
  * star asks for.
  *
  * Implementation: hash-min label propagation (GraphX's own
  * ConnectedComponents runs the identical Pregel program), kept declarative —
  * per round ONE shuffle join (current labels into the bidirectional edge
  * list) and ONE min-aggregate with map-side partial combine. Rounds ≤ graph
  * diameter; dup graphs are unions of near-cliques (every within-bucket pair
  * is emitted), so the diameter stays single-digit even at 10^10 docs —
  * `maxRounds` is a safety bound, not the expected cost. For adversarial
  * long-path graphs the O(log²n) alternating large-star/small-star variant
  * from the same paper is the upgrade; dedup workloads never need it.
  *
  * Convergence is detected with a monotone invariant: labels only ever
  * decrease, so an unchanged sum(comp) is a fixpoint — one scalar aggregate
  * per round instead of a change-count join.
  */
object Cluster {

  /** Connected components of an undirected edge list.
    *
    * @param edges DataFrame with two long-compatible id columns
    * @return (id, cluster_id) for every node incident to ≥1 edge, where
    *         cluster_id = the smallest node id in the component —
    *         deterministic regardless of partitioning, replay, or cluster
    *         size. Isolated docs (no edge) are by definition their own
    *         singleton cluster and are not materialized here.
    */
  def connectedComponents(
      edges: DataFrame,
      aCol: String = "id_a",
      bCol: String = "id_b",
      maxRounds: Int = 50): DataFrame = {
    val e = edges.select(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst"))
    // both orientations once, deduped: propagation below is then a plain join
    val bidir = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().persist(StorageLevel.MEMORY_AND_DISK)

    var labels = bidir.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("cluster_id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // sum(cluster_id) is strictly decreasing until the fixpoint (labels are
    // min-ids and only ever drop); track it with one scalar agg per round.
    def checksum(df: DataFrame): Long =
      df.agg(coalesce(sum(col("cluster_id")), lit(0L))).head().getLong(0)
    var prev = checksum(labels)

    var round = 0
    var converged = prev == 0L && labels.isEmpty
    while (!converged && round < maxRounds) {
      val msgs = bidir.join(labels, bidir("src") === labels("id"))
        .select(bidir("dst").as("id"), col("cluster_id"))
      // eager localCheckpoint EVERY round: `labels` appears twice in the new
      // plan (join + union), so without per-round truncation the logical
      // plan doubles each round — exponential Catalyst analysis cost, not
      // data, is what blows up iterative DataFrame loops.
      val next = labels.unionByName(msgs)
        .groupBy(col("id")).agg(min(col("cluster_id")).as("cluster_id"))
        .localCheckpoint(true)
      val s = checksum(next)
      labels.unpersist()
      labels = next
      converged = s == prev
      prev = s
      round += 1
    }
    bidir.unpersist()
    // Never return silently-wrong labels: an unconverged exit means some
    // node still carries a non-minimal cluster_id and survivors() would keep
    // duplicates. Dup graphs converge in single-digit rounds; hitting the
    // bound signals an adversarial long-path graph — fail loudly.
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge within $maxRounds rounds " +
          "(graph diameter exceeds the bound); raise maxRounds")
    labels
  }

  /** Transitive near-dup survivors: keep, per connected component of the dup
    * graph, only the smallest-id document (plus every doc with no dup edge
    * at all). One anti-join against the non-survivor set — the docs table is
    * scanned once and never shuffled (losers are the small side: at most one
    * per dup pair).
    */
  def survivors(
      docs: DataFrame,
      edges: DataFrame,
      idCol: String,
      aCol: String = "id_a",
      bCol: String = "id_b"): DataFrame = {
    val losers = connectedComponents(edges, aCol, bCol)
      .filter(col("id") =!= col("cluster_id"))
      .select(col("id"))
    docs.join(losers, docs(idCol) === losers("id"), "left_anti")
  }
}
