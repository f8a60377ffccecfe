package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Duplicate clustering — the step AFTER pairwise near-dup detection: fold
  * the pair list into connected components so each duplicate cluster keeps
  * one canonical representative. Implemented as iterative min-label
  * propagation (each node repeatedly adopts the minimum label among itself
  * and its neighbors) — a driver-side loop over Catalyst plans, converging
  * in O(component diameter) rounds.
  *
  * Scale notes: each round is one join + one aggregation, both keyed by
  * node id — the shuffle carries (node, label) longs. Labels persist
  * per round and the previous round unpersists (lineage would otherwise
  * grow by two stages per round; at deep diameters a checkpoint every ~10
  * rounds truncates it). Dup graphs are overwhelmingly tiny cliques —
  * diameter 1-2, so 2-3 rounds; the large-star/small-star variant bounds
  * pathological chains at web scale with the same per-round plan shape.
  */
object DupClusters {

  /** Connected components of an undirected edge list via min-label
    * propagation. `nodes`: (id); `edges`: (src, dst). Returns (id, component)
    * where component = min node id reachable. */
  def connectedComponents(nodes: DataFrame, edges: DataFrame,
                          maxRounds: Int = 20): DataFrame = {
    // symmetrize once; edges both ways so one join propagates both directions
    val sym = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = nodes.select(col("id"), col("id").as("lbl"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var changed = 1L
    var round = 0
    while (changed > 0 && round < maxRounds) {
      // neighbor labels: for edge (src→dst), dst receives src's current label
      val fromNeighbors = sym.join(labels, sym("src") === labels("id"))
        .select(col("dst").as("id"), col("lbl"))
      val next = labels.unionByName(fromNeighbors)
        .groupBy("id").agg(min(col("lbl")).as("lbl"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      changed = next.join(labels.withColumnRenamed("lbl", "prev"), "id")
        .filter(col("lbl") =!= col("prev")).count()
      labels.unpersist()
      labels = next
      round += 1
    }
    labels.withColumnRenamed("lbl", "component")
  }

  /** d57: cluster the exact-dup corpus (documents ∪ planted copies, d29's
    * corpus) by content hash INTO components, emitting each doc with its
    * canonical (minimum) duplicate-cluster id and the cluster size. Pairs
    * come from the same content-hash grouping d29 uses; the component of a
    * doc with no duplicates is itself. */
  def d57DupComponents(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val corpus = d.select(col("doc_id"), col("text"))
      .unionByName(
        d.filter(col("doc_id") % 10 === 0)
          .select((col("doc_id") + 1000000).as("doc_id"), col("text")))
    // pair each doc with the minimum doc_id sharing its content hash —
    // a star edge list (no C(n,2) explosion even for giant clusters)
    val hashed = corpus.select(col("doc_id"), md5(col("text")).as("h"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val reps = hashed.groupBy("h").agg(min(col("doc_id")).as("rep"))
    val edges = hashed.join(reps, "h")
      .filter(col("doc_id") =!= col("rep"))
      .select(col("rep").as("src"), col("doc_id").as("dst"))
    val nodes = hashed.select(col("doc_id").as("id"))
    connectedComponents(nodes, edges)
      .groupBy("component").agg(count(lit(1)).as("cluster_size"),
        sort_array(collect_list(col("id"))).as("members"))
      .selectExpr("component", "cluster_size", "explode(members) AS doc_id")
      .select("doc_id", "component", "cluster_size")
      .orderBy("doc_id")
  }

  val d57Sql: String =
    """WITH corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0),
      |hashed AS (SELECT doc_id, md5(text) AS h FROM corpus),
      |comp AS (
      |  SELECT doc_id, MIN(doc_id) OVER (PARTITION BY h) AS component
      |  FROM hashed)
      |SELECT doc_id, component,
      |  COUNT(*) OVER (PARTITION BY component) AS cluster_size
      |FROM comp ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d57_dup_components" -> d57DupComponents)

  val oracle: Map[String, String] = Map(
    "d57_dup_components" -> d57Sql)
}
