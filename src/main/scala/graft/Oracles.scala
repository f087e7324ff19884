package graft

/** DuckDB oracle SQL — one entry per oracle-checkable query in
  * [[Queries]]. Each statement is the ANSI-SQL twin of the Spark plan:
  * identical column NAMES and (post-cast) types, identical rounding
  * applied to every derived double, identical tiebreaks on every rank.
  *
  * Queries absent here (minhash/simhash/winnowing fingerprints, HLL
  * approx counts, mapPartitions decode) use engine-specific hash
  * families or estimators and get the driver's rows-only check; their
  * exact semantics are locked by ScalaTest specs instead.
  */
object Oracles {

  /** Every oracle, assembled from the per-family objects (r10 VERDICT
    * #7; the sum-of-sizes require makes a key collision between
    * families a construction-time failure, not a silent override). */
  val all: Map[String, String] = {
    val parts = Seq(CoreOracles.map, JoinOracles.map, AggOracles.map, WindowOracles.map, DedupOracles.map, SimilarityOracles.map, ProfileOracles.map, TextOracles.map, MultiModalOracles.map, CompositeOracles.map, CrawlOracles.map)
    val merged = parts.reduce(_ ++ _)
    require(merged.size == parts.map(_.size).sum,
      "duplicate oracle key across family objects")
    merged
  }
}
