package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.fred.ops.{Clean, DedupSync, Merge, MonthlyAgg, YearlyGold}
import graft.ext.{Decontam, Dedup, Ivf, MultiModal, Packing, Profile, Sampling, SemDedup, SeriesOps, Similarity, Splits, TextOps, VectorLsh, VectorQuant, VectorStats}

/** The operator catalog: every SURVEY §2 operator (and the contract's
  * `[EXT]` training-data ops) expressed as a named query over the
  * driver testdata, each paired (in [[Oracles]]) with ANSI SQL DuckDB
  * can run on the same tables.
  *
  * Determinism rules (SURVEY §5): no wall-clock columns; every double
  * produced by arithmetic is rounded (4 dp) or summed as decimal so the
  * hash compare is immune to summation-order float noise; ranks always
  * carry an id tiebreak.
  */
object Queries
    extends QueriesBase
    with CoreQueries with JoinQueries with AggQueries with WindowQueries
    with DedupQueries with SimilarityQueries with ProfileQueries
    with TextQueries with MultiModalQueries with CompositeQueries
    with CrawlQueries {

  /** The full catalog, assembled from the per-family registries (r10
    * VERDICT #7 split the former single-file catalog; each family file
    * owns its queries AND its registry slice, so adding an operator
    * touches one file). */
  val all: Map[String, Q] = coreRegistry ++
    joinRegistry ++
    aggRegistry ++
    windowRegistry ++
    dedupRegistry ++
    similarityRegistry ++
    profileRegistry ++
    textRegistry ++
    multiModalRegistry ++
    compositeRegistry ++
    crawlRegistry
}
