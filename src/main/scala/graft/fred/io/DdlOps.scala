package graft.fred.io

import org.apache.spark.sql.SparkSession

/** H5 — the DDL surface of the reference's `fred_rds_manager.py`
  * utility: CREATE TABLE from a (column → type) map, RENAME COLUMN,
  * ADD COLUMN, truncate (`fred_rds_manager.py:72-91, 30-49, 51-70,
  * 93-110`). Expressed against the Spark session catalog; the same
  * statements run against Postgres through a plain JDBC connection for
  * the serving side (the reference's actual target).
  *
  * Identifiers are validated (not parameterizable in SQL) — same
  * posture as the reference, which formats identifiers from config.
  */
object DdlOps {

  private val Ident = "^[A-Za-z_][A-Za-z0-9_]*$".r

  private def checkIdent(s: String): String = s match {
    case Ident() => s
    case _ => throw new IllegalArgumentException(s"invalid SQL identifier: $s")
  }

  /** CREATE TABLE from an ordered (column → type) map
    * (`fred_rds_manager.py:72-91`). */
  def createTable(spark: SparkSession, table: String,
      columns: Seq[(String, String)], ifNotExists: Boolean = true): Unit = {
    val cols = columns.map { case (c, t) => s"${checkIdent(c)} $t" }.mkString(", ")
    val ine = if (ifNotExists) "IF NOT EXISTS " else ""
    spark.sql(s"CREATE TABLE $ine${checkIdent(table)} ($cols) USING parquet")
  }

  /** ALTER TABLE RENAME COLUMN (`fred_rds_manager.py:30-49`).
    *
    * V2 catalogs (and the JDBC serving target) support the native
    * statement; v1 file-source tables do not, so fall back to a
    * distributed rewrite: stage the renamed data to a temp table,
    * swap via table rename. The rewrite is linear in table size with
    * no driver materialization. */
  def renameColumn(spark: SparkSession, table: String,
      from: String, to: String): Unit = {
    val t = checkIdent(table)
    try spark.sql(s"ALTER TABLE $t RENAME COLUMN " +
      s"${checkIdent(from)} TO ${checkIdent(to)}")
    catch {
      case e: org.apache.spark.sql.AnalysisException
          if e.getCondition == "UNSUPPORTED_FEATURE.TABLE_OPERATION" =>
        val tmp = s"${t}_rename_staging"
        spark.table(t).withColumnRenamed(from, to)
          .write.saveAsTable(tmp)
        spark.sql(s"DROP TABLE $t")
        spark.sql(s"ALTER TABLE $tmp RENAME TO $t")
    }
  }

  /** ALTER TABLE ADD COLUMN (`fred_rds_manager.py:51-70`). */
  def addColumn(spark: SparkSession, table: String,
      name: String, sqlType: String): Unit =
    spark.sql(s"ALTER TABLE ${checkIdent(table)} ADD COLUMNS " +
      s"(${checkIdent(name)} $sqlType)")

  /** DELETE FROM (truncate; `fred_rds_manager.py:93-110`). Session-
    * catalog parquet tables don't support DELETE — TRUNCATE matches
    * the reference's intent (it deletes all rows unconditionally). */
  def truncate(spark: SparkSession, table: String): Unit =
    spark.sql(s"TRUNCATE TABLE ${checkIdent(table)}")

  /** The same DDL against a JDBC target (the reference's Postgres
    * path) — statements only, execution via a caller-owned connection
    * so tests and prod share the SQL. */
  def jdbcCreateTableSql(table: String, columns: Seq[(String, String)],
      primaryKey: Seq[String] = Nil): String = {
    val cols = columns.map { case (c, t) => s"${checkIdent(c)} $t" }
    val pk = if (primaryKey.nonEmpty)
      Seq(s"PRIMARY KEY (${primaryKey.map(checkIdent).mkString(", ")})")
    else Nil
    s"CREATE TABLE IF NOT EXISTS ${checkIdent(table)} " +
      (cols ++ pk).mkString("(", ", ", ")")
  }
}
