package graft.examples
object KeyAudit {
  def main(args: Array[String]): Unit = {
    val q = graft.SparkEntry.queries.keySet
    val o = graft.SparkEntry.oracleSql.keySet
    println(s"[audit] queries=${q.size} oracles=${o.size}")
    val orphanOracles = o -- q
    val unoracled = q -- o
    println(s"[audit] oracle keys without a query: ${orphanOracles.toSeq.sorted}")
    println(s"[audit] queries without an oracle: ${unoracled.toSeq.sorted}")
    // An orphan oracle means the driver would DuckDB-run SQL that no Spark
    // query produces — a silent gate hole. Fail loud so CI wiring catches it.
    // Unoracled queries stay informational: non-SQL-expressible ops
    // legitimately omit oracles (driver records a rows-only check).
    if (orphanOracles.nonEmpty)
      sys.error(s"orphan oracle keys (no matching query): ${orphanOracles.toSeq.sorted}")
  }
}
