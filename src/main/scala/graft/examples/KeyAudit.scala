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
  }
}
