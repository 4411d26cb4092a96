package graft.tools

/** Prints the catalog keys and which lack a DuckDB oracle. */
object CatalogDump {
  def main(args: Array[String]): Unit = {
    val q = graft.SparkEntry.queries.keySet
    val o = graft.SparkEntry.oracleSql.keySet
    println(s"queries=${q.size} oracles=${o.size}")
    println(q.toSeq.sorted.mkString(" "))
    println("no-oracle: " + (q -- o).toSeq.sorted.mkString(" "))
  }
}
