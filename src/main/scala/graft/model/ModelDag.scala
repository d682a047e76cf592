package graft.model

/** Topological ordering over ref() edges — the engine's replacement for
  * dbt's DAG scheduler (reference: translator.py:32-47 asset-key edges;
  * staging models run before the marts that ref() them).
  */
object ModelDag {

  /** Models in dependency order (dependencies first). Refs to models not in
    * the set (e.g. cross-project) are treated as satisfied externally.
    * Throws on cycles, naming the cycle members.
    */
  def topoSort(models: Seq[SqlModel]): Seq[SqlModel] = {
    val byName = models.map(m => m.name -> m).toMap
    val visiting = scala.collection.mutable.LinkedHashSet[String]()
    val done = scala.collection.mutable.LinkedHashSet[String]()
    val out = scala.collection.mutable.ArrayBuffer[SqlModel]()

    def visit(name: String): Unit = {
      if (done.contains(name)) return
      if (visiting.contains(name))
        throw new IllegalStateException(
          s"model cycle: ${visiting.dropWhile(_ != name).mkString(" -> ")} -> $name")
      visiting += name
      byName(name).refs.filter(byName.contains).foreach(visit)
      visiting -= name
      done += name
      out += byName(name)
    }

    models.foreach(m => visit(m.name))
    out.toSeq
  }

  /** Topological *levels*: models in the same level share no ref edges and
    * can materialize concurrently — the engine's equivalent of dbt's thread
    * pool (reference: profiles.yml threads 4 dev / 8 prod). Level k contains
    * models whose longest ref chain has length k.
    */
  def levels(models: Seq[SqlModel]): Seq[Seq[SqlModel]] = {
    val sorted = topoSort(models)
    val depth = scala.collection.mutable.Map[String, Int]()
    sorted.foreach { m =>
      val d = m.refs.flatMap(depth.get).maxOption.map(_ + 1).getOrElse(0)
      depth(m.name) = d
    }
    sorted.groupBy(m => depth(m.name)).toSeq.sortBy(_._1).map(_._2)
  }

  /** Staging-layer models of a DAG = those no other model refs... kept
    * simple: layer is detectable from dbt-style names (`__stg_` / `__mart_`).
    */
  def layerOf(m: SqlModel): String =
    if (m.name.contains("__stg_")) "staging"
    else if (m.name.contains("__mart_")) "mart"
    else "other"
}
