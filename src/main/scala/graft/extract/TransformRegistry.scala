package graft.extract

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.Column

/** Registry for caller-supplied property transforms — the X1 escape hatch
  * for reference configs whose JSR-223 scripts
  * (ScrapingTransformer.java:266-299, README.md:396-410) have no
  * whitelisted [[graft.model.NamedTransform]] equivalent.
  *
  * A registered transform is a `Column => Column` applied once per
  * property ELEMENT (the reference evaluates its script per element of an
  * array property, ScrapingTransformer.java:288-294). It runs at PLAN
  * time on the driver: the function builds a Catalyst expression, so the
  * resulting plan stays declarative and codegen'd — there is no per-row
  * script engine anywhere, which is the whole point of the substitution
  * (SURVEY.md §2.9). Config files reference a transform by name
  * (`{"script": {"name": "custom", "ref": "<registered-name>"}}`), keeping
  * the config surface itself data, not code.
  *
  * Registration is process-wide and expected at session setup (before the
  * config's extraction plan is compiled), mirroring how a reference user
  * ships the script with the river config.
  */
object TransformRegistry {
  private val transforms = TrieMap.empty[String, Column => Column]

  /** Register (or replace) a named transform. */
  def register(name: String, f: Column => Column): Unit = transforms(name) = f

  /** Resolve a registered transform; plan-compile-time error (with the
    * registered names listed) when the config references an unknown one —
    * failing at session build, not mid-crawl on an executor.
    */
  def resolve(name: String): Column => Column =
    transforms.getOrElse(name, throw new IllegalArgumentException(
      s"no custom transform registered under '$name' " +
        s"(registered: ${transforms.keys.toSeq.sorted.mkString(", ")}); " +
        "call TransformRegistry.register before building the session"))

  /** Test hook: remove a registration. */
  def unregister(name: String): Unit = transforms.remove(name)
}
