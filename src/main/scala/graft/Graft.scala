package graft

import java.nio.file.Path

import graft.catalog.Atlas
import graft.channel.ChannelRegistry
import graft.runtime.QueryManager
import graft.streaming.LogAnalyser
import graft.switchboard.Switchboard
import org.apache.spark.sql.SparkSession

/** One-call boot of the engine runtime — the Spark-side equivalent of the
  * reference's host runtime wiring (system/runtime/src/main.rs: kernel +
  * registry + switchboard + atlas + module deployment). Returns every
  * subsystem pre-wired: durable channel registry under `root`, URI
  * catalogue, capability-checked query manager (with the engine logs
  * channel installed), and the typed switchboard.
  */
final case class Graft(
    spark: SparkSession,
    registry: ChannelRegistry,
    atlas: Atlas,
    queries: QueryManager,
    switchboard: Switchboard,
    modules: runtime.ModuleStore) {

  /** The engine's own log stream — subscribe like any channel (S8). */
  def logs: channel.Channel = registry.get(Graft.LogsChannel)

  /** Expose every topic to SQL (`graft_<name>` views with full pushdown);
    * returns the registered view names. */
  def sqlViews(prefix: String = "graft_"): Seq[String] =
    registry.registerViews(prefix)
}

object Graft {
  val LogsChannel = "graft_logs"

  def boot(spark: SparkSession, root: Path): Graft = {
    Tables.ensureConf(spark)
    val registry = new ChannelRegistry(spark, root)
    val atlas = new Atlas
    val logsSchema =
      org.apache.spark.sql.Encoders.product[LogAnalyser.LogRecord].schema
    val logsCh = registry.getOrCreate(LogsChannel, logsSchema)
    atlas.insert("sel://graft/logs", LogsChannel)
    val qm = new QueryManager(spark, logsChannel = Some(logsCh))
    val sb = new Switchboard(spark, registry)
    atlas.registerSingleton("switchboard", sb)
    // module bytes live under the runtime root; every path in a module
    // spec resolves through the store's traversal check
    val modules = new runtime.ModuleStore(root.resolve("modules"),
      onDeny = qm.logModuleDenial)
    Graft(spark, registry, atlas, qm, sb, modules)
  }
}
