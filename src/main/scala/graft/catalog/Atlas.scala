package graft.catalog

import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

/** URI name catalogue: `sel://` URIs → channel names, with glob lookup —
  * the engine's equivalent of the reference's selium-atlas catalogue
  * (usage: examples/waf/src/lib.rs:82-99, log-analyser lookup(pattern) at
  * src/lib.rs:47-54). Also hosts the singleton registry (DependencyId →
  * service, reference kernel/drivers/singleton.rs:28-86) as named shared
  * objects.
  */
final class Atlas {

  private val entries = new ConcurrentHashMap[String, String]()
  private val singletons = new ConcurrentHashMap[String, AnyRef]()

  def insert(uri: String, channel: String): Unit = {
    require(uri.startsWith("sel://"), s"URIs are sel://…: $uri")
    entries.put(uri, channel)
  }

  def get(uri: String): Option[String] = Option(entries.get(uri))

  /** Glob lookup over URIs (reference AdoptMode::Tap dynamic union, J3):
    * every matching channel, sorted for deterministic union order. */
  def lookup(pattern: String): Seq[String] = {
    val rx = ("^" + java.util.regex.Pattern.quote(pattern)
      .replace("*", "\\E[^/]*\\Q")
      .replace("?", "\\E.\\Q") + "$").r
    entries.asScala.toSeq
      .collect { case (uri, ch) if rx.matches(uri) => (uri, ch) }
      .sortBy(_._1).map(_._2)
  }

  def remove(uri: String): Unit = entries.remove(uri)

  // -- singletons (well-known named services, Context::require parity) --
  def registerSingleton(name: String, value: AnyRef): Unit = {
    val prev = singletons.putIfAbsent(name, value)
    require(prev == null, s"singleton '$name' already registered")
  }
  def requireSingleton[T <: AnyRef](name: String): T =
    Option(singletons.get(name))
      .getOrElse(throw new NoSuchElementException(s"no singleton '$name'"))
      .asInstanceOf[T]
}
