package graft.runtime

import java.nio.file.{Files, Path, Paths}

/** Filesystem module store rooted at a base directory — parity with the
  * reference's FilesystemStore, whose every fetch validates the requested
  * path against the store's base dir before touching the filesystem
  * (subsystem/filesystem-store/src/lib.rs:12-40, `validate_path` from its
  * path-security dependency). A module spec's `arg:path=` is untrusted
  * deployment input: without this check a spec like
  * `arg:path=../../secrets` reads outside the store with the engine's own
  * privileges.
  *
  * Refused (each with the reason logged through `onDeny`, so denials ride
  * the engine-log channel like capability refusals do):
  *   - absolute paths — a store path is always relative to the base dir;
  *   - any path whose normalized resolution escapes the base dir
  *     (`..` traversal, however spelled);
  *   - symlink escapes — the deepest existing ancestor of the resolved
  *     path must still be inside the REAL base dir, so a link planted
  *     inside the store cannot alias a target outside it.
  */
final class ModuleStore(baseDir: Path,
                        onDeny: (String, String) => Unit = (_, _) => ()) {

  private val root: Path = {
    Files.createDirectories(baseDir)
    baseDir.toRealPath()
  }

  /** The store's (real) base directory. */
  def base: Path = root

  /** Resolve `rel` to a path inside the store, or throw SecurityException
    * (after reporting through `onDeny`). The returned path is normalized
    * and containment-proven; it need not exist yet (stores are written
    * through the same resolution). */
  def resolve(rel: String): Path = {
    def deny(reason: String): Nothing = {
      onDeny(rel, reason)
      throw new SecurityException(s"module path '$rel' refused: $reason")
    }
    val p = Paths.get(rel)
    if (p.isAbsolute) deny("absolute path")
    val joined = root.resolve(p).normalize()
    if (!joined.startsWith(root)) deny("escapes module base dir")
    // Symlink containment: toRealPath follows links, so check the deepest
    // EXISTING ancestor (the final component may not exist yet). NOFOLLOW
    // existence + a deny on toRealPath failure refuses dangling links at
    // RESOLVE time rather than surfacing NoSuchFileException at fetch.
    var probe = joined
    while (!Files.exists(probe, java.nio.file.LinkOption.NOFOLLOW_LINKS))
      probe = probe.getParent
    val real =
      try probe.toRealPath()
      catch { case _: java.io.IOException => deny("unresolvable (dangling) link") }
    if (!real.startsWith(root)) deny("symlink escapes module base dir")
    joined
  }

  /** Fetch a module's bytes (FilesystemStore::fetch parity). */
  def fetch(rel: String): Array[Byte] = Files.readAllBytes(resolve(rel))
}
