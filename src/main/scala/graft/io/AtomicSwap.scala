package graft.io

import org.apache.hadoop.fs.{FileSystem, Path}

/** Crash-safe directory replacement for maintenance rewrites (edge-label
  * compaction, delete-mode cleanup, vertex-partition compaction):
  * write-new-to-scratch → rename-old-aside → rename-new-in → delete-old.
  *
  * NOT atomic — a plain filesystem cannot swap a directory name in one
  * operation — but crash-SAFE: a complete copy of the store's rows exists
  * on disk at every instant. The failure windows:
  *
  *  - crash before the first rename: live dir untouched, scratch dir is an
  *    invisible orphan (dot-prefixed — file/partition discovery skips it);
  *  - crash between rename-aside and rename-in (two metadata ops): the live
  *    name dangles, but the aside dir holds the complete pre-swap copy;
  *    [[heal]] renames it back — it runs automatically at the start of the
  *    next maintenance call on the same dir;
  *  - crash after rename-in: the new store is live; the aside copy is an
  *    invisible orphan cleaned up by the next swap.
  *
  * Contrast with the previous delete-then-rename, whose crash window left
  * NO directory under the live name and the only copy in a scratch dir
  * that partition discovery could also see.
  */
object AtomicSwap {

  /** Crash-injection points for specs: each is invoked immediately before
    * the step it names; a spec subclass throws to simulate dying there.
    */
  trait Hooks {
    def beforeAside(): Unit   = ()
    def beforeSwapIn(): Unit  = ()
    def beforeCleanup(): Unit = ()
  }
  object NoHooks extends Hooks

  /** Scratch path the rewrite output must be written to before [[swapIn]]:
    * a dot-prefixed sibling, invisible to Spark's file/partition discovery
    * even though it lives inside the store's base path.
    */
  def scratch(dir: Path): Path = new Path(dir.getParent, s".${dir.getName}.swap")

  private def aside(dir: Path): Path = new Path(dir.getParent, s".${dir.getName}.old")

  /** Heals a swap that died between rename-aside and rename-in: the live
    * name is missing but the complete aside copy exists → rename it back.
    * Idempotent; called automatically by [[swapIn]].
    */
  def heal(fs: FileSystem, dir: Path): Unit =
    if (!fs.exists(dir) && fs.exists(aside(dir))) { fs.rename(aside(dir), dir); () }

  /** Replaces `dir` with the content previously written to [[scratch]]. */
  def swapIn(fs: FileSystem, dir: Path, hooks: Hooks = NoHooks): Unit = {
    val old = aside(dir)
    heal(fs, dir)
    if (fs.exists(old)) fs.delete(old, true) // leftover of a crashed cleanup
    hooks.beforeAside()
    if (fs.exists(dir)) fs.rename(dir, old)
    hooks.beforeSwapIn()
    fs.rename(scratch(dir), dir)
    hooks.beforeCleanup()
    fs.delete(old, true)
    ()
  }
}
